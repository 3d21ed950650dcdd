"""Pallas TPU kernel: per-tile front-to-back alpha blend, forward + analytic VJP.

This is the performance centerpiece replacing `renderCUDA`
(cuda_rasterizer/forward.cu:262-398) and its hand-written backward
(backward.cu:398-593) with TPU-native per-tile programs:

  * grid = (num_tiles,): one program per 16×16 tile, splat lists pre-gathered
    to static capacity K (ops/rasterizer binning) living in VMEM;
  * the sequential front-to-back recurrence is reformulated in log space and
    computed with TRIANGULAR MATMULS on the MXU: prefix sums over the splat
    axis are `log1p(-a) @ U` with U upper-triangular — replacing the CUDA
    thread-serial loop;
  * the Gaussian falloff is evaluated as a quadratic-form matmul
    `monomials[P,6] @ coeff[6,CH]` (MXU) instead of per-pixel VPU chains;
  * per-pixel color/feature accumulation is a [3,CH]·[P,CH]ᵀ matmul (MXU);
  * chunks past the tile's splat count, or after every pixel latches T<eps,
    are skipped (the renderCUDA done/break analog) — exact no-ops either way;
  * backward recomputes the forward per chunk (flash-attention-style — no big
    residuals) and uses the suffix-sum identity
        dL/da_i = T_i·g_i − (S_i + dL/dlogT_final)/(1−a_i),
        S_i = Σ_{j>i} w_j·g_j
    (the associative form of backward.cu's `accum_rec` back-to-front replay),
    then reduces analytic d(power)/d{mean2d, conic, opacity} on-chip.

Data layout: ALL per-splat attributes arrive PACKED channel-first as one
`attrs [C, T, K]` tensor (rows: xy 2, conic 3, opacity 1, rgb 3, features F),
gathered once in XLA from a `[C, N]` table (gather_splats below) — one gather,
one scatter in the backward, no minor-dim transposes (6 separate gathers +
swapaxes measured ~15 ms fwd / ~40 ms bwd at the 65k/128² workload). The splat
axis K is minor and lane-aligned (Mosaic requires dynamically-sliced axes
aligned to 128 on hardware; interpret mode accepts any chunk). Tile-local
coordinates are formed IN-kernel by subtracting the tile origin (SMEM) so the
expanded quadratic form stays fp32-accurate.

Gradient semantics match the pure-jax oracle (ops/rasterizer_ref.py) — i.e.
jnp.minimum/where-gated autodiff: clamped alphas (0.99), skipped splats
(power>0, alpha<1/255) and latched pixels get zero gradient. (The CUDA backward
leaves the 0.99 clamp ungated, backward.cu:478-490 — a semantics bug we do not
replicate.) All tensors fp32; matmul accumulation fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4

# packed attribute rows
RGB = slice(6, 9)
FEAT0 = 9  # features start here; C = 9 + n_feat


def _pixel_monomials_t(tile: int):
    """[P, 6] monomial basis (1, px, py, px², px·py, py²), TILE-LOCAL pixels."""
    p = tile * tile
    local = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (local % tile).astype(jnp.float32)
    py = (local // tile).astype(jnp.float32)
    one = jnp.ones_like(px)
    return jnp.concatenate([one, px, py, px * px, px * py, py * py], axis=1)


def _tri_upper(ch: int, strict: bool):
    """[CH, CH] with M[j, i] = 1 for j < i (strict) or j <= i: x @ M = prefix."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    return jnp.where(r < c if strict else r <= c, 1.0, 0.0).astype(jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    """a [M,K], b [N,K] → [M,N] (contract last dims)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """a [K,M], b [K,N] → [M,N] (contract first dims)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _splat_coeffs(xm, ym, ca, cb, cc):
    """[6, CH] power coefficients from [1, CH] rows.

    power = -0.5a(xm-px)² - 0.5c(ym-py)² - b(xm-px)(ym-py), conic=(a, b, c).
    """
    return jnp.concatenate([
        -0.5 * ca * xm * xm - 0.5 * cc * ym * ym - cb * xm * ym,
        ca * xm + cb * ym,
        cc * ym + cb * xm,
        -0.5 * ca,
        -cb,
        -0.5 * cc,
    ], axis=0)


def _chunk_state(attrs, livet, ox, oy, mono_t, log_t_raw, fail_any,
                 u_incl, u_strict):
    """Shared fwd math for one chunk; attrs [C, CH] packed, pixel-major [P, CH]."""
    xm = attrs[0:1, :] - ox
    ym = attrs[1:2, :] - oy
    ca, cb, cc = attrs[2:3, :], attrs[3:4, :], attrs[4:5, :]
    opt = attrs[5:6, :]
    coeff = _splat_coeffs(xm, ym, ca, cb, cc)             # [6, CH]
    power = _dot(mono_t, coeff)                           # [P, CH]
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha_un = opt * g
    alpha = jnp.minimum(ALPHA_MAX, alpha_un)
    active = (power <= 0.0) & (alpha >= ALPHA_MIN) & (livet > 0.5)
    a = jnp.where(active, alpha, 0.0)
    log1m = jnp.log1p(-a)
    csum = _dot(log1m, u_incl)                            # inclusive prefix
    t_before = jnp.exp(csum - log1m + log_t_raw)          # [P, CH]
    test_t = t_before * (1.0 - a)
    fail = test_t < T_EPS
    fail_f = fail.astype(jnp.float32)
    term_before = (_dot(fail_f, u_strict) > 0.5) | (fail_any > 0.5)
    contrib = jnp.logical_not(term_before) & jnp.logical_not(fail)
    w = jnp.where(contrib, a * t_before, 0.0)
    new_log_t_raw = log_t_raw + csum[:, -1:]
    new_fail_any = jnp.maximum(fail_any, jnp.max(fail_f, axis=1, keepdims=True))
    return dict(xm=xm, ym=ym, ca=ca, cb=cb, cc=cc, g=g, alpha_un=alpha_un,
                a=a, active=active, log1m=log1m, t_before=t_before,
                contrib=contrib, w=w, new_log_t_raw=new_log_t_raw,
                new_fail_any=new_fail_any)


def _fwd_kernel(count_ref, origin_ref, attrs_ref, livet_ref,
                color_ref, lang_ref, logtf_ref,
                *, tile, ch, n_chunks, n_feat):
    p = tile * tile
    mono_t = _pixel_monomials_t(tile)
    u_incl = _tri_upper(ch, strict=False)
    u_strict = _tri_upper(ch, strict=True)
    t_idx = pl.program_id(0)
    count = count_ref[t_idx, 0]
    ox = origin_ref[t_idx, 0]
    oy = origin_ref[t_idx, 1]

    def body(c, carry):
        log_t_raw, log_t_final, fail_any, color_acc, lang_acc = carry
        all_latched = jnp.min(fail_any) > 0.5

        def run(carry):
            log_t_raw, log_t_final, fail_any, color_acc, lang_acc = carry
            sl = pl.ds(c * ch, ch)
            attrs = attrs_ref[:, sl]                       # [C, CH]
            s = _chunk_state(attrs, livet_ref[:, sl], ox, oy, mono_t,
                             log_t_raw, fail_any, u_incl, u_strict)
            color_acc = color_acc + _dot_nt(attrs[RGB, :], s["w"])   # [3, P]
            lang_acc = lang_acc + _dot_nt(attrs[FEAT0:, :], s["w"])  # [F, P]
            log_t_final = log_t_final + jnp.sum(
                jnp.where(s["contrib"], s["log1m"], 0.0), axis=1, keepdims=True)
            return (s["new_log_t_raw"], log_t_final, s["new_fail_any"],
                    color_acc, lang_acc)

        return jax.lax.cond((c * ch < count) & jnp.logical_not(all_latched),
                            run, lambda x: x, carry)

    init = (jnp.zeros((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32),
            jnp.zeros((p, 1), jnp.float32),
            jnp.zeros((3, p), jnp.float32),
            jnp.zeros((n_feat, p), jnp.float32))
    _, log_t_final, _, color_acc, lang_acc = jax.lax.fori_loop(
        0, n_chunks, body, init)
    color_ref[:, :] = color_acc
    lang_ref[:, :] = lang_acc
    logtf_ref[:, :] = jnp.transpose(log_t_final)           # [1, P]


def _bwd_kernel(count_ref, origin_ref, attrs_ref, livet_ref,
                gcolor_ref, glang_ref, glogtf_ref, dattrs_ref,
                *, tile, ch, n_chunks, n_feat):
    p = tile * tile
    mono_t = _pixel_monomials_t(tile)
    u_incl = _tri_upper(ch, strict=False)
    u_strict = _tri_upper(ch, strict=True)
    t_idx = pl.program_id(0)
    count = count_ref[t_idx, 0]
    ox = origin_ref[t_idx, 0]
    oy = origin_ref[t_idx, 1]
    gcolor = gcolor_ref[:, :]                              # [3, P]
    glang = glang_ref[:, :]                                # [F, P]
    glogtf = jnp.transpose(glogtf_ref[:, :])               # [P, 1]
    dattrs_ref[:, :] = jnp.zeros_like(dattrs_ref)

    # ---- pass 1 (forward replay): total Σ w·g per pixel
    def pass1(c, carry):
        def run(carry):
            log_t_raw, fail_any, total_wg = carry
            sl = pl.ds(c * ch, ch)
            attrs = attrs_ref[:, sl]
            s = _chunk_state(attrs, livet_ref[:, sl], ox, oy, mono_t,
                             log_t_raw, fail_any, u_incl, u_strict)
            gsplat = _dot_tn(gcolor, attrs[RGB, :]) \
                + _dot_tn(glang, attrs[FEAT0:, :])         # [P, CH]
            total_wg = total_wg + jnp.sum(s["w"] * gsplat, axis=1,
                                          keepdims=True)
            return (s["new_log_t_raw"], s["new_fail_any"], total_wg)

        all_latched = jnp.min(carry[1]) > 0.5
        return jax.lax.cond((c * ch < count) & jnp.logical_not(all_latched),
                            run, lambda x: x, carry)

    init1 = (jnp.zeros((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32),
             jnp.zeros((p, 1), jnp.float32))
    _, _, total_wg = jax.lax.fori_loop(0, n_chunks, pass1, init1)

    # ---- pass 2: per-splat gradients
    def pass2(c, carry):
        log_t_raw, fail_any, prefix_wg = carry
        sl = pl.ds(c * ch, ch)
        attrs = attrs_ref[:, sl]
        s = _chunk_state(attrs, livet_ref[:, sl], ox, oy, mono_t,
                         log_t_raw, fail_any, u_incl, u_strict)
        gsplat = _dot_tn(gcolor, attrs[RGB, :]) \
            + _dot_tn(glang, attrs[FEAT0:, :])             # [P, CH]
        wg = s["w"] * gsplat
        incl_here = _dot(wg, u_incl) + prefix_wg           # global inclusive
        suffix = total_wg - incl_here                      # S_i [P, CH]

        da = jnp.where(
            s["contrib"],
            s["t_before"] * gsplat - (suffix + glogtf) / (1.0 - s["a"]),
            0.0)

        open_gate = s["active"] & (s["alpha_un"] < ALPHA_MAX)
        da_open = jnp.where(open_gate, da, 0.0)
        dpower = da_open * s["alpha_un"]                   # dα/dpower = op·g
        dop = jnp.sum(da_open * s["g"], axis=0, keepdims=True)   # [1, CH]

        dcoeff = _dot_tn(mono_t, dpower)                   # [6, CH]
        xm, ym = s["xm"], s["ym"]
        ca, cb, cc = s["ca"], s["cb"], s["cc"]
        d1, dpx, dpy = dcoeff[0:1, :], dcoeff[1:2, :], dcoeff[2:3, :]
        dpx2, dpxpy, dpy2 = dcoeff[3:4, :], dcoeff[4:5, :], dcoeff[5:6, :]
        dxm = d1 * (-ca * xm - cb * ym) + dpx * ca + dpy * cb
        dym = d1 * (-cc * ym - cb * xm) + dpy * cc + dpx * cb
        dca = d1 * (-0.5 * xm * xm) + dpx * xm - 0.5 * dpx2
        dcb = d1 * (-xm * ym) + dpx * ym + dpy * xm - dpxpy
        dcc = d1 * (-0.5 * ym * ym) + dpy * ym - 0.5 * dpy2

        drgb = _dot_nt(gcolor, jnp.transpose(s["w"]))      # [3, CH]
        dfeat = _dot_nt(glang, jnp.transpose(s["w"]))      # [F, CH]
        dattrs_ref[:, sl] = jnp.concatenate(
            [dxm, dym, dca, dcb, dcc, dop, drgb, dfeat], axis=0)

        prefix_wg = prefix_wg + jnp.sum(wg, axis=1, keepdims=True)
        return (s["new_log_t_raw"], s["new_fail_any"], prefix_wg)

    def pass2_guarded(c, carry):
        all_latched = jnp.min(carry[1]) > 0.5
        return jax.lax.cond((c * ch < count) & jnp.logical_not(all_latched),
                            lambda x: pass2(c, x), lambda x: x, carry)

    init2 = (jnp.zeros((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32),
             jnp.zeros((p, 1), jnp.float32))
    jax.lax.fori_loop(0, n_chunks, pass2_guarded, init2)


def _specs(c_rows, k):
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def bs_mid(a, b):
        """Block over the middle (tile) axis: [A, T, B] → per-tile [A, B]."""
        return pl.BlockSpec((a, None, b), lambda t: (0, t, 0),
                            memory_space=pltpu.VMEM)

    def bs_lead(shape):
        """Block over the leading (tile) axis: [T, ...] → per-tile [...]."""
        return pl.BlockSpec((None,) + shape,
                            lambda t: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    ins = [smem, smem,                       # counts [T,1], origins [T,2]
           bs_lead((c_rows, k)),             # attrs [T, C, K] → [C, K]
           bs_lead((1, k))]                  # livet [T, 1, K] → [1, K]
    return ins, bs_mid, bs_lead


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def blend_tiles_pallas(counts, origins, attrs, livet, n_feat, cfg):
    """Differentiable per-tile blend.

    Args: counts [T,1] int32 (early-exit bound), origins [T,2] f32 tile pixel
      origins, attrs [T,C,K] f32 packed per-splat attributes (rows: xy 2,
      conic 3, opacity 1, rgb 3, features n_feat), livet [T,1,K] f32 0/1;
      n_feat: static feature row count; cfg: static (tile, chunk, interpret).
    Returns (color [T,3,P], lang [T,F,P], log_t_final [T,1,P]); the caller
    applies exp() and the background composite.
    """
    out, _ = _blend_fwd(counts, origins, attrs, livet, n_feat, cfg)
    return out


def _check_cfg(k, cfg):
    tile, chunk, interpret = cfg
    assert k % chunk == 0, "capacity must be a multiple of chunk"
    if not interpret:
        assert chunk % 128 == 0, (
            f"on TPU the chunk ({chunk}) must be lane-aligned (multiple of 128)")


def _blend_fwd(counts, origins, attrs, livet, n_feat, cfg):
    tile, chunk, interpret = cfg
    t, c_rows, k = attrs.shape
    assert c_rows == FEAT0 + n_feat, (c_rows, n_feat)
    p = tile * tile
    _check_cfg(k, cfg)
    ins, bs_mid, bs_lead = _specs(c_rows, k)
    kernel = functools.partial(
        _fwd_kernel, tile=tile, ch=chunk, n_chunks=k // chunk, n_feat=n_feat)
    out = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=ins,
        out_specs=[bs_lead((3, p)), bs_lead((n_feat, p)), bs_lead((1, p))],
        out_shape=[jax.ShapeDtypeStruct((t, 3, p), jnp.float32),
                   jax.ShapeDtypeStruct((t, n_feat, p), jnp.float32),
                   jax.ShapeDtypeStruct((t, 1, p), jnp.float32)],
        interpret=interpret,
    )(counts, origins, attrs, livet)
    return tuple(out), (counts, origins, attrs, livet)


def _blend_bwd(n_feat, cfg, residuals, grads):
    counts, origins, attrs, livet = residuals
    gcolor, glang, glogtf = grads
    tile, chunk, interpret = cfg
    t, c_rows, k = attrs.shape
    p = tile * tile
    ins, bs_mid, bs_lead = _specs(c_rows, k)
    ins = ins + [bs_lead((3, p)), bs_lead((n_feat, p)), bs_lead((1, p))]
    kernel = functools.partial(
        _bwd_kernel, tile=tile, ch=chunk, n_chunks=k // chunk, n_feat=n_feat)
    dattrs = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=ins,
        out_specs=bs_lead((c_rows, k)),
        out_shape=jax.ShapeDtypeStruct((t, c_rows, k), jnp.float32),
        interpret=interpret,
    )(counts, origins, attrs, livet, gcolor, glang, glogtf)
    dcounts = np.zeros(counts.shape, dtype=jax.dtypes.float0)
    return (dcounts, jnp.zeros_like(origins), dattrs, jnp.zeros_like(livet))


blend_tiles_pallas.defvjp(_blend_fwd, _blend_bwd)


# --------------------------------------------------------------- fast gather
@jax.custom_vjp
def gather_splats(table, gidx):
    """table [C, N] → [C, T, K] via gidx [T, K].

    One fused gather for all packed attributes; the custom backward is the
    deterministic replacement for CUDA's atomicAdd accumulation
    (backward.cu:398-593): one scatter-add in ROW layout.

    Perf notes from on-chip xplane traces (TPU v5e, D2 = T·K = 524k,
    N = 65k, C = 12): the scatter-add measures ~7 ms/step and is the single
    largest op in the render fwd+bwd. Alternatives MEASURED AND REJECTED:
      * gather-based segment sum (argsort ids, per-gaussian [C,N,S] gather):
        jnp.searchsorted lowers to a 17 ms while-loop and 1M-row gathers cost
        ~12 ms — 2× slower overall;
      * axis-1 scatter into [C, N]: same cost (layout did not matter);
      * isolated-microbenchmark numbers for this scatter are misleadingly
        fast on first compile — always re-measure in the full graph.
    Dead slots (slice padding) carry exactly-zero cotangents because the
    kernel masks by livet, so scattering them is harmless.
    """
    return jnp.take(table, gidx, axis=1)


def _gather_fwd(table, gidx):
    # `table` rides in the residuals only for its shape/dtype (XLA keeps it
    # alive for other consumers anyway — no extra memory)
    return jnp.take(table, gidx, axis=1), (table, gidx)


def _gather_bwd(res, g):
    table, gidx = res
    c, n = table.shape
    g_rows = jax.lax.optimization_barrier(g.reshape(c, -1).T)   # [D2, C]
    dtable = jnp.zeros((n, c), table.dtype).at[gidx.reshape(-1)].add(g_rows).T
    dgidx = np.zeros(gidx.shape, dtype=jax.dtypes.float0)
    return dtable, dgidx


gather_splats.defvjp(_gather_fwd, _gather_bwd)
