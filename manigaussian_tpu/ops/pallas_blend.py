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
  * backward recomputes the forward per chunk (flash-attention-style — no big
    residuals) and uses the suffix-sum identity
        dL/da_i = T_i·g_i − (S_i + dL/dlogT_final)/(1−a_i),
        S_i = Σ_{j>i} w_j·g_j
    (the associative form of backward.cu's `accum_rec` back-to-front replay),
    then reduces analytic d(power)/d{mean2d, conic, opacity} on-chip.

Memory layout (Mosaic constraint: dynamically-sliced axes must be lane-aligned):
every per-splat ref is 2-D `[channels, K]` — the splat axis K sits on lanes and
chunk slices are multiples of 128 on real TPUs (any chunk in interpret mode);
per-splat scalars broadcast as [1, CH] rows against [P, CH] pixel matrices.

Gradient semantics match the pure-jax oracle (ops/rasterizer_ref.py) — i.e.
jnp.minimum/where-gated autodiff: clamped alphas (0.99), skipped splats
(power>0, alpha<1/255) and latched pixels get zero gradient. (The CUDA backward
leaves the 0.99 clamp ungated, backward.cu:478-490 — a semantics bug we do not
replicate; alphas at the clamp are saturated anyway.)

All tensors fp32; matmul accumulation fp32. Splat centers arrive TILE-LOCAL
(xy − tile_origin) so the expanded quadratic form stays fp32-accurate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def _pixel_monomials_t(tile: int):
    """[P, 6] monomial basis (1, px, py, px², px·py, py²), TILE-LOCAL pixels."""
    p = tile * tile
    local = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (local % tile).astype(jnp.float32)
    py = (local // tile).astype(jnp.float32)
    one = jnp.ones_like(px)
    return jnp.concatenate([one, px, py, px * px, px * py, py * py], axis=1)


def _splat_coeffs(xyt, conict):
    """[6, CH] power coefficients from row-vector splat attrs ([2,CH], [3,CH]).

    power = -0.5a(xm-px)² - 0.5c(ym-py)² - b(xm-px)(ym-py), conic=(a, b, c).
    """
    xm, ym = xyt[0:1, :], xyt[1:2, :]
    a, b, c = conict[0:1, :], conict[1:2, :], conict[2:3, :]
    return jnp.concatenate([
        -0.5 * a * xm * xm - 0.5 * c * ym * ym - b * xm * ym,   # 1
        a * xm + b * ym,                                        # px
        c * ym + b * xm,                                        # py
        -0.5 * a,                                               # px²
        -b,                                                     # px·py
        -0.5 * c,                                               # py²
    ], axis=0)


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


def _chunk_state(xyt, conict, opt, livet, mono_t, log_t_raw, fail_any,
                 u_incl, u_strict):
    """Shared fwd math for one chunk. Pixel-major: [P, CH] matrices."""
    coeff = _splat_coeffs(xyt, conict)                    # [6, CH]
    power = _dot(mono_t, coeff)                           # [P, CH]
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha_un = opt * g                                    # [1,CH]·[P,CH]
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
    return dict(g=g, alpha_un=alpha_un, a=a, active=active, log1m=log1m,
                t_before=t_before, contrib=contrib, w=w,
                new_log_t_raw=new_log_t_raw, new_fail_any=new_fail_any)


def _fwd_kernel(count_ref, xyt_ref, conict_ref, opt_ref, rgbt_ref, langt_ref,
                livet_ref, color_ref, lang_ref, logtf_ref,
                *, tile, ch, n_chunks, n_color, n_feat):
    p = tile * tile
    mono_t = _pixel_monomials_t(tile)
    u_incl = _tri_upper(ch, strict=False)
    u_strict = _tri_upper(ch, strict=True)
    count = count_ref[pl.program_id(0), 0]

    def body(c, carry):
        # EARLY EXIT (the analog of renderCUDA's done/__syncthreads_count
        # break, forward.cu:277-285): skip chunks past the tile's splat count
        # or once every pixel has latched T<eps. Skipped chunks are exact
        # no-ops (live=0 ⇒ a=0), so this never changes the result.
        log_t_raw, log_t_final, fail_any, color_acc, lang_acc = carry
        all_latched = jnp.min(fail_any) > 0.5

        def run(carry):
            log_t_raw, log_t_final, fail_any, color_acc, lang_acc = carry
            sl = pl.ds(c * ch, ch)
            s = _chunk_state(xyt_ref[:, sl], conict_ref[:, sl], opt_ref[:, sl],
                             livet_ref[:, sl], mono_t, log_t_raw, fail_any,
                             u_incl, u_strict)
            color_acc = color_acc + _dot_nt(rgbt_ref[:, sl], s["w"])   # [3, P]
            lang_acc = lang_acc + _dot_nt(langt_ref[:, sl], s["w"])    # [F, P]
            log_t_final = log_t_final + jnp.sum(
                jnp.where(s["contrib"], s["log1m"], 0.0), axis=1, keepdims=True)
            return (s["new_log_t_raw"], log_t_final, s["new_fail_any"],
                    color_acc, lang_acc)

        return jax.lax.cond((c * ch < count) & jnp.logical_not(all_latched),
                            run, lambda x: x, carry)

    init = (jnp.zeros((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32),
            jnp.zeros((p, 1), jnp.float32),
            jnp.zeros((n_color, p), jnp.float32),
            jnp.zeros((n_feat, p), jnp.float32))
    _, log_t_final, _, color_acc, lang_acc = jax.lax.fori_loop(
        0, n_chunks, body, init)
    color_ref[:, :] = color_acc
    lang_ref[:, :] = lang_acc
    logtf_ref[:, :] = jnp.transpose(log_t_final)           # [1, P]


def _bwd_kernel(count_ref, xyt_ref, conict_ref, opt_ref, rgbt_ref, langt_ref,
                livet_ref, gcolor_ref, glang_ref, glogtf_ref,
                dxyt_ref, dconict_ref, dopt_ref, drgbt_ref, dlangt_ref,
                *, tile, ch, n_chunks, n_color, n_feat):
    p = tile * tile
    mono_t = _pixel_monomials_t(tile)
    u_incl = _tri_upper(ch, strict=False)
    u_strict = _tri_upper(ch, strict=True)
    count = count_ref[pl.program_id(0), 0]
    # grad outputs are written only for chunks the guarded loops visit — zero
    # the rest up front (skipped chunks have zero grads by construction)
    dxyt_ref[:, :] = jnp.zeros_like(dxyt_ref)
    dconict_ref[:, :] = jnp.zeros_like(dconict_ref)
    dopt_ref[:, :] = jnp.zeros_like(dopt_ref)
    drgbt_ref[:, :] = jnp.zeros_like(drgbt_ref)
    dlangt_ref[:, :] = jnp.zeros_like(dlangt_ref)
    gcolor = gcolor_ref[:, :]                              # [3, P]
    glang = glang_ref[:, :]                                # [F, P]
    glogtf = jnp.transpose(glogtf_ref[:, :])               # [P, 1]

    # ---- pass 1 (forward replay): total Σ w·g per pixel
    def pass1(c, carry):
        def run(carry):
            log_t_raw, fail_any, total_wg = carry
            sl = pl.ds(c * ch, ch)
            s = _chunk_state(xyt_ref[:, sl], conict_ref[:, sl], opt_ref[:, sl],
                             livet_ref[:, sl], mono_t, log_t_raw, fail_any,
                             u_incl, u_strict)
            gsplat = _dot_tn(gcolor, rgbt_ref[:, sl]) \
                + _dot_tn(glang, langt_ref[:, sl])         # [P, CH]
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
        xyt = xyt_ref[:, sl]
        conict = conict_ref[:, sl]
        s = _chunk_state(xyt, conict, opt_ref[:, sl], livet_ref[:, sl],
                         mono_t, log_t_raw, fail_any, u_incl, u_strict)
        gsplat = _dot_tn(gcolor, rgbt_ref[:, sl]) \
            + _dot_tn(glang, langt_ref[:, sl])             # [P, CH]
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
        dopt_ref[:, sl] = jnp.sum(da_open * s["g"], axis=0, keepdims=True)

        dcoeff = _dot_tn(mono_t, dpower)                   # [6, CH]
        xm, ym = xyt[0:1, :], xyt[1:2, :]
        ca, cb, cc = conict[0:1, :], conict[1:2, :], conict[2:3, :]
        d1, dpx, dpy = dcoeff[0:1, :], dcoeff[1:2, :], dcoeff[2:3, :]
        dpx2, dpxpy, dpy2 = dcoeff[3:4, :], dcoeff[4:5, :], dcoeff[5:6, :]
        dxm = d1 * (-ca * xm - cb * ym) + dpx * ca + dpy * cb
        dym = d1 * (-cc * ym - cb * xm) + dpy * cc + dpx * cb
        dca = d1 * (-0.5 * xm * xm) + dpx * xm - 0.5 * dpx2
        dcb = d1 * (-xm * ym) + dpx * ym + dpy * xm - dpxpy
        dcc = d1 * (-0.5 * ym * ym) + dpy * ym - 0.5 * dpy2
        dxyt_ref[:, sl] = jnp.concatenate([dxm, dym], axis=0)
        dconict_ref[:, sl] = jnp.concatenate([dca, dcb, dcc], axis=0)

        drgbt_ref[:, sl] = _dot_nt(gcolor, jnp.transpose(s["w"]))  # [3, CH]
        dlangt_ref[:, sl] = _dot_nt(glang, jnp.transpose(s["w"]))

        prefix_wg = prefix_wg + jnp.sum(wg, axis=1, keepdims=True)
        return (s["new_log_t_raw"], s["new_fail_any"], prefix_wg)

    def pass2_guarded(c, carry):
        all_latched = jnp.min(carry[1]) > 0.5
        return jax.lax.cond((c * ch < count) & jnp.logical_not(all_latched),
                            lambda x: pass2(c, x), lambda x: x, carry)

    init2 = (jnp.zeros((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32),
             jnp.zeros((p, 1), jnp.float32))
    jax.lax.fori_loop(0, n_chunks, pass2_guarded, init2)


def _specs(k, n_color, n_feat):
    def bs(shape):
        return pl.BlockSpec((None,) + shape,
                            lambda t: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)
    # whole counts array in SMEM (Mosaic disallows tiny blocked SMEM slices);
    # kernels index their tile via pl.program_id(0)
    counts = pl.BlockSpec(memory_space=pltpu.SMEM)
    ins = [counts,
           bs((2, k)), bs((3, k)), bs((1, k)),              # xyt conict opt
           bs((n_color, k)), bs((n_feat, k)), bs((1, k))]   # rgbt langt livet
    return ins, bs


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def blend_tiles_pallas(counts, xyt, conict, opt, rgbt, langt, livet, cfg):
    """Differentiable per-tile blend.

    Args: counts [T, 1] int32 per-tile splat counts (early-exit bound;
      NON-differentiable leading arg), then fp32 with the splat axis LAST:
      xyt [T,2,K] TILE-LOCAL centers, conict [T,3,K], opt [T,1,K],
      rgbt [T,3,K], langt [T,F,K], livet [T,1,K];
      cfg: static (tile, chunk, interpret).
    Returns (color [T,3,P], lang [T,F,P], log_t_final [T,1,P]); the caller
    applies exp() and the background composite.
    """
    out, _ = _blend_fwd(counts, xyt, conict, opt, rgbt, langt, livet, cfg)
    return out


def _check_cfg(k, cfg):
    tile, chunk, interpret = cfg
    assert k % chunk == 0, "capacity must be a multiple of chunk"
    if not interpret:
        assert chunk % 128 == 0, (
            f"on TPU the chunk ({chunk}) must be lane-aligned (multiple of 128)")


def _blend_fwd(counts, xyt, conict, opt, rgbt, langt, livet, cfg):
    tile, chunk, interpret = cfg
    t, _, k = xyt.shape
    n_color, n_feat = rgbt.shape[1], langt.shape[1]
    p = tile * tile
    _check_cfg(k, cfg)
    ins, bs = _specs(k, n_color, n_feat)
    kernel = functools.partial(
        _fwd_kernel, tile=tile, ch=chunk, n_chunks=k // chunk,
        n_color=n_color, n_feat=n_feat)
    out = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=ins,
        out_specs=[bs((n_color, p)), bs((n_feat, p)), bs((1, p))],
        out_shape=[jax.ShapeDtypeStruct((t, n_color, p), jnp.float32),
                   jax.ShapeDtypeStruct((t, n_feat, p), jnp.float32),
                   jax.ShapeDtypeStruct((t, 1, p), jnp.float32)],
        interpret=interpret,
    )(counts, xyt, conict, opt, rgbt, langt, livet)
    return tuple(out), (counts, xyt, conict, opt, rgbt, langt, livet)


def _blend_bwd(cfg, residuals, grads):
    counts, xyt, conict, opt, rgbt, langt, livet = residuals
    gcolor, glang, glogtf = grads
    tile, chunk, interpret = cfg
    t, _, k = xyt.shape
    n_color, n_feat = rgbt.shape[1], langt.shape[1]
    p = tile * tile
    ins, bs = _specs(k, n_color, n_feat)
    ins = ins + [bs((n_color, p)), bs((n_feat, p)), bs((1, p))]
    kernel = functools.partial(
        _bwd_kernel, tile=tile, ch=chunk, n_chunks=k // chunk,
        n_color=n_color, n_feat=n_feat)
    dxyt, dconict, dopt, drgbt, dlangt = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=ins,
        out_specs=[bs((2, k)), bs((3, k)), bs((1, k)),
                   bs((n_color, k)), bs((n_feat, k))],
        out_shape=[jax.ShapeDtypeStruct((t, 2, k), jnp.float32),
                   jax.ShapeDtypeStruct((t, 3, k), jnp.float32),
                   jax.ShapeDtypeStruct((t, 1, k), jnp.float32),
                   jax.ShapeDtypeStruct((t, n_color, k), jnp.float32),
                   jax.ShapeDtypeStruct((t, n_feat, k), jnp.float32)],
        interpret=interpret,
    )(counts, xyt, conict, opt, rgbt, langt, livet, gcolor, glang, glogtf)
    import numpy as _np
    dcounts = _np.zeros(counts.shape, dtype=jax.dtypes.float0)  # int arg
    return (dcounts, dxyt, dconict, dopt, drgbt, dlangt,
            jnp.zeros_like(livet))


blend_tiles_pallas.defvjp(_blend_fwd, _blend_bwd)
