"""Pallas TPU kernel for the hot 3³ stride-1 SAME-zero-pad 3D convolutions.

Why: the policy net's two 100³ tail convs (`final` 256→128 and up0's
post-resize 128→128, reference `helpers/network_utils.py:248-306` conv stack)
run at ~43% MXU through XLA's generic 3D conv path and their backward is the
single largest step cost (~93 ms of a 259 ms w_geo step, STATUS.md). This
kernel restructures the conv as halo-resident VMEM tiles + 27 accumulating
MXU matmuls, with a custom VJP whose dx is the SAME kernel (flipped/transposed
weights — a conv identity) and whose dW is a second Pallas kernel that
accumulates all 27 weight-gradient matmuls in one pass over the input
(the shift-sum einsum alternative re-reads the 512 MB input 27× and loses,
STATUS.md backlog #1).

Layout: channels-last [D, H, W, C] (XLA TPU native); C is the lane dim, so
Ci/Co ≥ 128 run the MXU full-width. fp32 accumulation regardless of input
dtype. Static shapes only; D % bd == 0 and H % bh == 0 are padded by the
wrapper when needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tiles(d: int, h: int) -> tuple[int, int]:
    """Largest (bd, bh) dividing (d, h) keeping the x halo tile ≲ 2 MB bf16."""
    def divisors(n):
        return [k for k in range(1, n + 1) if n % k == 0]
    best = (1, 1)
    for bd in divisors(d):
        if bd > 4:
            continue
        for bh in divisors(h):
            # tile rows (bd+2)(bh+2): target ~40-60 rows of W·C
            if (bd + 2) * (bh + 2) <= 60 and bd * bh > best[0] * best[1]:
                best = (bd, bh)
    return best


def _roll_rows(v, shift):
    """jnp.roll along axis 0 that lowers on Mosaic (sublane rotate) and falls
    back to jnp.roll under interpret mode / CPU."""
    try:
        return pltpu.roll(v, shift, 0)
    except Exception:  # interpret-mode paths without a roll rule
        return jnp.roll(v, shift, 0)


def _fwd_kernel(xp_hbm, w_ref, o_ref, xbuf, sem, *, bd, bh, wp, ci, co):
    """One output tile [bd, bh, WP, Co].

    Mosaic alignment strategy: the W axis is the sublane (second-minor) dim of
    every memref, so slicing it at the ox ∈ {0,1,2} taps is illegal unless
    8-aligned. Instead the wrapper pads W so WP % 8 == 0, the kernel matmuls
    FULL padded planes (only the untiled D/H dims are ever sliced), and the
    ox shift becomes a row roll of the flattened (bd·bh·WP, Co) accumulators:
        out[r] = Σ_ox F_ox[r + ox]  ⇒  acc = F_0 + roll(F_1,-1) + roll(F_2,-2).
    Rolls are linear, so 27 taps need only 2 rolls. Rows that cross a W-block
    boundary under the roll only ever land in the discarded pad rows
    (x ≥ W+2 is zero; outputs keep x < W)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(i * bd, bd + 2), pl.ds(j * bh, bh + 2)],
        xbuf, sem)
    dma.start()
    dma.wait()
    m = bd * bh * wp
    accs = [jnp.zeros((m, co), jnp.float32) for _ in range(3)]
    for oz in range(3):
        for oy in range(3):
            p = xbuf[oz:oz + bd, oy:oy + bh].reshape(m, ci)
            for ox in range(3):
                o = (oz * 3 + oy) * 3 + ox
                accs[ox] += jnp.dot(p, w_ref[o],
                                    preferred_element_type=jnp.float32)
    acc = accs[0] + _roll_rows(accs[1], -1) + _roll_rows(accs[2], -2)
    o_ref[:] = acc.reshape(bd, bh, wp, co)


def _dw_kernel(xp_hbm, dy_ref, dw_ref, xbuf, sem, *, bd, bh, wp, ci, co):
    """dW[o] += x_plane^T @ rolled dy_tile, accumulated across the grid.

    TPU grid steps run sequentially, so mapping every step to the same output
    block turns the output into a deterministic accumulator (the replacement
    for CUDA's atomicAdd into dL/dW, backward.cu:541-590). Same roll trick as
    _fwd_kernel: Σ_r P[r+ox]·dy[r] = P^T @ roll(dy, +ox); dy's pad rows are
    zero so wrapped rows contribute nothing."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dma = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(i * bd, bd + 2), pl.ds(j * bh, bh + 2)],
        xbuf, sem)
    dma.start()
    dma.wait()
    m = bd * bh * wp
    # Roll in fp32, cast to the MXU dtype AFTER: Mosaic's tpu.dynamic_rotate
    # has no sub-32-bit lowering ("Rotate with non-32-bit data" — the r3
    # HTTP-500 with the diagnostic swallowed by the tunnel). Cast commutes
    # with the roll (elementwise), so results are bit-identical.
    dy0 = dy_ref[:].reshape(m, co)
    dys = [dy0.astype(xbuf.dtype),
           _roll_rows(dy0, 1).astype(xbuf.dtype),
           _roll_rows(dy0, 2).astype(xbuf.dtype)]
    for oz in range(3):
        for oy in range(3):
            p = xbuf[oz:oz + bd, oy:oy + bh].reshape(m, ci)
            for ox in range(3):
                o = (oz * 3 + oy) * 3 + ox
                contrib = jax.lax.dot_general(
                    p, dys[ox], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dw_ref[o] += contrib


def _conv3d_raw(x: jnp.ndarray, w: jnp.ndarray, *, interpret: bool):
    """y[z,y,x,co] = Σ_{o,ci} x[z+oz-1, y+oy-1, x+ox-1, ci] · w[oz,oy,ox,ci,co]
    with zero padding. x: [D, H, W, Ci]; w: [3, 3, 3, Ci, Co]; y fp32."""
    d, h, w_sp, ci = x.shape
    co = w.shape[-1]
    bd, bh = _pick_tiles(d, h)
    wp = -(-(w_sp + 2) // 8) * 8  # sublane-aligned padded W plane
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, wp - w_sp - 1), (0, 0)))
    wm = w.reshape(27, ci, co).astype(x.dtype)
    grid = (d // bd, h // bh)
    kern = functools.partial(_fwd_kernel, bd=bd, bh=bh, wp=wp,
                             ci=ci, co=co)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((27, ci, co), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bd, bh, wp, co), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, h, wp, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bd + 2, bh + 2, wp, ci), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, wm)
    return out[:, :, :w_sp, :]


def _conv3d_dw(x: jnp.ndarray, dy: jnp.ndarray, *, interpret: bool):
    """dW [3,3,3,Ci,Co] for _conv3d_raw, one pass over x."""
    d, h, w_sp, ci = x.shape
    co = dy.shape[-1]
    bd, bh = _pick_tiles(d, h)
    wp = -(-(w_sp + 2) // 8) * 8
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, wp - w_sp - 1), (0, 0)))
    # dy stays fp32 into the kernel: the in-kernel roll needs 32-bit data
    # (Mosaic dynamic_rotate limitation); the kernel downcasts post-roll.
    dyp = jnp.pad(dy.astype(jnp.float32),
                  ((0, 0), (0, 0), (0, wp - w_sp), (0, 0)))
    grid = (d // bd, h // bh)
    kern = functools.partial(_dw_kernel, bd=bd, bh=bh, wp=wp,
                             ci=ci, co=co)
    dw = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bd, bh, wp, co), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((27, ci, co), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((27, ci, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bd + 2, bh + 2, wp, ci), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, dyp)
    return dw.reshape(3, 3, 3, ci, co)


def _should_interpret() -> bool:
    # Mosaic compile only on real TPU; interpret elsewhere (matches
    # ops/rasterizer._blend_tiles_pallas_path's convention).
    default_dev = jax.config.jax_default_device
    if default_dev is not None:
        return getattr(default_dev, "platform", str(default_dev)) != "tpu"
    return jax.default_backend() != "tpu"


@jax.custom_vjp
def conv3d_same(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3³ stride-1 zero-SAME conv, single sample [D, H, W, Ci] → fp32 [D, H, W, Co].

    Equals lax.conv_general_dilated(NDHWC, DHWIO, 'SAME') — pinned in
    tests/test_pallas_conv.py. Differentiable w.r.t. x and w (custom VJP)."""
    return _conv3d_raw(x, w, interpret=_should_interpret())


def _conv3d_same_fwd(x, w):
    return conv3d_same(x, w), (x, w)


def _conv3d_same_bwd(res, g):
    x, w = res
    interpret = _should_interpret()
    g = g.astype(x.dtype)
    # dx = conv(dy, flip(w) with Ci/Co swapped) — the standard conv transpose
    # identity for stride 1; reuses the forward kernel.
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(-1, -2)
    dx = _conv3d_raw(g, w_flip.astype(x.dtype), interpret=interpret)
    dw = _conv3d_dw(x, g, interpret=interpret)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_same.defvjp(_conv3d_same_fwd, _conv3d_same_bwd)


def conv3d_same_batched(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[B, D, H, W, Ci] wrapper — unrolled over B (flagship batch is 1; DP
    shards the batch before this point)."""
    return jnp.stack([conv3d_same(x[b], w) for b in range(x.shape[0])])
