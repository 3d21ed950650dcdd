"""Reference (oracle) Gaussian-splat rasterizer in pure jax.numpy.

This is SURVEY.md §7 stage 2: a slow, obviously-correct implementation used as the
correctness oracle for the production tile rasterizer (ops/rasterizer.py) and as a
CPU fallback. It evaluates every Gaussian at every pixel — O(N·H·W) memory — so use
it only on small problems (tests) or with plenty of HBM.

Semantics replicate the reference CUDA `renderCUDA` loop (forward.cu:262-398):
  * front-to-back order by view-space depth,
  * per-splat skip rules: power > 0, alpha < 1/255,
  * alpha = min(0.99, opacity * exp(power)),
  * termination latch when T·(1-alpha) < 1e-4 (the triggering splat does NOT
    contribute and T freezes),
  * a splat is only evaluated at pixels whose tile lies in its binned tile rect
    (the CUDA kernel never sees other tiles' pixels),
  * out_color = C + final_T * bg;  the embedding channels get no background
    (forward.cu:388-394).

Gradients come from jax autodiff through this exact forward — the masks (skips,
termination, SH clamp) gate gradients identically to the reference's hand-written
backward (backward.cu:398-593).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from manigaussian_tpu.ops import gaussian_math as gm

ALPHA_MAX = 0.99          # forward.cu:353
ALPHA_MIN = 1.0 / 255.0   # forward.cu:354
T_EPS = 1e-4              # forward.cu:357


def effective_alpha(power: jnp.ndarray, opacity: jnp.ndarray,
                    extra_mask: jnp.ndarray) -> jnp.ndarray:
    """CUDA per-pixel alpha with all skip rules folded in as alpha = 0."""
    power_safe = jnp.minimum(power, 0.0)  # power > 0 is skipped; avoid exp overflow
    alpha = jnp.minimum(ALPHA_MAX, opacity * jnp.exp(power_safe))
    active = (power <= 0.0) & (alpha >= ALPHA_MIN) & extra_mask
    return jnp.where(active, alpha, 0.0)


def blend_weights(alphas: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Front-to-back alpha-blend weights with the CUDA termination latch.

    alphas: [..., K] effective alphas in depth order along the last axis.
    Returns (weights [..., K], final_T [...]):
      weights_i = alpha_i * T_i for contributing splats, 0 otherwise;
      final_T = transmittance after the loop (used for the background term).
    """
    log1m = jnp.log1p(-alphas)
    csum_incl = jnp.cumsum(log1m, axis=-1)
    t_before = jnp.exp(csum_incl - log1m)          # exclusive prefix product
    test_t = t_before * (1.0 - alphas)
    fail = test_t < T_EPS
    fail_i = fail.astype(jnp.int32)
    terminated_before = (jnp.cumsum(fail_i, axis=-1) - fail_i) > 0
    contrib = jnp.logical_not(terminated_before) & jnp.logical_not(fail)
    weights = jnp.where(contrib, alphas * t_before, 0.0)
    final_t = jnp.exp(jnp.sum(jnp.where(contrib, log1m, 0.0), axis=-1))
    return weights, final_t


class RenderOutput(NamedTuple):
    color: jnp.ndarray          # [H, W, 3]
    language_feature: jnp.ndarray  # [H, W, F] (zeros if not requested)
    radii: jnp.ndarray          # [N] int32
    final_t: jnp.ndarray        # [H, W]


def rasterize_reference(means3d: jnp.ndarray,
                        opacities: jnp.ndarray,
                        camera,
                        width: int,
                        height: int,
                        bg_color,
                        scales: jnp.ndarray | None = None,
                        rotations: jnp.ndarray | None = None,
                        cov3d_precomp: jnp.ndarray | None = None,
                        shs: jnp.ndarray | None = None,
                        colors_precomp: jnp.ndarray | None = None,
                        language_features: jnp.ndarray | None = None,
                        sh_degree: int = 1,
                        scale_modifier: float = 1.0,
                        tile: int = 16) -> RenderOutput:
    """Render one view. See module docstring for semantics."""
    N = means3d.shape[0]
    pre = gm.preprocess(means3d, opacities, camera, width, height, tile,
                        scales=scales, rotations=rotations,
                        cov3d_precomp=cov3d_precomp, shs=shs,
                        colors_precomp=colors_precomp, sh_degree=sh_degree,
                        scale_modifier=scale_modifier)

    # Depth-sorted front-to-back order (invalid gaussians pushed to the back).
    sort_depth = jnp.where(pre.valid, pre.depths, jnp.inf)
    order = jnp.argsort(sort_depth)
    xy = pre.means2d[order]
    conic = pre.conic[order]
    opac = pre.opacity[order]
    rgb = pre.rgb[order]
    rect_min = pre.rect_min[order]
    rect_max = pre.rect_max[order]
    valid = pre.valid[order]

    # Pixel grid (pixel centers at integer coordinates, like pixf in renderCUDA).
    py = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    pix = jnp.stack([px, py], axis=-1).reshape(-1, 2)            # [P, 2]
    tile_xy = jnp.stack([(px // tile).astype(jnp.int32),
                         (py // tile).astype(jnp.int32)], axis=-1).reshape(-1, 2)

    d = xy[None, :, :] - pix[:, None, :]                          # [P, N, 2]
    power = (-0.5 * (conic[None, :, 0] * d[..., 0] ** 2
                     + conic[None, :, 2] * d[..., 1] ** 2)
             - conic[None, :, 1] * d[..., 0] * d[..., 1])         # [P, N]

    # CUDA only rasterizes a splat on tiles inside its binned rect.
    in_rect = ((tile_xy[:, None, 0] >= rect_min[None, :, 0])
               & (tile_xy[:, None, 0] < rect_max[None, :, 0])
               & (tile_xy[:, None, 1] >= rect_min[None, :, 1])
               & (tile_xy[:, None, 1] < rect_max[None, :, 1]))
    mask = in_rect & valid[None, :]

    alphas = effective_alpha(power, opac[None, :], mask)          # [P, N]
    weights, final_t = blend_weights(alphas)                      # [P, N], [P]

    color = jnp.matmul(weights, rgb,
                       precision=jax.lax.Precision.HIGHEST)        # [P, 3]
    bg = jnp.asarray(bg_color, dtype=color.dtype)
    color = color + final_t[:, None] * bg[None, :]

    if language_features is not None:
        lang = jnp.matmul(weights, language_features[order],
                          precision=jax.lax.Precision.HIGHEST)     # [P, F]
    else:
        lang = jnp.zeros((pix.shape[0], 3), dtype=color.dtype)

    return RenderOutput(
        color=color.reshape(height, width, -1),
        language_feature=lang.reshape(height, width, -1),
        radii=pre.radii,
        final_t=final_t.reshape(height, width),
    )
