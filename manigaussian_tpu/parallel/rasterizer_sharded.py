"""Multi-chip Gaussian-splat rendering: image tiles sharded over a mesh axis.

SURVEY.md §5's 'long-context analog': the scaling axis of this workload is
Gaussians × pixels. Design (shard_map over the `tile` mesh axis):

  * per-Gaussian preprocess is computed on every device (N-sized, cheap —
    replicating it avoids an all_gather of culled splat state);
  * each device OWNS a contiguous range of image tiles: it bins only the
    (gaussian, tile) duplicates that land in its range — so the depth sort is
    over a D× smaller duplicate list per device (the cross-chip analog of
    cub radix partitioning, rasterizer_impl.cu:303-311). Binning/sorting share
    ops/rasterizer._build_keys (tile_range mode), so two-level duplication and
    the fused single-key sort apply on this path too;
  * each device blends its tiles with the Pallas kernel, then the image rows
    are reassembled with jax.lax.all_gather over ICI;
  * backward: jax reverses the shard_map automatically — the all_gather
    transposes to a psum_scatter of image grads, and per-Gaussian grads are
    psum'd across devices (the deterministic replacement for CUDA's global
    atomicAdd accumulation);
  * capacity-overflow counters are psum'd (splats, per-device tile window) or
    taken replicated (rect slots, identical on every device) so truncation is
    visible in train metrics on this path too.

Requires num_tiles % mesh_axis_size == 0 (e.g. 64 tiles over 2/4/8 devices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from manigaussian_tpu.ops import gaussian_math as gm
from manigaussian_tpu.ops.rasterizer import (RasterizeConfig, RasterizeExtras,
                                             RenderOutput, _blend_tiles,
                                             _blend_tiles_pallas_path,
                                             _build_keys, _tile_gather,
                                             _untile)


def rasterize_sharded(mesh: Mesh,
                      means3d: jnp.ndarray,
                      opacities: jnp.ndarray,
                      camera,
                      cfg: RasterizeConfig,
                      bg_color,
                      scales=None, rotations=None, shs=None,
                      language_features=None,
                      axis: str = "tile"
                      ) -> tuple[RenderOutput, RasterizeExtras]:
    """Render one view with tiles sharded over `axis` of `mesh`. Differentiable.

    Same contract as ops/rasterizer.rasterize: returns (RenderOutput,
    RasterizeExtras) with GLOBAL overflow counters and per-tile counts.
    """
    tiles_x = (cfg.width + cfg.tile - 1) // cfg.tile
    tiles_y = (cfg.height + cfg.tile - 1) // cfg.tile
    num_tiles = tiles_x * tiles_y
    n_dev = mesh.shape[axis]
    assert num_tiles % n_dev == 0, (num_tiles, n_dev)
    n_local = num_tiles // n_dev

    lang = (language_features if language_features is not None
            else jnp.zeros((means3d.shape[0], 3), jnp.float32))
    bg = jnp.asarray(bg_color, jnp.float32)

    def local_render(means3d, opacities, scales, rotations, shs, lang):
        # Each device blends its contiguous tile window [tile_lo, tile_lo +
        # n_local) into PATCHES ([n_local, tile², C]); the blend kernels take
        # the traced tile_lo and derive global pixel coordinates themselves,
        # so ANY divisor of num_tiles works — the axis is no longer capped at
        # tiles_y devices (round-3 whole-row constraint). The image is
        # reassembled from the all_gathered patch list.
        didx = jax.lax.axis_index(axis)
        tile_lo = didx * n_local
        pre = gm.preprocess(means3d, opacities, camera, cfg.width, cfg.height,
                            cfg.tile, scales=scales, rotations=rotations,
                            shs=shs, sh_degree=cfg.sh_degree)
        sorted_tile, sorted_gidx, overflow_g, _ = _build_keys(
            pre, cfg, tile_range=(tile_lo, n_local))
        gidx, in_list, counts, overflow_s = _tile_gather(
            sorted_tile, sorted_gidx, n_local, cfg.tile_capacity)
        blend = (_blend_tiles_pallas_path if cfg.backend == "pallas"
                 else _blend_tiles)
        color_p, lang_p, final_t_p = blend(pre, lang, gidx, in_list, cfg, bg,
                                           tile_lo=tile_lo)
        # gather patches along the tile axis, then untile to images
        color_p = jax.lax.all_gather(color_p, axis, tiled=True)
        lang_p = jax.lax.all_gather(lang_p, axis, tiled=True)
        final_t_p = jax.lax.all_gather(final_t_p, axis, tiled=True)
        counts = jax.lax.all_gather(counts, axis, tiled=True)
        color = _untile(color_p, cfg)
        lang_img = _untile(lang_p, cfg)
        final_t = _untile(final_t_p[..., None], cfg)[..., 0]
        # tile_capacity overflow is a per-device count over its tile window;
        # rect-slot overflow is computed from replicated pre — identical
        # everywhere, no reduction needed.
        overflow_s = jax.lax.psum(overflow_s, axis)
        return color, lang_img, final_t, pre.radii, counts, overflow_s, \
            overflow_g

    # Manual ONLY over the tile axis (axis_names): on a 2D ('data', 'tile')
    # mesh the batch axis stays auto-partitioned over 'data' by the outer jit,
    # composing data-parallel training with rasterizer-internal tile sharding
    # (the configuration a real multi-chip pod runs; reference has only flat
    # DP, train.py:94).
    fn = shard_map(
        local_render, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P(), P(), P()),
        axis_names={axis}, check_vma=False)
    color, lang_img, final_t, radii, counts, overflow_s, overflow_g = fn(
        means3d, opacities, scales, rotations, shs, lang)
    out = RenderOutput(color=color, language_feature=lang_img, radii=radii,
                       final_t=final_t)
    extras = RasterizeExtras(overflow_splats=overflow_s,
                             overflow_gaussians=overflow_g,
                             tile_counts=counts)
    return out, extras
