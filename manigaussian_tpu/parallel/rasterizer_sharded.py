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
                                             _build_keys, _tile_gather)


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
    assert n_local % tiles_x == 0, (
        "tile rows must not straddle devices: tiles_per_device must be a "
        f"multiple of tiles_x ({tiles_x})")

    lang = (language_features if language_features is not None
            else jnp.zeros((means3d.shape[0], 3), jnp.float32))
    bg = jnp.asarray(bg_color, jnp.float32)

    def local_render_shifted(means3d, opacities, scales, rotations, shs, lang):
        # The blend kernels derive pixel coords from LOCAL tile indices, so a
        # device renders its row slab in a local frame: preprocess in global
        # coords, subtract the slab's row offset from means2d before blending.
        didx = jax.lax.axis_index(axis)
        tile_lo = didx * n_local
        row_off = (tile_lo // tiles_x) * cfg.tile
        pre = gm.preprocess(means3d, opacities, camera, cfg.width, cfg.height,
                            cfg.tile, scales=scales, rotations=rotations,
                            shs=shs, sh_degree=cfg.sh_degree)
        sorted_tile, sorted_gidx, overflow_g, _ = _build_keys(
            pre, cfg, tile_range=(tile_lo, n_local))
        gidx, in_list, counts, overflow_s = _tile_gather(
            sorted_tile, sorted_gidx, n_local, cfg.tile_capacity)
        pre_local = pre._replace(
            means2d=pre.means2d - jnp.array([0.0, 1.0]) * row_off)
        rows_per_dev = cfg.height // n_dev
        local_cfg = cfg._replace(height=rows_per_dev)
        if cfg.backend == "pallas":
            color, lang_img, final_t = _blend_tiles_pallas_path(
                pre_local, lang, gidx, in_list, local_cfg, bg)
        else:
            color, lang_img, final_t = _blend_tiles(
                pre_local, lang, gidx, in_list, local_cfg, bg)
        color = jax.lax.all_gather(color, axis, tiled=True)
        lang_img = jax.lax.all_gather(lang_img, axis, tiled=True)
        final_t = jax.lax.all_gather(final_t, axis, tiled=True)
        counts = jax.lax.all_gather(counts, axis, tiled=True)
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
        local_render_shifted, mesh=mesh,
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
