"""Multi-chip Gaussian-splat rendering: image tiles sharded over a mesh axis.

SURVEY.md §5's 'long-context analog': the scaling axis of this workload is
Gaussians × pixels. Design (shard_map over the `tile` mesh axis):

  * per-Gaussian preprocess is computed on every device (N-sized, cheap —
    replicating it avoids an all_gather of culled splat state);
  * each device OWNS a contiguous range of image tiles: it bins only the
    (gaussian, tile) duplicates that land in its range — so the depth sort is
    over a D× smaller duplicate list per device (the cross-chip analog of
    cub radix partitioning, rasterizer_impl.cu:303-311);
  * each device blends its tiles with the Pallas kernel, then the image rows
    are reassembled with jax.lax.all_gather over ICI;
  * backward: jax reverses the shard_map automatically — the all_gather
    transposes to a psum_scatter of image grads, and per-Gaussian grads are
    psum'd across devices (the deterministic replacement for CUDA's global
    atomicAdd accumulation).

Requires num_tiles % mesh_axis_size == 0 (e.g. 64 tiles over 2/4/8 devices).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from manigaussian_tpu.ops import gaussian_math as gm
from manigaussian_tpu.ops.rasterizer import (RasterizeConfig, RenderOutput,
                                             _blend_tiles,
                                             _blend_tiles_pallas_path,
                                             _tile_gather)


def _build_keys_range(pre: gm.ProjectedGaussians, cfg: RasterizeConfig,
                      tile_lo: jnp.ndarray, n_local_tiles: int):
    """duplicateWithKeys restricted to tiles [tile_lo, tile_lo + n_local)."""
    n = pre.depths.shape[0]
    tiles_x = (cfg.width + cfg.tile - 1) // cfg.tile
    r_cap = cfg.max_tiles_per_gaussian

    sort_depth = jnp.where(pre.valid, pre.depths, jnp.inf)
    order = jnp.argsort(sort_depth)
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1))

    rect_w = pre.rect_max[:, 0] - pre.rect_min[:, 0]
    slot = jax.lax.broadcasted_iota(jnp.int32, (n, r_cap), 1)
    rect_w_safe = jnp.maximum(rect_w, 1)[:, None]
    dx = slot % rect_w_safe
    dy = slot // rect_w_safe
    tile_x = pre.rect_min[:, 0:1] + dx
    tile_y = pre.rect_min[:, 1:2] + dy
    in_rect = slot < pre.tiles_touched[:, None]
    tile_id = tile_y * tiles_x + tile_x
    local_id = tile_id - tile_lo
    dup_valid = (in_rect & pre.valid[:, None]
                 & (local_id >= 0) & (local_id < n_local_tiles))
    local_id = jnp.where(dup_valid, local_id, n_local_tiles)

    gidx = jax.lax.broadcasted_iota(jnp.int32, (n, r_cap), 0)
    rank_b = jnp.broadcast_to(ranks[:, None], (n, r_cap))
    # fused single-key sort + (keys, rank_bits) contract — see
    # ops/rasterizer._build_keys
    rank_bits = max(1, (n - 1).bit_length())
    if ((n_local_tiles << rank_bits) | (n - 1)) < 2 ** 31:
        key = (local_id << rank_bits) | rank_b
        sorted_key, sorted_gidx = jax.lax.sort(
            (key.reshape(-1), gidx.reshape(-1)), num_keys=1, is_stable=False)
        return (sorted_key, rank_bits), sorted_gidx
    st, _r, sorted_gidx = jax.lax.sort(
        (local_id.reshape(-1), rank_b.reshape(-1), gidx.reshape(-1)),
        num_keys=2, is_stable=True)
    return (st, 0), sorted_gidx


def rasterize_sharded(mesh: Mesh,
                      means3d: jnp.ndarray,
                      opacities: jnp.ndarray,
                      camera,
                      cfg: RasterizeConfig,
                      bg_color,
                      scales=None, rotations=None, shs=None,
                      language_features=None,
                      axis: str = "tile") -> RenderOutput:
    """Render one view with tiles sharded over `axis` of `mesh`. Differentiable."""
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
        sorted_tile, sorted_gidx = _build_keys_range(pre, cfg, tile_lo, n_local)
        gidx, in_list, _cnt, _ov = _tile_gather(
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
        return color, lang_img, final_t

    fn = shard_map(
        local_render_shifted, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    color, lang_img, final_t = fn(means3d, opacities, scales, rotations, shs,
                                  lang)
    radii = gm.preprocess(means3d, opacities, camera, cfg.width, cfg.height,
                          cfg.tile, scales=scales, rotations=rotations,
                          shs=shs, sh_degree=cfg.sh_degree).radii
    return RenderOutput(color=color, language_feature=lang_img, radii=radii,
                        final_t=final_t)
