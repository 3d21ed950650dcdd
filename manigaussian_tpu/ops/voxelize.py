"""Point-cloud voxelization: scatter-mean features into a bounded 3D grid.

Parity target: reference `voxel/voxel_grid.py:104-229`
(VoxelGrid._scatter_mean / coords_to_bounding_voxel_grid):
  * grid allocated with +2 cells per side, edges cropped after scatter (out-of-bound
    points clamp into the border cells, which are then discarded),
  * scatter-MEAN of [features, world-xyz, ones] per voxel,
  * output channels = [feat_mean(F), xyz_mean(3), normalized index grid(3),
    occupancy(1)] → F+7 (= 10 for RGB features).

TPU-native redesign: the torch scatter_add over a flat buffer becomes
`jax.ops.segment_sum` (deterministic associative reduction — no atomics), and the
whole thing jit-fuses with the downstream 3D U-Net. Output is channels-LAST
([B, vs, vs, vs, C]) because TPU convolutions want NDHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_DENOMINATOR = 1e-12


def voxelize(coords: jnp.ndarray,
             coord_features: jnp.ndarray | None,
             coord_bounds: jnp.ndarray,
             voxel_size: int = 100) -> jnp.ndarray:
    """Scatter-mean point features into a (voxel_size+2)³ grid, then crop edges.

    Args:
      coords: [B, N, 3] world-space points.
      coord_features: [B, N, F] per-point features (e.g. RGB) or None.
      coord_bounds: [B, 6] or [6] (xmin ymin zmin xmax ymax zmax).
      voxel_size: cells per side of the cropped output grid.

    Returns: [B, vs, vs, vs, F+7] float32.
    """
    b, n, _ = coords.shape
    dims = voxel_size + 2

    bounds = jnp.asarray(coord_bounds, jnp.float32)
    if bounds.ndim == 1:
        bounds = jnp.broadcast_to(bounds[None], (b, 6))
    bb_mins = bounds[:, None, 0:3]
    bb_ranges = bounds[:, None, 3:6] - bb_mins
    res = bb_ranges / (float(voxel_size) + MIN_DENOMINATOR)
    bb_mins_shifted = bb_mins - res  # one-cell border (voxel_grid.py:179)

    floor = jnp.floor((coords - bb_mins_shifted) / (res + MIN_DENOMINATOR))
    idx = jnp.clip(floor.astype(jnp.int32), 0, dims - 1)          # [B, N, 3]

    values = coords if coord_features is None else jnp.concatenate(
        [coord_features, coords], axis=-1)
    ones = jnp.ones((b, n, 1), jnp.float32)
    values = jnp.concatenate([values, ones], axis=-1)             # [B, N, C+1]
    c = values.shape[-1]

    flat_idx = (idx[..., 0] * dims + idx[..., 1]) * dims + idx[..., 2]
    batch_off = jnp.arange(b, dtype=jnp.int32)[:, None] * (dims ** 3)
    seg = (flat_idx + batch_off).reshape(-1)

    sums = jax.ops.segment_sum(values.reshape(-1, c), seg,
                               num_segments=b * dims ** 3)
    counts = sums[:, -1:]
    mean = sums / jnp.maximum(counts, 1.0)
    # the ones-channel mean is 1 for occupied voxels; recover the raw count
    # semantics of the reference (count channel becomes occupancy below)
    grid = mean.reshape(b, dims, dims, dims, c)
    grid = grid[:, 1:-1, 1:-1, 1:-1]                              # crop border

    occupied = (grid[..., -1:] > 0).astype(jnp.float32)

    # normalized per-voxel index coordinates (voxel_grid.py:219-221)
    vs = voxel_size
    ii = jax.lax.broadcasted_iota(jnp.float32, (vs, vs, vs), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (vs, vs, vs), 1)
    kk = jax.lax.broadcasted_iota(jnp.float32, (vs, vs, vs), 2)
    index_grid = jnp.stack([ii, jj, kk], axis=-1) / float(vs)
    index_grid = jnp.broadcast_to(index_grid[None], (b, vs, vs, vs, 3))

    return jnp.concatenate([grid[..., :-1], index_grid, occupied], axis=-1)


def point_to_voxel_index(point: jnp.ndarray, coord_bounds, voxel_size: int = 100):
    """World point → integer voxel index in the CROPPED grid.

    Parity: helpers/utils.py:80-100 (point_to_voxel_index) — used for action
    discretization and the act() argmax→coordinate mapping.
    """
    bounds = jnp.asarray(coord_bounds, jnp.float32)
    bb_mins = bounds[..., 0:3]
    bb_maxs = bounds[..., 3:6]
    res = (bb_maxs - bb_mins) / float(voxel_size)
    idx = jnp.floor((point - bb_mins) / (res + MIN_DENOMINATOR)).astype(jnp.int32)
    return jnp.clip(idx, 0, voxel_size - 1)


def voxel_index_to_point(idx: jnp.ndarray, coord_bounds, voxel_size: int = 100):
    """Voxel index → world coordinate of the voxel center (inverse of the above)."""
    bounds = jnp.asarray(coord_bounds, jnp.float32)
    bb_mins = bounds[..., 0:3]
    bb_maxs = bounds[..., 3:6]
    res = (bb_maxs - bb_mins) / float(voxel_size)
    return bb_mins + (idx.astype(jnp.float32) + 0.5) * res
