"""Trilinear grid sampling (the jax analog of F.grid_sample for 3D volumes).

Parity target: `models_embed.py:167-188` (sample_in_canonical_voxel) — trilinear,
align_corners=True, zero padding outside the grid.

Axis convention: sample coordinates are (x, y, z) indexing spatial axes
(0, 1, 2) of a channels-last volume [D0, D1, D2, C]. (The reference relies on
torch grid_sample's reversed (x→W) convention, which silently transposes its
voxel grid; since no weights are ported we use the straightforward convention —
the network simply learns the consistent layout. Documented deviation.)
"""

from __future__ import annotations

import jax.numpy as jnp


def trilinear_sample(volume: jnp.ndarray, coords: jnp.ndarray,
                     align_corners: bool = True) -> jnp.ndarray:
    """Sample a 3D volume at continuous normalized coordinates.

    Args:
      volume: [D0, D1, D2, C]
      coords: [N, 3] in [-1, 1] (like grid_sample), coords[:, i] indexes axis i.
    Returns: [N, C]; coordinates outside [-1, 1] fade to zero (zeros padding).
    """
    d = jnp.asarray(volume.shape[:3], jnp.float32)
    if align_corners:
        pix = (coords + 1.0) * 0.5 * (d - 1.0)
    else:
        pix = ((coords + 1.0) * d - 1.0) * 0.5

    lo = jnp.floor(pix)
    frac = pix - lo
    lo = lo.astype(jnp.int32)

    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner = lo + jnp.array([dx, dy, dz], jnp.int32)
                w = jnp.prod(jnp.where(jnp.array([dx, dy, dz]) == 1, frac, 1.0 - frac),
                             axis=-1)
                in_bounds = jnp.all((corner >= 0) & (corner < d.astype(jnp.int32)),
                                    axis=-1)
                cc = jnp.clip(corner, 0, d.astype(jnp.int32) - 1)
                vals = volume[cc[:, 0], cc[:, 1], cc[:, 2]]       # [N, C]
                out = out + jnp.where(in_bounds, w, 0.0)[:, None] * vals
    return out
