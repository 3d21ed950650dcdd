"""k-nearest-neighbor distances (simple-knn parity).

Parity target: `submodules/simple-knn/simple_knn.cu` distCUDA2 — mean squared
distance from each point to its 3 nearest neighbors, used by vanilla 3DGS for
scale initialization (never called at runtime by ManiGaussian; provided for
capability parity, SURVEY.md §2.2).

TPU-native: O(N²) tiled distance matrix on the MXU for N ≤ ~64k (the 3DGS
use-case), fully jittable; the Morton-code pruning of the CUDA version is a
memory optimization the MXU does not need at this scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FAR = 1e6  # padding sentinel, far from any real point


def knn_mean_sq_dist(points: jnp.ndarray, k: int = 3,
                     block: int = 4096) -> jnp.ndarray:
    """points [N, 3] → [N] mean squared distance to the k nearest neighbors."""
    n = points.shape[0]
    block = min(block, n)
    n_pad = ((n + block - 1) // block) * block
    pts = jnp.pad(points.astype(jnp.float32), ((0, n_pad - n), (0, 0)),
                  constant_values=_FAR)
    sq = jnp.sum(pts * pts, axis=-1)                      # [n_pad]

    def body(i, out):
        start = i * block
        chunk = jax.lax.dynamic_slice_in_dim(pts, start, block, axis=0)
        chunk_sq = jax.lax.dynamic_slice_in_dim(sq, start, block, axis=0)
        d2 = (chunk_sq[:, None] + sq[None, :]
              - 2.0 * jnp.matmul(chunk, pts.T,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST))
        rows = jax.lax.broadcasted_iota(jnp.int32, (block, n_pad), 0) + start
        cols = jax.lax.broadcasted_iota(jnp.int32, (block, n_pad), 1)
        pad_col = cols >= n
        d2 = jnp.where((rows == cols) | pad_col, jnp.inf, jnp.maximum(d2, 0.0))
        neg_top, _ = jax.lax.top_k(-d2, k)
        mean_k = jnp.mean(-neg_top, axis=-1)
        return jax.lax.dynamic_update_slice_in_dim(out, mean_k, start, axis=0)

    out = jnp.zeros((n_pad,), jnp.float32)
    out = jax.lax.fori_loop(0, n_pad // block, body, out)
    return out[:n]
