"""Device-mesh + sharding helpers for multi-chip training.

Replaces the reference's distributed layer (Fabric DDP / NCCL all-reduce,
`train.py:94`, `qattention_manigaussian_bc_agent.py:918`, gloo fallback
`run_seed_fn.py:39`) with the TPU-native recipe: build a `jax.sharding.Mesh`,
annotate the batch with a `data`-axis NamedSharding, replicate parameters, and
let XLA insert the gradient all-reduce over ICI inside the single jitted train
step — no explicit collectives in user code for pure DP.

The second mesh axis (`tile`) is reserved for rasterizer-internal sharding
(Gaussians/image tiles, SURVEY.md §5 'long-context analog'), used by
parallel/train_sharded.py when mesh_shape has two entries.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (-1,),
              axes: Sequence[str] = ("data",)) -> Mesh:
    """Build a mesh over all available devices. shape=-1 entries auto-fill."""
    devices = jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    dev_array = mesh_utils.create_device_mesh(tuple(shape), devices=devices[: int(np.prod(shape))])
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding for every leaf of the batch pytree."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Device-put a host batch with the batch axis sharded over `axis`.

    Multi-process: the batch must be the identical GLOBAL batch on every
    process (parallel/distributed.py convention); only addressable shards are
    materialized locally."""
    if jax.process_count() > 1:
        from manigaussian_tpu.parallel.distributed import global_batch
        return global_batch(batch, mesh, axis)
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate_state(state, mesh: Mesh):
    if jax.process_count() > 1:
        from manigaussian_tpu.parallel.distributed import \
            replicate_tree_global
        return replicate_tree_global(jax.device_get(state), mesh)
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), state)
