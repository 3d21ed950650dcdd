"""Multi-host (multi-process) distributed wiring.

Parity target: the reference's DDP launcher — per-GPU processes with a
coordinator rendezvous (`/root/reference/train.py:86-129` sets MASTER_ADDR /
MASTER_PORT / RANK env vars; `run_seed_fn.py:39-41` picks nccl/gloo). The
TPU-native equivalent is `jax.distributed.initialize`: every host runs the
SAME program, `jax.devices()` becomes the global device list, and one jitted
step spans the whole multi-host mesh with XLA inserting ICI/DCN collectives.

Data convention ("replicated iterator", exact single-process parity):
every process seeds the identical `BatchIterator` and assembles the identical
GLOBAL host batch; `global_batch` then materializes only this process's
addressable shards via `jax.make_array_from_callback`. Host-side assembly is
duplicated across hosts (cheap at RLBench scale — PIL decode of a few images)
but device transfer is local-only and the global array equals the
single-process one bit-for-bit, so multi-host training is step-identical to
single-host. For disjoint-data scaling instead, construct
`TaskUniformReplay(shard=(jax.process_index(), jax.process_count()))`
(reference `task_uniform_replay_buffer.py:113-118`) and feed per-process
batches through `make_array_from_process_local_data` — hook kept in
`local_batch_to_global`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(spec: str, cpu_devices: int = 0) -> None:
    """Initialize multi-process JAX from a 'host:port,num_processes,pid' spec.

    Must run before any backend/device query. `cpu_devices` > 0 forces the CPU
    platform with that many local virtual devices first (the CPU-mesh smoke
    path; env vars are too late in this environment — sitecustomize imports
    jax at interpreter start).
    """
    coordinator, num_processes, process_id = spec.split(",")
    if cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(process_id))


def is_main() -> bool:
    return jax.process_index() == 0


def global_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Identical-on-every-process GLOBAL host batch → batch-sharded global
    jax.Arrays. Each process materializes only its addressable shards."""
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    return {k: put(v) for k, v in batch.items()}


def replicate_tree_global(tree, mesh: Mesh):
    """Replicate a host pytree over a (possibly multi-host) mesh."""
    rep = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree)


def local_batch_to_global(local: Dict[str, Any], mesh: Mesh,
                          axis: str = "data",
                          global_batch_size: Optional[int] = None):
    """Disjoint-data mode: this process's LOCAL batch rows → global array
    (rows laid out in mesh device order). Pair with a replay sharded by
    (process_index, process_count)."""
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        gshape = ((global_batch_size or x.shape[0] * jax.process_count(),)
                  + x.shape[1:])
        return jax.make_array_from_process_local_data(sh, x, gshape)

    return {k: put(v) for k, v in local.items()}
