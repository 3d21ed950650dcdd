"""Sharded training step: data-parallel BC update over a device mesh.

The reference's multi-GPU story is per-process DDP with NCCL grad all-reduce
(`train.py:86-129`). Here one process drives the whole mesh: the jitted
`agent.update` runs SPMD with the batch sharded on the `data` axis and the
TrainState replicated; XLA compiles the gradient psum over ICI and overlaps it
with the backward pass automatically.

Usage:
    mesh = make_mesh((n_chips,), ("data",))
    step_fn = make_sharded_update(agent, mesh)
    state = replicate_state(agent.init_state(...), mesh)
    state, metrics = step_fn(state, shard_batch(batch, mesh), key)
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
from manigaussian_tpu.parallel.mesh import batch_sharding, replicated


def make_sharded_update(agent: ManiGaussianBCAgent, mesh: Mesh,
                        donate: bool = False):
    """jit agent.update with explicit shardings: batch over `data`, state replicated."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def spec_of_batch(batch):
        return jax.tree_util.tree_map(lambda _: bsh, batch)

    cache = {}

    def step(state, batch, key):
        if "fn" not in cache:  # structure is stable across steps; jit once
            cache["fn"] = jax.jit(
                agent.update,
                in_shardings=(jax.tree_util.tree_map(lambda _: rep, state),
                              spec_of_batch(batch), rep),
                out_shardings=None,
                donate_argnums=(0,) if donate else ())
        return cache["fn"](state, batch, key)

    return step


def make_sharded_act(agent: ManiGaussianBCAgent, mesh: Mesh):
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    cache = {}

    def act(params, obs):
        if "fn" not in cache:
            cache["fn"] = jax.jit(
                agent.act,
                in_shardings=(jax.tree_util.tree_map(lambda _: rep, params),
                              jax.tree_util.tree_map(lambda _: bsh, obs)))
        return cache["fn"](params, obs)

    return act
