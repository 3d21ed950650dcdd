"""Bitwise-determinism tests (SURVEY.md §5: the TPU replacement for the CUDA
backward's unverified atomicAdd races is associative segment math — verify the
same inputs give bit-identical outputs and gradients run-to-run)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from manigaussian_tpu.ops import rasterizer as rast
from tests.helpers import make_camera, random_scene

BG = (0.0, 0.0, 0.0)


def _loss_and_grad(scene, c, cfg):
    def loss(means, scales):
        out, _ = rast.rasterize(means, scene["opacities"], c, cfg, BG,
                                scales=scales, rotations=scene["rotations"],
                                shs=scene["shs"],
                                language_features=scene["language_features"])
        return jnp.sum(out.color ** 2) + jnp.sum(out.language_feature ** 2)

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    return f(scene["means3d"], scene["scales"])


def test_rasterizer_bitwise_deterministic():
    scene = random_scene(jax.random.PRNGKey(1), 128, spread=0.35)
    c = make_camera(32, 32, focal=30.0)
    cfg = rast.RasterizeConfig(width=32, height=32, tile=16,
                               max_tiles_per_gaussian=8, tile_capacity=128,
                               chunk=64)
    v1, g1 = _loss_and_grad(scene, c, cfg)
    v2, g2 = _loss_and_grad(scene, c, cfg)
    assert float(v1) == float(v2)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_train_step_bitwise_deterministic():
    from tests.test_agent import make_batch, tiny_config
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

    cfg = tiny_config(use_neural_rendering=False)
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True)
    upd = agent.jit_update(donate=False)
    s1, m1 = upd(state, batch, jax.random.PRNGKey(2))
    s2, m2 = upd(state, batch, jax.random.PRNGKey(2))
    assert float(m1["total_loss"]) == float(m2["total_loss"])
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
