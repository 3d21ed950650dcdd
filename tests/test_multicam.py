"""Multi-camera agent path: ncam > 1 voxelizes all views' points (the reference
supports [front, left_shoulder, right_shoulder, wrist], conf/config.yaml)."""

import jax
import numpy as np
import pytest

from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
from tests.test_agent import make_batch, tiny_config


@pytest.mark.slow
def test_two_camera_update_and_act():
    cfg = tiny_config(use_neural_rendering=True)
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(0), ncam=2)
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True)
    _, metrics = agent.update(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))

    obs = {k: batch[k] for k in ("rgb", "pcd", "low_dim_state",
                                 "lang_goal_emb", "lang_token_embs")}
    res = agent.act(state.params, obs)
    assert res.continuous_action.shape == (1, 9)
