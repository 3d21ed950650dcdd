"""End-to-end agent tests on a tiny config: one jitted BC update + act.

This is the SURVEY.md §7 stage-5 'minimum end-to-end slice' exercised at toy
scale: voxelize → perceiver → Q losses + rendered RGB loss → LAMB step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manigaussian_tpu import config as C
from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent


def tiny_config(use_dynamic_field=False, use_neural_rendering=True,
                apply_se3=True):
    nr = C.NeuralRendererConfig(
        use_dynamic_field=use_dynamic_field,
        image_width=32, image_height=32,
        coordinate_bounds=(-0.3, -0.5, 0.6, 0.7, 0.5, 1.6),
        d_latent=16, mlp=C.MLPConfig(n_blocks=2, d_hidden=32),
        next_mlp=C.NextMLPConfig(d_hidden=32, n_blocks=2, warm_up=10),
        tile=16, max_tiles_per_gaussian=4, tile_capacity=64, chunk=32)
    method = C.MethodConfig(
        use_neural_rendering=use_neural_rendering, apply_se3=apply_se3,
        voxel_sizes=(20,), num_latents=32, latent_dim=32,
        transformer_depth=1, cross_dim_head=8, latent_dim_head=8,
        final_dim=16, neural_renderer=nr)
    # single-task fixture (the repo default is the paper's 10-task list)
    rlb = C.RLBenchConfig(camera_resolution=(16, 16), tasks=("open_drawer",))
    return C.ManiGaussianConfig(method=method, rlbench=rlb)


def make_batch(key, b=1, ncam=1, h=16, w=16, img=32):
    ks = jax.random.split(key, 8)
    center = jnp.array([0.2, 0.0, 1.1])
    pcd = center + jax.random.normal(ks[0], (b, ncam, h, w, 3)) * 0.05
    return {
        "rgb": jax.random.uniform(ks[1], (b, ncam, h, w, 3)),
        "pcd": pcd,
        "low_dim_state": jnp.zeros((b, 4)),
        "lang_goal_emb": jax.random.normal(ks[2], (b, 1024)) * 0.1,
        "lang_token_embs": jax.random.normal(ks[3], (b, 77, 512)) * 0.1,
        "trans_action_indicies": jnp.full((b, 3), 10, jnp.int32),
        "rot_grip_action_indicies": jnp.array([[10, 20, 30, 1]] * b, jnp.int32),
        "ignore_collisions": jnp.ones((b, 1), jnp.int32),
        "gripper_pose": jnp.tile(
            jnp.concatenate([center, jnp.array([0, 0, 0, 1.0])])[None], (b, 1)),
        "action": jnp.zeros((b, 8)),
        "camera_extrinsics": jnp.tile(jnp.eye(4), (b, ncam, 1, 1)),
        "nerf_target_rgb": jax.random.uniform(ks[4], (b, img, img, 3)),
        "nerf_target_pose": jnp.tile(jnp.eye(4), (b, 1, 1)),
        "nerf_target_intrinsic": jnp.tile(
            jnp.array([[30.0, 0, 16.0], [0, 30.0, 16.0], [0, 0, 1.0]]), (b, 1, 1)),
        "nerf_next_target_rgb": jax.random.uniform(ks[5], (b, img, img, 3)),
        "nerf_next_target_pose": jnp.tile(jnp.eye(4), (b, 1, 1)),
        "nerf_next_target_intrinsic": jnp.tile(
            jnp.array([[30.0, 0, 16.0], [0, 30.0, 16.0], [0, 0, 1.0]]), (b, 1, 1)),
    }


@pytest.fixture(scope="module")
def agent_and_state():
    cfg = tiny_config(use_dynamic_field=True)
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True)
    return agent, state, batch


@pytest.mark.slow
def test_update_step_runs_and_is_finite(agent_and_state):
    agent, state, batch = agent_and_state
    new_state, metrics = agent.update(state, batch, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    for k, val in metrics.items():
        assert np.isfinite(float(val)), f"{k} not finite"
    assert float(metrics["total_loss"]) > 0
    # params actually changed
    diff = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                  state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


@pytest.mark.slow
def test_loss_decreases_over_steps():
    """Fixed targets (no SE(3) re-randomization, no renderer) must be learnable."""
    cfg = tiny_config(use_neural_rendering=False, apply_se3=False)
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True)
    upd = agent.jit_update(donate=False)
    losses = []
    for i in range(12):
        state, metrics = upd(state, batch, jax.random.PRNGKey(10 + i))
        losses.append(float(metrics["bc_loss"]))
    assert losses[-1] < losses[0] * 0.8, losses


def test_act_produces_valid_action(agent_and_state):
    agent, state, batch = agent_and_state
    obs = {k: batch[k] for k in ("rgb", "pcd", "low_dim_state",
                                 "lang_goal_emb", "lang_token_embs")}
    res = agent.jit_act()(state.params, obs)
    a = np.asarray(res.continuous_action)
    assert a.shape == (1, 9)
    bounds = np.asarray(agent.bounds)
    assert (a[:, :3] >= bounds[:3]).all() and (a[:, :3] <= bounds[3:]).all()
    np.testing.assert_allclose(np.linalg.norm(a[:, 3:7], axis=-1), 1.0, atol=1e-5)
    assert a[0, 7] in (0.0, 1.0)
    assert (np.asarray(res.trans_coords) >= 0).all()
    assert (np.asarray(res.trans_coords) < 20).all()


@pytest.mark.slow
def test_no_renderer_variant():
    cfg = tiny_config(use_neural_rendering=False)
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(3))
    state = agent.init_state(jax.random.PRNGKey(4), batch, training=True)
    _, metrics = agent.update(state, batch, jax.random.PRNGKey(5))
    assert "rgb_loss" not in metrics
    assert np.isfinite(float(metrics["total_loss"]))
