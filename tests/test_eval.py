"""Eval stack tests: checkpoint selection, mock-env rollouts, results CSV."""

import os

import jax
import numpy as np
import pytest

from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
from manigaussian_tpu.data.language import create_language_model
from manigaussian_tpu.data.synthetic import generate_task
from manigaussian_tpu.envs.mock_env import MockEnvClient
from manigaussian_tpu.runners.eval_runner import (append_eval_csv,
                                                  read_eval_csv, run_eval,
                                                  select_checkpoints)
from manigaussian_tpu.utils.checkpoint import save_checkpoint
from tests.test_agent import make_batch, tiny_config


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("demos"))
    generate_task(root, "open_drawer", num_episodes=2, timesteps=10,
                  h=16, w=16, nerf_views=3, nerf_hw=16)
    cfg = tiny_config(use_neural_rendering=False)
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True)
    logdir = str(tmp_path_factory.mktemp("logs"))
    host_state = jax.device_get(state)
    save_checkpoint(logdir, 100, host_state)
    save_checkpoint(logdir, 200, host_state)
    return root, agent, state, logdir


def test_select_checkpoints_modes(eval_setup, tmp_path):
    _, _, _, logdir = eval_setup
    assert select_checkpoints(logdir, "last", ["open_drawer"]) == [200]
    assert select_checkpoints(logdir, "missing", ["open_drawer"]) == [100, 200]
    assert select_checkpoints(logdir, 100, ["open_drawer"]) == [100]
    # after evaluating 100, 'missing' returns only 200; 'best' picks from CSV
    append_eval_csv(logdir, {"step": 100, "eval_envs/return": 50.0})
    assert select_checkpoints(logdir, "missing", ["open_drawer"]) == [200]
    append_eval_csv(logdir, {"step": 200, "eval_envs/return": 10.0})
    assert select_checkpoints(logdir, "best", ["open_drawer"]) == [100]


def test_mock_env_oracle_rollout(eval_setup):
    """Feeding ground-truth keyframe actions must achieve success."""
    root, _, _, _ = eval_setup
    from manigaussian_tpu.data import episode as ep
    from manigaussian_tpu.data.keypoints import keypoint_discovery

    env = MockEnvClient(root, pos_tol=0.05)
    env.set_task("open_drawer")
    env.reset_to_demo(0)
    demo = ep.load_episode(ep.list_episodes(root, "open_drawer")[0])
    kps = keypoint_discovery(demo.gripper_open, demo.joint_velocities)
    total = 0.0
    for kp in kps:
        a = np.concatenate([demo.gripper_pose[kp],
                            [demo.gripper_open[kp]], [0.0]])
        res = env.step(a)
        total += res.reward
        if res.terminal:
            break
    assert total == 100.0


def test_run_eval_writes_csv(eval_setup, tmp_path):
    root, agent, state, logdir = eval_setup
    env = MockEnvClient(root, pos_tol=0.5)
    lang = create_language_model("stub")
    rows = run_eval(agent, logdir, env, ["open_drawer"], eval_type="last",
                    eval_episodes=2, episode_length=5, lang_model=lang,
                    state_like=jax.device_get(state))
    assert len(rows) == 1
    csv_rows = read_eval_csv(logdir)
    assert any(int(r["step"]) == 200 for r in csv_rows)
    assert "eval_envs/return" in rows[0]


def test_compute_results_aggregation(tmp_path):
    import pandas as pd
    from manigaussian_tpu.analysis.compute_results import aggregate
    for seed in range(2):
        df = pd.DataFrame({
            "step": [100, 200],
            "eval_envs/return/open_drawer": [20.0 + seed, 40.0 + seed],
            "eval_envs/return/turn_tap": [10.0, 30.0],
        })
        df.to_csv(tmp_path / f"{seed}.csv", index=False)
    mean, std, _ = aggregate([str(tmp_path / "0.csv"), str(tmp_path / "1.csv")],
                             "last")
    np.testing.assert_allclose(mean, (35.0 + 35.5) / 2)
    mean_best, _, _ = aggregate([str(tmp_path / "0.csv")], "best")
    np.testing.assert_allclose(mean_best, 35.0)


@pytest.fixture(scope="module")
def renderer_on_setup(tmp_path_factory):
    """Checkpoints saved from a renderer-ON training state (what real training
    writes), restorable by eval's make_state_skeleton tree."""
    root = str(tmp_path_factory.mktemp("demos_r"))
    generate_task(root, "open_drawer", num_episodes=2, timesteps=10,
                  h=16, w=16, nerf_views=3, nerf_hw=32)
    cfg = tiny_config()
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True,
                             lazy=True)
    logdir = str(tmp_path_factory.mktemp("logs_r"))
    host_state = jax.device_get(state)
    save_checkpoint(logdir, 100, host_state)
    save_checkpoint(logdir, 200, host_state)
    return root, cfg, logdir


@pytest.mark.slow
def test_run_eval_parallel_two_workers(renderer_on_setup):
    """Parallel checkpoint eval (reference eval.py:154-172): both checkpoints
    evaluated in spawn-context workers, rows appended in order by the parent."""
    import dataclasses

    from manigaussian_tpu.runners.eval_runner import run_eval_parallel

    root, cfg, logdir = renderer_on_setup
    eval_cfg = dataclasses.replace(
        cfg, method=dataclasses.replace(cfg.method,
                                        use_neural_rendering=False))
    rows = run_eval_parallel(eval_cfg, logdir, root, "mock",
                             eval_type="missing", eval_episodes=1,
                             num_workers=2, platform="cpu")
    assert [int(r["step"]) for r in rows] == [100, 200]
    csv_rows = read_eval_csv(logdir)
    assert [int(r["step"]) for r in csv_rows] == [100, 200]
    assert all("eval_envs/return" in r for r in rows)
    assert all(np.isfinite(r["eval_envs/return"]) for r in rows)


@pytest.mark.slow
def test_state_skeleton_respects_method_registry():
    """GNFACTOR_BC checkpoints carry the NeRF renderer tree — the restore
    skeleton must come from the registry, not a hardcoded splat agent."""
    import dataclasses

    from manigaussian_tpu.runners.eval_runner import make_state_skeleton

    cfg = tiny_config()
    nr = dataclasses.replace(cfg.method.neural_renderer, n_coarse=4, n_fine=2,
                             n_fine_depth=1, ray_chunk_size=8, d_embed=3)
    gcfg = dataclasses.replace(cfg, method=dataclasses.replace(
        cfg.method, name="GNFACTOR_BC", neural_renderer=nr))
    skel = make_state_skeleton(gcfg)
    flat = {"/".join(str(k) for k in p): None for p, _ in
            jax.tree_util.tree_leaves_with_path(skel.params)}
    assert any("nerf" in k for k in flat), sorted(flat)[:5]
    assert not any("gs_model" in k or "gaussian" in k.lower() for k in flat)


def test_eval_records_episode_gifs(eval_setup, tmp_path):
    """record_every_n saves cinematic-recorder GIFs under <logdir>/videos
    (reference conf/eval.yaml cinematic_recorder)."""
    import glob

    root, agent, state, _ = eval_setup
    logdir = str(tmp_path / "rec_logs")
    from manigaussian_tpu.utils.checkpoint import save_checkpoint
    save_checkpoint(logdir, 100, jax.device_get(state))
    env = MockEnvClient(root, pos_tol=0.5)
    lang = create_language_model("stub")
    run_eval(agent, logdir, env, ["open_drawer"], eval_type="last",
             eval_episodes=2, episode_length=3, lang_model=lang,
             state_like=jax.device_get(state), record_every_n=2)
    gifs = glob.glob(os.path.join(logdir, "videos", "*.gif"))
    assert len(gifs) == 1  # episode 0 recorded, episode 1 not
