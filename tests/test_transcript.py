"""Recorded-transcript conformance harness (VERDICT r3 item 7).

Records an EnvClient session from the mock env, then re-drives the FULL eval
stack (eval_runner → RPCEnvClient → TCP → EnvRPCServer → TranscriptReplayEnv)
against the replayed transcript, requiring identical rows and full transcript
exhaustion — so the only sim-facing code a live CoppeliaSim first-run can
break is RLBenchEnvClient's PyRep glue (helpers/custom_rlbench_env.py:279-392
boundary)."""

import jax
import numpy as np
import pytest

from manigaussian_tpu.data.synthetic import generate_task
from manigaussian_tpu.envs.mock_env import MockEnvClient
from manigaussian_tpu.envs.rpc import EnvRPCServer, RPCEnvClient
from manigaussian_tpu.envs.transcript import (TranscriptRecorder,
                                              TranscriptReplayEnv)


@pytest.fixture(scope="module")
def demo_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("demos_transcript"))
    generate_task(root, "open_drawer", num_episodes=2, timesteps=10,
                  h=16, w=16, nerf_views=3, nerf_hw=16)
    return root


def _oracle_actions(demo_root):
    from manigaussian_tpu.data import episode as ep
    from manigaussian_tpu.data.keypoints import keypoint_discovery

    demo = ep.load_episode(ep.list_episodes(demo_root, "open_drawer")[0])
    kps = keypoint_discovery(demo.gripper_open, demo.joint_velocities)
    return [np.concatenate([demo.gripper_pose[kp], [demo.gripper_open[kp]],
                            [0.0]]).astype(np.float32) for kp in kps]


def _drive(env, actions):
    env.launch()
    env.set_task("open_drawer")
    env.reset_to_demo(0)
    rewards = []
    for a in actions:
        res = env.step(a)
        rewards.append(res.reward)
        if res.terminal:
            break
    env.shutdown()
    return rewards


def test_record_replay_roundtrip(demo_root, tmp_path):
    path = str(tmp_path / "session.jsonl")
    actions = _oracle_actions(demo_root)

    rec = TranscriptRecorder(MockEnvClient(demo_root), path)
    rewards = _drive(rec, actions)

    rep = TranscriptReplayEnv(path)
    rewards2 = _drive(rep, actions)
    rep.assert_exhausted()
    assert rewards == rewards2
    assert sum(rewards2) == 100.0  # oracle actions succeed


def test_replay_detects_method_divergence(demo_root, tmp_path):
    path = str(tmp_path / "session.jsonl")
    actions = _oracle_actions(demo_root)
    _drive(TranscriptRecorder(MockEnvClient(demo_root), path), actions)

    rep = TranscriptReplayEnv(path)
    rep.launch()
    with pytest.raises(RuntimeError, match="conformance failure"):
        rep.reset_to_demo(0)  # recorded: set_task


def test_replay_detects_action_divergence(demo_root, tmp_path):
    path = str(tmp_path / "session.jsonl")
    actions = _oracle_actions(demo_root)
    _drive(TranscriptRecorder(MockEnvClient(demo_root), path), actions)

    rep = TranscriptReplayEnv(path)
    rep.launch()
    rep.set_task("open_drawer")
    rep.reset_to_demo(0)
    bad = actions[0].copy()
    bad[0] += 1.0
    with pytest.raises(RuntimeError, match="action diverged"):
        rep.step(bad)

    # non-strict mode: logs, serves the recorded response
    rep2 = TranscriptReplayEnv(path, strict=False)
    rep2.launch()
    rep2.set_task("open_drawer")
    rep2.reset_to_demo(0)
    with pytest.warns(UserWarning, match="divergence"):
        rep2.step(bad)
    assert len(rep2.divergences) == 1


def test_recorded_error_replays_as_error(demo_root, tmp_path):
    class ExplodingEnv(MockEnvClient):
        def step(self, action):
            raise ValueError("IK solver diverged")

    path = str(tmp_path / "err.jsonl")
    rec = TranscriptRecorder(ExplodingEnv(demo_root), path)
    rec.launch()
    rec.set_task("open_drawer")
    rec.reset_to_demo(0)
    a = _oracle_actions(demo_root)[0]
    with pytest.raises(ValueError):
        rec.step(a)

    rep = TranscriptReplayEnv(path)
    rep.launch()
    rep.set_task("open_drawer")
    rep.reset_to_demo(0)
    with pytest.raises(RuntimeError, match="IK solver diverged"):
        rep.step(a)


def test_eval_conformance_through_rpc_replay(demo_root, tmp_path):
    """The headline conformance test: record run_eval against the mock env,
    then run the SAME eval through RPC against the transcript replay server —
    identical CSV rows, transcript fully exhausted."""
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
    from manigaussian_tpu.data.language import create_language_model
    from manigaussian_tpu.runners.eval_runner import run_eval
    from manigaussian_tpu.utils.checkpoint import save_checkpoint
    from tests.test_agent import make_batch, tiny_config

    cfg = tiny_config(use_neural_rendering=False)
    agent = ManiGaussianBCAgent(cfg)
    state = agent.init_state(jax.random.PRNGKey(1),
                             make_batch(jax.random.PRNGKey(0)), training=True)
    host_state = jax.device_get(state)
    lang = create_language_model("stub")

    logdir_a, logdir_b = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (logdir_a, logdir_b):
        save_checkpoint(d, 100, host_state)

    path = str(tmp_path / "eval_session.jsonl")
    rows_rec = run_eval(
        agent, logdir_a,
        TranscriptRecorder(MockEnvClient(demo_root, pos_tol=0.5), path),
        ["open_drawer"], eval_type="last", eval_episodes=2,
        episode_length=4, lang_model=lang, state_like=host_state)

    replay = TranscriptReplayEnv(path)
    server = EnvRPCServer(replay, port=0).start_background()
    client = RPCEnvClient(f"rpc://127.0.0.1:{server.port}")
    rows_rpc = run_eval(agent, logdir_b, client, ["open_drawer"],
                        eval_type="last", eval_episodes=2, episode_length=4,
                        lang_model=lang, state_like=host_state)
    server.close()

    replay.assert_exhausted()
    assert rows_rec[0]["eval_envs/return"] == rows_rpc[0]["eval_envs/return"]
    assert rows_rec[0]["step"] == rows_rpc[0]["step"]


def test_make_env_transcript_scheme(demo_root, tmp_path):
    """eval.py --env transcript://PATH resolves to the replay double."""
    from manigaussian_tpu.runners.eval_runner import make_env
    from tests.test_agent import tiny_config

    path = str(tmp_path / "s.jsonl")
    _drive(TranscriptRecorder(MockEnvClient(demo_root), path),
           _oracle_actions(demo_root))
    env = make_env(tiny_config(), demo_root, f"transcript://{path}")
    assert isinstance(env, TranscriptReplayEnv)
    assert len(env.records) > 0


def test_production_shape_transcript_roundtrip(tmp_path):
    """Realistic-shape conformance (VERDICT r4 weak item 6): a recorded
    session at PRODUCTION observation shapes — 128² images, two cameras —
    replays bit-true through the RPC wire encoding, so shape/dtype/convention
    surprises from real RLBench observations (128², multi-camera) would be
    caught here, not on a live first run
    (helpers/custom_rlbench_env.py:279-392 boundary)."""
    root = str(tmp_path / "demos128")
    cams = ("front", "left_shoulder")
    generate_task(root, "open_drawer", num_episodes=1, timesteps=8,
                  h=128, w=128, nerf_views=2, nerf_hw=32, cameras=cams)
    actions = _oracle_actions(root)
    path = str(tmp_path / "session128.jsonl")

    env = MockEnvClient(root, cameras=cams)
    rec = TranscriptRecorder(env, path)
    rec.launch()
    rec.set_task("open_drawer")
    obs_rec = rec.reset_to_demo(0)
    step_rec = rec.step(actions[0])
    rec.shutdown()
    assert obs_rec.rgb.shape == (2, 128, 128, 3)
    assert obs_rec.pcd.shape == (2, 128, 128, 3)

    rep = TranscriptReplayEnv(path)
    rep.launch()
    rep.set_task("open_drawer")
    obs_rep = rep.reset_to_demo(0)
    step_rep = rep.step(actions[0])
    rep.shutdown()
    rep.assert_exhausted()

    # observations round-trip the wire encoding bit-true at full shape
    for a, b in ((obs_rec, obs_rep),
                 (step_rec.observation, step_rep.observation)):
        assert a.rgb.dtype == b.rgb.dtype and a.rgb.shape == b.rgb.shape
        np.testing.assert_array_equal(a.rgb, b.rgb)
        np.testing.assert_array_equal(a.pcd, b.pcd)
        np.testing.assert_array_equal(a.low_dim_state, b.low_dim_state)
        assert a.lang_goal == b.lang_goal
    assert step_rec.reward == step_rep.reward
    assert step_rec.terminal == step_rep.terminal
