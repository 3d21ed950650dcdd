"""RPC env bridge tests (VERDICT r2 item 6): protocol round-trip against an
in-process fake sim host, error forwarding, and eval parity — so the only
untested code on a real sim host is the RLBench glue itself."""

import threading

import jax
import numpy as np
import pytest

from manigaussian_tpu.data.synthetic import generate_task
from manigaussian_tpu.envs.base import EnvObservation, EnvStepResult
from manigaussian_tpu.envs.mock_env import MockEnvClient
from manigaussian_tpu.envs.rpc import EnvRPCServer, RPCEnvClient


@pytest.fixture(scope="module")
def demo_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("demos_rpc"))
    generate_task(root, "open_drawer", num_episodes=2, timesteps=10,
                  h=16, w=16, nerf_views=3, nerf_hw=16)
    return root


@pytest.fixture()
def served_env(demo_root):
    env = MockEnvClient(demo_root, pos_tol=0.05)
    server = EnvRPCServer(env, port=0).start_background()
    client = RPCEnvClient(f"rpc://127.0.0.1:{server.port}")
    yield client, env
    client.shutdown()
    server.close()


def test_roundtrip_observation_bit_exact(served_env, demo_root):
    client, local = served_env
    client.set_task("open_drawer")
    obs_remote = client.reset_to_demo(0)
    local.set_task("open_drawer")
    obs_local = local.reset_to_demo(0)
    assert isinstance(obs_remote, EnvObservation)
    np.testing.assert_array_equal(obs_remote.rgb, obs_local.rgb)
    np.testing.assert_array_equal(obs_remote.pcd, obs_local.pcd)
    np.testing.assert_array_equal(obs_remote.low_dim_state,
                                  obs_local.low_dim_state)
    assert obs_remote.lang_goal == obs_local.lang_goal


def test_step_and_reward_over_the_wire(served_env, demo_root):
    """Feeding ground-truth keyframe actions through the bridge succeeds,
    mirroring test_eval.test_mock_env_oracle_rollout."""
    client, _ = served_env
    from manigaussian_tpu.data import episode as ep
    from manigaussian_tpu.data.keypoints import keypoint_discovery

    client.ping()
    client.set_task("open_drawer")
    client.reset_to_demo(0)
    demo = ep.load_episode(ep.list_episodes(demo_root, "open_drawer")[0])
    kps = keypoint_discovery(demo.gripper_open, demo.joint_velocities)
    total = 0.0
    for kp in kps:
        a = np.concatenate([demo.gripper_pose[kp],
                            [demo.gripper_open[kp]], [0.0]])
        res = client.step(a)
        assert isinstance(res, EnvStepResult)
        total += res.reward
        if res.terminal:
            break
    assert total == 100.0


def test_sim_errors_forwarded_as_runtime_error(demo_root):
    class ExplodingEnv(MockEnvClient):
        def step(self, action):
            raise ValueError("IK solver diverged")

    server = EnvRPCServer(ExplodingEnv(demo_root), port=0).start_background()
    client = RPCEnvClient(f"127.0.0.1:{server.port}")
    client.set_task("open_drawer")
    client.reset_to_demo(0)
    with pytest.raises(RuntimeError, match="ValueError: IK solver diverged"):
        client.step(np.zeros(9))
    client.shutdown()
    server.close()


def test_eval_through_rpc_matches_local(demo_root, tmp_path):
    """run_eval through the bridge produces the same rows as the local env."""
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

    rows_local = run_eval(agent, logdir_a,
                          MockEnvClient(demo_root, pos_tol=0.5),
                          ["open_drawer"], eval_type="last", eval_episodes=2,
                          episode_length=4, lang_model=lang,
                          state_like=host_state)

    server = EnvRPCServer(MockEnvClient(demo_root, pos_tol=0.5),
                          port=0).start_background()
    client = RPCEnvClient(f"rpc://127.0.0.1:{server.port}")
    rows_rpc = run_eval(agent, logdir_b, client, ["open_drawer"],
                        eval_type="last", eval_episodes=2, episode_length=4,
                        lang_model=lang, state_like=host_state)
    client.shutdown()
    server.close()

    assert rows_local[0]["eval_envs/return"] == rows_rpc[0]["eval_envs/return"]
    assert rows_local[0]["step"] == rows_rpc[0]["step"]


def test_make_env_rpc_scheme(demo_root):
    import dataclasses

    from manigaussian_tpu.runners.eval_runner import make_env
    from tests.test_agent import tiny_config

    cfg = tiny_config()
    env = make_env(cfg, demo_root, "rpc://127.0.0.1:1")
    assert isinstance(env, RPCEnvClient)
    assert env.port == 1


def test_nerf_demo_recorder_without_simulator(tmp_path):
    """The capture half of gen_demonstrations --backend rlbench, driven by
    fake callables: keeps exactly views [keep_lo, keep_hi] per timestep and
    the written episode round-trips through the data loader."""
    import sys
    sys.path.insert(0, "scripts")
    from gen_demonstrations import NerfDemoRecorder
    from manigaussian_tpu.data import episode as ep_io
    from manigaussian_tpu.utils.video import circular_camera_path

    center = np.array([0.2, 0.0, 1.1])
    poses = circular_camera_path(center, radius=1.0, height=1.3, n_views=50)
    intr = np.array([[16.0, 0, 8], [0, 16.0, 8], [0, 0, 1]], np.float32)
    stepped = []

    def capture(i):
        rgb = np.full((16, 16, 3), i, np.uint8)
        depth = np.full((16, 16), float(i), np.float32)
        return rgb, depth, poses[i], intr

    rec = NerfDemoRecorder(capture, lambda: stepped.append(1),
                           num_motion_steps=50, keep_lo=20, keep_hi=40)
    for _ in range(3):
        rec.take_snap()
    views = rec.pop_episode()
    assert sorted(views) == [0, 1, 2]
    rgbs, depths, extrs, intrs = views[0]
    assert rgbs.shape == (21, 16, 16, 3)          # views 20..40 inclusive
    assert rgbs[0, 0, 0, 0] == 20 and rgbs[-1, 0, 0, 0] == 40
    assert len(stepped) == 3 * 21                  # scene stepped per kept view
    np.testing.assert_allclose(extrs[0], poses[20])

    # write + reload through the standard episode format
    t_steps = 4
    rgb = np.zeros((t_steps, 16, 16, 3), np.uint8)
    depth = np.ones((t_steps, 16, 16), np.float32)
    pose4 = np.tile(np.eye(4, dtype=np.float32), (t_steps, 1, 1))
    ep_io.write_episode(
        str(tmp_path), "open_drawer", 0,
        rgb={"front": rgb}, depth={"front": depth},
        low_dim=dict(
            gripper_open=np.ones(t_steps, np.float32),
            gripper_pose=np.tile(np.array([0, 0, 1, 0, 0, 0, 1], np.float32),
                                 (t_steps, 1)),
            gripper_joint_positions=np.zeros((t_steps, 2), np.float32),
            joint_velocities=np.zeros((t_steps, 7), np.float32),
            ignore_collisions=np.zeros(t_steps, np.float32)),
        camera_extrinsics={"front": pose4},
        camera_intrinsics={"front": np.tile(intr, (t_steps, 1, 1))},
        descriptions=["open drawer demo"],
        nerf_views={t: views[min(t, 2)] for t in range(t_steps - 1)})
    loaded = ep_io.load_episode(
        ep_io.list_episodes(str(tmp_path), "open_drawer")[0])
    assert len(loaded) == t_steps
    with_views = [p for p in loaded.nerf_rgb_paths if p is not None]
    assert len(with_views) >= t_steps - 1
    assert all(len(p) == 21 for p in with_views)
