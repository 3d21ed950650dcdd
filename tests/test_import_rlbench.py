"""Round-trip test for the reference stored-demo importer.

Builds an episode in the reference's EXACT on-disk format — pickled
rlbench.demo.Demo/Observation objects (fabricated module shims, no rlbench
dependency), 24-bit RGB-packed depth PNGs, nerf_data folders — imports it
with tools/import_rlbench, and verifies the native episode trains one step.
Parity targets: rlbench/utils.py:78-231, rlbench/backend/utils.py:168-207.
"""

from __future__ import annotations

import os
import pickle
import sys
import types

import numpy as np
import pytest
from PIL import Image

from manigaussian_tpu.data import episode as ep
from manigaussian_tpu.tools.import_rlbench import (decode_depth_png,
                                                   encode_depth_png,
                                                   import_task)

NEAR, FAR = 0.1, 4.5  # front camera planes (rlbench utils.py:326-327 comment)


def _fake_rlbench_modules():
    """Install rlbench.demo.Demo / rlbench.backend.observation.Observation
    lookalikes so pickle writes the reference's GLOBAL records."""
    mods = {}
    for name in ("rlbench", "rlbench.demo", "rlbench.backend",
                 "rlbench.backend.observation"):
        mods[name] = sys.modules.get(name) or types.ModuleType(name)

    class Demo:
        def __init__(self, observations):
            self._observations = observations
            self.random_seed = None
            self.variation_number = 0

    class Observation:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    Demo.__module__, Demo.__qualname__ = "rlbench.demo", "Demo"
    Observation.__module__ = "rlbench.backend.observation"
    Observation.__qualname__ = "Observation"
    mods["rlbench.demo"].Demo = Demo
    mods["rlbench.backend.observation"].Observation = Observation
    sys.modules.update(mods)
    return Demo, Observation


def _write_reference_episode(root: str, task: str, index: int,
                             t_steps: int = 6, h: int = 32, w: int = 32,
                             nerf_views: int = 2):
    Demo, Observation = _fake_rlbench_modules()
    rng = np.random.default_rng(index)
    ep_dir = os.path.join(root, task, "all_variations", "episodes",
                          f"episode{index}")
    for sub in ("front_rgb", "front_depth"):
        os.makedirs(os.path.join(ep_dir, sub), exist_ok=True)

    extr = np.eye(4, dtype=np.float64)
    extr[:3, 3] = [0.2, -0.8, 1.4]
    intr = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float64)

    obs, depths = [], []
    for t in range(t_steps):
        rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(
            os.path.join(ep_dir, "front_rgb", f"{t}.png"))
        depth_m = rng.uniform(0.5, 2.0, (h, w)).astype(np.float32)
        encode_depth_png((depth_m - NEAR) / (FAR - NEAR)).save(
            os.path.join(ep_dir, "front_depth", f"{t}.png"))
        depths.append(depth_m)
        obs.append(Observation(
            gripper_open=float(t < t_steps // 2),
            gripper_pose=np.array([0.2, 0.0, 1.1 + 0.02 * t,
                                   0, 0, 0, 1], np.float64),
            gripper_joint_positions=np.array([0.02, 0.02], np.float64),
            joint_velocities=rng.normal(0, 1, 7),
            ignore_collisions=np.float64(0.0),
            misc={"front_camera_extrinsics": extr,
                  "front_camera_intrinsics": intr,
                  "front_camera_near": NEAR, "front_camera_far": FAR,
                  "descriptions": ["open the drawer"]},
        ))
    obs[t_steps // 2].joint_velocities = np.zeros(7)  # a stopped keyframe

    with open(os.path.join(ep_dir, "low_dim_obs.pkl"), "wb") as f:
        pickle.dump(Demo(obs), f)
    with open(os.path.join(ep_dir, "variation_descriptions.pkl"), "wb") as f:
        pickle.dump(["open the drawer"], f)
    with open(os.path.join(ep_dir, "variation_number.pkl"), "wb") as f:
        pickle.dump(0, f)

    # nerf_data in the shared byte-identical layout
    for t in range(t_steps - 1):
        base = os.path.join(ep_dir, "nerf_data", str(t))
        for sub in ("images", "depths", "poses"):
            os.makedirs(os.path.join(base, sub), exist_ok=True)
        for v in range(nerf_views):
            Image.fromarray(rng.integers(0, 255, (h, w, 3),
                                         dtype=np.uint8)).save(
                os.path.join(base, "images", f"{v}.png"))
            Image.fromarray(rng.integers(0, 255, (h, w), dtype=np.uint8),
                            mode="L").save(
                os.path.join(base, "depths", f"{v}.png"))
            ep.write_camera_txt(os.path.join(base, "poses", f"{v}.txt"),
                                extr, intr)
    return np.stack(depths)


def test_depth_png_roundtrip():
    rng = np.random.default_rng(0)
    depth_m = rng.uniform(NEAR, FAR, (16, 16)).astype(np.float32)
    img = encode_depth_png((depth_m - NEAR) / (FAR - NEAR))
    path = "/tmp/_depth_rt.png"
    img.save(path)
    out = decode_depth_png(path, NEAR, FAR)
    # 24-bit fixed point over a 4.4 m range → ~2.6e-7 m quantization
    np.testing.assert_allclose(out, depth_m, atol=1e-5)


def test_unpickler_refuses_arbitrary_globals(tmp_path):
    from manigaussian_tpu.tools.import_rlbench import _RLBenchUnpickler
    p = tmp_path / "evil.pkl"
    with open(p, "wb") as f:
        pickle.dump(os.getcwd, f)  # any non-whitelisted callable
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        with open(p, "rb") as f:
            _RLBenchUnpickler(f).load()


def test_import_and_train_one_step(tmp_path):
    src = str(tmp_path / "ref")
    dst = str(tmp_path / "native")
    gt_depth = _write_reference_episode(src, "open_drawer", 0)
    n = import_task(src, dst, "open_drawer")
    assert n == 1

    # native episode loads; depth survived the PNG pack/unpack
    d = ep.load_episode(ep.list_episodes(dst, "open_drawer")[0])
    assert len(d) == 6
    got = ep.load_depth(d.depth_paths["front"][3])
    np.testing.assert_allclose(got, gt_depth[3], atol=1e-5)
    assert d.descriptions == ["open the drawer"]
    assert d.nerf_rgb_paths[0] is not None and len(d.nerf_rgb_paths[0]) == 2
    assert d.nerf_rgb_paths[5] is None  # last step has no nerf data

    # ...and feeds a real train step end-to-end
    import jax

    from manigaussian_tpu import config as C
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
    from manigaussian_tpu.data.language import create_language_model
    from manigaussian_tpu.data.pipeline import BatchIterator, fill_replay
    from manigaussian_tpu.data.replay import TaskUniformReplay

    cfg = C.micro_w_geo(("open_drawer",))
    lang = create_language_model("stub",
                                 cache_dir=str(tmp_path / "lang_cache"))
    replay = TaskUniformReplay(save_dir=None)
    cnt = fill_replay(replay, dst, "open_drawer", 1, ["front"],
                      cfg.rlbench.scene_bounds, cfg.method.voxel_sizes[0],
                      cfg.method.rotation_resolution,
                      cfg.rlbench.episode_length, lang)
    assert cnt > 0
    it = BatchIterator(replay, 1, seed=0,
                       num_view_for_nerf=cfg.method.num_view_for_nerf)
    batch = next(it)
    it.close()
    agent = ManiGaussianBCAgent(cfg)
    state = agent.init_state(jax.random.PRNGKey(0), batch, training=True,
                             lazy=True)
    _, metrics = jax.jit(agent.update)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
