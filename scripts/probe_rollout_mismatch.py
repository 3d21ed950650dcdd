"""Probe the train/rollout mismatch: act() on the replay-assembled obs vs the
mock-env obs for the SAME (episode, t=0) state, with the trained checkpoint
from scripts/diagnose_learning.py. Prints field-by-field obs diffs and the
predicted vs expected action."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from scripts.diagnose_learning import micro_cfg
from manigaussian_tpu.agents.registry import create_agent
from manigaussian_tpu.data.language import create_language_model
from manigaussian_tpu.data.pipeline import assemble_batch, fill_replay
from manigaussian_tpu.data.replay import TaskUniformReplay
from manigaussian_tpu.envs.mock_env import MockEnvClient
from manigaussian_tpu.runners.eval_runner import make_state_skeleton
from manigaussian_tpu.utils.checkpoint import list_checkpoints, restore_checkpoint

work = "/tmp/diag_learning"
cfg = micro_cfg(["open_drawer"], 1200, 200)
demo_root = os.path.join(work, "demos")
logdir = os.path.join(work, "logs", "seed0")

lang = create_language_model(cfg.method.language_model,
                             cache_dir=os.path.join(logdir, "lang_cache"))
replay = TaskUniformReplay()
fill_replay(replay, demo_root, "open_drawer", cfg.rlbench.demos,
            cfg.rlbench.cameras, cfg.rlbench.scene_bounds,
            cfg.method.voxel_sizes[0], cfg.method.rotation_resolution,
            cfg.rlbench.episode_length, lang)

eval_cfg = dataclasses.replace(
    cfg, method=dataclasses.replace(cfg.method, use_neural_rendering=False))
agent = create_agent(eval_cfg)
skeleton = make_state_skeleton(cfg)
step = list_checkpoints(logdir)[-1]
state, _ = restore_checkpoint(logdir, skeleton, step=step)
act = agent.jit_act()
print(f"checkpoint step {step}")

env = MockEnvClient(demo_root, cameras=cfg.rlbench.cameras,
                    episode_length=cfg.rlbench.episode_length)
env.launch()
env.set_task("open_drawer")

rng = np.random.default_rng(0)
bounds = np.asarray(cfg.rlbench.scene_bounds)
vs = cfg.method.voxel_sizes[0]
res = (bounds[3:] - bounds[:3]) / vs
print("scene_bounds:", bounds, "voxel res (m):", res)

for e in range(2):
    obs = env.reset_to_demo(e)
    # find the replay transition for this episode at t=0, k=0
    # (episode e, first transition added = t=0, first keypoint)
    # replay stores in insertion order per task
    tr = None
    for i in range(replay.size("open_drawer")):
        cand = replay._get("open_drawer", i)
        if f"episode{e}" in str(cand["rgb_paths"][0]) and \
                abs(float(cand["low_dim_state"][-1]) - 1.0) < 1e-6:
            tr = cand
            break
    assert tr is not None
    batch = assemble_batch([tr], rng, load_nerf_targets=False)

    print(f"\n=== episode {e} ===")
    for k in ("rgb", "pcd", "low_dim_state"):
        a = batch[k][0]
        b_env = {"rgb": obs.rgb, "pcd": obs.pcd,
                 "low_dim_state": obs.low_dim_state}[k]
        d = np.abs(np.asarray(a) - np.asarray(b_env))
        print(f"  {k}: replay range [{np.min(a):.3f},{np.max(a):.3f}] "
              f"env range [{np.min(b_env):.3f},{np.max(b_env):.3f}] "
              f"maxdiff {np.max(d):.6f}")

    sent, toks = lang.encode(tr["lang_goal"])
    env_obs = {"rgb": obs.rgb[None], "pcd": obs.pcd[None],
               "low_dim_state": obs.low_dim_state[None],
               "lang_goal_emb": sent[None], "lang_token_embs": toks[None]}
    rep_obs = {k: batch[k] for k in ("rgb", "pcd", "low_dim_state",
                                     "lang_goal_emb", "lang_token_embs")}
    r_env = act(state.params, env_obs)
    r_rep = act(state.params, rep_obs)

    kp = env._keypoints[0]
    gt_pos = env._demo.gripper_pose[kp][:3]
    gt_grip = float(env._demo.gripper_open[kp])
    for name, r in (("replay-obs", r_rep), ("env-obs", r_env)):
        a = np.asarray(r.continuous_action[0])
        vox = np.asarray(r.trans_coords[0])
        print(f"  {name}: pred vox {vox} (label {tr['trans_action_indicies'][:3]}) "
              f"pred pos {a[:3]} gt pos {gt_pos} "
              f"|err| {np.linalg.norm(a[:3] - gt_pos):.4f} "
              f"grip {a[7]:.2f} gt_grip {gt_grip}")
    # what would the LABEL voxel decode to?
    lab = tr["trans_action_indicies"][:3]
    center = bounds[:3] + (lab + 0.5) * res
    print(f"  label-voxel center {center} |err to gt| "
          f"{np.linalg.norm(center - gt_pos):.4f} (pos_tol {env.pos_tol})")
    print(f"  stored continuous action: {tr['action'][:3]} grip {tr['action'][7]}")
env.shutdown()
