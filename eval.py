"""Eval entry point.

Parity target: reference `eval.py:33-266`: reload the saved train config from
the log dir, suppress neural rendering at eval time, select checkpoints
(missing / best / last / <int>), roll out eval_episodes per task, append
eval_data.csv. Env backend: --env mock replays stored demos (CI /
simulator-free); --env rlbench drives CoppeliaSim when installed.

Usage:
    python eval.py --logdir logs/run/seed0 --demo-root /data/demos \
        --eval-type last --episodes 25
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", required=True)
    parser.add_argument("--demo-root", required=True)
    parser.add_argument("--env", default="mock", choices=["mock", "rlbench"])
    parser.add_argument("--eval-type", default="last",
                        help="missing | best | last | <int checkpoint>")
    parser.add_argument("--episodes", type=int, default=25)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from manigaussian_tpu.utils.config_io import (from_dict, load_saved_config,
                                                  parse_overrides)
    cfg = load_saved_config(args.logdir)
    if args.overrides:
        cfg = from_dict(parse_overrides(args.overrides), cfg)
    # eval suppresses neural rendering (eval.py:55-57)
    cfg = dataclasses.replace(
        cfg, method=dataclasses.replace(cfg.method, use_neural_rendering=False))

    import jax
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
    from manigaussian_tpu.data.language import create_language_model
    from manigaussian_tpu.runners.eval_runner import run_eval

    agent = ManiGaussianBCAgent(cfg)
    lang = create_language_model(cfg.method.language_model,
                                 cache_dir=os.path.join(args.logdir,
                                                        "lang_cache"))

    if args.env == "mock":
        from manigaussian_tpu.envs.mock_env import MockEnvClient
        env = MockEnvClient(args.demo_root, cameras=cfg.rlbench.cameras,
                            episode_length=cfg.rlbench.episode_length)
    else:
        from manigaussian_tpu.envs.rlbench_env import RLBenchEnvClient
        env = RLBenchEnvClient(args.demo_root, cameras=cfg.rlbench.cameras,
                               episode_length=cfg.rlbench.episode_length)

    # a state skeleton for checkpoint restore: shapes from a dummy batch
    h, w = cfg.rlbench.camera_resolution
    import jax.numpy as jnp
    ncam = len(cfg.rlbench.cameras)
    img = cfg.method.neural_renderer.image_height
    dummy = {
        "rgb": jnp.zeros((1, ncam, h, w, 3)),
        "pcd": jnp.zeros((1, ncam, h, w, 3)),
        "low_dim_state": jnp.zeros((1, 4)),
        "lang_goal_emb": jnp.zeros((1, 1024)),
        "lang_token_embs": jnp.zeros((1, 77, cfg.method.language_model_dim)),
    }
    # training=True so the restored tree includes optimizer state
    state_like = jax.device_get(ManiGaussianBCAgent(
        dataclasses.replace(cfg, method=dataclasses.replace(
            cfg.method, use_neural_rendering=True))).init_state(
        jax.random.PRNGKey(0), _train_like_batch(dummy, img), training=True))

    eval_type = (int(args.eval_type) if args.eval_type.isdigit()
                 else args.eval_type)
    rows = run_eval(agent, args.logdir, env, cfg.rlbench.tasks,
                    eval_type=eval_type, eval_episodes=args.episodes,
                    episode_length=cfg.rlbench.episode_length,
                    lang_model=lang, state_like=state_like)
    for r in rows:
        print(r)


def _train_like_batch(dummy, img):
    import jax.numpy as jnp
    out = dict(dummy)
    out.update(
        nerf_target_rgb=jnp.zeros((1, img, img, 3)),
        nerf_target_pose=jnp.tile(jnp.eye(4), (1, 1, 1)),
        nerf_target_intrinsic=jnp.tile(
            jnp.array([[float(img), 0, img / 2], [0, float(img), img / 2],
                       [0, 0, 1.0]]), (1, 1, 1)),
        nerf_next_target_rgb=jnp.zeros((1, img, img, 3)),
        nerf_next_target_pose=jnp.tile(jnp.eye(4), (1, 1, 1)),
        nerf_next_target_intrinsic=jnp.tile(
            jnp.array([[float(img), 0, img / 2], [0, float(img), img / 2],
                       [0, 0, 1.0]]), (1, 1, 1)),
        action=jnp.zeros((1, 8)))
    return out


if __name__ == "__main__":
    main()
