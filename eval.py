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
    parser.add_argument("--env", default="mock",
                        help="mock | rlbench | rpc://HOST:PORT (simulator on "
                             "a separate host, scripts/sim_host_server.py) | "
                             "transcript://PATH.jsonl (recorded-session "
                             "conformance replay, envs/transcript.py)")
    parser.add_argument("--eval-type", default="last",
                        help="missing | best | last | <int checkpoint>")
    parser.add_argument("--episodes", type=int, default=25)
    parser.add_argument("--episode-offset", type=int, default=0,
                        help="start rollouts at this stored-episode index — "
                             "held-out eval on episodes the replay fill never "
                             "saw (train on 0..demos-1, eval from demos up)")
    parser.add_argument("--episode-length", type=int, default=25,
                        help="max steps per rollout (reference conf/eval.yaml"
                             ":9 uses 25; training config default is 15)")
    parser.add_argument("--workers", type=int, default=1,
                        help="evaluate checkpoints in this many parallel "
                             "subprocesses (reference eval.py:154-172)")
    parser.add_argument("--record-every-n", type=int, default=0,
                        help="save a GIF of every n-th eval episode under "
                             "<logdir>/videos (cinematic recorder analog, "
                             "reference conf/eval.yaml:40-49; 0 = off)")
    parser.add_argument("--cpu", type=int, default=0, metavar="N",
                        help="force the CPU platform with N virtual devices")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/root/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    from manigaussian_tpu.utils.config_io import (from_dict, load_saved_config,
                                                  parse_overrides)
    cfg = load_saved_config(args.logdir)
    if args.overrides:
        cfg = from_dict(parse_overrides(args.overrides), cfg)
    # eval suppresses neural rendering (eval.py:55-57); eval rollouts use the
    # eval-config episode_length (25), not the training one (15)
    cfg = dataclasses.replace(
        cfg,
        method=dataclasses.replace(cfg.method, use_neural_rendering=False),
        rlbench=dataclasses.replace(cfg.rlbench,
                                    episode_length=args.episode_length))

    eval_type = (int(args.eval_type) if args.eval_type.isdigit()
                 else args.eval_type)

    if args.workers > 1:
        from manigaussian_tpu.runners.eval_runner import run_eval_parallel
        rows = run_eval_parallel(
            cfg, args.logdir, args.demo_root, args.env,
            eval_type=eval_type, eval_episodes=args.episodes,
            num_workers=args.workers,
            platform="cpu" if args.cpu else None,
            episode_offset=args.episode_offset)
        for r in rows:
            print(r)
        return

    from manigaussian_tpu.agents.registry import create_agent
    from manigaussian_tpu.data.language import create_language_model
    from manigaussian_tpu.runners.eval_runner import (make_env,
                                                      make_state_skeleton,
                                                      run_eval)

    agent = create_agent(cfg)
    lang = create_language_model(cfg.method.language_model,
                                 cache_dir=os.path.join(args.logdir,
                                                        "lang_cache"))
    env = make_env(cfg, args.demo_root, args.env)
    state_like = make_state_skeleton(cfg)

    rows = run_eval(agent, args.logdir, env, cfg.rlbench.tasks,
                    eval_type=eval_type, eval_episodes=args.episodes,
                    episode_length=cfg.rlbench.episode_length,
                    lang_model=lang, state_like=state_like,
                    record_every_n=args.record_every_n,
                    episode_offset=args.episode_offset)
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
