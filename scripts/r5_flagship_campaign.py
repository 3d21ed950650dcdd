"""Flagship-shape training campaign on the real chip (VERDICT r4 item 1).

Everything at the flagship configuration (voxel 100^3, 128^2 camera + nerf
views, 65k Gaussians) had only ever executed as isolated benchmark steps on
random inputs. This script runs the WHOLE system together at those shapes —
data pipeline, kernels, model, checkpointing — for a real training campaign,
and commits the evidence:

  1. `gen`   — multi-task synthetic dataset at flagship resolution (ray-cast
     consistent scenes, data/synthetic.py): 128^2 front camera, 21 nerf ring
     views at 128^2 per frame, 20 episodes x 3 tasks. Reference analog:
     `tools/nerf_dataset_generator.py` demos consumed by train.py
     (README.md:48-61).
  2. `feed`  — host input-pipeline feed rate at these shapes: can
     BatchIterator sustain the ~5 steps/s the device consumes? (The reference
     chokes exactly here: per-step PIL loads + nerf-view sampling inside
     qattention_manigaussian_bc_agent.py:680-739.)
  3. `train` — the campaign itself via the production train path
     (train._run_seed -> OfflineTrainRunner): w_geo for >=10k iterations and
     w_geo_sem_dyna for >=3k (real SD-VAE compute path,
     foundation_checkpoint='random-init'), logging loss/PSNR curves, recon
     panels every 1000 steps, overflow counters, rolling Orbax checkpoints.
  4. `collect` — artifact dir (results/flagship_campaign/<variant>/): train
     curves CSV, recon panels, config, and a summary.json with NaN counts,
     PSNR trajectory, overflow stats, steps/s, and the feed-rate margin.

One TPU process at a time (STATUS.md): do not run while another chip job is
live. Dataset + logs live under --work (default /tmp/flagship_campaign);
only the small artifact lands in the repo.

Usage:
    timeout 4500 python scripts/r5_flagship_campaign.py --variant w_geo \
        --iters 10010
    timeout 3600 python scripts/r5_flagship_campaign.py \
        --variant w_geo_sem_dyna --iters 3010
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TASKS = ["open_drawer", "turn_tap", "push_buttons"]
WORK = "/tmp/flagship_campaign"
OUT = "results/flagship_campaign"

# flagship data shapes (conf parity: rlbench.camera_resolution 128^2,
# num_view_for_nerf 21, demos 20)
H = W = 128
NERF_VIEWS = 21
TIMESTEPS = 20
DEMOS = 20


def gen_dataset(demo_root: str, demos: int = DEMOS) -> float:
    from manigaussian_tpu.data.synthetic import generate_task
    t0 = time.perf_counter()
    for i, task in enumerate(TASKS):
        if os.path.isdir(os.path.join(demo_root, task)):
            continue
        generate_task(demo_root, task, num_episodes=demos,
                      timesteps=TIMESTEPS, h=H, w=W,
                      nerf_views=NERF_VIEWS, nerf_hw=H, seed=i)
        print(f"[gen] {task}: {demos} episodes", flush=True)
    return time.perf_counter() - t0


def build_cfg(variant: str, iters: int, resume: bool = False):
    from manigaussian_tpu.utils.config_io import load_config
    overrides = (["framework.load_existing_weights=true"] if resume else []) + [
        f"rlbench.tasks=[{','.join(TASKS)}]",
        f"rlbench.demos={DEMOS}",
        f"framework.training_iterations={iters}",
        "framework.log_freq=50",
        "framework.save_freq=2500",
        "framework.num_weights_to_keep=8",
        "method.neural_renderer.render_freq=1000",
        f"replay.path={WORK}/replay_{variant}",
    ]
    if variant in ("w_geo_sem", "w_geo_sem_dyna"):
        # real Flax AutoencoderKL compute path (random init, zero-egress env)
        overrides.append(
            "method.neural_renderer.foundation_checkpoint=random-init")
    return load_config(None, overrides, variant=variant)


def measure_feed_rate(cfg, demo_root: str, n_batches: int = 40) -> dict:
    """Host-side BatchIterator throughput at flagship shapes (no device)."""
    from manigaussian_tpu.data.language import create_language_model
    from manigaussian_tpu.data.pipeline import BatchIterator, fill_replay
    from manigaussian_tpu.data.replay import TaskUniformReplay

    lang = create_language_model(
        cfg.method.language_model, cache_dir=os.path.join(WORK, "lang_cache"))
    replay = TaskUniformReplay(save_dir=None)
    n = 0
    for task in cfg.rlbench.tasks:
        n += fill_replay(
            replay, demo_root, task, cfg.rlbench.demos, cfg.rlbench.cameras,
            cfg.rlbench.scene_bounds, cfg.method.voxel_sizes[0],
            cfg.method.rotation_resolution, cfg.rlbench.episode_length, lang,
            demo_augmentation=cfg.method.demo_augmentation,
            demo_augmentation_every_n=cfg.method.demo_augmentation_every_n,
            keypoint_method=cfg.method.keypoint_method)
    it = BatchIterator(replay, cfg.replay.batch_size, seed=0,
                       num_view_for_nerf=cfg.method.num_view_for_nerf,
                       load_nerf_targets=True)
    next(it)  # warm (thread started, first assemble done)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    it.close()
    rate = n_batches / dt
    print(f"[feed] {n} transitions; {rate:.1f} batches/s "
          f"({dt / n_batches * 1e3:.1f} ms/batch) at batch "
          f"{cfg.replay.batch_size}", flush=True)
    return {"transitions": n, "batches_per_s": round(rate, 2),
            "ms_per_batch": round(dt / n_batches * 1e3, 2),
            "batch_size": cfg.replay.batch_size}


def train(cfg, variant: str, demo_root: str) -> str:
    import train as train_cli
    logdir_root = os.path.join(WORK, "logs", variant)
    args = argparse.Namespace(dist=None, synthetic=False, demo_root=demo_root,
                              logdir=logdir_root, mesh=0, mesh_tile=0)
    train_cli._run_seed(args, cfg, 0)
    return os.path.join(logdir_root, "seed0")


def collect(variant: str, logdir: str, feed: dict, gen_s: float,
            wall_s: float) -> dict:
    import pandas as pd
    out = os.path.join(OUT, variant)
    os.makedirs(out, exist_ok=True)

    train_csv = os.path.join(logdir, "train_data.csv")
    out_csv = os.path.join(out, "train.csv")
    if os.path.exists(out_csv):
        # resumed runs log a FRESH train_data.csv from their start iteration
        # (MetricLogger rewrites); merge with the previously collected
        # segment so the artifact keeps the whole curve
        old = pd.read_csv(out_csv)
        new = pd.read_csv(train_csv)
        pd.concat([old[~old.step.isin(new.step)], new]) \
            .sort_values("step").to_csv(out_csv, index=False)
    else:
        shutil.copyfile(train_csv, out_csv)
    for p in (os.path.join(logdir, "config.json"),):
        if os.path.exists(p):
            shutil.copyfile(p, os.path.join(out, "config.json"))
    panels = sorted(glob.glob(os.path.join(logdir, "recon", "*.png")),
                    key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))
    # keep first / middle / last panels (artifact stays small)
    keep = {0, len(panels) // 2, len(panels) - 1} if panels else set()
    for idx in sorted(keep):
        shutil.copyfile(panels[idx],
                        os.path.join(out, os.path.basename(panels[idx])))

    df = pd.read_csv(out_csv)   # merged curve (all resume segments)
    num = df.select_dtypes("number")
    loss_cols = [c for c in df.columns if c.endswith("_loss")]
    tail = df.tail(max(3, len(df) // 10))
    head = df.head(max(3, len(df) // 10))
    summary = {
        "variant": variant,
        "iterations": int(df["step"].iloc[-1]) + 1,
        "logged_rows": len(df),
        "nonfinite_cells": int((~np.isfinite(num.to_numpy(dtype=float))).sum()),
        "steps_per_s_median": round(float(
            df["steps_per_s"].iloc[1:].median()), 3),
        "gen_dataset_s": round(gen_s, 1),
        "train_wall_s": round(wall_s, 1),
        "feed": feed,
        "losses_first_decile_mean": {c: round(float(head[c].mean()), 5)
                                     for c in loss_cols},
        "losses_last_decile_mean": {c: round(float(tail[c].mean()), 5)
                                    for c in loss_cols},
    }
    if "psnr" in df.columns:
        summary["psnr_first"] = round(float(df["psnr"].iloc[0]), 2)
        summary["psnr_first_decile_mean"] = round(float(head["psnr"].mean()), 2)
        summary["psnr_last_decile_mean"] = round(float(tail["psnr"].mean()), 2)
        summary["psnr_max"] = round(float(df["psnr"].max()), 2)
    for c in ("overflow_splats", "overflow_gaussians"):
        if c in df.columns:
            summary[c + "_max"] = float(df[c].max())
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return summary


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", default="w_geo")
    parser.add_argument("--iters", type=int, default=10010)
    parser.add_argument("--skip-feed", action="store_true")
    parser.add_argument("--demos", type=int, default=DEMOS)
    parser.add_argument("--resume", action="store_true",
                        help="continue a previous campaign run from its last "
                             "checkpoint (framework.load_existing_weights)")
    args = parser.parse_args()

    os.makedirs(WORK, exist_ok=True)
    demo_root = os.path.join(WORK, "demos")
    gen_s = gen_dataset(demo_root, args.demos)

    cfg = build_cfg(args.variant, args.iters, resume=args.resume)
    feed = {} if args.skip_feed else measure_feed_rate(cfg, demo_root)

    t0 = time.perf_counter()
    logdir = train(cfg, args.variant, demo_root)
    wall_s = time.perf_counter() - t0
    collect(args.variant, logdir, feed, gen_s, wall_s)
    sys.stdout.flush()
    sys.stderr.flush()
    # the axon plugin's C++ teardown aborts the interpreter on exit in this
    # environment ("terminate called ... FATAL: exception not rethrown"),
    # turning a fully-successful campaign into rc!=0; all artifacts are
    # already on disk — skip the destructors.
    os._exit(0)


if __name__ == "__main__":
    main()
