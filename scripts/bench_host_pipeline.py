"""Host input-pipeline throughput vs the device step rate (VERDICT r1 item 7).

Measures `assemble_batch` latency (PIL decode + depth unprojection + nerf
target selection + optional PCA embed) and `BatchIterator` end-to-end
batches/s on synthetic RLBench-layout demos at the flagship camera config.
The device consumes ~2.4 steps/s at batch 1 (scripts/profile_train_split.py):
the host pipeline must sustain more than that or training goes input-bound.

Runs host-only (CPU platform) — the jitted embed_fn is part of the host
pipeline's cost in production too (it shares the chip with the train step, but
the PCA is tiny; CPU timing is the conservative bound).
"""
import os, sys, time, json, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from manigaussian_tpu.data.synthetic import generate_task
from manigaussian_tpu.data.replay import TaskUniformReplay
from manigaussian_tpu.data.pipeline import BatchIterator, fill_replay
from manigaussian_tpu.data.language import create_language_model

H = W = 128          # flagship camera + nerf resolution
BOUNDS = [-0.3, -0.5, 0.6, 0.7, 0.5, 1.6]


def setup(root):
    for task in ["open_drawer", "close_jar"]:
        generate_task(root, task, num_episodes=2, timesteps=20, h=H, w=W,
                      nerf_views=5, nerf_hw=H)
    lang = create_language_model("stub", cache_dir=os.path.join(root, "lc"))
    replay = TaskUniformReplay(save_dir=None)
    n = 0
    for task in ["open_drawer", "close_jar"]:
        n += fill_replay(replay, root, task, 2, ["front"], BOUNDS, 100, 5,
                         25, lang)
    print(f"replay: {n} transitions", flush=True)
    return replay


def run(replay, batch_size, embed, n_batches=40):
    embed_fn = None
    if embed:
        import functools
        from manigaussian_tpu.models.foundation import (
            StubFeatureExtractor, extract_gt_embed)
        embed_fn = jax.jit(functools.partial(
            extract_gt_embed, extractor=StubFeatureExtractor(), d_embed=3))
    it = BatchIterator(replay, batch_size, seed=0, load_nerf_targets=True,
                       embed_fn=embed_fn)
    next(it)  # warm (compiles embed_fn, touches page cache)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = (time.perf_counter() - t0) / n_batches
    it.close()
    label = f"bs={batch_size} embed={embed}"
    print(f"{label:22s} {dt*1e3:8.1f} ms/batch  ({1/dt:6.2f} batches/s)",
          flush=True)
    return 1 / dt


with tempfile.TemporaryDirectory() as root:
    replay = setup(root)
    r1 = run(replay, 1, embed=False)
    r1e = run(replay, 1, embed=True)
    r8e = run(replay, 8, embed=True)
    print(json.dumps({
        "metric": "host_pipeline_batches_per_s",
        "bs1": round(r1, 2), "bs1_embed": round(r1e, 2),
        "bs8_embed": round(r8e, 2),
        "device_steps_per_s_ref": 2.4,
        "headroom_bs1": round(r1e / 2.4, 2),
    }), flush=True)
