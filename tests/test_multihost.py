"""Multi-host (multi-process) training smoke: two `train.py --dist` processes
over a 2-device CPU mesh must match a single-process 2-device run step for
step (VERDICT item 5; reference DDP launcher `train.py:86-129`).

Exercises the real CLI: jax.distributed.initialize rendezvous, per-process
replay fill, identical-global-batch assembly, make_array_from_callback
sharding, process-0-gated checkpoints/CSV.
"""

import csv
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "method.use_neural_rendering=false",
    "method.voxel_sizes=[20]",
    "method.num_latents=16", "method.latent_dim=32",
    "method.transformer_depth=1",
    "method.cross_dim_head=8", "method.latent_dim_head=8",
    "method.final_dim=16",
    "rlbench.camera_resolution=[16,16]", "rlbench.demos=1",
    "replay.batch_size=2", "replay.use_disk=false",
    "framework.training_iterations=4", "framework.log_freq=1",
    "framework.save_freq=100",
]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(args, timeout=420):
    return subprocess.run([sys.executable, "train.py"] + args, cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


def _losses(logdir):
    with open(os.path.join(logdir, "seed0", "train_data.csv")) as f:
        rows = list(csv.DictReader(f))
    return np.array([float(r["total_loss"]) for r in rows])


@pytest.mark.slow
def test_two_process_cpu_mesh_matches_single_process(tmp_path):
    demos = str(tmp_path / "demos")
    common = ["--variant", "w_geo", "--demo-root", demos, "--synthetic",
              "--mesh", "2"] + TINY

    # single-process reference: one process, 2 virtual CPU devices
    log1 = str(tmp_path / "single")
    r = _run(common + ["--cpu", "2", "--logdir", log1])
    assert r.returncode == 0, f"single-process run failed:\n{r.stderr[-3000:]}"
    ref = _losses(log1)
    assert ref.size == 4 and np.isfinite(ref).all()

    # two processes x 1 virtual CPU device each, same seed/config
    port = _free_port()
    log2 = str(tmp_path / "dist")
    procs = [subprocess.Popen(
        [sys.executable, "train.py"] + common +
        ["--cpu", "1", "--logdir", log2,
         "--dist", f"localhost:{port},2,{pid}"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"dist process failed:\n{out[-3000:]}"

    dist = _losses(log2)
    # same global batches, same replicated init, same collectives topology →
    # losses match the single-process run to float tolerance
    np.testing.assert_allclose(dist, ref, rtol=1e-4, atol=1e-5)

    # process-0 gating: exactly one CSV in the shared logdir
    csvs = [os.path.join(dp, f) for dp, _, fs in os.walk(log2)
            for f in fs if f.endswith(".csv")]
    assert len(csvs) == 1
