"""Benchmark: fwd+bwd differentiable Gaussian-splat renders/s on one chip.

Workload (BASELINE.md TPU target): 128×128 image, 65,536 Gaussians, SH degree 1,
RGB + 3-channel language features, full gradient to every Gaussian parameter —
the training-time inner loop of ManiGaussian's world model (the reference's CUDA
rasterizer has no published number; target ≥ 30 renders/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Hardened against remote-compile tunnel flaps (STATUS.md "Environment quirks"):
the TPU backend is reached through a local tunnel (127.0.0.1:8113) that can
drop, producing either an instant ``RuntimeError: Unable to initialize backend
'axon'`` or an indefinite hang during device probe. The parent process here
never imports jax: it polls the tunnel socket, then runs the real benchmark in
a subprocess under a timeout, retrying with backoff within a total budget.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

TARGET = 30.0  # renders/s/chip (BASELINE.json north star)

TUNNEL_ADDR = ("127.0.0.1", 8113)
TOTAL_BUDGET_S = float(os.environ.get("BENCH_RETRY_BUDGET_S", 1800.0))
# One attempt = compile (~5-9 min via remote compile, STATUS.md) + 30 timed
# iters; give it room but don't let a hang eat the whole budget.
ATTEMPT_TIMEOUT_S = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", 900.0))


def make_scene(key, n):
    """Shared synthetic-scene maker (also used by bench_scaling.py and the
    dryrun). jax imported lazily: the hardened parent process must never
    touch the backend."""
    import jax
    import jax.numpy as jnp
    ks = jax.random.split(key, 6)
    means = jax.random.uniform(ks[0], (n, 3), minval=-0.4, maxval=0.4) \
        + jnp.array([0.0, 0.0, 1.6])
    scales = jnp.exp(jax.random.uniform(
        ks[1], (n, 3), minval=jnp.log(0.002), maxval=jnp.log(0.02)))
    q = jax.random.normal(ks[2], (n, 4))
    rotations = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    opacities = jax.random.uniform(ks[3], (n,), minval=0.2, maxval=0.9)
    shs = jax.random.normal(ks[4], (n, 4, 3)) * 0.3
    lang = jax.random.normal(ks[5], (n, 3))
    return means, scales, rotations, opacities, shs, lang


def make_camera(size):
    import jax.numpy as jnp

    from manigaussian_tpu.ops import camera as cam
    intr = jnp.array([[float(size), 0.0, size / 2.0],
                      [0.0, float(size), size / 2.0],
                      [0.0, 0.0, 1.0]])
    c2w = jnp.eye(4)
    return cam.novel_camera_calib(intr, c2w, 0.1, 4.0, size, size)


def _benchmark() -> None:
    """The actual benchmark; runs in a subprocess (see main)."""
    import jax
    import jax.numpy as jnp

    from manigaussian_tpu.ops.rasterizer import RasterizeConfig, rasterize

    n, size = 65536, 128
    camera = make_camera(size)
    # chunk=512 measured best on v5e (sweep: 128/256/512/1024 -> 59/66/68/65
    # renders/s); capacities cover the 65k-gaussian workload (524 of 2.1M
    # binned splats overflow at K=8192 -- reported, not silent)
    cfg = RasterizeConfig(width=size, height=size, tile=16,
                          max_tiles_per_gaussian=16, tile_capacity=8192,
                          chunk=512, sh_degree=1)
    scene = make_scene(jax.random.PRNGKey(0), n)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (size, size, 3))

    def loss(means, scales, rotations, opacities, shs, lang):
        out, _ = rasterize(means, opacities, camera, cfg, (0.0, 0.0, 0.0),
                           scales=scales, rotations=rotations, shs=shs,
                           language_features=lang)
        return (jnp.sum((out.color - tgt) ** 2)
                + jnp.sum(out.language_feature ** 2))

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))

    # warmup / compile
    g = step(*scene)
    jax.block_until_ready(g)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(*scene)
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0

    renders_per_s = iters / dt
    print(json.dumps({
        "metric": "fwd_bwd_renders_per_s_per_chip_128px_65k",
        "value": round(renders_per_s, 3),
        "unit": "renders/s",
        "vs_baseline": round(renders_per_s / TARGET, 3),
    }))


def _tunnel_open(timeout: float = 3.0) -> bool:
    try:
        with socket.create_connection(TUNNEL_ADDR, timeout=timeout):
            return True
    except OSError:
        return False


def main() -> int:
    if os.environ.get("JAX_PLATFORMS", "axon") != "axon":
        # CPU / explicit-platform run (tests, local debugging): no tunnel
        # involved, run inline.
        _benchmark()
        return 0

    deadline = time.monotonic() + TOTAL_BUDGET_S
    attempt = 0
    last_err = "no attempt made"
    while time.monotonic() < deadline:
        if not _tunnel_open():
            attempt += 1
            wait = min(30.0, 2.0 * attempt)
            print(f"bench: tunnel {TUNNEL_ADDR} closed, retry in {wait:.0f}s "
                  f"(budget {deadline - time.monotonic():.0f}s left)",
                  file=sys.stderr)
            time.sleep(wait)
            continue
        attempt += 1
        remaining = deadline - time.monotonic()
        budget = min(ATTEMPT_TIMEOUT_S, max(60.0, remaining))
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--run"],
                timeout=budget, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            last_err = f"attempt {attempt}: hang (> {budget:.0f}s)"
            print(f"bench: {last_err}", file=sys.stderr)
            continue
        if proc.returncode == 0 and proc.stdout.strip():
            # forward only the final JSON line
            print(proc.stdout.strip().splitlines()[-1])
            return 0
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-8:]
        last_err = f"attempt {attempt}: rc={proc.returncode}: " + " | ".join(tail)
        print(f"bench: {last_err}", file=sys.stderr)
        time.sleep(min(60.0, 10.0 * attempt))
    print(f"bench: FAILED after {attempt} attempts within "
          f"{TOTAL_BUDGET_S:.0f}s budget; last error: {last_err}",
          file=sys.stderr)
    return 1


if __name__ == "__main__":
    if "--run" in sys.argv:
        _benchmark()
    else:
        sys.exit(main())
