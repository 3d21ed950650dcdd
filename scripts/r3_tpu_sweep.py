"""Round-3 on-chip measurement sweep (run when the TPU tunnel is up).

One TPU process at a time (STATUS.md: concurrent TPU scripts hang) — this
script runs each experiment sequentially in ONE process and appends JSON rows
to R3_SWEEP.jsonl:

  1. renderer bench (bench.py workload) at the r2 best config — re-establish
     the driver-verifiable number (VERDICT r2 item 1);
  2. two-level duplication sweep over small_rect_cap (r2 backlog #2);
  3. the 100³ conv impls head-to-head: xla vs z2d vs pallas, fwd and fwd+bwd,
     at the two flagship shapes (final 256→128, up0 128→128);
  4. flagship w_geo train-step rate for the best conv impl.

Usage:  timeout 5400 python scripts/r3_tpu_sweep.py [--skip N,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "R3_SWEEP.jsonl"


def record(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def timeit(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_renderer():
    import jax
    import jax.numpy as jnp

    import bench as B
    from manigaussian_tpu.ops.rasterizer import RasterizeConfig, rasterize

    n, size = 65536, 128
    camera = B.make_camera(size)
    scene = B.make_scene(jax.random.PRNGKey(0), n)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (size, size, 3))

    def run(cfg):
        def loss(means, scales, rotations, opacities, shs, lang):
            out, _ = rasterize(means, opacities, camera, cfg, (0., 0., 0.),
                               scales=scales, rotations=rotations, shs=shs,
                               language_features=lang)
            return (jnp.sum((out.color - tgt) ** 2)
                    + jnp.sum(out.language_feature ** 2))
        step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
        dt = timeit(step, *scene, iters=30)
        return 1.0 / dt

    base = RasterizeConfig(width=size, height=size, tile=16,
                           max_tiles_per_gaussian=16, tile_capacity=8192,
                           chunk=512, sh_degree=1)
    r = run(base)
    record({"exp": "renderer_bench", "config": "r2_best",
            "renders_per_s": round(r, 2)})

    # two-level duplication sweep
    for s_cap in (2, 3, 4, 6):
        for m_cap in (4096, 8192):
            cfg = base._replace(small_rect_cap=s_cap, big_table_cap=m_cap)
            r2 = run(cfg)
            record({"exp": "two_level_dup", "small_rect_cap": s_cap,
                    "big_table_cap": m_cap, "renders_per_s": round(r2, 2),
                    "vs_single_level": round(r2 / r, 3)})


def bench_conv(impls, shapes):
    import jax
    import jax.numpy as jnp

    from manigaussian_tpu.models.blocks import Conv3DBlock

    for ci, co in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 100, 100, 100, ci),
                              jnp.bfloat16)
        for impl in impls:
            block = Conv3DBlock(co, 3, 1, "lrelu", dtype=jnp.bfloat16,
                                pad_mode="zero", impl=impl)

            fwd = jax.jit(lambda p, x, b=block: b.apply(p, x))
            try:
                v = block.init(jax.random.PRNGKey(1), x)
                t_f = timeit(fwd, v, x, iters=20)
            except Exception as e:  # noqa: BLE001 — report and continue
                record({"exp": "conv100", "ci": ci, "co": co, "impl": impl,
                        "error": f"fwd: {type(e).__name__}: {e}"[:300]})
                continue

            def loss(p, x, b=block):
                return jnp.sum(b.apply(p, x).astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss, argnums=(0, 1)))
            try:
                t_fb = timeit(g, v, x, iters=20)
            except Exception as e:  # noqa: BLE001
                record({"exp": "conv100", "ci": ci, "co": co, "impl": impl,
                        "fwd_ms": round(t_f * 1e3, 2),
                        "error": f"bwd: {type(e).__name__}: {e}"[:300]})
                continue
            record({"exp": "conv100", "ci": ci, "co": co, "impl": impl,
                    "fwd_ms": round(t_f * 1e3, 2),
                    "fwd_bwd_ms": round(t_fb * 1e3, 2)})


def bench_unet():
    """Whole voxel U-Net fwd+bwd at flagship dims (the tiny-channel stages run
    at 8-16 of 128 lanes — round-2 backlog; this pins the number before any
    channel-packing work)."""
    import jax
    import jax.numpy as jnp

    from manigaussian_tpu.models.unet3d import VoxelUNetShallow

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 100, 100, 100, 10),
                          jnp.float32)
    net = VoxelUNetShallow(dtype=jnp.bfloat16)
    v = net.init(jax.random.PRNGKey(1), x)

    fwd = jax.jit(lambda p, x: net.apply(p, x)[0])
    t_f = timeit(fwd, v, x, iters=20)

    def loss(p, x):
        out, _ = net.apply(p, x)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t_fb = timeit(g, v, x, iters=20)
    record({"exp": "unet100", "fwd_ms": round(t_f * 1e3, 2),
            "fwd_bwd_ms": round(t_fb * 1e3, 2)})


def bench_train_step(conv_impl: str):
    import dataclasses

    import jax

    import __graft_entry__ as ge
    from manigaussian_tpu import config as C
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

    cfg = C.w_geo()
    cfg = dataclasses.replace(cfg, method=dataclasses.replace(
        cfg.method, policy_conv_impl=conv_impl))
    agent = ManiGaussianBCAgent(cfg)
    batch = ge._make_batch(jax.random.PRNGKey(0), b=1, ncam=1, h=128, w=128,
                           img=128)
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True,
                             lazy=True)
    step = agent.jit_update(donate=False)
    _, m = step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    iters = 30
    for i in range(iters):
        _, m = step(state, batch, jax.random.PRNGKey(3 + i))
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / iters
    record({"exp": "w_geo_train_step", "conv_impl": conv_impl,
            "steps_per_s": round(1.0 / dt, 3), "ms": round(dt * 1e3, 1)})


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip", default="", help="comma list: renderer,conv,unet,step")
    parser.add_argument("--step-impls", default="xla,z2d,pallas")
    parser.add_argument("--conv-impls", default="xla,z2d,pallas")
    parser.add_argument("--conv-shapes", default="256:128,128:128",
                        help="comma list of ci:co pairs")
    args = parser.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    print(f"devices: {jax.devices()}", flush=True)

    if "renderer" not in skip:
        bench_renderer()
    if "conv" not in skip:
        shapes = [tuple(int(v) for v in s.split(":"))
                  for s in args.conv_shapes.split(",")]
        bench_conv(args.conv_impls.split(","), shapes)
    if "unet" not in skip:
        try:
            bench_unet()
        except Exception as e:  # noqa: BLE001 — report and continue
            record({"exp": "unet100",
                    "error": f"{type(e).__name__}: {e}"[:300]})
    if "step" not in skip:
        for impl in args.step_impls.split(","):
            try:
                bench_train_step(impl)
            except Exception as e:  # noqa: BLE001 — report and continue
                record({"exp": "w_geo_train_step", "conv_impl": impl,
                        "error": f"{type(e).__name__}: {e}"[:300]})


if __name__ == "__main__":
    main()
