"""Round-5 on-chip measurement sweep (VERDICT r4 items 4, 5, 6).

One TPU process at a time (STATUS.md). Appends JSON rows to R5_SWEEP.jsonl:

  1. `tiers`   — re-measure the 4-variant tier table AFTER the fused
     soft-argmax landed (fc52ba5 affects every tier; the committed r4 table
     mixed pre/post-fusion rows). Loop-of-30 direct timing (bench.py method —
     agrees with chained slope on this backend, STATUS.md).
  2. `renderer_cap` — renderer bench at tile_capacity 8192 (the r4 headline,
     which silently drops ~500 splats in the fullest tiles) vs 12288 (the
     smallest overflow-free capacity) — pricing exactness.
  3. `xplane`  — device-time profile of the w_geo step and the renderer via
     jax.profiler + xprof hlo_stats: per-HLO attribution of the ~75 ms
     residual the r4 chained-slope breakdown couldn't name, device-time
     cross-check of the timing methodology, and an MFU figure.

Usage:  timeout 5400 python scripts/r5_tpu_sweep.py [--skip a,b,...]
        sections: tiers,renderer_cap,xplane
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache (same setup as train.py / __graft_entry__):
# the four flagship tier steps cost ~10 min each through the remote-compile
# tunnel; cache hits make re-runs near-instant.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

OUT = "R5_SWEEP.jsonl"
PROF_DIR = "/tmp/r5_prof"

# v5e peak: 197 TFLOP/s bf16, 394 TOP/s int8 (public spec). The policy step
# runs bf16 matmuls with fp32 accumulation; fp32-only ops halve the ceiling.
V5E_PEAK_BF16 = 197e12


def record(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def _make_flagship(tier="w_geo", conv_impl="z2d", unet_impl="packed"):
    import dataclasses

    import jax

    import __graft_entry__ as ge
    from manigaussian_tpu import config as C
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

    cfg = C.VARIANTS[tier]()
    cfg = dataclasses.replace(cfg, method=dataclasses.replace(
        cfg.method, policy_conv_impl=conv_impl, policy_unet_impl=unet_impl))
    agent = ManiGaussianBCAgent(cfg)
    batch = ge._make_batch(jax.random.PRNGKey(0), b=1, ncam=1, h=128, w=128,
                           img=128)
    if cfg.method.neural_renderer.foundation_model_name:
        batch["gt_embed"] = jax.random.normal(
            jax.random.PRNGKey(9), (1, 128, 128, 3)) * 0.1
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True,
                             lazy=True)
    return agent, state, batch


# ------------------------------------------------------------- 1. tier table
def bench_tiers():
    import jax

    for tier in ("w_geo", "w_geo_dyna", "w_geo_sem", "w_geo_sem_dyna"):
        agent, state, batch = _make_flagship(tier)
        step = agent.jit_update(donate=False)
        _, m = step(state, batch, jax.random.PRNGKey(2))
        jax.block_until_ready(m)
        iters = 30
        t0 = time.perf_counter()
        for i in range(iters):
            _, m = step(state, batch, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / iters
        record({"exp": "tier_step_post_fusion", "tier": tier,
                "conv_impl": "z2d", "unet_impl": "packed",
                "steps_per_s": round(1.0 / dt, 3), "ms": round(dt * 1e3, 1)})


# --------------------------------------------------- 2. renderer capacities
def bench_renderer_cap():
    import jax
    import jax.numpy as jnp

    import bench as B
    from manigaussian_tpu.ops.rasterizer import RasterizeConfig, rasterize

    n, size = 65536, 128
    camera = B.make_camera(size)
    scene = B.make_scene(jax.random.PRNGKey(0), n)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (size, size, 3))

    for cap in (8192, 12288):
        cfg = RasterizeConfig(width=size, height=size, tile=16,
                              max_tiles_per_gaussian=16, tile_capacity=cap,
                              chunk=512, sh_degree=1)

        def loss(means, scales, rotations, opacities, shs, lang):
            out, ex = rasterize(means, opacities, camera, cfg, (0., 0., 0.),
                                scales=scales, rotations=rotations, shs=shs,
                                language_features=lang)
            return (jnp.sum((out.color - tgt) ** 2)
                    + jnp.sum(out.language_feature ** 2))

        step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
        out = step(*scene)
        jax.block_until_ready(out)
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*scene)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        record({"exp": "renderer_cap", "tile_capacity": cap,
                "per_iter_ms": round(dt * 1e3, 2),
                "renders_per_s": round(1.0 / dt, 2)})


# ------------------------------------------------------------- 3. xplane
def _trace(label, fn, n=10):
    """Run fn n times under a jax.profiler trace; return the trace dir."""
    import jax

    d = os.path.join(PROF_DIR, label)
    os.makedirs(d, exist_ok=True)
    jax.profiler.start_trace(d)
    out = None
    for i in range(n):
        out = fn(i)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return d


def _find_xplanes(trace_dir):
    hits = []
    for root, _dirs, files in os.walk(trace_dir):
        hits.extend(os.path.join(root, f) for f in files
                    if f.endswith(".xplane.pb"))
    return hits


def _hlo_stats(trace_dir):
    """xplane → list of per-HLO rows (device time attribution)."""
    from xprof.convert import raw_to_tool_data

    paths = _find_xplanes(trace_dir)
    if not paths:
        return None, "no .xplane.pb produced"
    data, _ctype = raw_to_tool_data.xspace_to_tool_data(
        paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    raw = os.path.join(trace_dir, "hlo_stats.json")
    with open(raw, "w") as f:
        f.write(data)
    return json.loads(data), raw


def profile_xplane(n_steps=10):
    import jax

    # ---- w_geo full update
    agent, state, batch = _make_flagship("w_geo")
    step = agent.jit_update(donate=False)
    _, m = step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(m)

    def run(i):
        _, m = step(state, batch, jax.random.PRNGKey(3 + i))
        return m

    d = _trace("w_geo_step", run, n_steps)
    stats, src = _hlo_stats(d)
    record({"exp": "xplane", "target": "w_geo_step", "n_steps": n_steps,
            "raw": src if stats is None else src,
            "ok": stats is not None})

    # ---- renderer
    import jax.numpy as jnp

    import bench as B
    from manigaussian_tpu.ops.rasterizer import RasterizeConfig, rasterize
    camera = B.make_camera(128)
    scene = B.make_scene(jax.random.PRNGKey(0), 65536)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (128, 128, 3))
    rcfg = RasterizeConfig(width=128, height=128, tile=16,
                           max_tiles_per_gaussian=16, tile_capacity=8192,
                           chunk=512, sh_degree=1)

    def rloss(means, scales, rotations, opacities, shs, lang):
        out, _ = rasterize(means, opacities, camera, rcfg, (0., 0., 0.),
                           scales=scales, rotations=rotations, shs=shs,
                           language_features=lang)
        return (jnp.sum((out.color - tgt) ** 2)
                + jnp.sum(out.language_feature ** 2))

    rstep = jax.jit(jax.grad(rloss, argnums=(0, 1, 2, 3, 4, 5)))
    out = rstep(*scene)
    jax.block_until_ready(out)
    d2 = _trace("renderer", lambda i: rstep(*scene), 30)
    stats2, src2 = _hlo_stats(d2)
    record({"exp": "xplane", "target": "renderer", "n_steps": 30,
            "raw": src2, "ok": stats2 is not None})

    # ---- FLOPs for MFU (compiled cost analysis; may be unavailable remotely)
    try:
        lowered = jax.jit(agent.update).lower(state, batch,
                                              jax.random.PRNGKey(0))
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        record({"exp": "cost_analysis", "target": "w_geo_step",
                "flops": flops,
                "mfu_note": "MFU = flops / step_time / 197e12 (v5e bf16)"})
    except Exception as e:
        record({"exp": "cost_analysis", "target": "w_geo_step",
                "error": str(e)[:200]})


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip", default="")
    args = parser.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()
    if "tiers" not in skip:
        bench_tiers()
    if "renderer_cap" not in skip:
        bench_renderer_cap()
    if "xplane" not in skip:
        profile_xplane()


if __name__ == "__main__":
    main()
