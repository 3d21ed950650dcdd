"""Chained (fori_loop dependency) re-measure of one tier's full train step.

For tiers whose jitted executable hits the axon block_until_ready no-op quirk
(STATUS.md), loop-of-30 direct timing reports dispatch time only. This wraps
`k` agent.update calls in ONE jit via lax.fori_loop (each iteration feeds the
updated TrainState forward, so nothing can be elided) and reports the
two-point slope — the same method as scripts/probe_timing3.py.

Usage: python scripts/r4_tier_chained.py --tier w_geo_sem --unet-impl packed
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "R4_SWEEP.jsonl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="w_geo_sem")
    ap.add_argument("--conv-impl", default="z2d")
    ap.add_argument("--unet-impl", default="packed")
    ap.add_argument("--k", type=int, nargs=2, default=(2, 6))
    args = ap.parse_args()

    import jax

    import __graft_entry__ as ge
    from manigaussian_tpu import config as C
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

    print(f"devices: {jax.devices()}", flush=True)
    cfg = C.VARIANTS[args.tier]()
    cfg = dataclasses.replace(cfg, method=dataclasses.replace(
        cfg.method, policy_conv_impl=args.conv_impl,
        policy_unet_impl=args.unet_impl))
    agent = ManiGaussianBCAgent(cfg)
    batch = ge._make_batch(jax.random.PRNGKey(0), b=1, ncam=1, h=128, w=128,
                           img=128)
    if cfg.method.neural_renderer.foundation_model_name:
        batch["gt_embed"] = jax.random.normal(
            jax.random.PRNGKey(9), (1, 128, 128, 3)) * 0.1
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True,
                             lazy=True)

    def chain(k):
        @jax.jit
        def f(state, batch, key):
            def body(i, st):
                ks = jax.random.fold_in(key, i)
                st, _m = agent.update(st, batch, ks)
                return st
            return jax.lax.fori_loop(0, k, body, state)
        return f

    def timed_min(fn, reps=3):
        out = fn(state, batch, jax.random.PRNGKey(2))
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(state, batch, jax.random.PRNGKey(2))
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    k_lo, k_hi = args.k
    t_lo = timed_min(chain(k_lo))
    t_hi = timed_min(chain(k_hi))
    slope = (t_hi - t_lo) / (k_hi - k_lo)
    row = {"exp": "tier_step", "tier": args.tier, "conv_impl": args.conv_impl,
           "unet_impl": args.unet_impl,
           "method": f"chained(k={k_lo},{k_hi})",
           "t_lo_ms": round(t_lo * 1e3, 1), "t_hi_ms": round(t_hi * 1e3, 1),
           "steps_per_s": round(1.0 / slope, 3), "ms": round(slope * 1e3, 1)}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
