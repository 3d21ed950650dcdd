"""Chained-slope timing (STATUS.md axon quirk) for the voxel U-Net and the
100^3 tail convs — the real cost of each w_geo step component.

Usage: timeout 900 python scripts/bench_unet_chain.py [--what unet,tail]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def slope_time(make_chain, lo, hi, repeats: int = 3):
    """Time make_chain(k) at k=lo and k=hi (min of `repeats` runs each);
    return per-iter slope seconds plus the raw samples."""
    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)  # warm-up / compile
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            samples.append(time.perf_counter() - t0)
        return min(samples), samples
    f_lo, args = make_chain(lo)
    f_hi, _ = make_chain(hi)
    t_lo, s_lo = timed(f_lo, *args)
    t_hi, s_hi = timed(f_hi, *args)
    print(json.dumps({"raw_samples": {"lo": [round(s * 1e3, 2) for s in s_lo],
                                      "hi": [round(s * 1e3, 2) for s in s_hi]}}),
          flush=True)
    return (t_hi - t_lo) / (hi - lo), t_lo, t_hi


def bench_unet():
    from manigaussian_tpu.models.unet3d import VoxelUNetShallow

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 100, 100, 100, 10),
                          jnp.float32)
    net = VoxelUNetShallow(dtype=jnp.bfloat16)
    v = net.init(jax.random.PRNGKey(1), x)

    def g(p, x):
        def loss(p, x):
            out, vox = net.apply(p, x)
            return (jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9
                    + jnp.sum(vox[1].astype(jnp.float32) ** 2) * 1e-9)
        return jax.grad(loss)(p, x)

    def make_chain(k):
        @jax.jit
        def f(p, x):
            def body(i, p):
                dp = g(p, x)
                return jax.tree.map(lambda a, b: a - 1e-6 * b, p, dp)
            return jax.lax.fori_loop(0, k, body, p)
        return f, (v, x)

    per, t_lo, t_hi = slope_time(make_chain, 2, 6)
    print(json.dumps({"exp": "unet100_chain", "fwd_bwd_ms": round(per * 1e3, 2),
                      "t_lo_ms": round(t_lo * 1e3, 1),
                      "t_hi_ms": round(t_hi * 1e3, 1)}), flush=True)


def bench_tail(impl):
    from manigaussian_tpu.models.blocks import Conv3DBlock

    # the two hot tail convs back-to-back: 256->128 then 128->128 at 100^3
    b1 = Conv3DBlock(128, 3, 1, "lrelu", dtype=jnp.bfloat16,
                     pad_mode="zero", impl=impl)
    b2 = Conv3DBlock(128, 3, 1, "lrelu", dtype=jnp.bfloat16,
                     pad_mode="zero", impl=impl)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 100, 100, 100, 256),
                          jnp.bfloat16)
    v1 = b1.init(jax.random.PRNGKey(1), x)
    v2 = b2.init(jax.random.PRNGKey(2),
                 jnp.zeros((1, 100, 100, 100, 128), jnp.bfloat16))

    def g(p1, p2, x):
        def loss(p1, p2, x):
            y = b2.apply(p2, b1.apply(p1, x).astype(jnp.bfloat16))
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-9
        return jax.grad(loss, argnums=(0, 1))(p1, p2, x)

    def make_chain(k):
        @jax.jit
        def f(p1, p2, x):
            def body(i, ps):
                p1, p2 = ps
                d1, d2 = g(p1, p2, x)
                return (jax.tree.map(lambda a, b: a - 1e-6 * b, p1, d1),
                        jax.tree.map(lambda a, b: a - 1e-6 * b, p2, d2))
            return jax.lax.fori_loop(0, k, body, (p1, p2))
        return f, (v1, v2, x)

    per, t_lo, t_hi = slope_time(make_chain, 2, 6)
    print(json.dumps({"exp": "tail_convs_chain", "impl": impl,
                      "fwd_bwd_ms": round(per * 1e3, 2),
                      "t_lo_ms": round(t_lo * 1e3, 1),
                      "t_hi_ms": round(t_hi * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="unet,tail")
    ap.add_argument("--impls", default="z2d")
    a = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    what = a.what.split(",")
    if "unet" in what:
        bench_unet()
    if "tail" in what:
        for impl in a.impls.split(","):
            bench_tail(impl)
