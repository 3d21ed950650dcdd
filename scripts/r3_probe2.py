"""Round-3 follow-up probe (run after r3_tpu_sweep):

  A. Re-time conv100 (128->128) and the U-Net with anti-caching timing
     (per-iteration input perturbation + per-call block): the first sweep
     reported 0.04-0.28 ms, which is below the HBM roofline and therefore an
     artifact (suspected remote-runtime result caching of identical
     (executable, inputs) executions).
  B. Mosaic-compile + parity + timing for the fixed Pallas conv kernel
     (padded-W sublane alignment + roll-based ox taps).

Appends rows to R3_SWEEP.jsonl. One TPU process at a time.
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


def timeit_varied(make_args, fn, iters=10):
    """Robust device timing: every call gets a DIFFERENT input (defeats any
    result caching keyed on (executable, inputs)) and is individually blocked
    (defeats lazy/elided execution). Returns median seconds/call."""
    import jax
    jax.block_until_ready(fn(*make_args(0)))  # compile + warmup
    ts = []
    for i in range(1, iters + 1):
        args = make_args(i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def probe_conv(impls, shapes):
    import jax
    import jax.numpy as jnp

    from manigaussian_tpu.models.blocks import Conv3DBlock

    for ci, co in shapes:
        x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 100, 100, 100, ci),
                               jnp.bfloat16)

        for impl in impls:
            block = Conv3DBlock(co, 3, 1, "lrelu", dtype=jnp.bfloat16,
                                pad_mode="zero", impl=impl)
            add = jax.jit(lambda x, i: x + jnp.bfloat16(i) * 1e-6)
            make_args = lambda i: (v, add(x0, i))  # noqa: B023

            fwd = jax.jit(lambda p, x, b=block: b.apply(p, x))
            try:
                v = block.init(jax.random.PRNGKey(1), x0)
                t_f = timeit_varied(make_args, fwd)
            except Exception as e:  # noqa: BLE001
                record({"exp": "conv100_v2", "ci": ci, "co": co, "impl": impl,
                        "error": f"fwd: {type(e).__name__}: {e}"[:300]})
                continue

            def loss(p, x, b=block):
                return jnp.sum(b.apply(p, x).astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss, argnums=(0, 1)))
            try:
                t_fb = timeit_varied(make_args, g)
            except Exception as e:  # noqa: BLE001
                record({"exp": "conv100_v2", "ci": ci, "co": co, "impl": impl,
                        "fwd_ms": round(t_f * 1e3, 2),
                        "error": f"bwd: {type(e).__name__}: {e}"[:300]})
                continue
            record({"exp": "conv100_v2", "ci": ci, "co": co, "impl": impl,
                    "fwd_ms": round(t_f * 1e3, 2),
                    "fwd_bwd_ms": round(t_fb * 1e3, 2)})


def probe_pallas_parity():
    """On-chip numerical parity of the fixed Pallas kernel vs lax conv at a
    reduced shape (fast compile), fwd + dx + dW."""
    import jax
    import jax.numpy as jnp

    from manigaussian_tpu.ops.pallas_conv import conv3d_same

    d = h = w = 20
    ci, co = 256, 128
    kx, kw, kg = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.normal(kx, (d, h, w, ci), jnp.bfloat16)
    wgt = jax.random.normal(kw, (3, 3, 3, ci, co), jnp.bfloat16) * 0.05

    def ref(x, wgt):
        return jax.lax.conv_general_dilated(
            x[None].astype(jnp.float32), wgt.astype(jnp.float32),
            (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]

    g = jax.random.normal(kg, (d, h, w, co), jnp.float32)

    def loss_p(x, wgt):
        return jnp.sum(conv3d_same(x, wgt) * g)

    def loss_r(x, wgt):
        return jnp.sum(ref(x, wgt) * g)

    try:
        y_p = jax.jit(conv3d_same)(x, wgt)
        y_r = jax.jit(ref)(x, wgt)
        dx_p, dw_p = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(x, wgt)
        dx_r, dw_r = jax.jit(jax.grad(loss_r, argnums=(0, 1)))(x, wgt)
        err_y = float(jnp.max(jnp.abs(y_p - y_r)) / (jnp.max(jnp.abs(y_r)) + 1e-9))
        err_dx = float(jnp.max(jnp.abs(dx_p.astype(jnp.float32) - dx_r.astype(jnp.float32)))
                       / (jnp.max(jnp.abs(dx_r.astype(jnp.float32))) + 1e-9))
        err_dw = float(jnp.max(jnp.abs(dw_p.astype(jnp.float32) - dw_r.astype(jnp.float32)))
                       / (jnp.max(jnp.abs(dw_r.astype(jnp.float32))) + 1e-9))
        record({"exp": "pallas_conv_parity_onchip", "rel_err_y": err_y,
                "rel_err_dx": err_dx, "rel_err_dw": err_dw,
                "ok": bool(err_y < 2e-2 and err_dx < 2e-2 and err_dw < 2e-2)})
    except Exception as e:  # noqa: BLE001
        record({"exp": "pallas_conv_parity_onchip",
                "error": f"{type(e).__name__}: {e}"[:400]})


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip", default="", help="comma list: parity,conv")
    parser.add_argument("--conv-impls", default="xla,z2d,pallas")
    parser.add_argument("--conv-shapes", default="256:128,128:128")
    args = parser.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    print(f"devices: {jax.devices()}", flush=True)

    if "parity" not in skip:
        probe_pallas_parity()
    if "conv" not in skip:
        shapes = [tuple(int(v) for v in s.split(":"))
                  for s in args.conv_shapes.split(",")]
        probe_conv(args.conv_impls.split(","), shapes)


if __name__ == "__main__":
    main()
