"""Minimize the pallas_conv dW Mosaic remote-compile failure (VERDICT r3 #5).

R3 symptom: `impl='pallas'` fwd compiles on chip; the dW backward kernel dies
in remote compile with `MosaicError: INTERNAL: HTTP 500: tpu_compile_helper
subprocess exit code 1` and no diagnostic. Suspects: the 27-row VMEM
accumulator output block, the 27 separate `dw_ref[o] +=` read-modify-writes
per grid step, grid-wide accumulation via @pl.when init.

This script compiles ONLY the dW kernel (and variants) at escalating shapes,
one subprocess per case with a timeout so a compiler hang can't wedge the
sweep, and appends verdict rows to R4_SWEEP.jsonl.

Variants:
  asis     — _conv3d_dw as shipped (27 RMWs into dw_ref)
  stacked  — ONE RMW per grid step: contributions stacked to (27, ci, co)
  scratch  — accumulate into VMEM scratch, copy to dw_ref on the last step

Usage: python scripts/r4_pallas_dw_repro.py            # orchestrates
       python scripts/r4_pallas_dw_repro.py --case v:d:h:w:ci:co  # one case
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "R4_SWEEP.jsonl"


def record(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


# ---------------------------------------------------------------- variants
def _dw_kernel_stacked(xp_hbm, dy_ref, dw_ref, xbuf, sem, *, bd, bh, wp, ci,
                       co):
    """Single read-modify-write per grid step: stack the 27 contributions."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from manigaussian_tpu.ops.pallas_conv import _roll_rows

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dma = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(i * bd, bd + 2), pl.ds(j * bh, bh + 2)], xbuf, sem)
    dma.start()
    dma.wait()
    m = bd * bh * wp
    dy0 = dy_ref[:].reshape(m, co)
    dys = [dy0.astype(xbuf.dtype), _roll_rows(dy0, 1).astype(xbuf.dtype),
           _roll_rows(dy0, 2).astype(xbuf.dtype)]
    contribs = []
    for oz in range(3):
        for oy in range(3):
            p = xbuf[oz:oz + bd, oy:oy + bh].reshape(m, ci)
            for ox in range(3):
                contribs.append(jax.lax.dot_general(
                    p, dys[ox], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
    dw_ref[:] += jnp.stack(contribs, axis=0)


def _dw_kernel_scratch(xp_hbm, dy_ref, dw_ref, xbuf, acc, sem, *, bd, bh, wp,
                       ci, co, gi, gj):
    """Accumulate in VMEM scratch; write dw_ref once at the last grid step."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from manigaussian_tpu.ops.pallas_conv import _roll_rows

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        acc[:] = jnp.zeros_like(acc)

    dma = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(i * bd, bd + 2), pl.ds(j * bh, bh + 2)], xbuf, sem)
    dma.start()
    dma.wait()
    m = bd * bh * wp
    dy0 = dy_ref[:].reshape(m, co)
    dys = [dy0.astype(xbuf.dtype), _roll_rows(dy0, 1).astype(xbuf.dtype),
           _roll_rows(dy0, 2).astype(xbuf.dtype)]
    contribs = []
    for oz in range(3):
        for oy in range(3):
            p = xbuf[oz:oz + bd, oy:oy + bh].reshape(m, ci)
            for ox in range(3):
                contribs.append(jax.lax.dot_general(
                    p, dys[ox], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
    acc[:] += jnp.stack(contribs, axis=0)

    @pl.when((i == gi - 1) & (j == gj - 1))
    def _flush():
        dw_ref[:] = acc[:]


def run_case(variant: str, d: int, h: int, w_sp: int, ci: int, co: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from manigaussian_tpu.ops import pallas_conv as pc

    x = jax.random.normal(jax.random.PRNGKey(0), (d, h, w_sp, ci),
                          jnp.bfloat16)
    dy = jax.random.normal(jax.random.PRNGKey(1), (d, h, w_sp, co),
                           jnp.float32)

    if variant == "asis":
        f = jax.jit(functools.partial(pc._conv3d_dw, interpret=False))
        out = f(x, dy)
        jax.block_until_ready(out)
        return out

    bd, bh = pc._pick_tiles(d, h)
    wp = -(-(w_sp + 2) // 8) * 8
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, wp - w_sp - 1), (0, 0)))
    dyp = jnp.pad(dy.astype(jnp.float32), ((0, 0), (0, 0), (0, wp - w_sp),
                                           (0, 0)))
    grid = (d // bd, h // bh)
    common = dict(
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bd, bh, wp, co), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((27, ci, co), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((27, ci, co), jnp.float32),
        interpret=False,
    )
    if variant == "stacked":
        kern = functools.partial(_dw_kernel_stacked, bd=bd, bh=bh, wp=wp,
                                 ci=ci, co=co)
        call = pl.pallas_call(
            kern, scratch_shapes=[
                pltpu.VMEM((bd + 2, bh + 2, wp, ci), x.dtype),
                pltpu.SemaphoreType.DMA(()),
            ], **common)
    elif variant == "scratch":
        kern = functools.partial(_dw_kernel_scratch, bd=bd, bh=bh, wp=wp,
                                 ci=ci, co=co, gi=grid[0], gj=grid[1])
        call = pl.pallas_call(
            kern, scratch_shapes=[
                pltpu.VMEM((bd + 2, bh + 2, wp, ci), x.dtype),
                pltpu.VMEM((27, ci, co), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ], **common)
    else:
        raise ValueError(variant)
    out = jax.jit(call)(xp, dyp)
    jax.block_until_ready(out)
    return out


def check_numerics(variant, d, h, w_sp, ci, co):
    """Compare the variant against lax conv dW on small shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    out = run_case(variant, d, h, w_sp, ci, co)
    x = jax.random.normal(jax.random.PRNGKey(0), (d, h, w_sp, ci),
                          jnp.bfloat16)
    dy = jax.random.normal(jax.random.PRNGKey(1), (d, h, w_sp, co),
                           jnp.float32)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x[None].astype(jnp.float32), w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    w0 = jnp.zeros((3, 3, 3, ci, co), jnp.float32)
    ref = jax.grad(lambda w: jnp.sum(conv(x, w)[0] * dy))(w0)
    got = np.asarray(out).reshape(3, 3, 3, ci, co)
    err = float(np.max(np.abs(got - np.asarray(ref))) /
                (np.max(np.abs(ref)) + 1e-9))
    return err


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--case", default=None,
                        help="variant:d:h:w:ci:co — run one case in-process")
    parser.add_argument("--check", action="store_true")
    args = parser.parse_args()

    if args.case:
        v, *dims = args.case.split(":")
        d, h, w_sp, ci, co = (int(s) for s in dims)
        if args.check:
            err = check_numerics(v, d, h, w_sp, ci, co)
            print(json.dumps({"case": args.case, "rel_err": err}), flush=True)
        else:
            t0 = time.time()
            run_case(v, d, h, w_sp, ci, co)
            print(json.dumps({"case": args.case, "ok": True,
                              "wall_s": round(time.time() - t0, 1)}),
                  flush=True)
        return

    cases = []
    for variant in ("asis", "stacked", "scratch"):
        cases += [f"{variant}:20:20:24:128:128",     # small
                  f"{variant}:100:100:100:256:128"]  # flagship failing shape
    for case in cases:
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, __file__, "--case", case],
            capture_output=True, text=True, timeout=1500)
        row = {"exp": "pallas_dw_repro", "case": case, "rc": p.returncode,
               "wall_s": round(time.time() - t0, 1)}
        if p.returncode != 0:
            tail = (p.stderr or p.stdout).strip().splitlines()[-12:]
            row["error"] = " | ".join(line.strip() for line in tail)[-900:]
        record(row)


if __name__ == "__main__":
    main()
