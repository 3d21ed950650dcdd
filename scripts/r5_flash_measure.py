"""Measure the flash self-attention kernel in the flagship step + standalone.

Appends to R5_SWEEP.jsonl:
  * `attn_micro` — one 8×2048×64 self-attention layer fwd+bwd, xla vs flash
    (loop-of-30; the validated timing method, see xplane_summary rows);
  * `tier_step_attn` — the full w_geo train step with policy_attn_impl
    'flash' (compare tier_step_post_fusion w_geo = xla attention).

One TPU process at a time (STATUS.md).
Usage: timeout 3600 python scripts/r5_flash_measure.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

OUT = "R5_SWEEP.jsonl"


def record(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def loop30(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(30):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 30


def attn_micro():
    from manigaussian_tpu.ops.flash_attention import flash_self_attention

    b, h, n, d = 1, 8, 2048, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.bfloat16)
               for kk in ks[:3])
    g = jax.random.normal(ks[3], (b, h, n, d), jnp.bfloat16)

    def xla_attn(q, k, v):
        scale = d ** -0.5
        logits = jnp.einsum("bhid,bhjd->bhij", q * scale, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def flash_attn(q, k, v):
        return flash_self_attention(q, k, v, block_q=256)

    for name, fn in (("xla", xla_attn), ("flash", flash_attn)):
        def fwdbwd(q, k, v):
            out, vjp = jax.vjp(fn, q, k, v)
            return out, vjp(g)

        dt_f = loop30(jax.jit(fn), q, k, v)
        dt_fb = loop30(jax.jit(fwdbwd), q, k, v)
        record({"exp": "attn_micro", "impl": name, "shape": [b, h, n, d],
                "fwd_ms": round(dt_f * 1e3, 3),
                "fwd_bwd_ms": round(dt_fb * 1e3, 3)})


def tier_step(attn_impl="flash"):
    import dataclasses

    import __graft_entry__ as ge
    from manigaussian_tpu import config as C
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

    cfg = C.VARIANTS["w_geo"]()
    cfg = dataclasses.replace(cfg, method=dataclasses.replace(
        cfg.method, policy_attn_impl=attn_impl))
    agent = ManiGaussianBCAgent(cfg)
    batch = ge._make_batch(jax.random.PRNGKey(0), b=1, ncam=1, h=128, w=128,
                           img=128)
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True,
                             lazy=True)
    step = agent.jit_update(donate=False)
    _, m = step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(m)
    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        _, m = step(state, batch, jax.random.PRNGKey(3 + i))
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / iters
    record({"exp": "tier_step_attn", "tier": "w_geo", "attn_impl": attn_impl,
            "steps_per_s": round(1.0 / dt, 3), "ms": round(dt * 1e3, 1)})


if __name__ == "__main__":
    attn_micro()
    tier_step("flash")
