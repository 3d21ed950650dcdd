"""Probe 2: does block_until_ready actually block on the axon backend?
Time the same conv with (a) block_until_ready, (b) full device_get fetch,
(c) a 10-deep dependency chain + fetch. Also verify numerics vs a CPU oracle
(float32, small slice)."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

ci, co = 128, 128
x = jax.random.normal(jax.random.PRNGKey(0), (100, 100, 100, ci), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, ci, co), jnp.bfloat16) * 0.02

@jax.jit
def conv(x, w):
    return jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]

y = conv(x, w); jax.block_until_ready(y)

t0 = time.perf_counter()
for _ in range(5):
    y = conv(x, w)
jax.block_until_ready(y)
t_block = (time.perf_counter() - t0) / 5

t0 = time.perf_counter()
for _ in range(5):
    y = conv(x, w)
    _ = np.asarray(y[0, 0, 0, :4])
t_fetch = (time.perf_counter() - t0) / 5

# dependency chain: each conv feeds the next
@jax.jit
def chain(x, w):
    def body(i, v):
        return conv(v, w) * jnp.bfloat16(0.1)
    return jax.lax.fori_loop(0, 10, body, x)

z = chain(x, w); jax.block_until_ready(z)
t0 = time.perf_counter()
z = chain(x, w)
jax.block_until_ready(z)
t_chain = time.perf_counter() - t0

# numerics check on a tiny slice vs CPU
xs = np.asarray(x[:8, :8, :8], dtype=np.float32)
ws = np.asarray(w, dtype=np.float32)
# CPU oracle via numpy direct conv on the tiny slice
def conv_np(x, w):
    D, H, W, Ci = x.shape
    Co = w.shape[-1]
    xp = np.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((D, H, W, Co), np.float32)
    for oz in range(3):
        for oy in range(3):
            for ox in range(3):
                out += np.einsum("dhwc,co->dhwo",
                                 xp[oz:oz+D, oy:oy+H, ox:ox+W], w[oz, oy, ox])
    return out
ref = conv_np(xs, ws)
got = np.asarray(conv(jnp.asarray(xs).astype(jnp.bfloat16),
                      jnp.asarray(ws).astype(jnp.bfloat16)), dtype=np.float32)
err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-8)

print(json.dumps({"exp": "timing_probe2",
                  "block_ms": round(t_block * 1e3, 3),
                  "fetch_ms": round(t_fetch * 1e3, 3),
                  "chain10_ms": round(t_chain * 1e3, 3),
                  "rel_err_tiny": float(err)}), flush=True)
