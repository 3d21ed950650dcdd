"""Probe the remote-execution timing anomaly: some sweep rows (conv 128:128,
unet, pallas fwd) report physically impossible times (0.03-0.07 ms for
~0.5-1 TFLOP of work). Hypothesis: the axon remote terminal memoizes repeat
executions with identical inputs. Test: time the same conv with (a) fixed
input, (b) input varied per iteration (fold in the loop counter).
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

# warm
y = conv(x, w); jax.block_until_ready(y)

# (a) fixed input
t0 = time.perf_counter()
for _ in range(10):
    y = conv(x, w)
jax.block_until_ready(y)
t_fixed = (time.perf_counter() - t0) / 10

# (b) varying input
xs = [x + jnp.bfloat16(i * 1e-3) for i in range(10)]
jax.block_until_ready(xs)
t0 = time.perf_counter()
for i in range(10):
    y = conv(xs[i], w)
jax.block_until_ready(y)
t_vary = (time.perf_counter() - t0) / 10

print(json.dumps({"exp": "timing_probe", "ci": ci, "co": co,
                  "fixed_ms": round(t_fixed * 1e3, 3),
                  "vary_ms": round(t_vary * 1e3, 3)}), flush=True)
