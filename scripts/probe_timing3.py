"""Probe 3: establish a trustworthy timing method on the axon remote backend.

Method under test: run the op K times inside ONE jit as a lax.fori_loop
dependency chain, time the call + block_until_ready, and check the time
scales linearly in K (then per-iter = slope). Apply to (a) the 100^3 conv,
(b) the bench.py renderer grad step — the headline number.
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


# ---- conv chain ----
ci, co = 128, 128
x = jax.random.normal(jax.random.PRNGKey(0), (100, 100, 100, ci), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, ci, co), jnp.bfloat16) * 0.02


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]


def chain_conv(k):
    @jax.jit
    def f(x, w):
        return jax.lax.fori_loop(
            0, k, lambda i, v: conv(v, w) * jnp.bfloat16(0.5), x)
    return f


t5 = timed(chain_conv(5), x, w)
t20 = timed(chain_conv(20), x, w)
per_iter_conv = (t20 - t5) / 15
print(json.dumps({"exp": "chain_conv", "t5_ms": round(t5 * 1e3, 1),
                  "t20_ms": round(t20 * 1e3, 1),
                  "per_iter_ms": round(per_iter_conv * 1e3, 2)}), flush=True)

# ---- renderer grad-step chain ----
import bench as B
from manigaussian_tpu.ops.rasterizer import RasterizeConfig, rasterize

n, size = 65536, 128
camera = B.make_camera(size)
scene = B.make_scene(jax.random.PRNGKey(0), n)
tgt = jax.random.uniform(jax.random.PRNGKey(1), (size, size, 3))
cfg = RasterizeConfig(width=size, height=size, tile=16,
                      max_tiles_per_gaussian=16, tile_capacity=8192,
                      chunk=512, sh_degree=1)


def loss(means, scales, rotations, opacities, shs, lang):
    out, _ = rasterize(means, opacities, camera, cfg, (0., 0., 0.),
                       scales=scales, rotations=rotations, shs=shs,
                       language_features=lang)
    return (jnp.sum((out.color - tgt) ** 2)
            + jnp.sum(out.language_feature ** 2))


grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))


def chain_render(k):
    @jax.jit
    def f(scene):
        def body(i, s):
            g = grad(*s)
            # feed gradients back (tiny step) to force a dependency chain
            return tuple(a - 1e-12 * b for a, b in zip(s, g))
        return jax.lax.fori_loop(0, k, body, s := scene)
    return f


t2 = timed(chain_render(2), scene)
t8 = timed(chain_render(8), scene)
per_iter_r = (t8 - t2) / 6
print(json.dumps({"exp": "chain_render", "t2_ms": round(t2 * 1e3, 1),
                  "t8_ms": round(t8 * 1e3, 1),
                  "per_iter_ms": round(per_iter_r * 1e3, 2),
                  "renders_per_s": round(1.0 / per_iter_r, 2)}), flush=True)
