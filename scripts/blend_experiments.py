"""Bisect the blend cost: which parts of the per-chunk body dominate on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from functools import partial
from manigaussian_tpu.ops import gaussian_math as gm
from manigaussian_tpu.ops.rasterizer import RasterizeConfig, _build_keys, _tile_gather
import bench as B

n, size = 65536, 128
camera = B.make_camera(size)
cfg = RasterizeConfig(width=size, height=size, tile=16,
                      max_tiles_per_gaussian=16, tile_capacity=4096,
                      chunk=512, sh_degree=1)
means, scales, rotations, opacities, shs, lang = B.make_scene(jax.random.PRNGKey(0), n)

pre = jax.jit(lambda: gm.preprocess(means, opacities, camera, size, size, 16,
                                    scales=scales, rotations=rotations, shs=shs,
                                    sh_degree=1))()
st, sg, og, nt = jax.jit(lambda: _build_keys(pre, cfg))()
gi, il, cnt, ov = jax.jit(lambda: _tile_gather(st, sg, 64, cfg.tile_capacity))()
jax.block_until_ready(gi)

T, K = gi.shape
P = 256
CH = cfg.chunk
n_chunks = K // CH
tiles_x = 8

t_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0).squeeze(-1)
ox = (t_ids % tiles_x) * 16
oy = (t_ids // tiles_x) * 16
local = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).squeeze(-1)
px = ((local % 16)[None, :] + ox[:, None]).astype(jnp.float32)
py = ((local // 16)[None, :] + oy[:, None]).astype(jnp.float32)

gidx_c = jnp.moveaxis(gi.reshape(T, n_chunks, CH), 1, 0)
live_c = jnp.moveaxis(il.reshape(T, n_chunks, CH), 1, 0)


def timeit(name, fn, iters=30):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms")


def make_blend(do_power=True, do_exp=True, do_cumsum=True, do_color=True,
               ckpt=True, grad=False):
    def body(carry, inputs):
        log_t_raw, acc = carry
        gi_, live = inputs
        xy = pre.means2d[gi_]
        con = pre.conic[gi_]
        op = pre.opacity[gi_]
        rgb = pre.rgb[gi_]
        if do_power:
            dx = xy[..., 0][:, :, None] - px[:, None, :]
            dy = xy[..., 1][:, :, None] - py[:, None, :]
            power = (-0.5 * (con[..., 0][:, :, None] * dx * dx
                             + con[..., 2][:, :, None] * dy * dy)
                     - con[..., 1][:, :, None] * dx * dy)
        else:
            power = -jnp.abs(xy[..., 0])[:, :, None] * jnp.ones((1, 1, P))
        if do_exp:
            alpha = jnp.minimum(0.99, op[:, :, None] * jnp.exp(jnp.minimum(power, 0.)))
        else:
            alpha = jnp.clip(op[:, :, None] + 0 * power, 0, 0.5)
        a = jnp.where(live[:, :, None], alpha, 0.0)
        if do_cumsum:
            log1m = jnp.log1p(-a)
            csum = jnp.cumsum(log1m, axis=1)
            t_before = jnp.exp(csum - log1m + log_t_raw[:, None, :])
            w = a * t_before
            log_t_raw = log_t_raw + csum[:, -1, :]
        else:
            w = a
        if do_color:
            acc = acc + jnp.einsum("tkp,tkc->tpc", w, rgb,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        else:
            acc = acc + jnp.sum(w, axis=1)[..., None]
        return (log_t_raw, acc), None

    def run(means2d):
        pre2 = pre._replace(means2d=means2d)
        def body2(c, i):
            return body(c, i)
        init = (jnp.zeros((T, P)), jnp.zeros((T, P, 3)))
        b = jax.checkpoint(body2) if ckpt else body2
        (ltr, acc), _ = jax.lax.scan(b, init, (gidx_c, live_c))
        return jnp.sum(acc)

    if grad:
        return jax.jit(lambda: jax.grad(lambda m: run(m))(pre.means2d))
    return jax.jit(lambda: run(pre.means2d))


timeit("full body fwd", make_blend())
timeit("no power fwd", make_blend(do_power=False))
timeit("no exp fwd", make_blend(do_exp=False))
timeit("no cumsum fwd", make_blend(do_cumsum=False))
timeit("no color fwd", make_blend(do_color=False))
timeit("full body fwd+bwd ckpt", make_blend(grad=True))
timeit("full body fwd+bwd NOckpt", make_blend(grad=True, ckpt=False))
