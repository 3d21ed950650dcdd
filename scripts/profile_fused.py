"""Bisect the fused fwd/bwd pipeline: where do the extra ms hide?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from manigaussian_tpu.ops import gaussian_math as gm
from manigaussian_tpu.ops.rasterizer import (RasterizeConfig, _build_keys,
                                             _tile_gather)
from manigaussian_tpu.ops.pallas_blend import blend_tiles_pallas
import bench as B

n, size = 65536, 128
camera = B.make_camera(size)
cfg = RasterizeConfig(width=size, height=size, tile=16,
                      max_tiles_per_gaussian=16, tile_capacity=8192,
                      chunk=256, sh_degree=1)
means, scales, rotations, opacities, shs, lang = B.make_scene(jax.random.PRNGKey(0), n)


def timeit(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


def stage_to_gathered(means, scales, rotations, opacities, shs, lang):
    pre = gm.preprocess(means, opacities, camera, size, size, 16,
                        scales=scales, rotations=rotations, shs=shs, sh_degree=1)
    st, sg, og, nt = _build_keys(pre, cfg)
    gi, il, cnt, ov = _tile_gather(st, sg, 64, cfg.tile_capacity)
    tiles_x = 8
    t_ids = jnp.arange(64)
    origins = jnp.stack([(t_ids % tiles_x) * 16, (t_ids // tiles_x) * 16],
                        -1).astype(jnp.float32)
    xyt = jnp.swapaxes(pre.means2d[gi] - origins[:, None, :], 1, 2)
    conict = jnp.swapaxes(pre.conic[gi], 1, 2)
    opt = pre.opacity[gi][:, None, :]
    rgbt = jnp.swapaxes(pre.rgb[gi], 1, 2)
    langt = jnp.swapaxes(lang[gi], 1, 2)
    livet = il.astype(jnp.float32)[:, None, :]
    counts = jnp.sum(il, axis=1, dtype=jnp.int32)[:, None]
    return counts, xyt, conict, opt, rgbt, langt, livet


def full(means, scales, rotations, opacities, shs, lang):
    g = stage_to_gathered(means, scales, rotations, opacities, shs, lang)
    c, l, t = blend_tiles_pallas(*g, (16, 256, False))
    return c, l, t


args = (means, scales, rotations, opacities, shs, lang)
timeit("fwd to gathered (fused)", jax.jit(stage_to_gathered), *args)
timeit("fwd full (fused)", jax.jit(full), *args)

def loss_g(*a):
    g = stage_to_gathered(*a)
    return sum(jnp.sum(x ** 2) for x in g[1:])

def loss_full(*a):
    c, l, t = full(*a)
    return jnp.sum(c ** 2) + jnp.sum(l ** 2) + jnp.sum(t ** 2)

timeit("fwd+bwd to gathered", jax.jit(jax.grad(loss_g, argnums=(0, 1, 2, 3, 4, 5))), *args)
timeit("fwd+bwd full", jax.jit(jax.grad(loss_full, argnums=(0, 1, 2, 3, 4, 5))), *args)
