"""Stage-by-stage timing of the rasterizer on the current default device."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from manigaussian_tpu.ops import gaussian_math as gm
from manigaussian_tpu.ops.rasterizer import (RasterizeConfig, _build_keys,
                                             _tile_gather, _blend_tiles, rasterize)
import bench as B

n, size = 65536, 128
camera = B.make_camera(size)
cfg = RasterizeConfig(width=size, height=size, tile=16,
                      max_tiles_per_gaussian=16, tile_capacity=4096,
                      chunk=512, sh_degree=1)
means, scales, rotations, opacities, shs, lang = B.make_scene(jax.random.PRNGKey(0), n)
tgt = jax.random.uniform(jax.random.PRNGKey(1), (size, size, 3))


def timeit(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1000:8.2f} ms")
    return out


@jax.jit
def preprocess():
    return gm.preprocess(means, opacities, camera, size, size, 16,
                         scales=scales, rotations=rotations, shs=shs, sh_degree=1)

pre = timeit("preprocess", preprocess)

@jax.jit
def keys():
    return _build_keys(pre, cfg)

st, sg, og, nt = timeit("build_keys+sort", keys)

@jax.jit
def gather():
    return _tile_gather(st, sg, 64, cfg.tile_capacity)

gi, il, cnt, ov = timeit("tile_gather", gather)
print("counts max/mean:", int(jnp.max(cnt)), float(jnp.mean(cnt)),
      "overflow:", int(ov))

@jax.jit
def blend():
    return _blend_tiles(pre, lang, gi, il, cfg, jnp.zeros(3))

timeit("blend fwd", blend)

@jax.jit
def blend_bwd(means_, scales_):
    def f(m, s):
        p = gm.preprocess(m, opacities, camera, size, size, 16,
                          scales=s, rotations=rotations, shs=shs, sh_degree=1)
        c, lf, ft = _blend_tiles(p, lang, gi, il, cfg, jnp.zeros(3))
        return jnp.sum((c - tgt) ** 2) + jnp.sum(lf ** 2)
    return jax.grad(f, argnums=(0, 1))(means_, scales_)

timeit("preprocess+blend fwd+bwd", blend_bwd, means, scales)

@jax.jit
def full_fwd():
    out, _ = rasterize(means, opacities, camera, cfg, (0., 0., 0.),
                       scales=scales, rotations=rotations, shs=shs,
                       language_features=lang)
    return out.color

timeit("full fwd", full_fwd)

def loss(*args):
    out, _ = rasterize(args[0], args[3], camera, cfg, (0., 0., 0.),
                       scales=args[1], rotations=args[2], shs=args[4],
                       language_features=args[5])
    return jnp.sum((out.color - tgt) ** 2) + jnp.sum(out.language_feature ** 2)

full_bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
timeit("full fwd+bwd", full_bwd, means, scales, rotations, opacities, shs, lang)
