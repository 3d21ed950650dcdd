"""Stage-by-stage timing of the rasterizer on the current default device."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from manigaussian_tpu.ops import gaussian_math as gm
from manigaussian_tpu.ops.rasterizer import (RasterizeConfig, _build_keys,
                                             _tile_gather, rasterize)
from manigaussian_tpu.ops.pallas_blend import blend_tiles_pallas, gather_splats
import bench as B

n, size = 65536, 128
camera = B.make_camera(size)
cfg = RasterizeConfig(width=size, height=size, tile=16,
                      max_tiles_per_gaussian=16, tile_capacity=8192,
                      chunk=256, sh_degree=1)
means, scales, rotations, opacities, shs, lang = B.make_scene(jax.random.PRNGKey(0), n)
tgt = jax.random.uniform(jax.random.PRNGKey(1), (size, size, 3))


def timeit(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1000:8.2f} ms", flush=True)
    return out


pre = timeit("preprocess", jax.jit(lambda: gm.preprocess(
    means, opacities, camera, size, size, 16, scales=scales,
    rotations=rotations, shs=shs, sh_degree=1)))
(sk, rb), sg, og, nt = timeit("build_keys+sort",
                              jax.jit(lambda: _build_keys(pre, cfg)))
gi, il, cnt, ov = timeit("tile_gather", jax.jit(
    lambda: _tile_gather((sk, rb), sg, 64, cfg.tile_capacity)))
print("counts max/mean:", int(jnp.max(cnt)), float(jnp.mean(cnt)),
      "overflow:", int(ov))

# gathered tensors for the kernel (the production packed layout,
# rasterizer._blend_tiles_pallas_path)
tiles_x = 8
t_ids = jnp.arange(64)
origins = jnp.stack([(t_ids % tiles_x) * 16, (t_ids // tiles_x) * 16],
                    -1).astype(jnp.float32)


@jax.jit
def gather_big():
    table = jnp.concatenate([
        pre.means2d.T, pre.conic.T, pre.opacity[None, :], pre.rgb.T, lang.T,
    ], axis=0)
    attrs = jnp.swapaxes(gather_splats(table, gi), 0, 1)
    livet = il.astype(jnp.float32)[:, None, :]
    counts = jnp.sum(il, axis=1, dtype=jnp.int32)[:, None]
    return counts, attrs, livet


counts_t, attrs_t, livet_t = timeit("param gather+transpose", gather_big)

interp = jax.default_backend() != "tpu"
kcfg = (16, 256, interp)
timeit("pallas kernel fwd", jax.jit(
    lambda a: blend_tiles_pallas(counts_t, origins, a, livet_t, 3, kcfg)),
    attrs_t)


def kloss(a):
    c, l, t = blend_tiles_pallas(counts_t, origins, a, livet_t, 3, kcfg)
    return jnp.sum(c ** 2) + jnp.sum(l ** 2) + jnp.sum(t ** 2)


timeit("pallas kernel fwd+bwd", jax.jit(jax.grad(kloss)), attrs_t)


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

timeit("full fwd+bwd", jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))),
       means, scales, rotations, opacities, shs, lang)
