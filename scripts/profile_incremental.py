"""Incremental fused-pipeline bisection: add one stage at a time."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
try:  # persistent compile cache (remote compiles are minutes each)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass
from manigaussian_tpu.ops import gaussian_math as gm
from manigaussian_tpu.ops.rasterizer import (RasterizeConfig, _build_keys,
                                             _tile_gather)
import bench as B

n, size = 65536, 128
camera = B.make_camera(size)
cfg = RasterizeConfig(width=size, height=size, tile=16,
                      max_tiles_per_gaussian=16, tile_capacity=8192,
                      chunk=256, sh_degree=1)
means, scales, rotations, opacities, shs, lang = B.make_scene(jax.random.PRNGKey(0), n)


def _sync(out):
    """device_get of one element — block_until_ready is a silent no-op for
    some executables on the axon backend (STATUS.md quirk)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jax.device_get(leaf.ravel()[0]))


def timeit(name, fn, *args, iters=20):
    out = fn(*args); _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


def pre_fn(means, scales, rotations, opacities, shs):
    return gm.preprocess(means, opacities, camera, size, size, 16,
                         scales=scales, rotations=rotations, shs=shs,
                         sh_degree=1)

def upto_keys(*a):
    pre = pre_fn(*a)
    return _build_keys(pre, cfg)

def upto_gather(*a):
    pre = pre_fn(*a)
    st, sg, og, nt = _build_keys(pre, cfg)
    return _tile_gather(st, sg, 64, cfg.tile_capacity)

def upto_params(*a):
    pre = pre_fn(*a)
    st, sg, og, nt = _build_keys(pre, cfg)
    gi, il, cnt, ov = _tile_gather(st, sg, 64, cfg.tile_capacity)
    xyt = jnp.swapaxes(pre.means2d[gi], 1, 2)
    conict = jnp.swapaxes(pre.conic[gi], 1, 2)
    opt = pre.opacity[gi][:, None, :]
    rgbt = jnp.swapaxes(pre.rgb[gi], 1, 2)
    langt = jnp.swapaxes(lang[gi], 1, 2)
    return xyt, conict, opt, rgbt, langt

args = (means, scales, rotations, opacities, shs)
timeit("jit preprocess", jax.jit(pre_fn), *args)
timeit("jit upto keys", jax.jit(upto_keys), *args)
timeit("jit upto tile_gather", jax.jit(upto_gather), *args)
timeit("jit upto param gathers", jax.jit(upto_params), *args)

# bwd increments
def l1(*a):
    pre = pre_fn(*a)
    return (jnp.sum(pre.means2d ** 2) + jnp.sum(pre.conic ** 2)
            + jnp.sum(pre.rgb ** 2) + jnp.sum(pre.opacity ** 2))

def l2_fn(*a):
    x = upto_params(*a)
    return sum(jnp.sum(v ** 2) for v in x)

timeit("grad preprocess only", jax.jit(jax.grad(l1, argnums=(0, 1, 2, 3, 4))), *args)
timeit("grad upto param gathers", jax.jit(jax.grad(l2_fn, argnums=(0, 1, 2, 3, 4))), *args)
