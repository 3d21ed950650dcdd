"""Test: do narrow-last-dim arrays (padded TPU tiles) explain the overhead?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

N, T, K = 65536, 64, 8192
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, iters=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


x_wide = jax.random.normal(key, (N, 128))
x_narrow = jax.random.normal(key, (N, 2))
x_t = jax.random.normal(key, (2, N))

# elementwise chain producing narrow outputs
timeit("elementwise x10 on [N,128]", jax.jit(lambda x: x * 1.01 + 0.5), x_wide)
timeit("elementwise x10 on [N,2]", jax.jit(lambda x: x * 1.01 + 0.5), x_narrow)
timeit("elementwise x10 on [2,N]", jax.jit(lambda x: x * 1.01 + 0.5), x_t)

gi = jax.random.randint(key, (T, K), 0, N)
timeit("gather+swap [N,2]->[T,2,K]",
       jax.jit(lambda x: jnp.swapaxes(x[gi], 1, 2)), x_narrow)
timeit("gather axis1 [2,N]->[2,T,K]",
       jax.jit(lambda x: jnp.take(x, gi, axis=1)), x_t)

big_narrow = jax.random.normal(key, (T, K, 2))
big_t = jax.random.normal(key, (T, 2, K))
timeit("elementwise on [T,K,2]", jax.jit(lambda x: x * 1.01 + 0.5), big_narrow)
timeit("elementwise on [T,2,K]", jax.jit(lambda x: x * 1.01 + 0.5), big_t)

# argsort / searchsorted costs at pipeline sizes
depths = jax.random.normal(key, (N,))
timeit("argsort [N]", jax.jit(lambda d: jnp.argsort(d)), depths)
st = jnp.sort(jax.random.randint(key, (N * 16,), 0, 65))
tids = jnp.arange(64, dtype=jnp.int32)
timeit("searchsorted 2x", jax.jit(
    lambda s: (jnp.searchsorted(s, tids, side="left"),
               jnp.searchsorted(s, tids, side="right"))), st)
sg = jax.random.randint(key, (N * 16,), 0, N)
pos = jnp.clip(jax.random.randint(key, (T, K), 0, N * 16), 0, N * 16 - 1)
timeit("gather [T,K] from 1M ints", jax.jit(lambda s: s[pos]), sg)
