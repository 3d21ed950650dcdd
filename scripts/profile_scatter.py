"""Isolate: scatter-add cost, narrow-dim layout cost, packed-transposed variant."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

N, T, K = 65536, 64, 8192
key = jax.random.PRNGKey(0)
gi = jax.random.randint(key, (T, K), 0, N)
g3 = jax.random.normal(key, (T, K, 3))
g12 = jax.random.normal(key, (T, K, 12))
x3 = jax.random.normal(key, (N, 3))
x12 = jax.random.normal(key, (N, 12))
x12t = jnp.asarray(jnp.swapaxes(x12, 0, 1))         # [12, N]


def timeit(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


timeit("gather [T,K,3] from [N,3]", jax.jit(lambda: x3[gi]))
timeit("gather [T,K,12] from [N,12]", jax.jit(lambda: x12[gi]))
timeit("gather [12,T,K] from [12,N]", jax.jit(lambda: jnp.take(x12t, gi, axis=1)))
timeit("scatter-add [T,K,3] -> [N,3]",
       jax.jit(lambda: jnp.zeros((N, 3)).at[gi].add(g3)))
timeit("scatter-add [T,K,12] -> [N,12]",
       jax.jit(lambda: jnp.zeros((N, 12)).at[gi].add(g12)))
g12t = jnp.swapaxes(jnp.swapaxes(g12, 0, 2), 1, 2)  # [12, T, K]
timeit("scatter-add [12,T,K] -> [12,N]",
       jax.jit(lambda: jnp.zeros((12, N)).at[:, gi].add(g12t)))

# autodiff of gather (what the pipeline actually does)
def loss_gather(x):
    return jnp.sum(x[gi] ** 2)
timeit("grad of gather [N,12]", jax.jit(jax.grad(loss_gather)), x12)

def loss_gather_t(xt):
    return jnp.sum(jnp.take(xt, gi, axis=1) ** 2)
timeit("grad of gather [12,N]", jax.jit(jax.grad(loss_gather_t)), x12t)

# sort-based segment sum alternative
def seg_sum(g):
    flat_g = g.reshape(-1, 12)
    flat_i = gi.reshape(-1)
    si = jnp.argsort(flat_i)
    return jax.ops.segment_sum(flat_g[si], flat_i[si], num_segments=N,
                               indices_are_sorted=True)
timeit("sorted segment_sum [TK,12] -> [N,12]", jax.jit(seg_sum), g12)

# one big sort cost (what _build_keys pays)
keys_ = jax.random.randint(key, (N * 16,), 0, 64)
vals = jax.random.randint(key, (N * 16,), 0, N)
timeit("lax.sort 1M x (2 keys + payload)",
       jax.jit(lambda: jax.lax.sort((keys_, vals, vals), num_keys=2)))
