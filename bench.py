"""Benchmark: fwd+bwd differentiable Gaussian-splat renders/s on one chip.

Workload (BASELINE.md TPU target): 128×128 image, 65,536 Gaussians, SH degree 1,
RGB + 3-channel language features, full gradient to every Gaussian parameter —
the training-time inner loop of ManiGaussian's world model (the reference's CUDA
rasterizer has no published number; target ≥ 30 renders/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from manigaussian_tpu.ops import camera as cam
from manigaussian_tpu.ops.rasterizer import RasterizeConfig, rasterize

TARGET = 30.0  # renders/s/chip (BASELINE.json north star)


def make_scene(key, n):
    ks = jax.random.split(key, 6)
    means = jax.random.uniform(ks[0], (n, 3), minval=-0.4, maxval=0.4) \
        + jnp.array([0.0, 0.0, 1.6])
    scales = jnp.exp(jax.random.uniform(ks[1], (n, 3),
                                        minval=jnp.log(0.002), maxval=jnp.log(0.02)))
    q = jax.random.normal(ks[2], (n, 4))
    rotations = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    opacities = jax.random.uniform(ks[3], (n,), minval=0.2, maxval=0.9)
    shs = jax.random.normal(ks[4], (n, 4, 3)) * 0.3
    lang = jax.random.normal(ks[5], (n, 3))
    return means, scales, rotations, opacities, shs, lang


def make_camera(size):
    intr = jnp.array([[float(size), 0.0, size / 2.0],
                      [0.0, float(size), size / 2.0],
                      [0.0, 0.0, 1.0]])
    c2w = jnp.eye(4)
    return cam.novel_camera_calib(intr, c2w, 0.1, 4.0, size, size)


def main():
    n, size = 65536, 128
    camera = make_camera(size)
    # chunk=512 measured best on v5e (sweep: 128/256/512/1024 -> 59/66/68/65
    # renders/s); capacities cover the 65k-gaussian workload (524 of 2.1M
    # binned splats overflow at K=8192 -- reported, not silent)
    cfg = RasterizeConfig(width=size, height=size, tile=16,
                          max_tiles_per_gaussian=16, tile_capacity=8192,
                          chunk=512, sh_degree=1)
    scene = make_scene(jax.random.PRNGKey(0), n)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (size, size, 3))

    def loss(means, scales, rotations, opacities, shs, lang):
        out, _ = rasterize(means, opacities, camera, cfg, (0.0, 0.0, 0.0),
                           scales=scales, rotations=rotations, shs=shs,
                           language_features=lang)
        return (jnp.sum((out.color - tgt) ** 2)
                + jnp.sum(out.language_feature ** 2))

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))

    # warmup / compile
    g = step(*scene)
    jax.block_until_ready(g)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(*scene)
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0

    renders_per_s = iters / dt
    print(json.dumps({
        "metric": "fwd_bwd_renders_per_s_per_chip_128px_65k",
        "value": round(renders_per_s, 3),
        "unit": "renders/s",
        "vs_baseline": round(renders_per_s / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
