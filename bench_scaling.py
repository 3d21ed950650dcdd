"""Scaling benchmark: rays/s of the tile-sharded renderer across device counts.

BASELINE.md target: ≥ 85% rays/s scaling efficiency at 1 chip → 1 host →
4 hosts. With one physical chip available, this harness measures true scaling
only when run on real multi-chip slices; anywhere else it validates the
sharded path end-to-end and reports per-configuration rays/s (on a virtual CPU
mesh the numbers exercise correctness, not ICI bandwidth — labeled as such).

Prints one JSON line per device count:
  {"metric": "rays_per_s", "devices": D, "value": ..., "efficiency_vs_1": ...}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from manigaussian_tpu.ops.rasterizer import RasterizeConfig, rasterize
from manigaussian_tpu.parallel.mesh import make_mesh
from manigaussian_tpu.parallel.rasterizer_sharded import rasterize_sharded
import bench as B


def run(n=65536, size=128, iters=20):
    camera = B.make_camera(size)
    cfg = RasterizeConfig(width=size, height=size, tile=16,
                          max_tiles_per_gaussian=16, tile_capacity=8192,
                          chunk=256, sh_degree=1)
    means, scales, rotations, opacities, shs, lang = B.make_scene(
        jax.random.PRNGKey(0), n)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (size, size, 3))
    n_devices = len(jax.devices())
    rays = size * size

    tiles_x = size // 16
    num_tiles = tiles_x * tiles_x
    results = []
    base = None
    d = 1
    while d <= n_devices:
        # tile rows must not straddle devices (rasterizer_sharded constraint)
        if d > 1 and (num_tiles % d != 0 or (num_tiles // d) % tiles_x != 0):
            d *= 2
            continue
        if d == 1:
            def loss(m):
                out, _ = rasterize(m, opacities, camera, cfg, (0., 0., 0.),
                                   scales=scales, rotations=rotations, shs=shs,
                                   language_features=lang)
                return jnp.sum((out.color - tgt) ** 2)
        else:
            mesh = make_mesh((d,), ("tile",))

            def loss(m, mesh=mesh):
                out = rasterize_sharded(mesh, m, opacities, camera, cfg,
                                        (0., 0., 0.), scales=scales,
                                        rotations=rotations, shs=shs,
                                        language_features=lang)
                return jnp.sum((out.color - tgt) ** 2)

        step = jax.jit(jax.grad(loss))
        out = step(means)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(means)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        rate = rays / dt
        if base is None:
            base = rate
        results.append({
            "metric": "rays_per_s_fwd_bwd",
            "devices": d,
            "value": round(rate, 1),
            "efficiency_vs_1": round(rate / (base * d), 3),
            "platform": jax.default_backend(),
        })
        print(json.dumps(results[-1]), flush=True)
        d *= 2
    return results


if __name__ == "__main__":
    run()
