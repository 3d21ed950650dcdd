"""Scaling benchmark: tile-sharded renderer rays/s + DP train-step steps/s
across device counts.

BASELINE.md target: ≥ 85% rays/s scaling efficiency at 1 chip → 1 host →
4 hosts. With one physical chip available, this harness measures true scaling
only when run on real multi-chip slices; anywhere else it validates the
sharded paths end-to-end and reports per-configuration rates (on a virtual
CPU mesh the numbers exercise correctness + partition efficiency of the
compiled program, not ICI bandwidth — `platform` labels each row).

Per-host usage (mirrors train.py --dist): run the SAME command on every host:
    python bench_scaling.py --dist HOST:PORT,NPROCS,PID [--cpu N]
Single-process virtual mesh:
    python bench_scaling.py --cpu 8 --n 16384 --size 64 --backend xla

Prints one JSON line per configuration and appends them to SCALING.jsonl.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", type=int, default=0,
                        help="force CPU platform with N virtual devices")
    parser.add_argument("--dist", default=None,
                        metavar="HOST:PORT,NPROCS,PID",
                        help="multi-host rendezvous (same spec as train.py)")
    parser.add_argument("--n", type=int, default=65536, help="gaussians")
    parser.add_argument("--size", type=int, default=128, help="image px")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--backend", default=None,
                        help="rasterizer backend override (pallas|xla); "
                             "defaults to pallas on TPU, xla elsewhere")
    parser.add_argument("--train-step", action="store_true",
                        help="also bench DP train-step scaling (batch = D)")
    parser.add_argument("--out", default="SCALING.jsonl")
    args = parser.parse_args(argv)

    if args.dist:
        from manigaussian_tpu.parallel.distributed import init_distributed
        init_distributed(args.dist, cpu_devices=args.cpu)
    elif args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    import jax
    import jax.numpy as jnp

    from manigaussian_tpu.ops.rasterizer import RasterizeConfig, rasterize
    from manigaussian_tpu.parallel.mesh import make_mesh
    from manigaussian_tpu.parallel.rasterizer_sharded import rasterize_sharded
    import bench as B

    backend = args.backend or ("pallas" if jax.default_backend() == "tpu"
                               else "xla")
    n, size, iters = args.n, args.size, args.iters
    camera = B.make_camera(size)
    cfg = RasterizeConfig(width=size, height=size, tile=16,
                          max_tiles_per_gaussian=16,
                          tile_capacity=min(8192, max(512, n // 8)),
                          chunk=256, sh_degree=1, backend=backend)
    means, scales, rotations, opacities, shs, lang = B.make_scene(
        jax.random.PRNGKey(0), n)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (size, size, 3))
    n_devices = len(jax.devices())
    rays = size * size

    tiles_x = size // 16
    num_tiles = tiles_x * tiles_x
    results = []
    is_main = jax.process_index() == 0

    def record(row):
        results.append(row)
        if is_main:
            print(json.dumps(row), flush=True)
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")

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
                out, _ = rasterize_sharded(mesh, m, opacities, camera, cfg,
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
        record({
            "metric": "rays_per_s_fwd_bwd",
            "devices": d,
            "value": round(rate, 1),
            "efficiency_vs_1": round(rate / (base * d), 3),
            "backend": backend,
            "n_gaussians": n, "size": size,
            "platform": jax.default_backend(),
            "processes": jax.process_count(),
        })
        d *= 2

    if args.train_step:
        _train_scaling(args, record)
    return results


def _train_scaling(args, record):
    """DP train-step scaling: global batch = device count, tiny policy dims
    (CPU-mesh feasible); steps/s should stay ~flat as D grows."""
    import dataclasses
    import time

    import jax

    import __graft_entry__ as ge
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
    from manigaussian_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from manigaussian_tpu.parallel.train_sharded import make_sharded_update

    cfg = ge._tiny_cfg() if hasattr(ge, "_tiny_cfg") else None
    if cfg is None:
        from manigaussian_tpu import config as C
        cfg = C.w_geo()
        cfg = dataclasses.replace(cfg, method=dataclasses.replace(
            cfg.method, num_latents=64, latent_dim=64, transformer_depth=1,
            voxel_sizes=(20,), final_dim=16,
            neural_renderer=dataclasses.replace(
                cfg.method.neural_renderer, image_width=32, image_height=32,
                d_latent=16, tile_capacity=64, max_tiles_per_gaussian=4,
                chunk=32)))

    n_devices = len(jax.devices())
    base = None
    d = 1
    while d <= n_devices:
        agent = ManiGaussianBCAgent(cfg)
        batch = ge._make_batch(jax.random.PRNGKey(0), b=d, ncam=1, h=32, w=32,
                               img=32)
        state = agent.init_state(jax.random.PRNGKey(1), batch, training=True,
                                 lazy=True)
        if d == 1:
            step = agent.jit_update(donate=False)
        else:
            mesh = make_mesh((d,), ("data",))
            step = make_sharded_update(agent, mesh, donate=False)
            state = replicate_state(state, mesh)
            batch = shard_batch(batch, mesh)
        _, m = step(state, batch, jax.random.PRNGKey(2))
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for i in range(args.iters):
            _, m = step(state, batch, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / args.iters
        rate = 1.0 / dt
        if base is None:
            base = rate
        record({
            "metric": "dp_train_steps_per_s",
            "devices": d,
            "global_batch": d,
            "value": round(rate, 2),
            "efficiency_vs_1": round(rate / base, 3),
            "platform": jax.default_backend(),
            "processes": jax.process_count(),
        })
        d *= 2


if __name__ == "__main__":
    main()
