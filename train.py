"""Train entry point.

Parity target: reference `train.py:36-129` + `run_seed_fn.py:25-164`: resolve
config (variant + dotted overrides), build/refill the replay buffer from stored
demos, build the agent, run OfflineTrainRunner with auto-resume, one log dir per
task-set/seed. Distributed: instead of Fabric DDP process spawning, one process
drives the whole mesh (pass --mesh N to shard the batch over N devices).

Usage:
    python train.py --variant w_geo --demo-root /data/demos \
        --logdir logs/open_drawer/seed0 \
        method.neural_renderer.use_dynamic_field=true rlbench.tasks=[open_drawer]
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", default="w_geo",
                        help="w_geo | w_geo_dyna | w_geo_sem | w_geo_sem_dyna")
    parser.add_argument("--config", default=None, help="optional YAML config")
    parser.add_argument("--demo-root", required=True)
    parser.add_argument("--logdir", default="logs/run")
    parser.add_argument("--seed", type=int, default=0,
                        help="start seed; cfg.framework.seeds consecutive "
                             "seeds run SEQUENTIALLY (reference "
                             "train.py:86-88), each in <logdir>/seed<i>")
    parser.add_argument("--mesh", type=int, default=0,
                        help="shard batches over this many devices (0 = single)")
    parser.add_argument("--mesh-tile", type=int, default=0,
                        help="shard the renderer's image tiles over this many "
                             "devices inside the train step (0 = off)")
    parser.add_argument("--cpu", type=int, default=0, metavar="N",
                        help="force the CPU platform with N virtual devices "
                             "(multi-chip smoke tests without TPU hardware)")
    parser.add_argument("--dist", default=None,
                        metavar="HOST:PORT,NPROCS,PID",
                        help="multi-host: jax.distributed.initialize rendezvous"
                             " spec; run the SAME command on every host with "
                             "its own PID (reference train.py:86-129 DDP)")
    parser.add_argument("--synthetic", action="store_true",
                        help="generate synthetic demos into --demo-root first")
    parser.add_argument("overrides", nargs="*",
                        help="dotted config overrides key=value")
    args = parser.parse_args(argv)

    # Persistent compilation cache: the flagship update graph costs ~10 min
    # through this environment's remote-compile tunnel; cache hits are
    # near-instant on re-runs/resumes (same setup as __graft_entry__).
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/root/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    if args.dist:
        # must precede any device query (forces CPU first when --cpu is set)
        from manigaussian_tpu.parallel.distributed import init_distributed
        init_distributed(args.dist, cpu_devices=args.cpu)
    elif args.cpu:
        # Must precede any jax.devices() call; env vars are too late in this
        # environment (sitecustomize imports jax at interpreter start).
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    from manigaussian_tpu.utils.config_io import load_config, save_config
    cfg = load_config(args.config, args.overrides, variant=args.variant)

    # run train jobs with multiple seeds, sequentially (train.py:86-88)
    for seed in range(args.seed, args.seed + max(1, cfg.framework.seeds)):
        _run_seed(args, cfg, seed)


def _run_seed(args, cfg, seed):
    from manigaussian_tpu.utils.config_io import save_config

    random.seed(seed)
    np.random.seed(seed)

    is_main = True
    if args.dist:
        import jax
        is_main = jax.process_index() == 0

    logdir = os.path.join(args.logdir, f"seed{seed}")

    # already-trained early exit (reference train.py:78-84)
    weights_dir = os.path.join(logdir, "weights")
    if os.path.isdir(weights_dir):
        done = sorted(int(w) for w in os.listdir(weights_dir) if w.isdigit())
        if done and done[-1] >= cfg.framework.training_iterations - 1:
            print(f"[train] seed {seed} already trained to {done[-1]} "
                  "iterations; skipping.")
            return
    os.makedirs(logdir, exist_ok=True)
    if is_main:
        save_config(cfg, logdir)

    if args.synthetic and is_main:
        from manigaussian_tpu.data.synthetic import generate_task
        for task in cfg.rlbench.tasks:
            if not os.path.isdir(os.path.join(args.demo_root, task)):
                generate_task(args.demo_root, task,
                              num_episodes=cfg.rlbench.demos,
                              h=cfg.rlbench.camera_resolution[0],
                              w=cfg.rlbench.camera_resolution[1],
                              nerf_hw=cfg.method.neural_renderer.image_height)
    if args.dist:
        # every process fills its OWN replay copy from the shared demos
        # (identical contents -> identical global batches, see
        # parallel/distributed.py); barrier so demos exist before fills
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("demos_ready")
        if cfg.replay.use_disk:
            import jax
            cfg.replay.path = f"{cfg.replay.path}_p{jax.process_index()}"

    from manigaussian_tpu.agents.registry import create_agent
    from manigaussian_tpu.data.language import create_language_model
    from manigaussian_tpu.data.pipeline import BatchIterator, fill_replay
    from manigaussian_tpu.data.replay import TaskUniformReplay
    from manigaussian_tpu.runners.offline_train_runner import OfflineTrainRunner

    lang_cache = os.path.join(logdir, "lang_cache")
    if args.dist and not is_main:
        import jax
        lang_cache = os.path.join(logdir, f"lang_cache_p{jax.process_index()}")
    lang = create_language_model(cfg.method.language_model,
                                 checkpoint_dir=cfg.method.language_model_checkpoint,
                                 cache_dir=lang_cache)
    replay = TaskUniformReplay(
        save_dir=cfg.replay.path if cfg.replay.use_disk else None)
    replay.reload_from_disk()
    if replay.size() == 0:
        for task in cfg.rlbench.tasks:
            n = fill_replay(
                replay, args.demo_root, task, cfg.rlbench.demos,
                cfg.rlbench.cameras, cfg.rlbench.scene_bounds,
                cfg.method.voxel_sizes[0], cfg.method.rotation_resolution,
                cfg.rlbench.episode_length, lang,
                demo_augmentation=cfg.method.demo_augmentation,
                demo_augmentation_every_n=cfg.method.demo_augmentation_every_n,
                keypoint_method=cfg.method.keypoint_method)
            print(f"[replay] {task}: {n} transitions")
        replay.flush()

    embed_fn = None
    fm_name = cfg.method.neural_renderer.foundation_model_name
    if fm_name and cfg.method.use_neural_rendering:
        import functools
        import jax
        from manigaussian_tpu.models.foundation import (create_feature_extractor,
                                                        extract_gt_embed)
        extractor = create_feature_extractor(
            fm_name, cfg.method.neural_renderer.foundation_checkpoint)
        if hasattr(extractor, "make_embed_fn"):
            # extractors carrying large param trees (SD-VAE) build their own
            # jit with the weights as ARGUMENTS — an outer jit closure bakes
            # them into the HLO as constants and the remote-compile tunnel
            # rejects the oversized request (HTTP 413)
            embed_fn = extractor.make_embed_fn(
                cfg.method.neural_renderer.d_embed)
        else:
            embed_fn = functools.partial(
                extract_gt_embed, extractor=extractor,
                d_embed=cfg.method.neural_renderer.d_embed)
            # jit only pure-jax extractors; the transformers-backed ones run
            # torch inside __call__ and cannot trace
            from manigaussian_tpu.models.foundation import \
                DINOv2FeatureExtractor
            if not isinstance(extractor, DINOv2FeatureExtractor):
                embed_fn = jax.jit(embed_fn)

    batches = BatchIterator(
        replay, cfg.replay.batch_size, seed=seed,
        num_view_for_nerf=cfg.method.num_view_for_nerf,
        load_nerf_targets=cfg.method.use_neural_rendering,
        embed_fn=embed_fn)

    # Mesh layout: --mesh D shards the batch over a 'data' axis; --mesh-tile T
    # shards the renderer's image tiles over a 'tile' axis inside the jitted
    # step. Combined, ONE (D, T) mesh carries both: the batch is placed with
    # P('data') and the rasterizer shard_maps manually over 'tile' only
    # (axis_names), leaving 'data' to the auto partitioner.
    tile_mesh = None
    mesh = None
    from manigaussian_tpu.parallel.mesh import make_mesh
    if args.mesh and args.mesh_tile:
        mesh = make_mesh((args.mesh, args.mesh_tile), ("data", "tile"))
        tile_mesh = mesh
    elif args.mesh_tile:
        tile_mesh = make_mesh((args.mesh_tile,), ("tile",))
    elif args.mesh:
        mesh = make_mesh((args.mesh,), ("data",))
    agent = create_agent(cfg, tile_mesh=tile_mesh)

    runner = OfflineTrainRunner(agent, batches, logdir, cfg, mesh=mesh,
                                seed=seed)
    runner.start()
    batches.close()


if __name__ == "__main__":
    main()
