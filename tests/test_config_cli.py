"""Config IO + CLI smoke tests: variants, overrides, save/reload, train.py main."""

import json
import os

import numpy as np
import pytest

from manigaussian_tpu import config as C
from manigaussian_tpu.utils.config_io import (from_dict, load_config,
                                              load_saved_config,
                                              parse_overrides, save_config)


def test_variants_match_reference_tiers():
    """The 4 launch tiers (scripts/train_and_eval_w_geo*.sh)."""
    assert C.w_geo().method.neural_renderer.use_dynamic_field is False
    assert C.w_geo().method.neural_renderer.foundation_model_name is None
    assert C.w_geo_dyna().method.neural_renderer.use_dynamic_field is True
    assert C.w_geo_sem().method.neural_renderer.foundation_model_name == "diffusion"
    full = C.w_geo_sem_dyna().method.neural_renderer
    assert full.use_dynamic_field and full.foundation_model_name == "diffusion"


def test_overrides_dotted_keys():
    cfg = load_config(overrides=[
        "method.lr=0.001",
        "method.neural_renderer.lambda_nerf=0.02",
        "method.neural_renderer.use_dynamic_field=true",
        "rlbench.tasks=[open_drawer,turn_tap]",
        "framework.training_iterations=5",
    ])
    assert cfg.method.lr == 0.001
    assert cfg.method.neural_renderer.lambda_nerf == 0.02
    assert cfg.method.neural_renderer.use_dynamic_field is True
    assert cfg.rlbench.tasks == ("open_drawer", "turn_tap")
    assert cfg.framework.training_iterations == 5


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        load_config(overrides=["method.nonexistent_key=1"])


def test_yaml_conf_tree_loads():
    """conf/*.yaml (reference key-tree parity) load onto the dataclasses."""
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "conf", "config.yaml"))
    assert cfg.framework.training_iterations == 100010
    cfg = load_config(os.path.join(root, "conf", "method",
                                   "ManiGaussian_BC.yaml"))
    assert cfg.method.name == "ManiGaussian_BC"
    assert cfg.method.neural_renderer.mlp.d_hidden == 512
    assert cfg.method.neural_renderer.foundation_model_name is None


def test_save_and_reload(tmp_path):
    cfg = C.w_geo_sem_dyna()
    save_config(cfg, str(tmp_path))
    cfg2 = load_saved_config(str(tmp_path))
    assert cfg2 == cfg


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    """Full train.py main() on synthetic data with a tiny override set."""
    import train as train_mod
    demo_root = str(tmp_path / "demos")
    logdir = str(tmp_path / "logs")
    replay_dir = str(tmp_path / "replay")
    train_mod.main([
        "--variant", "w_geo", "--demo-root", demo_root,
        "--logdir", logdir, "--synthetic",
        "rlbench.tasks=[open_drawer]",
        "rlbench.demos=1",
        "rlbench.camera_resolution=[16,16]",
        "method.voxel_sizes=[20]",
        "method.num_latents=16",
        "method.latent_dim=32",
        "method.transformer_depth=1",
        "method.cross_dim_head=8",
        "method.latent_dim_head=8",
        "method.final_dim=16",
        "method.neural_renderer.image_width=32",
        "method.neural_renderer.image_height=32",
        "method.neural_renderer.d_latent=16",
        "method.neural_renderer.tile_capacity=64",
        "method.neural_renderer.max_tiles_per_gaussian=4",
        "method.neural_renderer.chunk=32",
        "method.neural_renderer.mlp.n_blocks=2",
        "method.neural_renderer.mlp.d_hidden=32",
        f"replay.path={replay_dir}",
        "framework.training_iterations=2",
        "framework.save_freq=2",
        "framework.log_freq=1",
    ])
    seed_dir = os.path.join(logdir, "seed0")
    assert os.path.exists(os.path.join(seed_dir, "config.json"))
    assert os.path.exists(os.path.join(seed_dir, "train_data.csv"))
    from manigaussian_tpu.utils.checkpoint import list_checkpoints
    assert list_checkpoints(seed_dir)

    # eval.py against the trained logdir with the mock env
    import eval as eval_mod
    eval_mod.main(["--logdir", seed_dir, "--demo-root", demo_root,
                   "--env", "mock", "--eval-type", "last", "--episodes", "1"])
    assert os.path.exists(os.path.join(seed_dir, "eval_data.csv"))


@pytest.mark.slow
def test_train_cli_multi_seed_sequential(tmp_path):
    """framework.seeds=2 runs both seeds sequentially (reference
    train.py:86-88) and the already-trained early exit (train.py:78-84)
    skips completed seeds on re-run."""
    import train as train_mod
    demo_root = str(tmp_path / "demos")
    logdir = str(tmp_path / "logs")
    args = [
        "--variant", "w_geo", "--demo-root", demo_root,
        "--logdir", logdir, "--synthetic",
        "rlbench.tasks=[open_drawer]",
        "rlbench.demos=1",
        "rlbench.camera_resolution=[16,16]",
        "method.voxel_sizes=[20]",
        "method.num_latents=16",
        "method.latent_dim=32",
        "method.transformer_depth=1",
        "method.cross_dim_head=8",
        "method.latent_dim_head=8",
        "method.final_dim=16",
        "method.use_neural_rendering=false",
        f"replay.path={tmp_path / 'replay'}",
        "framework.seeds=2",
        "framework.training_iterations=2",
        "framework.save_freq=2",
        "framework.log_freq=1",
    ]
    train_mod.main(args)
    from manigaussian_tpu.utils.checkpoint import list_checkpoints
    for seed in (0, 1):
        sd = os.path.join(logdir, f"seed{seed}")
        assert os.path.exists(os.path.join(sd, "train_data.csv")), sd
        assert list_checkpoints(sd), sd
    # re-run: both seeds skip (no crash, no new iterations)
    csv0 = open(os.path.join(logdir, "seed0", "train_data.csv")).read()
    train_mod.main(args)
    assert open(os.path.join(logdir, "seed0", "train_data.csv")).read() == csv0
