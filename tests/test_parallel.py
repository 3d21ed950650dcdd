"""Multi-device tests on the 8-device virtual CPU mesh: DP train step and
tile-sharded rasterizer parity + gradient psum correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manigaussian_tpu.ops import rasterizer as rast
from manigaussian_tpu.parallel.mesh import (make_mesh, replicate_state,
                                            shard_batch)
from manigaussian_tpu.parallel.rasterizer_sharded import rasterize_sharded
from manigaussian_tpu.parallel.train_sharded import make_sharded_update
from tests.helpers import assert_mostly_close, make_camera, random_scene

BG = (0.1, 0.2, 0.3)


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.slow
def test_tile_sharded_rasterizer_matches_single(backend):
    n = 128
    scene = random_scene(jax.random.PRNGKey(0), n, spread=0.35)
    c = make_camera(64, 64, focal=60.0)
    cfg = rast.RasterizeConfig(width=64, height=64, tile=16,
                               max_tiles_per_gaussian=16, tile_capacity=128,
                               chunk=64, backend=backend)
    mesh = make_mesh((4,), ("tile",))  # 16 tiles → 4 per device (1 row each)

    out_s, ext_s = rasterize_sharded(
        mesh, scene["means3d"], scene["opacities"], c, cfg, BG,
        scales=scene["scales"], rotations=scene["rotations"],
        shs=scene["shs"], language_features=scene["language_features"])
    out_1, ext_1 = rast.rasterize(scene["means3d"], scene["opacities"], c,
                                  cfg, BG, scales=scene["scales"],
                                  rotations=scene["rotations"], shs=scene["shs"],
                                  language_features=scene["language_features"])
    assert_mostly_close(out_s.color, out_1.color, atol=1e-5, rtol=1e-4,
                        err_msg="color")
    assert_mostly_close(out_s.final_t, out_1.final_t, atol=1e-4, rtol=1e-4,
                        err_msg="final_t")
    # sharded extras match the single-chip path (global counters + counts)
    assert int(ext_s.overflow_splats) == int(ext_1.overflow_splats)
    assert int(ext_s.overflow_gaussians) == int(ext_1.overflow_gaussians)
    np.testing.assert_array_equal(np.sort(np.asarray(ext_s.tile_counts)),
                                  np.sort(np.asarray(ext_1.tile_counts)))
    # radii now come from inside the shard_map (no duplicate preprocess)
    np.testing.assert_array_equal(np.asarray(out_s.radii),
                                  np.asarray(out_1.radii))


@pytest.mark.parametrize("n_dev,size,n", [
    pytest.param(4, 32, 64, id="fast-4dev-1tile"),   # 1 tile/device < tiles_x
    pytest.param(8, 64, 128, id="8dev-halfrow", marks=pytest.mark.slow),
    pytest.param(2, 64, 128, id="2dev-2rows", marks=pytest.mark.slow),
])
def test_tile_sharded_sub_row_windows_match_single(n_dev, size, n):
    """Tile axes that DON'T align with whole tile rows (VERDICT r3 item 4:
    the round-3 ceiling was tiles_y devices). 8 devices over a 64² image =
    2 tiles per device — half a tile row; 4 devices over 32² = 1 tile each."""
    scene = random_scene(jax.random.PRNGKey(2), n, spread=0.35)
    c = make_camera(size, size, focal=60.0)
    cfg = rast.RasterizeConfig(width=size, height=size, tile=16,
                               max_tiles_per_gaussian=16, tile_capacity=128,
                               chunk=64)
    mesh = make_mesh((n_dev,), ("tile",))
    out_s, ext_s = rasterize_sharded(
        mesh, scene["means3d"], scene["opacities"], c, cfg, BG,
        scales=scene["scales"], rotations=scene["rotations"],
        shs=scene["shs"], language_features=scene["language_features"])
    out_1, ext_1 = rast.rasterize(scene["means3d"], scene["opacities"], c,
                                  cfg, BG, scales=scene["scales"],
                                  rotations=scene["rotations"],
                                  shs=scene["shs"],
                                  language_features=scene["language_features"])
    assert_mostly_close(out_s.color, out_1.color, atol=1e-5, rtol=1e-4,
                        err_msg="color")
    assert_mostly_close(out_s.language_feature, out_1.language_feature,
                        atol=1e-5, rtol=1e-4, err_msg="lang")
    assert_mostly_close(out_s.final_t, out_1.final_t, atol=1e-4, rtol=1e-4,
                        err_msg="final_t")
    assert int(ext_s.overflow_splats) == int(ext_1.overflow_splats)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.slow
def test_tile_sharded_gradients_match_single(backend):
    n = 96
    scene = random_scene(jax.random.PRNGKey(5), n, spread=0.35)
    c = make_camera(64, 64, focal=60.0)
    cfg = rast.RasterizeConfig(width=64, height=64, tile=16,
                               max_tiles_per_gaussian=16, tile_capacity=96,
                               chunk=32, backend=backend)
    mesh = make_mesh((4,), ("tile",))
    tgt = jax.random.uniform(jax.random.PRNGKey(6), (64, 64, 3))

    def loss_sharded(means):
        out, _ = rasterize_sharded(mesh, means, scene["opacities"], c, cfg, BG,
                                   scales=scene["scales"],
                                   rotations=scene["rotations"],
                                   shs=scene["shs"])
        return jnp.sum((out.color - tgt) ** 2)

    def loss_single(means):
        out, _ = rast.rasterize(means, scene["opacities"], c, cfg, BG,
                                scales=scene["scales"],
                                rotations=scene["rotations"], shs=scene["shs"])
        return jnp.sum((out.color - tgt) ** 2)

    g_s = jax.grad(loss_sharded)(scene["means3d"])
    g_1 = jax.grad(loss_single)(scene["means3d"])
    assert_mostly_close(g_s, g_1, atol=1e-4, rtol=1e-3, max_frac=0.02,
                        err_msg="means grad")


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.slow
def test_tile_sharded_train_step_matches_single(backend):
    """Full BC update with the renderer's image tiles sharded over a 2-device
    mesh axis must match the unsharded update (VERDICT item 2: tile sharding
    wired into the TRAIN step, with the production pallas kernel)."""
    import dataclasses
    from tests.test_agent import make_batch, tiny_config
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

    cfg = tiny_config(use_dynamic_field=False, apply_se3=False)
    nr = dataclasses.replace(cfg.method.neural_renderer, backend=backend)
    cfg = dataclasses.replace(
        cfg, method=dataclasses.replace(cfg.method, neural_renderer=nr))
    batch = make_batch(jax.random.PRNGKey(0))

    agent_1 = ManiGaussianBCAgent(cfg)
    state = agent_1.init_state(jax.random.PRNGKey(1), batch, training=True)
    _, metrics_1 = agent_1.update(state, batch, jax.random.PRNGKey(2))

    tmesh = make_mesh((2,), ("tile",))  # 32x32 img, 16px tiles -> 2x2 tiles
    agent_t = ManiGaussianBCAgent(cfg, tile_mesh=tmesh)
    state_t = agent_t.init_state(jax.random.PRNGKey(1), batch, training=True)
    new_state, metrics_t = agent_t.update(state_t, batch, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(metrics_1["rgb_loss"]),
                               float(metrics_t["rgb_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(metrics_1["total_loss"]),
                               float(metrics_t["total_loss"]), rtol=1e-4)
    for path, leaf in jax.tree_util.tree_leaves_with_path(new_state.params):
        assert bool(jnp.isfinite(leaf).all()), jax.tree_util.keystr(path)


@pytest.mark.slow
def test_tile_sharded_two_level_dup_and_overflow():
    """Sharded path parity features (round 3): two-level duplication produces
    the same image as single-level, and tile_capacity overflow is REPORTED
    (psum'd), not silently zero."""
    n = 160
    scene = random_scene(jax.random.PRNGKey(9), n, spread=0.25)
    c = make_camera(64, 64, focal=60.0)
    mesh = make_mesh((4,), ("tile",))
    base = rast.RasterizeConfig(width=64, height=64, tile=16,
                                max_tiles_per_gaussian=16, tile_capacity=128,
                                chunk=64, backend="xla")

    def render(cfg):
        return rasterize_sharded(mesh, scene["means3d"], scene["opacities"],
                                 c, cfg, BG, scales=scene["scales"],
                                 rotations=scene["rotations"],
                                 shs=scene["shs"])

    out_1lvl, _ = render(base)
    out_2lvl, _ = render(base._replace(small_rect_cap=2, big_table_cap=64))
    np.testing.assert_allclose(np.asarray(out_2lvl.color),
                               np.asarray(out_1lvl.color), atol=1e-6)

    # squeeze capacity: overflow counter must be visible through shard_map
    tiny = base._replace(tile_capacity=8, chunk=8)
    out_t, ext_t = render(tiny)
    _, ext_t1 = rast.rasterize(scene["means3d"], scene["opacities"], c, tiny,
                               BG, scales=scene["scales"],
                               rotations=scene["rotations"], shs=scene["shs"])
    assert int(ext_t.overflow_splats) > 0
    assert int(ext_t.overflow_splats) == int(ext_t1.overflow_splats)


@pytest.mark.slow
def test_2d_mesh_update_matches_single_device():
    """Combined data × tile sharding (VERDICT r2 item 3): a (4, 2) mesh with
    the batch on 'data' and the renderer's tiles shard_mapped over 'tile'
    computes the same update as one device."""
    import dataclasses
    from tests.test_agent import make_batch, tiny_config
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

    cfg = tiny_config(use_dynamic_field=False, apply_se3=False)
    cfg = dataclasses.replace(cfg, method=dataclasses.replace(
        cfg.method, policy_dtype="float32"))
    batch = make_batch(jax.random.PRNGKey(0), b=4)

    agent_1 = ManiGaussianBCAgent(cfg)
    state = agent_1.init_state(jax.random.PRNGKey(1), batch, training=True)
    _, metrics_1 = agent_1.update(state, batch, jax.random.PRNGKey(2))

    mesh2 = make_mesh((4, 2), ("data", "tile"))
    agent_2 = ManiGaussianBCAgent(cfg, tile_mesh=mesh2)
    sharded = make_sharded_update(agent_2, mesh2)
    state_r = replicate_state(state, mesh2)
    batch_s = shard_batch(batch, mesh2)
    new_state, metrics_2 = sharded(state_r, batch_s, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(metrics_1["rgb_loss"]),
                               float(metrics_2["rgb_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(metrics_1["total_loss"]),
                               float(metrics_2["total_loss"]), rtol=1e-4)
    for path, leaf in jax.tree_util.tree_leaves_with_path(new_state.params):
        assert bool(jnp.isfinite(leaf).all()), jax.tree_util.keystr(path)


@pytest.mark.slow
def test_data_parallel_update_matches_single_device():
    """DP over 8 virtual devices computes the same update as one device."""
    from tests.test_agent import make_batch, tiny_config
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

    import dataclasses

    cfg = tiny_config(use_neural_rendering=False, apply_se3=False)
    # fp32 policy: this test pins SHARDING parity at rtol 1e-5; bf16 batch-8
    # vs 8x-batch-1 conv tilings legitimately reassociate (~1e-4 rel)
    cfg = dataclasses.replace(cfg, method=dataclasses.replace(
        cfg.method, policy_dtype="float32"))
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(0), b=8)
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True)

    # single device
    _, metrics_1 = agent.update(state, batch, jax.random.PRNGKey(2))

    mesh = make_mesh((8,), ("data",))
    sharded = make_sharded_update(agent, mesh)
    state_r = replicate_state(state, mesh)
    batch_s = shard_batch(batch, mesh)
    _, metrics_8 = sharded(state_r, batch_s, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(metrics_1["bc_loss"]),
                               float(metrics_8["bc_loss"]), rtol=1e-5)
