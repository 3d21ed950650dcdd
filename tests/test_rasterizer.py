"""Stage-2/3 tests: oracle rasterizer semantics + production/oracle parity + grads.

Parity targets: forward.cu:262-398 (blend), rasterizer_impl.cu:198-355 (pipeline),
backward.cu (gradients, via finite differences + autodiff cross-check).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manigaussian_tpu.ops import gaussian_math as gm
from manigaussian_tpu.ops import rasterizer as rast
from manigaussian_tpu.ops import rasterizer_ref as ref
from tests.helpers import assert_mostly_close, make_camera, random_scene

BG = (0.0, 0.0, 0.0)


def test_empty_scene_renders_background():
    c = make_camera(32, 32)
    out = ref.rasterize_reference(
        means3d=jnp.zeros((4, 3)).at[:, 2].set(-5.0),  # all behind camera
        opacities=jnp.full((4,), 0.9), camera=c, width=32, height=32,
        bg_color=(0.2, 0.4, 0.6), scales=jnp.full((4, 3), 0.05),
        rotations=jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1)),
        shs=jnp.zeros((4, 4, 3)))
    img = np.asarray(out.color)
    np.testing.assert_allclose(img[..., 0], 0.2, atol=1e-6)
    np.testing.assert_allclose(img[..., 2], 0.6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.final_t), 1.0, atol=1e-6)


def test_single_gaussian_blob():
    c = make_camera(64, 64, focal=60.0)
    out = ref.rasterize_reference(
        means3d=jnp.array([[0.0, 0.0, 2.0]]), opacities=jnp.array([0.9]),
        camera=c, width=64, height=64, bg_color=BG,
        scales=jnp.array([[0.05, 0.05, 0.05]]),
        rotations=jnp.array([[1.0, 0, 0, 0]]),
        colors_precomp=jnp.array([[1.0, 0.0, 0.0]]))
    img = np.asarray(out.color)
    # red blob at center, dark corners
    cy, cx = 31, 31
    assert img[cy, cx, 0] > 0.5
    assert img[cy, cx, 1] == 0.0
    assert img[0, 0, 0] < 1e-3
    # center alpha ~ 0.9 -> final_t ~ 0.1
    assert np.asarray(out.final_t)[cy, cx] < 0.2


def test_front_to_back_occlusion():
    c = make_camera(64, 64, focal=60.0)
    # nearly opaque red in front of green
    means = jnp.array([[0.0, 0.0, 1.5], [0.0, 0.0, 2.5]])
    out = ref.rasterize_reference(
        means3d=means, opacities=jnp.array([0.99, 0.99]), camera=c,
        width=64, height=64, bg_color=BG,
        scales=jnp.full((2, 3), 0.08),
        rotations=jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1)),
        colors_precomp=jnp.array([[1.0, 0, 0], [0, 1.0, 0]]))
    img = np.asarray(out.color)
    assert img[31, 31, 0] > 0.9
    assert img[31, 31, 1] < 0.05


def test_termination_latch():
    """Stacked opaque splats: once T < 1e-4 later splats contribute nothing."""
    c = make_camera(32, 32, focal=30.0)
    n = 64
    means = jnp.zeros((n, 3)).at[:, 2].set(1.0 + 0.01 * jnp.arange(n))
    out = ref.rasterize_reference(
        means3d=means, opacities=jnp.full((n,), 0.99), camera=c,
        width=32, height=32, bg_color=(1.0, 1.0, 1.0),
        scales=jnp.full((n, 3), 0.5),
        rotations=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        colors_precomp=jnp.ones((n, 3)))
    t = np.asarray(out.final_t)
    # T freezes at the first test_T < 1e-4 so it never goes below 1e-4*(1-0.99)... but
    # must be >= 1e-4 (the latch) and the image saturated to splat color 1.
    assert (t[15, 15] >= 1e-4) and (t[15, 15] < 2e-2)
    np.testing.assert_allclose(np.asarray(out.color)[15, 15], 1.0, atol=2e-2)


def test_language_feature_channel():
    c = make_camera(32, 32, focal=30.0)
    out = ref.rasterize_reference(
        means3d=jnp.array([[0.0, 0.0, 2.0]]), opacities=jnp.array([0.9]),
        camera=c, width=32, height=32, bg_color=(1.0, 1.0, 1.0),
        scales=jnp.array([[0.1, 0.1, 0.1]]),
        rotations=jnp.array([[1.0, 0, 0, 0]]),
        colors_precomp=jnp.array([[1.0, 0.0, 0.0]]),
        language_features=jnp.array([[0.0, 2.0, 0.0]]))
    # language channel gets NO background contribution (forward.cu:390-394)
    lang = np.asarray(out.language_feature)
    assert lang[15, 15, 1] > 1.0
    np.testing.assert_allclose(lang[0, 0], 0.0, atol=1e-4)


@pytest.mark.parametrize("n", [64, pytest.param(300, marks=pytest.mark.slow)])
def test_production_matches_oracle(n):
    key = jax.random.PRNGKey(42)
    scene = random_scene(key, n, spread=0.4)
    c = make_camera(64, 64, focal=60.0)
    cfg = rast.RasterizeConfig(width=64, height=64, tile=16,
                               max_tiles_per_gaussian=16,
                               tile_capacity=n if n % 64 == 0 else 320,
                               chunk=64, sh_degree=1)
    out_p, extras = rast.rasterize(
        scene["means3d"], scene["opacities"], c, cfg, BG,
        scales=scene["scales"], rotations=scene["rotations"], shs=scene["shs"],
        language_features=scene["language_features"])
    out_r = ref.rasterize_reference(
        scene["means3d"], scene["opacities"], c, 64, 64, BG,
        scales=scene["scales"], rotations=scene["rotations"], shs=scene["shs"],
        language_features=scene["language_features"], sh_degree=1)
    assert int(extras.overflow_splats) == 0
    assert_mostly_close(out_p.color, out_r.color, atol=1e-5, rtol=1e-4,
                        err_msg="color")
    assert_mostly_close(out_p.language_feature, out_r.language_feature,
                        atol=1e-5, rtol=1e-4, err_msg="lang")
    # final_t goes through exp(Σlog1p) with different accumulation order in the
    # pallas (triangular-matmul) backend — tolerance reflects fp32 reassociation
    assert_mostly_close(out_p.final_t, out_r.final_t, atol=1e-4, rtol=1e-4,
                        err_msg="final_t")
    np.testing.assert_array_equal(np.asarray(out_p.radii), np.asarray(out_r.radii))


@pytest.mark.slow
def test_production_matches_oracle_gradients():
    n = 96
    key = jax.random.PRNGKey(7)
    scene = random_scene(key, n, spread=0.3)
    c = make_camera(32, 32, focal=30.0)
    cfg = rast.RasterizeConfig(width=32, height=32, tile=16,
                               max_tiles_per_gaussian=8, tile_capacity=n,
                               chunk=32, sh_degree=1)
    tgt = jax.random.uniform(jax.random.PRNGKey(9), (32, 32, 3))

    def loss_p(means, scales, rots, opac, shs, lang):
        out, _ = rast.rasterize(means, opac, c, cfg, BG, scales=scales,
                                rotations=rots, shs=shs, language_features=lang)
        return jnp.sum((out.color - tgt) ** 2) + jnp.sum(out.language_feature ** 2)

    def loss_r(means, scales, rots, opac, shs, lang):
        out = ref.rasterize_reference(means, opac, c, 32, 32, BG, scales=scales,
                                      rotations=rots, shs=shs,
                                      language_features=lang, sh_degree=1)
        return jnp.sum((out.color - tgt) ** 2) + jnp.sum(out.language_feature ** 2)

    args = (scene["means3d"], scene["scales"], scene["rotations"],
            scene["opacities"], scene["shs"], scene["language_features"])
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4, 5))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b, name in zip(gp, gr, ["means", "scales", "rots", "opac", "shs", "lang"]):
        assert_mostly_close(a, b, atol=1e-4, rtol=1e-3, max_frac=0.02,
                            err_msg=name)


@pytest.mark.slow
def test_gradients_match_finite_differences():
    """Spot-check autodiff vs central differences on a small scene (oracle)."""
    n = 8
    scene = random_scene(jax.random.PRNGKey(3), n, spread=0.2)
    c = make_camera(16, 16, focal=15.0)

    def loss(means, opac):
        out = ref.rasterize_reference(
            means, opac, c, 16, 16, BG, scales=scene["scales"],
            rotations=scene["rotations"], shs=scene["shs"], sh_degree=1)
        return jnp.sum(out.color * jnp.cos(jnp.arange(16 * 16 * 3).reshape(16, 16, 3)))

    means, opac = scene["means3d"], scene["opacities"]
    g_means, g_opac = jax.grad(loss, argnums=(0, 1))(means, opac)
    eps = 1e-3
    for idx in [(0, 0), (3, 2), (5, 1)]:
        e = jnp.zeros_like(means).at[idx].set(eps)
        fd = (loss(means + e, opac) - loss(means - e, opac)) / (2 * eps)
        np.testing.assert_allclose(float(g_means[idx]), float(fd), rtol=2e-2,
                                   atol=2e-3)
    for i in [0, 4]:
        e = jnp.zeros_like(opac).at[i].set(eps)
        fd = (loss(means, opac + e) - loss(means, opac - e)) / (2 * eps)
        np.testing.assert_allclose(float(g_opac[i]), float(fd), rtol=2e-2, atol=2e-3)


@pytest.mark.slow
def test_pallas_vs_xla_backends_agree():
    """The two production backends run the same binning; fwd+grads must agree."""
    n = 128
    scene = random_scene(jax.random.PRNGKey(21), n, spread=0.35)
    c = make_camera(64, 64, focal=60.0)
    tgt = jax.random.uniform(jax.random.PRNGKey(22), (64, 64, 3))

    def loss(backend, means, scales):
        cfg = rast.RasterizeConfig(width=64, height=64, tile=16,
                                   max_tiles_per_gaussian=16, tile_capacity=128,
                                   chunk=64, backend=backend)
        out, _ = rast.rasterize(means, scene["opacities"], c, cfg, BG,
                                scales=scales, rotations=scene["rotations"],
                                shs=scene["shs"],
                                language_features=scene["language_features"])
        return (jnp.sum((out.color - tgt) ** 2)
                + jnp.sum(out.language_feature ** 2))

    args = (scene["means3d"], scene["scales"])
    lp = float(loss("pallas", *args))
    lx = float(loss("xla", *args))
    np.testing.assert_allclose(lp, lx, rtol=1e-4)
    gp = jax.grad(loss, argnums=(1, 2))("pallas", *args)
    gx = jax.grad(loss, argnums=(1, 2))("xla", *args)
    for a, b, name in zip(gp, gx, ["means", "scales"]):
        assert_mostly_close(a, b, atol=1e-4, rtol=1e-3, max_frac=0.02,
                            err_msg=name)


@pytest.mark.slow
def test_pallas_gradients_match_finite_differences():
    """Validate the hand-written analytic VJP directly (central differences)."""
    n = 16
    scene = random_scene(jax.random.PRNGKey(31), n, spread=0.25)
    c = make_camera(32, 32, focal=30.0)
    cfg = rast.RasterizeConfig(width=32, height=32, tile=16,
                               max_tiles_per_gaussian=4, tile_capacity=16,
                               chunk=16, backend="pallas")

    def loss(means, opac):
        out, _ = rast.rasterize(means, opac, c, cfg, BG,
                                scales=scene["scales"],
                                rotations=scene["rotations"], shs=scene["shs"])
        return jnp.sum(out.color * jnp.cos(
            jnp.arange(32 * 32 * 3).reshape(32, 32, 3)))

    means, opac = scene["means3d"], scene["opacities"]
    g_means, g_opac = jax.grad(loss, argnums=(0, 1))(means, opac)
    eps = 1e-3
    for idx in [(0, 0), (5, 1), (11, 2)]:
        e = jnp.zeros_like(means).at[idx].set(eps)
        fd = (loss(means + e, opac) - loss(means - e, opac)) / (2 * eps)
        np.testing.assert_allclose(float(g_means[idx]), float(fd), rtol=3e-2,
                                   atol=3e-3)
    for i in [2, 9]:
        e = jnp.zeros_like(opac).at[i].set(eps)
        fd = (loss(means, opac + e) - loss(means, opac - e)) / (2 * eps)
        np.testing.assert_allclose(float(g_opac[i]), float(fd), rtol=3e-2,
                                   atol=3e-3)


def test_tile_capacity_overflow_reported():
    n = 64
    scene = random_scene(jax.random.PRNGKey(5), n, spread=0.05)  # all in one spot
    c = make_camera(32, 32, focal=30.0)
    cfg = rast.RasterizeConfig(width=32, height=32, tile=16,
                               max_tiles_per_gaussian=8, tile_capacity=16,
                               chunk=16)
    _, extras = rast.rasterize(
        scene["means3d"], scene["opacities"], c, cfg, BG,
        scales=scene["scales"], rotations=scene["rotations"], shs=scene["shs"])
    assert int(extras.overflow_splats) > 0


def test_jit_and_vmap_compatible():
    n = 32
    scene = random_scene(jax.random.PRNGKey(11), n)
    c = make_camera(32, 32, focal=30.0)
    cfg = rast.RasterizeConfig(width=32, height=32, tile=16,
                               max_tiles_per_gaussian=8, tile_capacity=32, chunk=32)

    @jax.jit
    def render(means):
        out, _ = rast.rasterize(means, scene["opacities"], c, cfg, BG,
                                scales=scene["scales"],
                                rotations=scene["rotations"], shs=scene["shs"])
        return out.color

    img = render(scene["means3d"])
    assert img.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.slow
def test_two_level_duplication_matches_single_level(backend):
    """small_rect_cap + big-table compaction (RasterizeConfig two-level
    duplication) renders the IDENTICAL splat set when the big table covers
    every large-rect gaussian — same image, same grads; with an undersized
    table it degrades gracefully (overflow_gaussians counts the dropped
    rect slots, output stays finite)."""
    n = 256
    scene = random_scene(jax.random.PRNGKey(11), n, spread=0.35)
    scene["scales"] = scene["scales"].at[:12].set(0.22)   # big rects
    c = make_camera(64, 64, focal=60.0)
    base = rast.RasterizeConfig(width=64, height=64, tile=16,
                                max_tiles_per_gaussian=16, tile_capacity=512,
                                chunk=64, sh_degree=1, backend=backend)
    two = base._replace(small_rect_cap=4, big_table_cap=64)

    def loss(cfg, means, scales):
        out, ex = rast.rasterize(means, scene["opacities"], c, cfg, BG,
                                 scales=scales, rotations=scene["rotations"],
                                 shs=scene["shs"],
                                 language_features=scene["language_features"])
        return jnp.sum(out.color ** 2) + jnp.sum(out.final_t), (out, ex)

    (l1, (o1, e1)), g1 = jax.value_and_grad(
        lambda m, s: loss(base, m, s), argnums=(0, 1), has_aux=True)(
        scene["means3d"], scene["scales"])
    (l2, (o2, e2)), g2 = jax.value_and_grad(
        lambda m, s: loss(two, m, s), argnums=(0, 1), has_aux=True)(
        scene["means3d"], scene["scales"])
    assert int(e1.overflow_gaussians) == 0
    assert int(e2.overflow_gaussians) == 0
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    assert_mostly_close(o1.color, o2.color, atol=1e-5, rtol=1e-4)
    for a, b in zip(g1, g2):
        assert_mostly_close(a, b, atol=1e-4, rtol=1e-3, max_frac=0.02)

    tiny = base._replace(small_rect_cap=4, big_table_cap=2)
    out3, e3 = rast.rasterize(scene["means3d"], scene["opacities"], c, tiny,
                              BG, scales=scene["scales"],
                              rotations=scene["rotations"], shs=scene["shs"],
                              language_features=scene["language_features"])
    assert int(e3.overflow_gaussians) > 0
    assert bool(jnp.isfinite(out3.color).all())
