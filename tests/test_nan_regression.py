"""Regression tests for the round-1 NaN bug class (STATUS.md / VERDICT.md).

The full-tier (w_geo_sem_dyna) training NaN'd within steps 2-10 on TPU. The
diagnosed mechanisms, each pinned here with the degenerate inputs that
triggered it, asserting EVERY grad leaf stays finite:

  1. warm-up gate: the reference multiplies the next-frame loss by 0 during
     warm-up (neural_rendering.py:323-329) but a zero cotangent still flows
     through the branch jacobian — 0 x inf = NaN. Our lax.cond gate
     (rendering/neural_renderer.py:149-166) removes the branch entirely;
     test: step < warm_up with a degenerate scene must give finite grads.
  2. zero-embed pixels: rendered embedding pixels are EXACTLY zero wherever
     nothing splats (feature channels get no background, forward.cu:388-394);
     a clamped-norm cosine loss emits 1/eps-scale grads there. Our smooth-eps
     cosine (ops/losses.py:27-41) bounds them; test: gt_embed == 0 everywhere
     AND a scene where most pixels receive no splats.
  3. near-camera gaussians: points at/behind the camera center produce z <= 0,
     degenerate EWA projection jacobians (1/z^2 -> inf). Culling plus eps
     guards must keep grads finite; test: pcd clustered at the camera origin.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
from tests.test_agent import make_batch, tiny_config


def _full_tier_config(warm_up=10):
    cfg = tiny_config(use_dynamic_field=True)
    nr = dataclasses.replace(
        cfg.method.neural_renderer,
        foundation_model_name="diffusion",
        next_mlp=dataclasses.replace(cfg.method.neural_renderer.next_mlp,
                                     warm_up=warm_up))
    return dataclasses.replace(
        cfg, method=dataclasses.replace(cfg.method, neural_renderer=nr))


def _grad_leaves_finite(agent, state, batch, key):
    """Run one update and return (all_finite, offending leaf paths)."""
    # grads are what poison params; check the *updated params* (post-LAMB),
    # which also covers the optimizer path (trust ratio etc.).
    new_state, metrics = agent.update(state, batch, key)
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(new_state.params):
        if not bool(jnp.isfinite(leaf).all()):
            bad.append(jax.tree_util.keystr(path))
    return len(bad) == 0, bad, metrics


@pytest.mark.parametrize("step", [0, 5])
@pytest.mark.slow
def test_warmup_gate_degenerate_scene_finite_grads(step):
    """step < warm_up with near-camera points + zero embeds: the exact poison
    combination of round 1 must produce finite updated params."""
    cfg = _full_tier_config(warm_up=10)
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    # degenerate scene: all points AT the camera origin (z ~ 0 in cam frame)
    batch["pcd"] = jnp.zeros_like(batch["pcd"]) + jnp.asarray([0.0, 0.0, 0.0])
    # zero GT embedding — the no-background feature channels case
    img = batch["nerf_target_rgb"].shape[1]
    batch["gt_embed"] = jnp.zeros((1, img, img, 3))
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True)
    state = state._replace(step=jnp.asarray(step, jnp.int32))
    ok, bad, metrics = _grad_leaves_finite(agent, state, batch,
                                           jax.random.PRNGKey(2))
    assert ok, f"non-finite params after update at step={step}: {bad[:10]}"
    assert np.isfinite(float(metrics["total_loss"]))


@pytest.mark.slow
def test_post_warmup_degenerate_scene_finite_grads():
    """Past warm-up the dyna branch is LIVE; near-camera splats + empty embed
    pixels must still yield finite grads through the next-frame render."""
    cfg = _full_tier_config(warm_up=2)
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    batch["pcd"] = jnp.zeros_like(batch["pcd"])
    img = batch["nerf_target_rgb"].shape[1]
    batch["gt_embed"] = jnp.zeros((1, img, img, 3))
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True)
    state = state._replace(step=jnp.asarray(100, jnp.int32))
    ok, bad, metrics = _grad_leaves_finite(agent, state, batch,
                                           jax.random.PRNGKey(2))
    assert ok, f"non-finite params: {bad[:10]}"


@pytest.mark.slow
def test_sparse_scene_zero_embed_pixels_finite():
    """A few splats covering a small image region: most embed pixels are
    exactly zero (no background in feature channels). Cosine loss grads must
    stay bounded (smooth-eps, ops/losses.py:27-41)."""
    cfg = _full_tier_config(warm_up=2)
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    # tight cluster far from camera -> tiny on-screen footprint
    batch["pcd"] = (jnp.zeros_like(batch["pcd"])
                    + jnp.asarray([0.0, 0.0, 2.5])
                    + 0.01 * jax.random.normal(jax.random.PRNGKey(3),
                                               batch["pcd"].shape))
    img = batch["nerf_target_rgb"].shape[1]
    batch["gt_embed"] = jax.random.normal(
        jax.random.PRNGKey(4), (1, img, img, 3)) * 0.1
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True)
    state = state._replace(step=jnp.asarray(50, jnp.int32))
    ok, bad, _ = _grad_leaves_finite(agent, state, batch,
                                     jax.random.PRNGKey(2))
    assert ok, f"non-finite params: {bad[:10]}"


@pytest.mark.slow
def test_multi_step_degenerate_training_stays_finite():
    """Run 5 consecutive updates through the warm-up boundary (steps 0..4,
    warm_up=3) on a half-degenerate batch; params must remain finite at every
    step — the round-1 failure appeared at steps 2-10."""
    cfg = _full_tier_config(warm_up=3)
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    b = batch["pcd"]
    # half the points at the camera, half in a normal cluster
    flat = b.reshape(-1, 3)
    n = flat.shape[0]
    flat = flat.at[: n // 2].set(0.0)
    batch["pcd"] = flat.reshape(b.shape)
    img = batch["nerf_target_rgb"].shape[1]
    batch["gt_embed"] = jnp.zeros((1, img, img, 3))
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True)
    upd = agent.jit_update(donate=False)
    for i in range(5):
        state, metrics = upd(state, batch, jax.random.PRNGKey(10 + i))
        assert np.isfinite(float(metrics["total_loss"])), f"step {i} loss NaN"
        for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
            assert bool(jnp.isfinite(leaf).all()), (
                f"step {i}: non-finite {jax.tree_util.keystr(path)}")


def test_overflowed_scale_and_tiny_rot_finite_grads():
    """Root cause of a mid-training NaN (round 3): once a scale logit crosses
    ~88, min(exp(x), c)'s backward is 0·inf = NaN; near-zero raw quaternions
    similarly emit O(1/eps) normalize gradients. Force both pathologies into
    the regressor head and require finite gradients end-to-end."""
    from manigaussian_tpu.models.gaussian_regressor import GeneralizableGSEmbedNet

    net = GeneralizableGSEmbedNet(d_latent=8, d_hidden=16, n_blocks=2,
                                  combine_layer=1)
    xyz = jnp.array([[[0.2, 0.0, 1.1], [0.21, 0.01, 1.11]]])   # [1, 2, 3]
    vox = jnp.zeros((1, 4, 4, 4, 8))
    variables = net.init(jax.random.PRNGKey(0), xyz, vox)

    # regresser output = Dense(h); force the scale split's bias to +200
    # (exp overflow) and the rot split's kernel+bias to ~0 (zero-norm quat)
    p = jax.device_get(variables)
    dense = p["params"]["regresser"]["Dense_0"]
    b = np.asarray(dense["bias"]).copy()
    k = np.asarray(dense["kernel"]).copy()
    b[4:7] = 200.0          # scale split (after Δxyz 3 + opacity 1)
    b[7:11] = 0.0           # rot split
    k[:, 7:11] = 0.0
    dense["bias"], dense["kernel"] = jnp.asarray(b), jnp.asarray(k)

    def loss(v):
        out = net.apply(v, xyz, vox)
        return (jnp.sum(out["scale"]) + jnp.sum(out["rot"] ** 2)
                + jnp.sum(out["xyz"] ** 2) + jnp.sum(out["opacity"]))

    val, g = jax.value_and_grad(loss)(p)
    assert bool(jnp.isfinite(val))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert bool(jnp.isfinite(leaf).all()), jax.tree_util.keystr(path)
