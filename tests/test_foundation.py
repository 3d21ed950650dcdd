"""Foundation-feature tests: PCA parity vs torch.pca_lowrank, extractor shapes,
semantic (w_geo_sem) train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from manigaussian_tpu.models.foundation import (StubFeatureExtractor,
                                                extract_gt_embed,
                                                pca_to_channels)


def test_pca_matches_torch_pca_lowrank():
    """neural_rendering.py:159-162: reconstructed = A @ pca_lowrank(A).V[:, :3]."""
    rs = np.random.RandomState(0)
    # strong spectral decay (like real image features): torch.pca_lowrank is a
    # RANDOMIZED approximation — only well-separated components are comparable
    basis = rs.randn(16, 16).astype(np.float32)
    weights = rs.randn(100, 16).astype(np.float32) * (2.0 ** -np.arange(16))
    A = (weights @ basis).astype(np.float32)
    ours = np.asarray(pca_to_channels(jnp.array(A), 3))
    _u, _s, V = torch.pca_lowrank(torch.tensor(A), q=6)
    theirs = (torch.tensor(A) @ V[:, :3]).numpy()
    # principal directions are sign-ambiguous per component
    for k in range(3):
        d_same = np.abs(ours[:, k] - theirs[:, k]).max()
        d_flip = np.abs(ours[:, k] + theirs[:, k]).max()
        assert min(d_same, d_flip) < 2e-3, (k, d_same, d_flip)


def test_pca_lowrank_matches_exact_subspace():
    """The randomized path ('lowrank', what the reference's torch.pca_lowrank
    runs) and the exact-SVD path span the same top-3 projection on a
    well-separated spectrum (projector Frobenius distance)."""
    rs = np.random.RandomState(1)
    basis = rs.randn(32, 32).astype(np.float32)
    weights = rs.randn(400, 32).astype(np.float32) * (2.0 ** -np.arange(32))
    A = jnp.array((weights @ basis).astype(np.float32))
    lr = np.asarray(pca_to_channels(A, 3, method="lowrank"))
    ex = np.asarray(pca_to_channels(A, 3, method="exact"))
    # compare projections componentwise up to sign (like the torch test)
    for k in range(3):
        d = min(np.abs(lr[:, k] - ex[:, k]).max(),
                np.abs(lr[:, k] + ex[:, k]).max())
        assert d < 2e-3, (k, d)


def test_stub_extractor_deterministic_and_shaped():
    ex = StubFeatureExtractor(out_channels=16)
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    f1 = ex(rgb)
    f2 = ex(rgb)
    assert f1.shape == (2, 16, 16, 16)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_extract_gt_embed_shape():
    ex = StubFeatureExtractor(out_channels=16)
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    embed = extract_gt_embed(rgb, ex, d_embed=3)
    assert embed.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(embed)).all()


@pytest.mark.slow
def test_semantic_train_step():
    """w_geo_sem tier: gt_embed supervision produces a nonzero embed loss and
    gradients into the language-feature head."""
    from tests.test_agent import make_batch, tiny_config
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
    import dataclasses

    cfg = tiny_config(use_dynamic_field=False)
    cfg = dataclasses.replace(cfg, method=dataclasses.replace(
        cfg.method, neural_renderer=dataclasses.replace(
            cfg.method.neural_renderer, foundation_model_name="diffusion")))
    agent = ManiGaussianBCAgent(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    ex = StubFeatureExtractor(out_channels=8)
    batch["gt_embed"] = extract_gt_embed(batch["nerf_target_rgb"], ex, 3)
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True)
    _, metrics = agent.update(state, batch, jax.random.PRNGKey(2))
    assert float(metrics["embed_loss"]) != 0.0
    assert np.isfinite(float(metrics["total_loss"]))


def test_sd_vae_make_embed_fn_matches_extract_gt_embed():
    """SDVaeFeatureExtractor.make_embed_fn (weights as jit ARGUMENTS — the
    outer-jit closure variant bakes the VAE params into the HLO and the
    remote-compile tunnel rejects it, r5 campaign) produces the same GT
    embed as the generic extract_gt_embed path."""
    from manigaussian_tpu.models.foundation import SDVaeFeatureExtractor

    ex = SDVaeFeatureExtractor(None, feature_hw=64)
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    a = ex.make_embed_fn(3)(rgb)
    b = extract_gt_embed(rgb, ex, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-4, rtol=2e-4)
