"""Model-zoo tests: positional encoding parity vs torch, regressor shapes/semantics,
perceiver forward shapes (tiny dims), neural renderer end-to-end smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from manigaussian_tpu.models.gaussian_regressor import (MAX_SCALE,
                                                        GeneralizableGSEmbedNet)
from manigaussian_tpu.models.perceiver import PerceiverVoxelLangEncoder
from manigaussian_tpu.models.positional import PositionalEncoding


def test_positional_encoding_matches_torch_reference():
    """Parity vs utils.py:133-169 semantics (interleaved sin/cos, input first)."""
    pe = PositionalEncoding(num_freqs=6, d_in=3, freq_factor=1.5)
    assert pe.d_out == 39
    x = np.random.RandomState(0).randn(5, 3).astype(np.float32)

    # torch oracle, transcribed formula
    freqs = 1.5 * 2.0 ** torch.arange(0, 6)
    _freqs = torch.repeat_interleave(freqs, 2).view(1, -1, 1)
    _phases = torch.zeros(12)
    _phases[1::2] = np.pi * 0.5
    _phases = _phases.view(1, -1, 1)
    xt = torch.tensor(x)
    embed = xt.unsqueeze(1).repeat(1, 12, 1)
    embed = torch.sin(torch.addcmul(_phases, embed, _freqs)).view(5, -1)
    expected = torch.cat((xt, embed), dim=-1).numpy()

    np.testing.assert_allclose(np.asarray(pe(jnp.array(x))), expected,
                               rtol=1e-5, atol=1e-6)


def test_positional_encoding_batch_shapes():
    pe = PositionalEncoding(num_freqs=6, d_in=3, freq_factor=1.5)
    out = pe(jnp.zeros((2, 7, 3)))
    assert out.shape == (2, 7, 39)


def _tiny_regressor(use_dynamic_field=False, use_semantic_feature=False):
    return GeneralizableGSEmbedNet(
        coordinate_bounds=(-1.0, -1.0, 0.0, 1.0, 1.0, 2.0),
        d_latent=16, d_hidden=32, n_blocks=2,
        use_dynamic_field=use_dynamic_field,
        use_semantic_feature=use_semantic_feature,
        next_d_hidden=32, next_n_blocks=2)


def test_gaussian_regressor_shapes_and_activations():
    model = _tiny_regressor()
    B, N, V = 2, 50, 8
    xyz = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3)) * 0.5
    vox = jax.random.normal(jax.random.PRNGKey(1), (B, V, V, V, 16))
    params = model.init(jax.random.PRNGKey(2), xyz, vox)
    out = model.apply(params, xyz, vox)

    assert out["xyz"].shape == (B, N, 3)
    assert out["sh"].shape == (B, N, 4, 3)
    assert out["rot"].shape == (B, N, 4)
    assert out["scale"].shape == (B, N, 3)
    assert out["opacity"].shape == (B, N, 1)
    assert out["feature"].shape == (B, N, 3)
    # activations: unit quats, bounded scale, sigmoid opacity
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out["rot"]), axis=-1),
                               1.0, atol=1e-5)
    assert float(jnp.max(out["scale"])) <= MAX_SCALE + 1e-6
    assert float(jnp.min(out["opacity"])) >= 0.0
    assert float(jnp.max(out["opacity"])) <= 1.0
    assert "next" not in out


@pytest.mark.slow
def test_gaussian_regressor_dynamic_field_detached():
    """Deformation branch: next params exist; grads through 'next' must NOT flow
    into the encoder (stop_gradient parity with models_embed.py:256-304)."""
    model = _tiny_regressor(use_dynamic_field=True)
    B, N, V = 1, 20, 8
    xyz = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3)) * 0.5
    vox = jax.random.normal(jax.random.PRNGKey(1), (B, V, V, V, 16))
    action = jnp.ones((B, 8))
    variables = model.init(jax.random.PRNGKey(2), xyz, vox, action)
    out = model.apply(variables, xyz, vox, action)
    assert out["next"]["xyz"].shape == (B, N, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["next"]["rot"]), axis=-1), 1.0, atol=1e-5)

    def loss_next(v):
        o = model.apply(v, xyz, vox, action)
        return jnp.sum(o["next"]["xyz"] ** 2)

    g = jax.grad(loss_next)(variables)
    enc_g = jax.tree_util.tree_leaves(g["params"]["encoder"])
    assert all(float(jnp.abs(x).max()) == 0.0 for x in enc_g), \
        "encoder must not receive gradients through the detached next-frame branch"
    def_g = jax.tree_util.tree_leaves(g["params"]["deformation"])
    assert any(float(jnp.abs(x).max()) > 0.0 for x in def_g)


def test_perceiver_forward_shapes_tiny():
    model = PerceiverVoxelLangEncoder(
        depth=2, voxel_size=20, initial_dim=10, low_dim_size=4,
        num_rotation_classes=72, num_latents=32, im_channels=16,
        latent_dim=32, cross_dim_head=8, latent_dim_head=8,
        lang_emb_dim=512, lang_max_seq_len=77,
        voxel_patch_size=5, voxel_patch_stride=5, final_dim=16,
        unet_channels=(4, 8, 8, 8))
    B, V = 1, 20
    vox = jnp.zeros((B, V, V, V, 10))
    proprio = jnp.zeros((B, 4))
    lang_goal = jnp.zeros((B, 1024))
    lang_tok = jnp.zeros((B, 77, 512))
    params = model.init(jax.random.PRNGKey(0), vox, proprio, lang_goal, lang_tok)
    trans, rot_grip, collision, d0, lang = model.apply(
        params, vox, proprio, lang_goal, lang_tok)
    assert trans.shape == (B, V, V, V, 1)
    assert rot_grip.shape == (B, 72 * 3 + 2)
    assert collision.shape == (B, 2)
    assert d0.shape == (B, V, V, V, 16)
    assert lang.shape == (B, 77, 32)


@pytest.mark.slow
def test_neural_renderer_end_to_end_tiny():
    from manigaussian_tpu.rendering.neural_renderer import NeuralRenderer

    B, N, V = 1, 64, 8
    H = W = 32
    bounds = (-1.0, -1.0, 0.5, 1.0, 1.0, 2.5)
    nr = NeuralRenderer(
        coordinate_bounds=bounds, image_width=W, image_height=H,
        use_dynamic_field=True, d_latent=16,
        tile=16, max_tiles_per_gaussian=4, tile_capacity=64, chunk=32)

    key = jax.random.PRNGKey(0)
    pcd = jax.random.uniform(key, (B, N, 3), minval=-0.3, maxval=0.3) \
        + jnp.array([0.0, 0.0, 1.5])
    dec_fts = jax.random.normal(jax.random.PRNGKey(1), (B, V, V, V, 16)) * 0.1
    intr = jnp.tile(jnp.array([[30.0, 0, 16.0], [0, 30.0, 16.0], [0, 0, 1.0]]),
                    (B, 1, 1))
    pose = jnp.tile(jnp.eye(4), (B, 1, 1))  # camera at origin looking +z (c2w)
    gt_rgb = jnp.zeros((B, H, W, 3))
    action = jnp.zeros((B, 8))

    variables = nr.init(jax.random.PRNGKey(2), pcd, dec_fts, gt_rgb, pose, intr,
                        gt_rgb, pose, intr, None, action, 0)
    losses, result = nr.apply(variables, pcd, dec_fts, gt_rgb, pose, intr,
                              gt_rgb, pose, intr, None, action, 5000)
    assert result.render_novel.shape == (B, H, W, 3)
    assert result.next_render_novel.shape == (B, H, W, 3)
    assert np.isfinite(float(losses.loss))
    assert float(losses.loss_dyna) >= 0.0

    # gradient flows end-to-end
    def loss_fn(v):
        l, _ = nr.apply(v, pcd, dec_fts, gt_rgb, pose, intr,
                        gt_rgb, pose, intr, None, action, 5000)
        return l.loss

    g = jax.grad(loss_fn)(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
