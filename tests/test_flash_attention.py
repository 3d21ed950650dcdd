"""Parity of the Pallas flash self-attention (ops/flash_attention.py) vs the
XLA attention path in models/perceiver.Attention.

Reference semantics: perceiver_lang_io.py:102-145 (fp32-softmax attention
with dropout on the probabilities). Both impls here are the same math; these
tests pin values and all input grads, plus the dropout mask's statistics and
fwd/bwd mask consistency. CPU runs use Pallas interpret mode (conftest forces
the CPU platform)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manigaussian_tpu.models.perceiver import Attention
from manigaussian_tpu.ops.flash_attention import flash_self_attention


def _qkv(key, b=1, h=4, n=128, d=32, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, h, n, d), dtype) for k in ks)


def _xla_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhid,bhjd->bhij", q * scale, k,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("dtype,n,d,tol", [
    (jnp.float32, 128, 32, 1e-5),
    (jnp.float32, 512, 64, 1e-5),   # multi-block (block_q=256)
    (jnp.bfloat16, 256, 64, 2e-2),
])
def test_forward_parity(dtype, n, d, tol):
    q, k, v = _qkv(jax.random.PRNGKey(0), n=n, d=d, dtype=dtype)
    bq = min(256, n)
    out = flash_self_attention(q, k, v, block_q=bq)
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=tol)


def test_grad_parity():
    q, k, v = _qkv(jax.random.PRNGKey(1), h=2, n=512, d=32)
    tgt = jax.random.normal(jax.random.PRNGKey(2), q.shape)

    def loss(fn, q, k, v):
        return jnp.sum((fn(q, k, v) - tgt) ** 2)

    gf = jax.grad(functools.partial(loss, lambda *a: flash_self_attention(
        *a, block_q=256)), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(functools.partial(loss, _xla_attention),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_attention_module_flash_equals_xla_eval():
    """The full Attention module (projections included) agrees between impls
    in eval mode — same params, deterministic."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 128, 64))
    mod_x = Attention(heads=4, dim_head=16, dropout=0.1, impl="xla")
    mod_f = Attention(heads=4, dim_head=16, dropout=0.1, impl="flash")
    params = mod_x.init(jax.random.PRNGKey(4), x, deterministic=True)
    ox = mod_x.apply(params, x, deterministic=True)
    of = mod_f.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(of), np.asarray(ox),
                               atol=1e-5, rtol=1e-5)


def test_dropout_statistics_and_scale():
    """Training-mode dropout: ~rate of prob mass dropped, survivors scaled by
    1/keep, and a fixed seed reproduces the same output."""
    q, k, v = _qkv(jax.random.PRNGKey(5), h=2, n=256, d=16)
    seed = jnp.array([1234], jnp.int32)
    base = flash_self_attention(q, k, v)
    rate = 0.5
    outs = [flash_self_attention(q, k, v, dropout_rate=rate,
                                 dropout_seed=seed, block_q=256)
            for _ in range(2)]
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))
    # v == ones -> each output row sums the scaled kept probs: mean over rows
    # approximates keep * (1/keep) = 1, with binomial spread
    ones = jnp.ones_like(v)
    row = flash_self_attention(q, k, ones, dropout_rate=rate,
                               dropout_seed=seed, block_q=256)
    mean = float(jnp.mean(row))
    assert 0.9 < mean < 1.1, mean
    # and a different seed changes the mask
    other = flash_self_attention(q, k, v, dropout_rate=rate,
                                 dropout_seed=jnp.array([99], jnp.int32),
                                 block_q=256)
    assert not np.allclose(np.asarray(other), np.asarray(outs[0]))
    assert not np.allclose(np.asarray(base), np.asarray(outs[0]))


def test_perceiver_attn_impl_parity():
    """Full PerceiverVoxelLangEncoder: attn_impl='flash' equals 'xla' on the
    same params in eval mode (the knob flows qfunction -> perceiver ->
    self_attn blocks only; cross attention is untouched)."""
    from manigaussian_tpu.models.perceiver import PerceiverVoxelLangEncoder

    def build(impl):
        return PerceiverVoxelLangEncoder(
            depth=2, voxel_size=20, initial_dim=10, low_dim_size=4,
            num_rotation_classes=72, num_latents=32, im_channels=16,
            latent_dim=32, cross_dim_head=8, latent_dim_head=8,
            lang_emb_dim=512, lang_max_seq_len=77,
            voxel_patch_size=5, voxel_patch_stride=5, final_dim=16,
            unet_channels=(4, 8, 8, 8), attn_impl=impl)

    B, V = 1, 20
    key = jax.random.PRNGKey(11)
    vox = jax.random.normal(key, (B, V, V, V, 10)) * 0.1
    proprio = jnp.ones((B, 4)) * 0.2
    lang_goal = jnp.zeros((B, 1024))
    lang_tok = jnp.zeros((B, 77, 512))
    params = build("xla").init(jax.random.PRNGKey(0), vox, proprio,
                               lang_goal, lang_tok)
    ox = build("xla").apply(params, vox, proprio, lang_goal, lang_tok)
    of = build("flash").apply(params, vox, proprio, lang_goal, lang_tok)
    for a, b in zip(jax.tree_util.tree_leaves(ox),
                    jax.tree_util.tree_leaves(of)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_dropout_bwd_mask_matches_fwd():
    """The backward pass regenerates the same mask as the forward: for
    v-grads, d(out)/d(v) = P_dropped^T g — finite-difference one v element
    on the dropped path and compare."""
    q, k, v = _qkv(jax.random.PRNGKey(7), h=1, n=64, d=8)
    seed = jnp.array([7], jnp.int32)
    rate = 0.3

    def f(vv):
        return jnp.sum(flash_self_attention(
            q, k, vv, dropout_rate=rate, dropout_seed=seed, block_q=64) ** 2)

    g = jax.grad(f)(v)
    eps = 1e-3
    dv = jnp.zeros_like(v).at[0, 0, 3, 2].set(eps)
    fd = (f(v + dv) - f(v - dv)) / (2 * eps)
    np.testing.assert_allclose(float(fd), float(g[0, 0, 3, 2]),
                               atol=2e-2, rtol=2e-2)
