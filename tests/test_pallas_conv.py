"""Parity of the Pallas 3³ conv kernel (ops/pallas_conv.py) vs lax conv:
forward, dx, and dW — the acceptance test of VERDICT r2 item 2 (like
blocks.Patchify3D's parity proof)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manigaussian_tpu.ops.pallas_conv import conv3d_same, conv3d_same_batched


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]


@pytest.mark.parametrize("d,h,wsp,ci,co", [
    (8, 8, 8, 8, 16),     # tiny
    (10, 10, 10, 16, 8),  # odd spatial size (pad path), Co < Ci
])
def test_forward_matches_lax(d, h, wsp, ci, co):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (d, h, wsp, ci), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 3, ci, co), jnp.float32) * 0.1
    np.testing.assert_allclose(np.asarray(conv3d_same(x, w)),
                               np.asarray(_ref_conv(x, w)),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_lax():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (8, 8, 8, 8), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 3, 8, 16), jnp.float32) * 0.1
    tgt = jax.random.normal(k3, (8, 8, 8, 16), jnp.float32)

    def loss_pallas(x, w):
        return jnp.sum((conv3d_same(x, w) - tgt) ** 2)

    def loss_ref(x, w):
        return jnp.sum((_ref_conv(x, w) - tgt) ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_batched_and_jit():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (2, 8, 8, 8, 8), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 3, 8, 8), jnp.float32) * 0.1
    y = jax.jit(conv3d_same_batched)(x, w)
    for b in range(2):
        np.testing.assert_allclose(np.asarray(y[b]),
                                   np.asarray(_ref_conv(x[b], w)),
                                   rtol=1e-5, atol=1e-5)


def test_bfloat16_inputs():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (8, 8, 8, 8), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(k2, (3, 3, 3, 8, 16), jnp.float32) * 0.1
    y = conv3d_same(x, w.astype(jnp.bfloat16))
    assert y.dtype == jnp.float32
    ref = _ref_conv(x.astype(jnp.float32), w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_conv3dblock_impls_agree():
    """Conv3DBlock's three impls ('xla' nn.Conv, 'z2d', 'pallas') compute the
    same function for 3³/stride-1/zero-pad convs given the same weights."""
    from manigaussian_tpu.models.blocks import Conv3DBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8, 8), jnp.float32)
    kw = dict(out_channels=16, kernel_size=3, strides=1, activation="lrelu",
              dtype=jnp.float32, pad_mode="zero")
    block_z = Conv3DBlock(**kw, impl="z2d")
    block_p = Conv3DBlock(**kw, impl="pallas")
    block_x = Conv3DBlock(**kw, impl="xla")

    v = block_z.init(jax.random.PRNGKey(1), x)
    y_z = block_z.apply(v, x)
    y_p = block_p.apply(v, x)  # z2d and pallas share the explicit param tree
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_z),
                               rtol=1e-5, atol=1e-5)

    v_x = {"params": {"Conv_0": {"kernel": v["params"]["kernel"],
                                 "bias": v["params"]["bias"]}}}
    y_x = block_x.apply(v_x, x)
    np.testing.assert_allclose(np.asarray(y_z), np.asarray(y_x),
                               rtol=1e-5, atol=1e-5)

    # gradients flow through every impl
    for block, var in [(block_z, v), (block_p, v)]:
        g = jax.grad(lambda p: jnp.sum(block.apply(p, x) ** 2))(var)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)
