"""Fused soft-argmax+max (blocks.spatial_softmax3d_with_max) parity.

The fused custom-VJP path must match the naive autodiff formulation
(softmax → einsum with the coordinate grid; separate jnp.max) in both values
and input gradients — it replaced that formulation for speed only (the
100³×128 head summaries were the largest single policy-step stage on chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manigaussian_tpu.models.blocks import (SpatialSoftmax3D, _pos_grid,
                                            spatial_softmax3d_with_max)


def _naive(x, temperature=0.01):
    b, d, h, w, c = x.shape
    flat = x.astype(jnp.float32).reshape(b, d * h * w, c) / temperature
    attn = jax.nn.softmax(flat, axis=1)
    pos = _pos_grid(d, h, w)
    expected = jnp.einsum("bpc,pk->bck", attn, pos)
    return expected.reshape(b, c * 3), jnp.max(
        x.astype(jnp.float32), axis=(1, 2, 3))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_naive_values(dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 5, 4, 7)) * 3.0
    x = x.astype(dtype)
    soft_f, max_f = spatial_softmax3d_with_max(x)
    soft_n, max_n = _naive(x)
    np.testing.assert_allclose(np.asarray(soft_f), np.asarray(soft_n),
                               atol=2e-6)
    np.testing.assert_array_equal(np.asarray(max_f, np.float32),
                                  np.asarray(max_n, np.float32))


def test_fused_matches_naive_gradients():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 6, 3)) * 2.0
    wsoft = jax.random.normal(jax.random.PRNGKey(2), (1, 9))
    wmax = jax.random.normal(jax.random.PRNGKey(3), (1, 3))

    def loss_fused(x):
        s, m = spatial_softmax3d_with_max(x)
        return jnp.sum(s * wsoft) + jnp.sum(m * wmax)

    def loss_naive(x):
        s, m = _naive(x)
        return jnp.sum(s * wsoft) + jnp.sum(m * wmax)

    gf = jax.grad(loss_fused)(x)
    gn = jax.grad(loss_naive)(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gn),
                               rtol=1e-4, atol=1e-5)


def test_fused_max_gradient_splits_ties():
    """jnp.max autodiff splits the cotangent over argmax ties; the hand
    VJP must reproduce that."""
    x = jnp.zeros((1, 2, 2, 1, 1)).at[0, 0, 0, 0, 0].set(1.0)
    x = x.at[0, 1, 1, 0, 0].set(1.0)  # two tied maxima

    g_fused = jax.grad(
        lambda x: jnp.sum(spatial_softmax3d_with_max(x)[1]))(x)
    g_naive = jax.grad(lambda x: jnp.sum(_naive(x)[1]))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_naive),
                               atol=1e-7)
    assert abs(float(g_fused[0, 0, 0, 0, 0]) - 0.5) < 1e-6


def test_module_wrapper_unchanged_api():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 4, 5))
    # SpatialSoftmax3D is param-free; init+apply must keep working
    variables = SpatialSoftmax3D().init(jax.random.PRNGKey(0), x)
    y = SpatialSoftmax3D().apply(variables, x)
    assert y.shape == (2, 5 * 3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_naive(x)[0]),
                               atol=2e-6)
