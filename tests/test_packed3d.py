"""Space-to-channel packed conv stages (models/packed3d.py): exact parity
with the unpacked path on shared parameters (VERDICT r3 item 3 — the
tiny-channel U-Net stages starve the 128-wide lanes; packing is a pure
layout change, so outputs must match to fp32 tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manigaussian_tpu.models.blocks import ConvNormAct3D
from manigaussian_tpu.models.packed3d import (PackedConvNormAct3D,
                                              channel_to_space,
                                              pack_conv3_weights,
                                              space_to_channel,
                                              transplant_unet_params)
from manigaussian_tpu.models.unet3d import VoxelUNetShallow


def test_pack_unpack_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 10, 12, 5))
    np.testing.assert_array_equal(
        np.asarray(channel_to_space(space_to_channel(x))), np.asarray(x))


@pytest.mark.parametrize("stride", [1, 2])
def test_packed_stage_matches_unpacked(stride):
    ci, co, d = 10, 8, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (2, d, d, d, ci))
    ref = ConvNormAct3D(co, strides=stride)
    vref = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(vref, x)

    packed = PackedConvNormAct3D(co, strides=stride)
    vp = {"params": {"kernel": vref["params"]["Conv_0"]["kernel"],
                     "scale": vref["params"]["GroupNorm_0"]["scale"],
                     "bias": vref["params"]["GroupNorm_0"]["bias"]}}
    y = channel_to_space(packed.apply(vp, space_to_channel(x)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)


def test_packed_weights_density():
    """Exactly 1/8 of the packed kernel entries are populated (one valid k
    per (q, s_in, s_out) triple per dim, half the per-dim combos valid)."""
    w = jnp.ones((3, 3, 3, 4, 6))
    pw = pack_conv3_weights(w, 1)
    assert pw.shape == (3, 3, 3, 32, 48)
    frac = float(jnp.mean((pw != 0).astype(jnp.float32)))
    np.testing.assert_allclose(frac, 1.0 / 8.0, atol=1e-6)


def test_packed_unet_matches_unpacked():
    """Whole VoxelUNetShallow: impl='packed' == impl='xla' on transplanted
    params (output map AND every multi-scale skip tensor)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 20, 20, 20, 4))
    ref = VoxelUNetShallow(out_channels=24, channels=(4, 6, 8, 12))
    vref = ref.init(jax.random.PRNGKey(1), x)
    y_ref, skips_ref = ref.apply(vref, x)

    packed = VoxelUNetShallow(out_channels=24, channels=(4, 6, 8, 12),
                              impl="packed")
    vp = {"params": transplant_unet_params(vref["params"])}
    y, skips = packed.apply(vp, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=5e-5, rtol=1e-4)
    assert len(skips) == len(skips_ref)
    for s, sr in zip(skips, skips_ref):
        np.testing.assert_allclose(np.asarray(s), np.asarray(sr),
                                   atol=5e-5, rtol=1e-4)


def test_packed_unet_param_shapes_transplantable():
    """Init the packed impl directly: every leaf has the same shape as the
    transplanted tree (so either init is checkpoint-compatible)."""
    x = jnp.zeros((1, 20, 20, 20, 4))
    ref = VoxelUNetShallow(out_channels=24, channels=(4, 6, 8, 12))
    vref = ref.init(jax.random.PRNGKey(1), x)
    packed = VoxelUNetShallow(out_channels=24, channels=(4, 6, 8, 12),
                              impl="packed")
    vp_init = packed.init(jax.random.PRNGKey(2), x)
    vp_trans = transplant_unet_params(vref["params"])
    flat_a = jax.tree_util.tree_leaves_with_path(vp_init["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(vp_trans))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        assert leaf.shape == flat_b[path].shape, path
