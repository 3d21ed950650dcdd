"""Flax building blocks for the voxel policy networks.

Parity targets: reference `helpers/network_utils.py` — Conv3DBlock (:129-171),
DenseBlock (:394-427), SpatialSoftmax3D (:927-963), Conv3DUpsampleBlock (:374-391),
ConvBnReLU3D (:234-245).

TPU-first deviations (no weights are ported, so layout/init freedom is used):
  * channels-LAST everywhere (NDHWC) — XLA TPU's native conv layout.
  * InPlaceABN (BatchNorm+LeakyReLU at batch-size 1/GPU in the reference ≈ instance
    statistics) → stateless instance norm (GroupNorm with one group per channel) +
    leaky_relu. No mutable batch stats → pure train step, trivially SPMD.
  * ConvTranspose upsampling → nearest-resize + conv (no checkerboard, maps cleanly
    onto the MXU).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.02  # network_utils.py:14


def act_layer(name: Optional[str]):
    if name is None:
        return lambda x: x
    return {
        "relu": jax.nn.relu,
        "lrelu": lambda x: jax.nn.leaky_relu(x, LRELU_SLOPE),
        "elu": jax.nn.elu,
        "tanh": jnp.tanh,
        "gelu": jax.nn.gelu,
    }[name]


def _kaiming_or_xavier(activation: Optional[str]):
    """Match the reference init policy: kaiming for relu/lrelu, xavier otherwise."""
    if activation in ("relu",):
        return nn.initializers.kaiming_uniform()
    if activation in ("lrelu",):
        return nn.initializers.variance_scaling(
            2.0 / (1 + LRELU_SLOPE ** 2), "fan_in", "uniform")
    return nn.initializers.xavier_uniform()


class Conv3DBlock(nn.Module):
    """k³ conv (replicate padding) + optional activation (network_utils.py:129-171)."""

    out_channels: int
    kernel_size: int = 3
    strides: int = 1
    activation: Optional[str] = None
    padding: Optional[int] = None

    @nn.compact
    def __call__(self, x):  # [B, D, H, W, C]
        pad = self.kernel_size // 2 if self.padding is None else self.padding
        if pad > 0:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)),
                        mode="edge")
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 3,
                    strides=(self.strides,) * 3, padding="VALID",
                    kernel_init=_kaiming_or_xavier(self.activation))(x)
        return act_layer(self.activation)(x)


class DenseBlock(nn.Module):
    """Linear + optional norm/activation (network_utils.py:394-427)."""

    out_features: int
    activation: Optional[str] = None
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_features,
                     kernel_init=_kaiming_or_xavier(self.activation))(x)
        if self.norm == "layer":
            x = nn.LayerNorm()(x)
        return act_layer(self.activation)(x)


class ConvNormAct3D(nn.Module):
    """conv(no bias) + instance norm + leaky_relu — the ConvBnReLU3D/InPlaceABN
    analog (network_utils.py:234-245); see module docstring for the norm choice."""

    out_channels: int
    kernel_size: int = 3
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 3,
                    strides=(self.strides,) * 3,
                    padding=[(pad, pad)] * 3, use_bias=False)(x)
        x = nn.GroupNorm(num_groups=None, group_size=1)(x)  # instance norm
        return jax.nn.leaky_relu(x, 0.01)


class SpatialSoftmax3D(nn.Module):
    """Per-channel soft-argmax over a 3D grid → [B, C*3] expected coordinates.

    Parity: network_utils.py:927-963 (temperature 0.01, coords in [-1, 1]).
    Channels-last input [B, D, H, W, C].
    """

    temperature: float = 0.01

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        flat = x.reshape(b, d * h * w, c) / self.temperature
        attn = jax.nn.softmax(flat, axis=1)
        gd = jnp.linspace(-1.0, 1.0, d)
        gh = jnp.linspace(-1.0, 1.0, h)
        gw = jnp.linspace(-1.0, 1.0, w)
        pos = jnp.stack(jnp.meshgrid(gd, gh, gw, indexing="ij"), axis=-1)
        pos = pos.reshape(d * h * w, 3)                       # [P, 3]
        expected = jnp.einsum("bpc,pk->bck", attn, pos)        # [B, C, 3]
        return expected.reshape(b, c * 3)


class Conv3DUpsampleBlock(nn.Module):
    """conv → trilinear resize ×stride → conv (network_utils.py:374-391)."""

    out_channels: int
    strides: int
    kernel_size: int = 3
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = Conv3DBlock(self.out_channels, self.kernel_size, 1,
                        self.activation)(x)
        if self.strides > 1:
            b, d, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, d * self.strides, h * self.strides, w * self.strides, c),
                method="trilinear")
        x = Conv3DBlock(self.out_channels, self.kernel_size, 1,
                        self.activation)(x)
        return x
