"""Shallow 3D U-Net voxel encoder.

Parity target: `helpers/network_utils.py:248-306` (MultiLayer3DEncoderShallow):
10ch 100³ → 128ch 100³ with three stride-2 stages (channels 8/16/32/64), skip sums,
and a list of multi-scale feature maps [input, 25³ feats, 50³ feats].

TPU-first: channels-last, resize+conv upsampling (see models/blocks.py docstring).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from manigaussian_tpu.models.blocks import ConvNormAct3D


class VoxelUNetShallow(nn.Module):
    out_channels: int = 128
    channels: Sequence[int] = (8, 16, 32, 64)
    dtype: Any = jnp.float32  # conv compute dtype (blocks.py convention)

    @nn.compact
    def __call__(self, x):  # [B, D, H, W, Cin]
        c = self.channels
        voxel_list = [x]
        conv0 = ConvNormAct3D(c[0], dtype=self.dtype)(x)          # 100³
        conv2 = ConvNormAct3D(c[1], dtype=self.dtype)(
            ConvNormAct3D(c[1], strides=2, dtype=self.dtype)(conv0))  # 50³
        conv4 = ConvNormAct3D(c[2], dtype=self.dtype)(
            ConvNormAct3D(c[2], strides=2, dtype=self.dtype)(conv2))  # 25³
        mid = ConvNormAct3D(c[3], dtype=self.dtype)(
            ConvNormAct3D(c[3], strides=2, dtype=self.dtype)(conv4))  # 13³

        def up(z, target, ch):
            b, _, _, _, _ = z.shape
            t = target.shape[1]
            z = jax.image.resize(z, (b, t, t, t, z.shape[-1]), method="nearest")
            z = nn.Conv(ch, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False,
                        dtype=self.dtype)(z)
            z = nn.GroupNorm(num_groups=None, group_size=1)(z)
            return jax.nn.leaky_relu(z, 0.01)

        x = conv4 + up(mid, conv4, c[2])                          # 25³
        voxel_list.append(x)
        x = conv2 + up(x, conv2, c[1])                            # 50³
        voxel_list.append(x)
        x = conv0 + up(x, conv0, c[0])                            # 100³
        # 1×1 out conv in float32: d0 feeds the renderer's Gaussian regressor
        x = nn.Conv(self.out_channels, (1, 1, 1))(x.astype(jnp.float32))
        return x, voxel_list
