"""Shallow 3D U-Net voxel encoder.

Parity target: `helpers/network_utils.py:248-306` (MultiLayer3DEncoderShallow):
10ch 100³ → 128ch 100³ with three stride-2 stages (channels 8/16/32/64), skip sums,
and a list of multi-scale feature maps [input, 25³ feats, 50³ feats].

TPU-first: channels-last, resize+conv upsampling (see models/blocks.py docstring).

impl='packed' runs the tiny-channel stages (8/16ch at 100³/50³ — 8-16 of 128
lanes busy, the round-2/3 'U-Net starves the lanes' backlog) space-to-channel
packed: 2×2×2 spatial blocks folded into channels so the same math moves ~8×
fewer padded bytes through HBM (models/packed3d.py). The 25³/13³ stages stay
unpacked (odd extents; already 64× smaller tensors). Compute-exact — parity
pinned in tests/test_packed3d.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from manigaussian_tpu.models.blocks import ConvNormAct3D
from manigaussian_tpu.models.packed3d import (PackedConvNormAct3D,
                                              channel_to_space,
                                              space_to_channel)


class VoxelUNetShallow(nn.Module):
    out_channels: int = 128
    channels: Sequence[int] = (8, 16, 32, 64)
    dtype: Any = jnp.float32  # conv compute dtype (blocks.py convention)
    impl: str = "xla"         # 'xla' | 'packed' (MethodConfig.policy_unet_impl)

    @nn.compact
    def __call__(self, x):  # [B, D, H, W, Cin]
        c = self.channels

        def up(z, target_len, ch):
            b = z.shape[0]
            t = target_len
            z = jax.image.resize(z, (b, t, t, t, z.shape[-1]), method="nearest")
            z = nn.Conv(ch, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False,
                        dtype=self.dtype)(z)
            z = nn.GroupNorm(num_groups=None, group_size=1)(z)
            return jax.nn.leaky_relu(z, 0.01)

        # Packed stages are exact only when the stride-2 output grid (V/2) is
        # itself even: for V % 4 != 0 the packed stride-2 conv emits one extra
        # (zero-padded) slot row whose instance-norm contribution diverges
        # from the unpacked net. Fall back silently — 'packed' is a pure
        # compute knob, never a semantics change.
        if self.impl == "packed" and x.shape[1] % 4 == 0:
            return self._packed(x, up)

        voxel_list = [x]
        conv0 = ConvNormAct3D(c[0], dtype=self.dtype)(x)          # 100³
        conv2 = ConvNormAct3D(c[1], dtype=self.dtype)(
            ConvNormAct3D(c[1], strides=2, dtype=self.dtype)(conv0))  # 50³
        conv4 = ConvNormAct3D(c[2], dtype=self.dtype)(
            ConvNormAct3D(c[2], strides=2, dtype=self.dtype)(conv2))  # 25³
        mid = ConvNormAct3D(c[3], dtype=self.dtype)(
            ConvNormAct3D(c[3], strides=2, dtype=self.dtype)(conv4))  # 13³

        x = conv4 + up(mid, conv4.shape[1], c[2])                 # 25³
        voxel_list.append(x)
        x = conv2 + up(x, conv2.shape[1], c[1])                   # 50³
        voxel_list.append(x)
        x = conv0 + up(x, conv0.shape[1], c[0])                   # 100³
        # 1×1 out conv in the compute dtype: d0 is the largest tensor in the
        # net (100³×128) and is re-read many times (patchify, head summaries,
        # skip concat, the renderer's trilinear sampling) — storing it bf16
        # halves that HBM traffic (trace: the step is copy/reshape-bound).
        # Consumers that need fp32 (softmax stats, the Gaussian regressor's
        # MLP) upcast at their boundary. dtype=float32 restores exact parity.
        x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype)(x)
        return x, voxel_list

    def _packed(self, x, up):
        """Same network; the V=100³ and V/2=50³ stages run packed."""
        c = self.channels
        v = x.shape[1]
        voxel_list = [x]

        def up_packed(z, target_len, ch):
            # nearest ×2 + conv + instance-norm + lrelu, conv packed
            b = z.shape[0]
            t = target_len
            z = jax.image.resize(z, (b, t, t, t, z.shape[-1]),
                                 method="nearest")
            return PackedConvNormAct3D(ch, dtype=self.dtype)(
                space_to_channel(z))

        xp = space_to_channel(x)                                  # V/2, 8Cin
        c0p = PackedConvNormAct3D(c[0], dtype=self.dtype)(xp)     # V/2, 8c0
        c2p = PackedConvNormAct3D(c[1], dtype=self.dtype)(
            PackedConvNormAct3D(c[1], strides=2,
                                dtype=self.dtype)(c0p))           # V/4p, 8c1
        conv2 = channel_to_space(c2p)                             # V/2, c1
        conv4 = ConvNormAct3D(c[2], dtype=self.dtype)(
            ConvNormAct3D(c[2], strides=2, dtype=self.dtype)(conv2))  # V/4
        mid = ConvNormAct3D(c[3], dtype=self.dtype)(
            ConvNormAct3D(c[3], strides=2, dtype=self.dtype)(conv4))  # V/8

        x25 = conv4 + up(mid, conv4.shape[1], c[2])               # V/4 (odd)
        voxel_list.append(x25)
        x50p = c2p + up_packed(x25, v // 2, c[1])                 # V/4p
        x50 = channel_to_space(x50p)
        voxel_list.append(x50)
        x100p = c0p + up_packed(x50, v, c[0])                     # V/2p
        x = channel_to_space(x100p)                               # V, c0
        # compute-dtype out conv — see the unpacked body's rationale
        x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype)(x)
        return x, voxel_list
