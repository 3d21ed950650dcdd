"""Space-to-channel packed 3D conv stages for tiny-channel U-Net layers.

Why (VERDICT r3 'What's weak' #2 / 'Next round' #3): the voxel U-Net's early
stages run 8/16 channels at 100³/50³ (reference `helpers/network_utils.py:
248-306` channel plan). TPU lanes are 128 wide, so XLA pads C=8 to the full
lane width — a 100³×8ch activation occupies (and moves) 16× its useful bytes
through HBM. Folding a 2×2×2 spatial block into channels (space-to-channel)
turns [D,H,W,C] into [D/2,H/2,W/2,8C]: 64 packed channels at C=8 → half-full
lanes instead of 1/16, ~8× less padded HBM traffic for the same math.

The packed stage computes EXACTLY the original conv: a stride-s 3³ conv on
the original grid equals a stride-s 3³ conv on the packed grid whose
[3,3,3,8Ci,8Co] weights are a sparse rearrangement of the original
[3,3,3,Ci,Co] kernel (assembled on the fly from the SAME parameters):

    output voxel 2P+s_out, tap k (k∈{0,1,2}, offset k-1) reads input voxel
    stride·(2P+s_out) + k - 1 = 2(P·stride + q) + s_in
      with per-dim  k = 2q + s_in - stride·s_out + 1,  valid iff 0 ≤ k ≤ 2,
    so packed tap q ∈ {-1,0,1} — again a 3³ kernel (stride preserved).

The dense packed matmul multiplies 8× more zeros than the original (density
1/8), but at these sizes the stage is HBM-bound, not MXU-bound, so trading
redundant FLOPs for lane occupancy wins (scaling-book roofline logic).

Instance norm (GroupNorm group_size=1 over the ORIGINAL channels) must reduce
over the 8 packing slots too; channel-major packing (packed_ch = c·8 + slot)
makes each original channel a contiguous group of 8.

Parity: tests/test_packed3d.py asserts bit-level agreement (fp32) with the
unpacked ConvNormAct3D path on random params.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["space_to_channel", "channel_to_space", "pack_conv3_weights",
           "PackedConvNormAct3D", "transplant_unet_params"]


def space_to_channel(x: jnp.ndarray) -> jnp.ndarray:
    """[B, D, H, W, C] → [B, D/2, H/2, W/2, 8C], packed_ch = c·8 + slot,
    slot = sz·4 + sy·2 + sx (channel-major: slots of one c are contiguous)."""
    b, d, h, w, c = x.shape
    assert d % 2 == 0 and h % 2 == 0 and w % 2 == 0, (d, h, w)
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)     # [B,D/2,H/2,W/2,C,2,2,2]
    return x.reshape(b, d // 2, h // 2, w // 2, 8 * c)


def channel_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_channel."""
    b, dp, hp, wp, c8 = x.shape
    c = c8 // 8
    x = x.reshape(b, dp, hp, wp, c, 2, 2, 2)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)     # [B,D/2,2,H/2,2,W/2,2,C]
    return x.reshape(b, dp * 2, hp * 2, wp * 2, c)


def _tap_map(stride: int) -> np.ndarray:
    """Per-dim tap table k[q, s_in, s_out] ∈ {0,1,2} or -1 (invalid)."""
    t = np.full((3, 2, 2), -1, np.int32)
    for qi, q in enumerate((-1, 0, 1)):
        for s_in in range(2):
            for s_out in range(2):
                k = 2 * q + s_in - stride * s_out + 1
                if 0 <= k <= 2:
                    t[qi, s_in, s_out] = k
    return t


def pack_conv3_weights(w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """[3,3,3,Ci,Co] → [3,3,3,8Ci,8Co] packed kernel (channel-major slots).

    One vectorized gather from a zero-extended kernel: invalid (q, s_in,
    s_out) combinations index the padded zero tap."""
    ci, co = w.shape[3], w.shape[4]
    t = _tap_map(stride)                                   # [3,2,2]
    # zero-extend each spatial kernel dim with a 4th zero tap for invalid -1
    wz = jnp.pad(w, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
    # slot decomposition: slot = sz*4 + sy*2 + sx
    slots = np.arange(8)
    sz, sy, sx = slots // 4, (slots // 2) % 2, slots % 2
    # index arrays over [q_z, q_y, q_x, s_in, s_out]
    qz, qy, qx, si, so = np.meshgrid(np.arange(3), np.arange(3), np.arange(3),
                                     slots, slots, indexing="ij")
    kz = t[qz, sz[si], sz[so]]
    ky = t[qy, sy[si], sy[so]]
    kx = t[qx, sx[si], sx[so]]
    invalid = (kz < 0) | (ky < 0) | (kx < 0)
    kz = np.where(invalid, 3, kz)   # any -1 → the zero tap
    ky = np.where(invalid, 3, ky)
    kx = np.where(invalid, 3, kx)
    # gather: [3,3,3,8,8,Ci,Co]
    pw = wz[kz, ky, kx]
    # → [3,3,3, Ci, 8(s_in), Co, 8(s_out)] → [3,3,3, 8Ci, 8Co] channel-major
    pw = pw.transpose(0, 1, 2, 5, 3, 6, 4)
    return pw.reshape(3, 3, 3, 8 * ci, 8 * co)


class PackedConvNormAct3D(nn.Module):
    """conv(no bias) + instance norm + leaky_relu on a PACKED [B,D',H',W',8C]
    grid — compute-exact twin of blocks.ConvNormAct3D(kernel_size=3) running
    on the unpacked grid. Parameters stay in the ORIGINAL [3,3,3,Ci,Co]/[Co]
    shapes (transplantable between impls)."""

    out_channels: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):  # [B, D', H', W', 8*Ci]
        ci = xp.shape[-1] // 8
        co = self.out_channels
        kernel = self.param("kernel", nn.initializers.lecun_normal(
            in_axis=(0, 1, 2, 3), out_axis=4), (3, 3, 3, ci, co))
        scale = self.param("scale", nn.initializers.ones, (co,))
        bias = self.param("bias", nn.initializers.zeros, (co,))

        pw = pack_conv3_weights(kernel, self.strides).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), pw,
            window_strides=(self.strides,) * 3, padding=[(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))  # [B,·,·,·,8Co]

        # instance norm per ORIGINAL channel: reduce over space AND the 8
        # slots (channel-major packing → contiguous groups of 8), fp32 stats
        # like nn.GroupNorm
        b, dp, hp, wp, _ = y.shape
        yf = y.astype(jnp.float32).reshape(b, dp, hp, wp, co, 8)
        mean = jnp.mean(yf, axis=(1, 2, 3, 5), keepdims=True)
        var = jnp.mean(jnp.square(yf - mean), axis=(1, 2, 3, 5), keepdims=True)
        yf = (yf - mean) * jax.lax.rsqrt(var + 1e-6)
        yf = yf * scale[None, None, None, None, :, None] \
            + bias[None, None, None, None, :, None]
        return jax.nn.leaky_relu(yf.reshape(b, dp, hp, wp, co * 8), 0.01)


def transplant_unet_params(unpacked: dict) -> dict:
    """VoxelUNetShallow(impl='xla') params → impl='packed' params.

    The two impls share every weight (the packed kernel is assembled on the
    fly); only the flax module names differ. Used by the parity test and for
    migrating checkpoints when flipping MethodConfig.policy_unet_impl.

    Call-order correspondence (see unet3d.py bodies):
      packed PCNA_{0,1,2}   ← unpacked CNA_{0,1,2}   (100³/50³ encoder stages)
      packed CNA_{0..3}     ← unpacked CNA_{3..6}    (25³/13³ stages)
      packed Conv_0/GN_0    ← unpacked Conv_0/GN_0   (up to 25³, unpacked)
      packed PCNA_{3,4}     ← unpacked Conv_{1,2}+GN_{1,2} (packed up stages)
      packed Conv_1         ← unpacked Conv_3        (final 1×1)
    """
    u = unpacked

    def cna(i):
        return {"kernel": u[f"ConvNormAct3D_{i}"]["Conv_0"]["kernel"],
                "scale": u[f"ConvNormAct3D_{i}"]["GroupNorm_0"]["scale"],
                "bias": u[f"ConvNormAct3D_{i}"]["GroupNorm_0"]["bias"]}

    def upconv(i):
        return {"kernel": u[f"Conv_{i}"]["kernel"],
                "scale": u[f"GroupNorm_{i}"]["scale"],
                "bias": u[f"GroupNorm_{i}"]["bias"]}

    out = {}
    for i in range(3):
        out[f"PackedConvNormAct3D_{i}"] = cna(i)
    for i in range(4):
        out[f"ConvNormAct3D_{i}"] = {
            "Conv_0": {"kernel": u[f"ConvNormAct3D_{i + 3}"]["Conv_0"]["kernel"]},
            "GroupNorm_0": dict(u[f"ConvNormAct3D_{i + 3}"]["GroupNorm_0"])}
    out["Conv_0"] = dict(u["Conv_0"])
    out["GroupNorm_0"] = dict(u["GroupNorm_0"])
    out["PackedConvNormAct3D_3"] = upconv(1)
    out["PackedConvNormAct3D_4"] = upconv(2)
    out["Conv_1"] = dict(u["Conv_3"])
    return out
