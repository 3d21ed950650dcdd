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

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Compute-dtype convention (MethodConfig.policy_dtype): `dtype` below is the
# nn.Conv/nn.Dense computation dtype only — param_dtype stays float32, flax
# norm layers keep float32 statistics, and activations/softmaxes upcast, so
# bfloat16 here touches exactly the MXU ops.

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
    """k³ conv + optional activation (network_utils.py:129-171).

    pad_mode: 'edge' matches the reference's padding_mode='replicate'
    (network_utils.py:133); 'zero' is the TPU-fast choice — the edge-pad's
    backward lowers to boundary scatter-adds over the full 100³ volume and
    measured ~20 ms/conv at 100³×256 on a real chip, while zero padding folds
    into the conv op. Differs only at the outermost voxel shell.

    impl (3³/stride-1/zero-pad convs only — others always use nn.Conv):
      'xla'    — nn.Conv (XLA's generic 3D conv; ~43% MXU on the 100³ tails)
      'z2d'    — z-offset decomposition into 3 batched 2D convs (XLA's
                 best-tuned conv path; same math, fp-exact per offset)
      'pallas' — ops/pallas_conv halo-tile MXU kernel with custom VJP
    Param pytrees differ between 'xla' (Conv_0/{kernel,bias}) and the explicit
    impls ({kernel,bias}); no weights are ported, so this is layout freedom.
    """

    out_channels: int
    kernel_size: int = 3
    strides: int = 1
    activation: Optional[str] = None
    padding: Optional[int] = None
    dtype: Any = jnp.float32
    pad_mode: str = "edge"
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):  # [B, D, H, W, C]
        pad = self.kernel_size // 2 if self.padding is None else self.padding
        fast_eligible = (self.impl != "xla" and self.kernel_size == 3
                         and self.strides == 1 and pad == 1
                         and self.pad_mode != "edge")
        if fast_eligible:
            kernel = self.param(
                "kernel", _kaiming_or_xavier(self.activation),
                (3, 3, 3, x.shape[-1], self.out_channels))
            bias = self.param("bias", nn.initializers.zeros,
                              (self.out_channels,))
            xd = x.astype(self.dtype)
            wd = kernel.astype(self.dtype)
            if self.impl == "pallas":
                from manigaussian_tpu.ops.pallas_conv import \
                    conv3d_same_batched
                y = conv3d_same_batched(xd, wd)
            else:  # z2d
                y = _conv3d_as_2d(xd, wd)
            # emit the compute dtype (accumulation stays f32 above) — matches
            # the nn.Conv path, which also returns `dtype`; at bf16 the 100³
            # outputs halve their HBM footprint for every downstream reader
            return act_layer(self.activation)(y + bias).astype(self.dtype)
        if pad > 0 and self.pad_mode == "edge":
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)),
                        mode="edge")
            conv_pad = "VALID"
        else:
            conv_pad = [(pad, pad)] * 3
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 3,
                    strides=(self.strides,) * 3, padding=conv_pad,
                    dtype=self.dtype,
                    kernel_init=_kaiming_or_xavier(self.activation))(x)
        return act_layer(self.activation)(x)


def _conv3d_as_2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3³ stride-1 zero-SAME 3D conv as 3 batched 2D convs (one per z-offset).

    y[:, z] = Σ_oz conv2d(x[:, z + oz - 1], w[oz]) — the depth axis folds into
    the conv batch, putting the work on XLA's heavily-tuned 2D conv path
    instead of the generic 3D one.
    """
    b, d, h, wsp, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    # accumulate the 3 z-offsets in f32; the conv itself runs in the input
    # dtype (casting after, not preferred_element_type: a f32-preferred conv
    # hands its transpose a f32 cotangent against bf16 operands and fails)
    y = jnp.zeros((b * d, h, wsp, co), jnp.float32)
    for oz in range(3):
        xs = xp[:, oz:oz + d].reshape(b * d, h, wsp, ci)
        y = y + jax.lax.conv_general_dilated(
            xs, w[oz], window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    return y.reshape(b, d, h, wsp, co)


class Patchify3D(nn.Module):
    """Non-overlapping p³ patch embedding — the kernel==stride, padding=0 conv
    (the perceiver's `patchify` layer) expressed as reshape + ONE matmul.

    A stride-p conv's backward lowers to an lhs-dilated conv (insert p-1 zeros
    between cotangent elements) which Mosaic executes poorly: measured +75 ms
    fwd+bwd at 100³×128 on a real chip. The reshape+matmul formulation is the
    same math (exactly, fp-for-fp at matching contraction order) and runs the
    backward as two plain matmuls: ~2 ms. Param shapes/init match nn.Conv so
    the layer is interchangeable in spirit, though the pytree path differs.
    """

    out_channels: int
    patch: int
    activation: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, D, H, W, C], D/H/W % patch == 0
        b, d, h, w, c = x.shape
        p = self.patch
        kernel = self.param("kernel", _kaiming_or_xavier(self.activation),
                            (p, p, p, c, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        xd = x.astype(self.dtype)
        xd = xd.reshape(b, d // p, p, h // p, p, w // p, p, c)
        xd = xd.transpose(0, 1, 3, 5, 2, 4, 6, 7)       # [B,S,S,S,p,p,p,C]
        xd = xd.reshape(b, d // p, h // p, w // p, p * p * p * c)
        wd = kernel.astype(self.dtype).reshape(p * p * p * c,
                                               self.out_channels)
        y = jnp.einsum("bdhwk,kc->bdhwc", xd, wd,
                       preferred_element_type=self.dtype) + bias.astype(
            self.dtype)
        return act_layer(self.activation)(y)


class ChannelProjectConv3D(nn.Module):
    """k³ conv with FEW output channels (the trans Q-head: 128→1 at 100³),
    expressed as channel-contraction matmul + k³ static shifted adds.

    A 1-output-channel conv starves the MXU (1 of 128 result lanes used) and
    its backward pairs that with an edge-pad scatter: measured +74 ms at
    100³ on a real chip. Equivalent decomposition: y = x_pad @ W[C, k³·Co]
    (full-lane contraction), then out[v, co] = Σ_o y[v+o, o·Co+co] — static
    slices XLA fuses. Replicate padding matches Conv3DBlock.
    """

    out_channels: int
    kernel_size: int = 3
    activation: Optional[str] = None
    dtype: Any = jnp.float32
    pad_mode: str = "edge"

    @nn.compact
    def __call__(self, x):  # [B, D, H, W, C]
        b, d, h, w, c = x.shape
        k, co = self.kernel_size, self.out_channels
        kernel = self.param("kernel", _kaiming_or_xavier(self.activation),
                            (k, k, k, c, co))
        bias = self.param("bias", nn.initializers.zeros, (co,))
        pad = k // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)),
                     mode="edge" if self.pad_mode == "edge" else "constant"
                     ).astype(self.dtype)
        wd = kernel.astype(self.dtype).reshape(k, k, k, c, co)
        wd = wd.transpose(3, 0, 1, 2, 4).reshape(c, k * k * k * co)
        y = jnp.einsum("bdhwc,ck->bdhwk", xp, wd,
                       preferred_element_type=jnp.float32)  # [B,D+2p,..,k³·Co]
        out = jnp.zeros((b, d, h, w, co), jnp.float32)
        for oi in range(k):
            for oj in range(k):
                for ok in range(k):
                    o = (oi * k + oj) * k + ok
                    out = out + y[:, oi:oi + d, oj:oj + h, ok:ok + w,
                                  o * co:(o + 1) * co]
        return act_layer(self.activation)(out + bias)


class DenseBlock(nn.Module):
    """Linear + optional norm/activation (network_utils.py:394-427)."""

    out_features: int
    activation: Optional[str] = None
    norm: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_features, dtype=self.dtype,
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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 3,
                    strides=(self.strides,) * 3, dtype=self.dtype,
                    padding=[(pad, pad)] * 3, use_bias=False)(x)
        x = nn.GroupNorm(num_groups=None, group_size=1)(x)  # instance norm
        return jax.nn.leaky_relu(x, 0.01)


def _pos_grid(d: int, h: int, w: int) -> jnp.ndarray:
    """[-1, 1]³ coordinate grid, row-major over (d, h, w) → [P, 3]."""
    gd = jnp.linspace(-1.0, 1.0, d)
    gh = jnp.linspace(-1.0, 1.0, h)
    gw = jnp.linspace(-1.0, 1.0, w)
    pos = jnp.stack(jnp.meshgrid(gd, gh, gw, indexing="ij"), axis=-1)
    return pos.reshape(d * h * w, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _softargmax_and_max(xf, pos, temperature):
    out, xmax, _, _ = _softargmax_fwd_impl(xf, pos, temperature)
    return out, xmax


def _softargmax_fwd_impl(xf, pos, t):
    # xf may be bf16: the f32 upcast happens INSIDE the op so it fuses into
    # the reduction passes instead of materializing a f32 copy of the (often
    # 512 MB-scale) input at the custom_vjp boundary
    z = xf.astype(jnp.float32) / t               # [B, P, C]
    m = jnp.max(z, axis=1, keepdims=True)        # [B, 1, C]
    xmax = jnp.max(xf, axis=1).astype(jnp.float32)  # [B, C] (max is exact in
    # any dtype; XLA fuses both reductions into the same pass over xf)
    e = jnp.exp(z - m)
    s0 = jnp.sum(e, axis=1)                      # [B, C]
    s1 = jnp.einsum("bpc,pk->bck", e, pos)       # [B, C, 3]
    out = s1 / s0[..., None]
    return out, xmax, m, s0


def _softargmax_vjp_fwd(xf, pos, temperature):
    out, xmax, m, s0 = _softargmax_fwd_impl(xf, pos, temperature)
    return (out, xmax), (xf, pos, m, s0, out, xmax)


def _softargmax_vjp_bwd(temperature, res, cts):
    """Recompute the softmax weights instead of saving the [B,P,C] attention
    tensor (the autodiff path materializes it — ~512 MB at 100³×128 fp32).

    d out_ck / d z_pc = attn_pc (pos_pk − out_ck); the max output's gradient
    splits the cotangent equally over argmax ties (lax.reduce_max semantics,
    matching what jnp.max's autodiff would produce)."""
    xf, pos, m, s0, out, xmax = res
    g_out, g_max = cts
    z = xf.astype(jnp.float32) / temperature
    attn = jnp.exp(z - m) / s0[:, None, :]                 # [B, P, C]
    proj = jnp.einsum("pk,bck->bpc", pos, g_out)           # [B, P, C]
    dot = jnp.sum(out * g_out, axis=-1)                    # [B, C]
    dz = attn * (proj - dot[:, None, :])
    dx = dz / temperature
    if g_max is not None:
        # tie mask in the input dtype (consistent with how xmax was reduced)
        tie = (xf.astype(jnp.float32)
               == xmax[:, None, :]).astype(jnp.float32)    # [B, P, C]
        cnt = jnp.sum(tie, axis=1, keepdims=True)
        dx = dx + tie * (g_max[:, None, :] / cnt)
    dx = dx.astype(xf.dtype)
    # pos is always a constant grid here; its cotangent is never consumed
    # (one einsum saved per call) — do NOT differentiate w.r.t. pos upstream.
    return dx, jnp.zeros_like(pos)


_softargmax_and_max.defvjp(_softargmax_vjp_fwd, _softargmax_vjp_bwd)


def spatial_softmax3d_with_max(x: jnp.ndarray, temperature: float = 0.01):
    """Fused per-channel soft-argmax + per-channel max over a 3D grid.

    Returns (expected [B, C*3], xmax [B, C]) — exactly
    (SpatialSoftmax3D()(x), jnp.max(x, axis=(1,2,3))) but in one pass pair
    with a hand-written VJP: the heads' feature summaries at 100³×128 were
    the single largest policy-step stage on chip (14 ms fwd+bwd each via the
    autodiff softmax path, which materializes the attention tensor twice).
    Algebraically identical (softmax-weighted coordinate = Σe·pos / Σe);
    fp-level difference is one deferred division.
    """
    b, d, h, w, c = x.shape
    xf = x.reshape(b, d * h * w, c)   # dtype preserved; f32 upcast happens
    pos = _pos_grid(d, h, w)          # inside the op (fuses into the reads)
    out, xmax = _softargmax_and_max(xf, pos, float(temperature))
    return out.reshape(b, c * 3), xmax


class SpatialSoftmax3D(nn.Module):
    """Per-channel soft-argmax over a 3D grid → [B, C*3] expected coordinates.

    Parity: network_utils.py:927-963 (temperature 0.01, coords in [-1, 1]).
    Channels-last input [B, D, H, W, C]. Delegates to the fused
    `spatial_softmax3d_with_max` kernel (max output unused here).
    """

    temperature: float = 0.01

    @nn.compact
    def __call__(self, x):
        return spatial_softmax3d_with_max(x, self.temperature)[0]


class Conv3DUpsampleBlock(nn.Module):
    """conv → trilinear resize ×stride → conv (network_utils.py:374-391).

    `impl` applies to the POST-resize conv only (the full-resolution hot one,
    100³ in the flagship); the pre-resize conv runs at 1/stride³ the cost and
    stays on nn.Conv."""

    out_channels: int
    strides: int
    kernel_size: int = 3
    activation: Optional[str] = None
    dtype: Any = jnp.float32
    pad_mode: str = "edge"
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        x = Conv3DBlock(self.out_channels, self.kernel_size, 1,
                        self.activation, dtype=self.dtype,
                        pad_mode=self.pad_mode)(x)
        if self.strides > 1:
            b, d, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, d * self.strides, h * self.strides, w * self.strides, c),
                method="trilinear")
        x = Conv3DBlock(self.out_channels, self.kernel_size, 1,
                        self.activation, dtype=self.dtype,
                        pad_mode=self.pad_mode, impl=self.impl)(x)
        return x
