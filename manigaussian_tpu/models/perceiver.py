"""Perceiver IO voxel/language policy encoder (the Q-attention net).

Parity target: reference `agents/manigaussian_bc/perceiver_lang_io.py:146-513`
(PerceiverVoxelLangEncoder) with the ManiGaussian_BC.yaml dims
(im_channels = final_dim = 128, launch_utils.py:409-441):

  voxel [B,100³,10ch] → 3D U-Net (→128ch, d0) → patchify 5³/5 (→20³) →
  +tiled proprio(4→128) → 256-ch tokens → flatten 8000 + 77 CLIP lang tokens
  (512→256) → +learned pos-enc → 1 cross-attn iteration into 2048×512 latents →
  `depth` self-attn blocks → decoder cross-attn back to 8077 tokens → crop lang →
  un-patchify (resize-conv ×5) → skip-concat d0 → trans Q-head Conv3D(→1) +
  rot/grip/collision MLP head fed by three SpatialSoftmax3D+maxpool summaries.

TPU-first deviations (no reference weights are ported):
  * channels-LAST volumes (NDHWC) throughout; attention as batched einsum on the
    MXU with fp32 softmax accumulation;
  * ConvTranspose unpatchify → nearest-resize + conv (models/blocks.py rationale);
  * dropout kept (input/attn/decoder rates) but off unless `deterministic=False`.

Returns (trans_q [B,V,V,V,1], rot_grip_q [B,3*R+2], collision_q [B,2],
voxel_feat d0 [B,V,V,V,128], lang_tokens [B,77,256]) — the same tuple the
reference forward emits (perceiver_lang_io.py:513), minus the unused
multi-scale list.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from manigaussian_tpu.models.blocks import (ChannelProjectConv3D, Conv3DBlock,
                                            Conv3DUpsampleBlock, DenseBlock,
                                            Patchify3D,
                                            spatial_softmax3d_with_max)
from manigaussian_tpu.models.unet3d import VoxelUNetShallow


class Attention(nn.Module):
    """Multi-head attention, optionally cross (parity: perceiver_lang_io.py:102-145).

    impl='flash' routes SELF-attention through the Pallas flash kernel
    (ops/flash_attention.py): identical math — fp32 softmax over the scaled
    bf16 score matmul, dropout on the probabilities — but the [H, N, N]
    probability tensor never leaves VMEM (the XLA path's dominant HBM cost at
    N=2048, R5_SWEEP.jsonl `hlo_attribution`). Cross attention and shapes the
    kernel cannot block evenly fall back to the XLA path.
    """

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        is_self = context is None
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv",
                      dtype=self.dtype)(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        scale = self.dim_head ** -0.5
        n = q.shape[2]
        bq = 256 if n % 256 == 0 else (n if n <= 256 else 0)
        if self.impl == "flash" and is_self and bq:
            from manigaussian_tpu.ops.flash_attention import \
                flash_self_attention
            rate = 0.0 if deterministic else float(self.dropout)
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, 2 ** 31 - 1,
                    dtype=jnp.int32)
            out = flash_self_attention(q, k, v, dropout_rate=rate,
                                       dropout_seed=seed, block_q=bq)
        else:
            logits = jnp.einsum("bhid,bhjd->bhij", q * scale, k,
                                preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(logits, axis=-1)  # fp32 (preferred_element_type)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(x.shape[-1], name="to_out", dtype=self.dtype)(out)


class GEGLUFeedForward(nn.Module):
    """dim → dim*mult*2 → GEGLU → dim (perceiver_lang_io.py:84-100)."""

    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(d * self.mult * 2, dtype=self.dtype)(x)
        h, gates = jnp.split(h, 2, axis=-1)
        return nn.Dense(d, dtype=self.dtype)(h * jax.nn.gelu(gates))


class PreNormAttention(nn.Module):
    heads: int
    dim_head: int
    dropout: float = 0.0
    cross: bool = False
    dtype: Any = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        xn = nn.LayerNorm()(x)
        cn = nn.LayerNorm()(context) if self.cross else None
        return Attention(self.heads, self.dim_head, self.dropout,
                         dtype=self.dtype, impl=self.impl)(
            xn, context=cn, deterministic=deterministic)


class PreNormFF(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return GEGLUFeedForward(dtype=self.dtype)(nn.LayerNorm()(x))


class PerceiverVoxelLangEncoder(nn.Module):
    depth: int = 6
    iterations: int = 1
    voxel_size: int = 100
    initial_dim: int = 10
    low_dim_size: int = 4
    num_rotation_classes: int = 72
    num_grip_classes: int = 2
    num_collision_classes: int = 2
    num_latents: int = 2048
    im_channels: int = 128
    latent_dim: int = 512
    cross_heads: int = 1
    latent_heads: int = 8
    cross_dim_head: int = 64
    latent_dim_head: int = 64
    activation: str = "lrelu"
    lang_emb_dim: int = 512
    lang_max_seq_len: int = 77
    input_dropout: float = 0.1
    attn_dropout: float = 0.1
    decoder_dropout: float = 0.0
    voxel_patch_size: int = 5
    voxel_patch_stride: int = 5
    final_dim: int = 128
    no_skip_connection: bool = False
    no_perceiver: bool = False
    no_language: bool = False
    unet_channels: Sequence[int] = (8, 16, 32, 64)
    # matmul/conv compute dtype (MethodConfig.policy_dtype): heads, norms,
    # softmaxes and the trans decoder stay float32
    dtype: Any = jnp.float32
    # boundary padding of the 100³ tail convs (MethodConfig.policy_pad_mode)
    pad_mode: str = "edge"
    # implementation of the hot 100³ tail convs (MethodConfig.policy_conv_impl)
    conv_impl: str = "xla"
    # voxel U-Net encoder impl (MethodConfig.policy_unet_impl)
    unet_impl: str = "xla"
    # latent self-attention impl (MethodConfig.policy_attn_impl):
    # 'xla' | 'flash' (ops/flash_attention.py Pallas kernel)
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, voxel_grid: jnp.ndarray, proprio: jnp.ndarray,
                 lang_goal_emb: jnp.ndarray, lang_token_embs: jnp.ndarray,
                 deterministic: bool = True):
        """
        Args:
          voxel_grid: [B, V, V, V, initial_dim] channels-last.
          proprio: [B, low_dim_size]
          lang_goal_emb: [B, 1024] CLIP sentence embedding (used only by ablations).
          lang_token_embs: [B, 77, lang_emb_dim] CLIP token embeddings.
        """
        b = voxel_grid.shape[0]
        spatial = self.voxel_size // self.voxel_patch_stride
        token_dim = self.im_channels * 2

        if self.no_language:
            lang_goal_emb = jnp.zeros_like(lang_goal_emb)
            lang_token_embs = jnp.zeros_like(lang_token_embs)

        d0, _multi_scale = VoxelUNetShallow(
            out_channels=self.im_channels, channels=tuple(self.unet_channels),
            dtype=self.dtype, impl=self.unet_impl,
            name="encoder_3d")(voxel_grid)                     # [B,V,V,V,128]

        feats = list(spatial_softmax3d_with_max(d0))           # 3C + C

        # patchify: kernel==stride non-overlapping conv as reshape+matmul
        # (blocks.Patchify3D rationale — stride-5 conv backward is a Mosaic
        # pathology, +75 ms/step measured)
        ins = Patchify3D(self.im_channels, self.voxel_patch_size,
                         self.activation, dtype=self.dtype,
                         name="patchify")(d0)                  # [B,S,S,S,128]

        if self.low_dim_size > 0:
            p = DenseBlock(self.im_channels, self.activation,
                           name="proprio_preprocess")(proprio)  # [B,128]
            p = jnp.broadcast_to(p[:, None, None, None, :],
                                 (b, spatial, spatial, spatial, self.im_channels))
            ins = jnp.concatenate([ins, p], axis=-1)           # [B,S,S,S,256]

        queries_shape = ins.shape
        ins = ins.reshape(b, spatial ** 3, token_dim)          # [B,8000,256]

        lang = nn.Dense(token_dim, name="lang_preprocess",
                        dtype=self.dtype)(lang_token_embs)
        num_lang = lang.shape[1]
        ins = jnp.concatenate([lang, ins], axis=1)             # [B,8077,256]

        pos = self.param("pos_encoding", nn.initializers.normal(1.0),
                         (1, self.lang_max_seq_len + spatial ** 3, token_dim))
        ins = ins + pos

        latents = self.param("latents", nn.initializers.normal(1.0),
                             (self.num_latents, self.latent_dim))
        x = jnp.broadcast_to(latents[None], (b, self.num_latents, self.latent_dim))

        cross_attn = PreNormAttention(self.cross_heads, self.cross_dim_head,
                                      self.input_dropout, cross=True,
                                      dtype=self.dtype, name="cross_attn")
        cross_ff = PreNormFF(dtype=self.dtype, name="cross_ff")
        self_blocks = [(PreNormAttention(self.latent_heads, self.latent_dim_head,
                                         self.attn_dropout, dtype=self.dtype,
                                         impl=self.attn_impl,
                                         name=f"self_attn_{i}"),
                        PreNormFF(dtype=self.dtype, name=f"self_ff_{i}"))
                       for i in range(self.depth)]

        for _ in range(self.iterations):
            x = cross_attn(x, context=ins, deterministic=deterministic) + x
            x = cross_ff(x) + x
            for sa, ff in self_blocks:
                x = sa(x, deterministic=deterministic) + x
                x = ff(x) + x

        dec = PreNormAttention(self.cross_heads, self.cross_dim_head,
                               self.decoder_dropout, cross=True,
                               dtype=self.dtype, name="decoder_cross_attn")(
            ins, context=x, deterministic=deterministic)       # [B,8077,256]

        dec = dec[:, num_lang:]
        dec = dec.reshape(queries_shape)                       # [B,S,S,S,256]

        feats.extend(spatial_softmax3d_with_max(dec))

        up = Conv3DUpsampleBlock(self.final_dim, self.voxel_patch_stride,
                                 kernel_size=3, activation=self.activation,
                                 dtype=self.dtype, pad_mode=self.pad_mode,
                                 impl=self.conv_impl,
                                 name="up0")(dec)              # [B,V,V,V,128]

        if self.no_skip_connection:
            lat = Conv3DBlock(self.im_channels, 3, 1, self.activation,
                              dtype=self.dtype, pad_mode=self.pad_mode,
                              impl=self.conv_impl, name="final")(up)
        elif self.no_perceiver:
            lat = Conv3DBlock(self.im_channels, 3, 1, self.activation,
                              dtype=self.dtype, pad_mode=self.pad_mode,
                              impl=self.conv_impl, name="final")(d0)
        else:
            # concat in the compute dtype: at bf16 this halves the HBM cost of
            # the heaviest tensor in the net (100³×256ch)
            lat = Conv3DBlock(self.im_channels, 3, 1, self.activation,
                              dtype=self.dtype, pad_mode=self.pad_mode,
                              impl=self.conv_impl, name="final")(
                jnp.concatenate([d0.astype(self.dtype),
                                 up.astype(self.dtype)], axis=-1))

        # Q-head: 128→1 conv as channel-contraction matmul + shifted adds
        # (blocks.ChannelProjectConv3D — 1-lane convs starve the MXU, +74 ms
        # measured); contraction in compute dtype, fp32 accumulation/logits
        trans = ChannelProjectConv3D(1, 3, None, dtype=self.dtype,
                                     pad_mode=self.pad_mode,
                                     name="trans_decoder")(lat)  # [B,V,V,V,1]

        rot_grip_q = None
        collision_q = None
        if self.num_rotation_classes > 0:
            feats.extend(spatial_softmax3d_with_max(lat))
            h = DenseBlock(256, self.activation, name="dense0")(
                jnp.concatenate(feats, axis=1))
            h = DenseBlock(self.final_dim, self.activation, name="dense1")(h)
            out = DenseBlock(self.num_rotation_classes * 3
                             + self.num_grip_classes + self.num_collision_classes,
                             None, name="rot_grip_collision_ff")(h)
            rot_grip_q = out[:, :-self.num_collision_classes]
            collision_q = out[:, -self.num_collision_classes:]

        return trans, rot_grip_q, collision_q, d0, lang
