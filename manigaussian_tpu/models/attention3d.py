"""3D visual-language cross-attention blocks.

Parity target: `agents/manigaussian_bc/attention.py:92-420`
(Visual3DLangTransformer / CrossAttention / LinearAttention) — shipped by the
reference as an optional library for fusing language into 3D feature volumes
(constructed by config, largely unused by the main model; provided here for
capability parity).

Flax, channels-last volumes [B, D, H, W, C]; linear attention is the
kernelized O(N) variant (softmax feature maps), standard attention uses fp32
softmax on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class LinearAttention3D(nn.Module):
    """O(N) kernelized self-attention over voxel tokens (attention.py:92-130)."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):  # [B, D, H, W, C]
        b, d, h, w, c = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Conv(inner * 3, (1, 1, 1), use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, d * h * w, 3 * inner), 3, axis=-1)

        def heads_of(t):
            return t.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(heads_of, (q, k, v))
        q = jax.nn.softmax(q, axis=-1)
        k = jax.nn.softmax(k, axis=-2)
        ctx = jnp.einsum("bhnd,bhne->bhde", k, v)
        out = jnp.einsum("bhnd,bhde->bhne", q, ctx)
        out = out.transpose(0, 2, 1, 3).reshape(b, d, h, w, inner)
        return nn.Conv(c, (1, 1, 1), name="to_out")(out)


class CrossAttention3D(nn.Module):
    """Voxel tokens attend to language tokens (attention.py:200-260)."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x, context):  # x [B,D,H,W,C], context [B,L,Cl]
        b, d, h, w, c = x.shape
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(
            x.reshape(b, d * h * w, c))
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)

        def heads_of(t):
            return t.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(heads_of, (q, k, v))
        logits = jnp.einsum("bhnd,bhmd->bhnm", q * self.dim_head ** -0.5, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, d * h * w, inner)
        out = nn.Dense(c, name="to_out")(out)
        return out.reshape(b, d, h, w, c)


class Visual3DLangTransformer(nn.Module):
    """Self-attn (linear) + language cross-attn + MLP over a voxel volume
    (attention.py:300-420)."""

    heads: int = 4
    dim_head: int = 32
    mlp_mult: int = 2

    @nn.compact
    def __call__(self, x, lang_tokens):
        c = x.shape[-1]
        x = x + LinearAttention3D(self.heads, self.dim_head,
                                  name="self_attn")(nn.LayerNorm()(x))
        x = x + CrossAttention3D(self.heads, self.dim_head,
                                 name="cross_attn")(nn.LayerNorm()(x),
                                                    lang_tokens)
        h = nn.Dense(c * self.mlp_mult)(nn.LayerNorm()(x))
        x = x + nn.Dense(c)(jax.nn.gelu(h))
        return x
