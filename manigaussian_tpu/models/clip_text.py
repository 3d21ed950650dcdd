"""CLIP RN50 text tower in Flax + OpenAI-checkpoint weight loader.

Parity target: the reference's vendored CLIP text encoder
(`helpers/clip/core/clip.py:462-495` encode_text_with_embeddings): token
embedding (49408×512) + positional embedding (77×512) → 12 residual attention
blocks (8 heads, causal mask, QuickGELU MLP ×4) → ln_final → per-token
embeddings [77, 512]; the sentence embedding is the ln_final output at the EOT
position (argmax token id) projected 512→1024 by `text_projection`. The
reference embeds each goal string once at replay-fill time
(`launch_utils.py:228`), so this tower runs host-side/jitted-once, frozen.

TPU-first: one jit over the whole batch of prompts; fp32 (the tower is tiny
and runs once per task string).

Weights: `load_openai_state_dict` maps an OpenAI CLIP checkpoint (either a
torch.jit archive like RN50.pt or a plain state_dict) into this module's
param tree. No weights ship with this repo (zero-egress environment) —
see PARITY.md. The architecture+loader are verified against a torch twin with
random weights in tests/test_clip_text.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VOCAB_SIZE = 49408
CONTEXT_LENGTH = 77
WIDTH = 512
HEADS = 8
LAYERS = 12
EMBED_DIM = 1024  # RN50 joint space


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        # attn sub-block: x + out_proj(MHA(ln_1(x)))
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, L, _ = q.shape
        d = self.width // self.heads

        def heads_split(t):
            return t.reshape(B, L, self.heads, d).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
        att = att + mask[None, None, :, :]
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, self.width)
        x = x + nn.Dense(self.width, name="out_proj")(o)
        # mlp sub-block: x + c_proj(quickgelu(c_fc(ln_2(x))))
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * self.width, name="c_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.width, name="c_proj")(h)
        return x


class ClipTextTransformer(nn.Module):
    vocab_size: int = VOCAB_SIZE
    context_length: int = CONTEXT_LENGTH
    width: int = WIDTH
    heads: int = HEADS
    layers: int = LAYERS
    embed_dim: int = EMBED_DIM

    @nn.compact
    def __call__(self, tokens: jnp.ndarray):
        """tokens [B, 77] int32 → (sentence [B, embed_dim], token_embs [B, 77, width])."""
        tok_emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.width))
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width))
        x = tok_emb[tokens] + pos_emb[None, :, :]

        # causal mask (clip.py:449-455): additive -inf above the diagonal
        mask = jnp.triu(
            jnp.full((self.context_length, self.context_length), -jnp.inf), k=1)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, name=f"resblock_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)

        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim))
        eot_pos = jnp.argmax(tokens, axis=-1)
        sent = jnp.take_along_axis(
            x, eot_pos[:, None, None], axis=1)[:, 0, :] @ proj
        return sent, x


def load_openai_state_dict(path_or_sd) -> Dict[str, Any]:
    """OpenAI CLIP checkpoint → ClipTextTransformer params pytree.

    Accepts a path (.pt: torch.jit archive or pickled state_dict) or an
    in-memory dict of numpy/torch tensors. Only text-tower keys are consumed;
    the visual tower is ignored.
    """
    if isinstance(path_or_sd, (str, bytes)):
        import torch
        try:
            sd = torch.jit.load(path_or_sd, map_location="cpu").state_dict()
        except RuntimeError:
            obj = torch.load(path_or_sd, map_location="cpu")
            sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    else:
        sd = path_or_sd

    def arr(key):
        t = sd[key]
        return jnp.asarray(np.asarray(getattr(t, "detach", lambda: t)().cpu()
                                      if hasattr(t, "detach") else t,
                                      dtype=np.float32))

    params: Dict[str, Any] = {
        "token_embedding": arr("token_embedding.weight"),
        "positional_embedding": arr("positional_embedding"),
        "text_projection": arr("text_projection"),
        "ln_final": {"scale": arr("ln_final.weight"),
                     "bias": arr("ln_final.bias")},
    }
    n_layers = max(int(k.split(".")[2]) for k in sd
                   if k.startswith("transformer.resblocks.")) + 1
    for i in range(n_layers):
        p = f"transformer.resblocks.{i}"
        # torch Linear stores [out, in]; flax Dense kernels are [in, out]
        params[f"resblock_{i}"] = {
            "ln_1": {"scale": arr(f"{p}.ln_1.weight"),
                     "bias": arr(f"{p}.ln_1.bias")},
            "ln_2": {"scale": arr(f"{p}.ln_2.weight"),
                     "bias": arr(f"{p}.ln_2.bias")},
            "in_proj": {"kernel": arr(f"{p}.attn.in_proj_weight").T,
                        "bias": arr(f"{p}.attn.in_proj_bias")},
            "out_proj": {"kernel": arr(f"{p}.attn.out_proj.weight").T,
                         "bias": arr(f"{p}.attn.out_proj.bias")},
            "c_fc": {"kernel": arr(f"{p}.mlp.c_fc.weight").T,
                     "bias": arr(f"{p}.mlp.c_fc.bias")},
            "c_proj": {"kernel": arr(f"{p}.mlp.c_proj.weight").T,
                       "bias": arr(f"{p}.mlp.c_proj.bias")},
        }
    return {"params": params}


def model_dims_from_state_dict(sd) -> Dict[str, int]:
    """Infer tower dims from a checkpoint (supports tiny test twins)."""
    vocab, width = np.asarray(sd["token_embedding.weight"]).shape
    ctx = np.asarray(sd["positional_embedding"]).shape[0]
    embed_dim = np.asarray(sd["text_projection"]).shape[1]
    layers = max(int(k.split(".")[2]) for k in sd
                 if k.startswith("transformer.resblocks.")) + 1
    return dict(vocab_size=vocab, context_length=ctx, width=width,
                layers=layers, embed_dim=embed_dim)
