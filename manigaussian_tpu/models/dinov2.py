"""DINOv2 ViT patch-feature extractor in Flax + torch-hub checkpoint loader.

Parity target: the reference's semantic-supervision tower for w_geo_sem with
`foundation_model_name=dinov2` (`agents/manigaussian_bc/dino_extractor.py:10-34`
VitExtractor + `neural_rendering.py:149-166`): ImageNet-normalize the GT view,
run DINOv2 ViT-L/14 `forward_features`, take `x_norm_patchtokens` (final
LayerNorm over patch tokens, CLS dropped), reshape to the patch grid, bilinear
resize to the render resolution, then per-image PCA to d_embed=3 channels.

Architecture (published DINOv2 ViT): 14x14 conv patch embed -> prepend CLS ->
add interpolated position embeddings -> L pre-norm blocks with LayerScale
(x += ls1*attn(norm1 x); x += ls2*mlp(norm2 x), GELU MLP x4) -> final
LayerNorm. Optional register tokens (the `_reg` variants) are inserted after
CLS and dropped from the patch-token output.

TPU-first: pure Flax/jit, fp32; the tower is frozen (feature provider), runs
once per batch on-device — no torch at inference time. `load_dinov2_state_dict`
maps a facebookresearch/dinov2 torch-hub state dict into this tree; verified
against a randomly-initialized torch twin in tests/test_dinov2.py (real
weights cannot enter this zero-egress environment — PARITY.md).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class DinoBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        B, L, D = x.shape
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * self.width, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = self.width // self.heads

        def split(t):
            return t.reshape(B, L, self.heads, d).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        att = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d), axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, D)
        o = nn.Dense(self.width, name="proj")(o)
        ls1 = self.param("ls1_gamma", nn.initializers.constant(1e-5),
                         (self.width,))
        x = x + ls1 * o

        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(4 * self.width, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, name="fc2")(h)
        ls2 = self.param("ls2_gamma", nn.initializers.constant(1e-5),
                         (self.width,))
        return x + ls2 * h


class DinoV2ViT(nn.Module):
    patch_size: int = 14
    width: int = 1024      # ViT-L
    layers: int = 24
    heads: int = 16
    num_registers: int = 0
    pos_grid: int = 37     # 518/14: the pretraining pos-embed grid side

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B, H, W, 3] ALREADY ImageNet-normalized, H,W % patch == 0
        → x_norm_patchtokens [B, (H/p)*(W/p), width]."""
        B, H, W, _ = images.shape
        p = self.patch_size
        gh, gw = H // p, W // p

        x = nn.Conv(self.width, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed")(images)          # [B, gh, gw, D]
        x = x.reshape(B, gh * gw, self.width)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.width))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + self.pos_grid * self.pos_grid, self.width))
        # interpolate the patch position grid to (gh, gw) (dinov2
        # interpolate_pos_encoding; bicubic there, bilinear here — identical
        # when gh == pos_grid, and the tower is frozen so train/eval agree)
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        patch_pos = patch_pos.reshape(1, self.pos_grid, self.pos_grid,
                                      self.width)
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            patch_pos = jax.image.resize(
                patch_pos, (1, gh, gw, self.width), method="bilinear")
        patch_pos = patch_pos.reshape(1, gh * gw, self.width)

        x = x + patch_pos
        tokens = [jnp.broadcast_to(cls + cls_pos, (B, 1, self.width))]
        if self.num_registers:
            reg = self.param("register_tokens", nn.initializers.zeros,
                             (1, self.num_registers, self.width))
            tokens.append(jnp.broadcast_to(
                reg, (B, self.num_registers, self.width)))
        x = jnp.concatenate(tokens + [x], axis=1)

        for i in range(self.layers):
            x = DinoBlock(self.width, self.heads, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x[:, 1 + self.num_registers:]


def load_dinov2_state_dict(path_or_sd) -> Dict[str, Any]:
    """facebookresearch/dinov2 torch state dict → DinoV2ViT params pytree."""
    if isinstance(path_or_sd, (str, bytes)):
        import torch
        obj = torch.load(path_or_sd, map_location="cpu")
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        sd = sd.get("model", sd) if isinstance(sd, dict) else sd
    else:
        sd = path_or_sd

    def arr(key):
        t = sd[key]
        return jnp.asarray(np.asarray(getattr(t, "detach", lambda: t)().cpu()
                                      if hasattr(t, "detach") else t,
                                      dtype=np.float32))

    params: Dict[str, Any] = {
        "cls_token": arr("cls_token"),
        "pos_embed": arr("pos_embed"),
        # torch conv [D, 3, p, p] -> flax [p, p, 3, D]
        "patch_embed": {
            "kernel": jnp.transpose(arr("patch_embed.proj.weight"),
                                    (2, 3, 1, 0)),
            "bias": arr("patch_embed.proj.bias")},
        "norm": {"scale": arr("norm.weight"), "bias": arr("norm.bias")},
    }
    if "register_tokens" in sd:
        params["register_tokens"] = arr("register_tokens")
    n_layers = max(int(k.split(".")[1]) for k in sd
                   if k.startswith("blocks.")) + 1
    for i in range(n_layers):
        b = f"blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": {"scale": arr(f"{b}.norm1.weight"),
                      "bias": arr(f"{b}.norm1.bias")},
            "norm2": {"scale": arr(f"{b}.norm2.weight"),
                      "bias": arr(f"{b}.norm2.bias")},
            "qkv": {"kernel": arr(f"{b}.attn.qkv.weight").T,
                    "bias": arr(f"{b}.attn.qkv.bias")},
            "proj": {"kernel": arr(f"{b}.attn.proj.weight").T,
                     "bias": arr(f"{b}.attn.proj.bias")},
            "fc1": {"kernel": arr(f"{b}.mlp.fc1.weight").T,
                    "bias": arr(f"{b}.mlp.fc1.bias")},
            "fc2": {"kernel": arr(f"{b}.mlp.fc2.weight").T,
                    "bias": arr(f"{b}.mlp.fc2.bias")},
            "ls1_gamma": arr(f"{b}.ls1.gamma"),
            "ls2_gamma": arr(f"{b}.ls2.gamma"),
        }
    return {"params": params}


def dims_from_state_dict(sd) -> Dict[str, int]:
    d, _, p, _ = np.asarray(sd["patch_embed.proj.weight"]).shape
    n_pos = np.asarray(sd["pos_embed"]).shape[1] - 1
    layers = max(int(k.split(".")[1]) for k in sd
                 if k.startswith("blocks.")) + 1
    # heads are not recoverable from the state dict; published dinov2 towers
    # use head_dim 64
    return dict(patch_size=p, width=d, layers=layers, heads=max(1, d // 64),
                num_registers=(np.asarray(sd["register_tokens"]).shape[1]
                               if "register_tokens" in sd else 0),
                pos_grid=int(round(np.sqrt(n_pos))))


class DinoV2JaxExtractor:
    """FeatureExtractor provider backed by the Flax tower: [B,H,W,3] in [0,1]
    → dense features [B,H,W,width] (resized from the patch grid), matching
    VitExtractor + F.interpolate (neural_rendering.py:151-153)."""

    def __init__(self, checkpoint_path, patch_multiple: int = 518):
        if isinstance(checkpoint_path, str) and \
                checkpoint_path.endswith(".msgpack"):
            # pre-converted Flax weights (tools/convert_weights.py) — no torch
            from manigaussian_tpu.tools.convert_weights import load_converted
            payload = load_converted(checkpoint_path)
            dims, self.variables = payload["dims"], payload["variables"]
        else:
            sd = checkpoint_path
            if isinstance(checkpoint_path, (str, bytes)):
                import torch
                obj = torch.load(checkpoint_path, map_location="cpu")
                sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
            dims = dims_from_state_dict(sd)
            self.variables = load_dinov2_state_dict(sd)
        self.model = DinoV2ViT(**dims)
        self.patch = dims["patch_size"]
        self._apply = jax.jit(self.model.apply)

    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = rgb.shape
        p = self.patch
        # resize so the patch grid is at least the image size (the reference
        # resizes 128² -> 518² = 37 patches, then interpolates back to 128²)
        side = max(((max(h, w) + p - 1) // p) * p, p)
        img = jax.image.resize(rgb, (b, side, side, 3), method="bilinear")
        img = (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        toks = self._apply(self.variables, img)          # [B, g*g, D]
        g = side // p
        feats = toks.reshape(b, g, g, -1)
        return jax.image.resize(feats, (b, h, w, feats.shape[-1]),
                                method="bilinear")
