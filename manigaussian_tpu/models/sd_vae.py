"""Stable-Diffusion VAE (AutoencoderKL) in Flax, with ODISE feature taps.

This is the real compute behind ManiGaussian's flagship
`foundation_model_name='diffusion'` semantic supervision: ODISE's
LdmFeatureExtractor decodes the CLEAN latent (`decode_to_image(latent_image)`,
ldm.py:592 — NOT the UNet output), and ManiGaussian consumes only
`feature_list[-1]` (`used_feature_idx = -1`,
agents/manigaussian_bc/neural_rendering.py:135-137) — the VAE decoder tap at
flat block index 5: a [B, 512, 128, 128] feature for a 512² input. The SD
UNet and caption conditioning therefore do not influence the training signal;
this module implements the VAE bit-faithfully (CompVis LDM AutoencoderKL:
swish + GroupNorm(32, eps 1e-6) resnet blocks, mid single-head attention,
asymmetric-pad stride-2 downsample, nearest-2× upsample) and exposes the same
taps:

  encoder taps (5, 7)  — hidden state BEFORE flat-indexed encoder res-block
                         (ldm.py:291,422-425)
  decoder taps (2, 5)  — hidden state BEFORE flat-indexed decoder res-block
                         (ldm.py:321,500-505); tap 5 is THE ManiGaussian
                         feature (512 ch, stride 4)

Weights convert from a CompVis SD checkpoint's `first_stage_model.*` keys via
tools/convert_weights.py sd_vae. SD v1.x config: ch=128, ch_mult=(1,2,4,4),
2 res blocks/level, z=4 (double), scale_factor 0.18215.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def swish(x):
    return x * jax.nn.sigmoid(x)


class ResnetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(h)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention (LDM VAE mid attention)."""

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = nn.Conv(c, (1, 1), name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), name="v")(y).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(float(c)), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), name="proj_out")(out)
        return x + out


class SDVaeEncoder(nn.Module):
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    taps: Tuple[int, ...] = (5, 7)

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] normalized
        feats = []
        flat = 0
        h = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv_in")(x)
        for i_level, mult in enumerate(self.ch_mult):
            for i_block in range(self.num_res_blocks):
                if flat in self.taps:
                    feats.append(h)
                h = ResnetBlock(self.ch * mult,
                                name=f"down_{i_level}_block_{i_block}")(h)
                flat += 1
            if i_level != len(self.ch_mult) - 1:
                # LDM downsample: asymmetric pad (0,1,0,1) + stride-2 VALID
                hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            padding="VALID",
                            name=f"down_{i_level}_downsample")(hp)
        h = ResnetBlock(h.shape[-1], name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        h = swish(h)
        h = nn.Conv(2 * self.z_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv_out")(h)            # moments [B, h, w, 8]
        return h, feats


class SDVaeDecoder(nn.Module):
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    taps: Tuple[int, ...] = (2, 5)
    decode_image: bool = False  # taps only by default (the used path)

    @nn.compact
    def __call__(self, z):  # [B, h, w, z]
        feats = []
        flat = 0
        h = nn.Conv(self.ch * self.ch_mult[-1], (3, 3),
                    padding=[(1, 1), (1, 1)], name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_2")(h)
        n_levels = len(self.ch_mult)
        max_tap = max(self.taps) if self.taps else -1
        for rev, i_level in enumerate(reversed(range(n_levels))):
            for i_block in range(self.num_res_blocks + 1):
                if flat in self.taps:
                    feats.append(h)
                h = ResnetBlock(self.ch * self.ch_mult[i_level],
                                name=f"up_{i_level}_block_{i_block}")(h)
                flat += 1
            if not self.decode_image and flat > max_tap:
                return None, feats      # skip the unused high-res levels
            if i_level != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c),
                                     method="nearest")
                h = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"up_{i_level}_upsample")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        h = swish(h)
        h = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], name="conv_out")(h)
        return h, feats


class SDVae(nn.Module):
    """encode (deterministic posterior mean) → scaled latent → decode taps."""

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    scale_factor: float = 0.18215
    encoder_taps: Tuple[int, ...] = (5, 7)
    decoder_taps: Tuple[int, ...] = (2, 5)
    decode_image: bool = False

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] in [-1, 1]
        moments, enc_feats = SDVaeEncoder(
            self.ch, self.ch_mult, self.num_res_blocks, self.z_channels,
            self.encoder_taps, name="encoder")(x)
        moments = nn.Conv(2 * self.z_channels, (1, 1), name="quant_conv")(
            moments)
        mean = moments[..., :self.z_channels]   # deterministic (ldm.py:453)
        latent = self.scale_factor * mean
        z = (1.0 / self.scale_factor) * latent  # decode_to_image (ldm.py:524)
        z = nn.Conv(self.z_channels, (1, 1), name="post_quant_conv")(z)
        img, dec_feats = SDVaeDecoder(
            self.ch, self.ch_mult, self.num_res_blocks, self.decoder_taps,
            self.decode_image, name="decoder")(z)
        return {"latent": latent, "image": img,
                "encoder_features": enc_feats, "decoder_features": dec_feats}


# ------------------------------------------------------------------ weights

def load_sd_vae_state_dict(path_or_sd) -> Dict[str, Any]:
    """CompVis SD checkpoint (or bare AutoencoderKL state dict) → SDVae params.

    Accepts the full SD checkpoint (keys prefixed `first_stage_model.`) or an
    already-extracted VAE state dict.
    """
    if isinstance(path_or_sd, (str, bytes)):
        import torch
        obj = torch.load(path_or_sd, map_location="cpu")
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else \
            obj.state_dict()
    else:
        sd = path_or_sd
    if any(k.startswith("first_stage_model.") for k in sd):
        sd = {k[len("first_stage_model."):]: v for k, v in sd.items()
              if k.startswith("first_stage_model.")}

    def arr(key):
        t = sd[key]
        return jnp.asarray(np.asarray(getattr(t, "detach", lambda: t)().cpu()
                                      if hasattr(t, "detach") else t,
                                      dtype=np.float32))

    def conv(key):  # torch [O, I, kh, kw] -> flax [kh, kw, I, O]
        return {"kernel": jnp.transpose(arr(f"{key}.weight"), (2, 3, 1, 0)),
                "bias": arr(f"{key}.bias")}

    def gn(key):
        return {"scale": arr(f"{key}.weight"), "bias": arr(f"{key}.bias")}

    def resblock(key, in_ch, out_ch):
        p = {"norm1": gn(f"{key}.norm1"), "conv1": conv(f"{key}.conv1"),
             "norm2": gn(f"{key}.norm2"), "conv2": conv(f"{key}.conv2")}
        if f"{key}.nin_shortcut.weight" in sd:
            p["nin_shortcut"] = conv(f"{key}.nin_shortcut")
        return p

    def attn(key):
        return {"norm": gn(f"{key}.norm"), "q": conv(f"{key}.q"),
                "k": conv(f"{key}.k"), "v": conv(f"{key}.v"),
                "proj_out": conv(f"{key}.proj_out")}

    ch_mult, n_res = (1, 2, 4, 4), 2
    enc: Dict[str, Any] = {"conv_in": conv("encoder.conv_in"),
                           "mid_block_1": resblock("encoder.mid.block_1", 0, 0),
                           "mid_attn_1": attn("encoder.mid.attn_1"),
                           "mid_block_2": resblock("encoder.mid.block_2", 0, 0),
                           "norm_out": gn("encoder.norm_out"),
                           "conv_out": conv("encoder.conv_out")}
    for i in range(len(ch_mult)):
        for j in range(n_res):
            enc[f"down_{i}_block_{j}"] = resblock(
                f"encoder.down.{i}.block.{j}", 0, 0)
        if i != len(ch_mult) - 1:
            enc[f"down_{i}_downsample"] = conv(
                f"encoder.down.{i}.downsample.conv")

    dec: Dict[str, Any] = {"conv_in": conv("decoder.conv_in"),
                           "mid_block_1": resblock("decoder.mid.block_1", 0, 0),
                           "mid_attn_1": attn("decoder.mid.attn_1"),
                           "mid_block_2": resblock("decoder.mid.block_2", 0, 0)}
    for i in range(len(ch_mult)):
        for j in range(n_res + 1):
            key = f"decoder.up.{i}.block.{j}"
            if f"{key}.conv1.weight" in sd:
                dec[f"up_{i}_block_{j}"] = resblock(key, 0, 0)
        if f"decoder.up.{i}.upsample.conv.weight" in sd:
            dec[f"up_{i}_upsample"] = conv(f"decoder.up.{i}.upsample.conv")
    if "decoder.norm_out.weight" in sd:
        dec["norm_out"] = gn("decoder.norm_out")
        dec["conv_out"] = conv("decoder.conv_out")

    return {"params": {"encoder": enc, "decoder": dec,
                       "quant_conv": conv("quant_conv"),
                       "post_quant_conv": conv("post_quant_conv")}}


def dims_from_state_dict(sd) -> Dict[str, Any]:
    """Infer (ch, ch_mult, num_res_blocks, z) from a VAE state dict."""
    if any(k.startswith("first_stage_model.") for k in sd):
        sd = {k[len("first_stage_model."):]: v for k, v in sd.items()
              if k.startswith("first_stage_model.")}
    ch = int(np.asarray(sd["encoder.conv_in.weight"]).shape[0])
    z2 = int(np.asarray(sd["encoder.conv_out.weight"]).shape[0])
    n_levels = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("encoder.down."))
    n_res = 1 + max(int(k.split(".")[4]) for k in sd
                    if k.startswith("encoder.down.0.block."))
    mult = []
    for i in range(n_levels):
        out_c = int(np.asarray(
            sd[f"encoder.down.{i}.block.0.conv1.weight"]).shape[0])
        mult.append(out_c // ch)
    return dict(ch=ch, ch_mult=tuple(mult), num_res_blocks=n_res,
                z_channels=z2 // 2)
