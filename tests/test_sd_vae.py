"""Flax SD-VAE (models/sd_vae.py) parity vs a torch twin built 1:1 from the
CompVis/LDM AutoencoderKL definitions the reference loads (ODISE
ldm.py:407-520 encoder/decoder forward; ManiGaussian consumes the decoder
tap-[-1] feature, neural_rendering.py:135-137)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from manigaussian_tpu.models import sd_vae as sv

# tiny config: same topology as SD v1 (4 levels, mult (1,2,4,4), 2 res
# blocks), base ch 32 so GroupNorm(32) divides every width
CH, CH_MULT, NRES, Z = 32, (1, 2, 4, 4), 2, 4


def _gn(c):
    return tnn.GroupNorm(32, c, eps=1e-6)


class _Res(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1, self.conv1 = _gn(cin), tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2, self.conv2 = _gn(cout), tnn.Conv2d(cout, cout, 3, padding=1)
        self.nin_shortcut = (tnn.Conv2d(cin, cout, 1)
                             if cin != cout else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.nin_shortcut is not None:
            x = self.nin_shortcut(x)
        return x + h


class _Attn(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = _gn(c)
        self.q, self.k, self.v = (tnn.Conv2d(c, c, 1) for _ in range(3))
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.norm(x)
        q = self.q(y).reshape(b, c, h * w).permute(0, 2, 1)
        k = self.k(y).reshape(b, c, h * w)
        v = self.v(y).reshape(b, c, h * w)
        w_ = torch.softmax(torch.bmm(q, k) * (c ** -0.5), dim=2)
        out = torch.bmm(v, w_.permute(0, 2, 1)).reshape(b, c, h, w)
        return x + self.proj_out(out)


class _TorchVaeTwin(tnn.Module):
    """State-dict-compatible with CompVis AutoencoderKL (keys match
    first_stage_model.* minus the prefix)."""

    def __init__(self):
        super().__init__()
        sd = {}
        ch = CH

        def conv(key, cin, cout, k, stride=1):
            m = tnn.Conv2d(cin, cout, k, stride=stride,
                           padding=(k // 2 if stride == 1 else 0))
            sd[f"{key}.weight"], sd[f"{key}.bias"] = m.weight, m.bias
            return m

        def res(key, cin, cout):
            m = _Res(cin, cout)
            sd[f"{key}.norm1.weight"], sd[f"{key}.norm1.bias"] = \
                m.norm1.weight, m.norm1.bias
            sd[f"{key}.conv1.weight"], sd[f"{key}.conv1.bias"] = \
                m.conv1.weight, m.conv1.bias
            sd[f"{key}.norm2.weight"], sd[f"{key}.norm2.bias"] = \
                m.norm2.weight, m.norm2.bias
            sd[f"{key}.conv2.weight"], sd[f"{key}.conv2.bias"] = \
                m.conv2.weight, m.conv2.bias
            if m.nin_shortcut is not None:
                sd[f"{key}.nin_shortcut.weight"] = m.nin_shortcut.weight
                sd[f"{key}.nin_shortcut.bias"] = m.nin_shortcut.bias
            return m

        def attn(key, c):
            m = _Attn(c)
            for name in ("norm", "q", "k", "v", "proj_out"):
                sub = getattr(m, name)
                sd[f"{key}.{name}.weight"] = sub.weight
                sd[f"{key}.{name}.bias"] = sub.bias
            return m

        self.enc_conv_in = conv("encoder.conv_in", 3, ch, 3)
        self.enc_blocks, self.enc_down = [], []
        cin = ch
        for i, mult in enumerate(CH_MULT):
            lvl = []
            for j in range(NRES):
                lvl.append(res(f"encoder.down.{i}.block.{j}", cin, ch * mult))
                cin = ch * mult
            self.enc_blocks.append(tnn.ModuleList(lvl))
            if i != len(CH_MULT) - 1:
                self.enc_down.append(
                    conv(f"encoder.down.{i}.downsample.conv", cin, cin, 3,
                         stride=2))
        self.enc_blocks = tnn.ModuleList(self.enc_blocks)
        self.enc_down = tnn.ModuleList(self.enc_down)
        self.enc_mid1 = res("encoder.mid.block_1", cin, cin)
        self.enc_attn = attn("encoder.mid.attn_1", cin)
        self.enc_mid2 = res("encoder.mid.block_2", cin, cin)
        self.enc_norm_out = _gn(cin)
        sd["encoder.norm_out.weight"] = self.enc_norm_out.weight
        sd["encoder.norm_out.bias"] = self.enc_norm_out.bias
        self.enc_conv_out = conv("encoder.conv_out", cin, 2 * Z, 3)
        self.quant_conv = conv("quant_conv", 2 * Z, 2 * Z, 1)
        self.post_quant_conv = conv("post_quant_conv", Z, Z, 1)

        self.dec_conv_in = conv("decoder.conv_in", Z, ch * CH_MULT[-1], 3)
        cin = ch * CH_MULT[-1]
        self.dec_mid1 = res("decoder.mid.block_1", cin, cin)
        self.dec_attn = attn("decoder.mid.attn_1", cin)
        self.dec_mid2 = res("decoder.mid.block_2", cin, cin)
        self.dec_blocks, self.dec_up = {}, {}
        for i in reversed(range(len(CH_MULT))):
            lvl = []
            for j in range(NRES + 1):
                lvl.append(res(f"decoder.up.{i}.block.{j}", cin,
                               ch * CH_MULT[i]))
                cin = ch * CH_MULT[i]
            self.dec_blocks[i] = tnn.ModuleList(lvl)
            if i != 0:
                self.dec_up[i] = conv(f"decoder.up.{i}.upsample.conv",
                                      cin, cin, 3)
        self.dec_blocks = tnn.ModuleDict(
            {str(k): v for k, v in self.dec_blocks.items()})
        self.dec_up = tnn.ModuleDict(
            {str(k): v for k, v in self.dec_up.items()})
        self.dec_norm_out = _gn(cin)
        sd["decoder.norm_out.weight"] = self.dec_norm_out.weight
        sd["decoder.norm_out.bias"] = self.dec_norm_out.bias
        self.dec_conv_out = conv("decoder.conv_out", cin, 3, 3)
        self._sd = sd

    def state_dict_compat(self):
        return {k: v.detach().clone() for k, v in self._sd.items()}

    @torch.no_grad()
    def forward(self, x, scale_factor=0.18215):
        # mirrors ODISE encoder_forward / encode_to_latent / decode_to_image
        # (ldm.py:412-520), capturing taps (5,7) and (2,5)
        enc_feats, flat = [], 0
        h = self.enc_conv_in(x)
        for i in range(len(CH_MULT)):
            for j in range(NRES):
                if flat in (5, 7):
                    enc_feats.append(h.clone())
                h = self.enc_blocks[i][j](h)
                flat += 1
            if i != len(CH_MULT) - 1:
                h = self.enc_down[i](F.pad(h, (0, 1, 0, 1)))
        h = self.enc_mid2(self.enc_attn(self.enc_mid1(h)))
        h = self.enc_conv_out(F.silu(self.enc_norm_out(h)))
        moments = self.quant_conv(h)
        latent = scale_factor * moments[:, :Z]

        z = self.post_quant_conv(latent / scale_factor)
        h = self.dec_conv_in(z)
        h = self.dec_mid2(self.dec_attn(self.dec_mid1(h)))
        dec_feats, flat = [], 0
        for i in reversed(range(len(CH_MULT))):
            for j in range(NRES + 1):
                if flat in (2, 5):
                    dec_feats.append(h.clone())
                h = self.dec_blocks[str(i)][j](h)
                flat += 1
            if i != 0:
                h = self.dec_up[str(i)](
                    F.interpolate(h, scale_factor=2.0, mode="nearest"))
        return latent, enc_feats, dec_feats


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(0)
    return _TorchVaeTwin().eval()


def test_dims_inferred_from_state_dict(twin):
    dims = sv.dims_from_state_dict(twin.state_dict_compat())
    assert dims == dict(ch=CH, ch_mult=CH_MULT, num_res_blocks=NRES,
                        z_channels=Z)


def test_flax_vae_matches_torch_twin(twin):
    sd = twin.state_dict_compat()
    dims = sv.dims_from_state_dict(sd)
    model = sv.SDVae(**dims)
    variables = sv.load_sd_vae_state_dict(sd)

    torch.manual_seed(1)
    x_t = torch.randn(2, 3, 32, 32)
    latent_t, enc_t, dec_t = twin(x_t)

    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    out = model.apply(variables, x_j)

    np.testing.assert_allclose(
        np.asarray(out["latent"]).transpose(0, 3, 1, 2),
        latent_t.numpy(), rtol=1e-4, atol=1e-4)
    assert len(out["encoder_features"]) == 2
    assert len(out["decoder_features"]) == 2
    for f_j, f_t in zip(out["encoder_features"], enc_t):
        np.testing.assert_allclose(np.asarray(f_j).transpose(0, 3, 1, 2),
                                   f_t.numpy(), rtol=1e-4, atol=1e-4)
    for f_j, f_t in zip(out["decoder_features"], dec_t):
        np.testing.assert_allclose(np.asarray(f_j).transpose(0, 3, 1, 2),
                                   f_t.numpy(), rtol=1e-4, atol=2e-4)
    # the ManiGaussian feature: decoder tap -1, 4x-downsampled, ch*mult[2]
    f = out["decoder_features"][-1]
    assert f.shape == (2, 8, 8, CH * CH_MULT[2])


def test_convert_and_extract(tmp_path, twin):
    from manigaussian_tpu.models.foundation import (SDVaeFeatureExtractor,
                                                    create_feature_extractor)
    from manigaussian_tpu.tools.convert_weights import convert_sd_vae

    # full-SD-checkpoint layout: first_stage_model.* under 'state_dict'
    ckpt = {"state_dict": {f"first_stage_model.{k}": v
                           for k, v in twin.state_dict_compat().items()}}
    pt = str(tmp_path / "sd.ckpt")
    torch.save(ckpt, pt)
    out = str(tmp_path / "sd_vae.msgpack")
    payload = convert_sd_vae(pt, out)
    assert payload["tower"] == "sd_vae"

    ext = create_feature_extractor("diffusion", out)
    assert isinstance(ext, SDVaeFeatureExtractor)
    ext.feature_hw = 32  # tiny twin scale (512 on the real tower)
    rgb = jnp.linspace(0, 1, 2 * 16 * 16 * 3).reshape(2, 16, 16, 3)
    feats = np.asarray(ext(rgb))
    assert feats.shape == (2, 16, 16, CH * CH_MULT[2])
    assert np.isfinite(feats).all()

    # direct-ckpt path == converted path
    ext2 = SDVaeFeatureExtractor(pt, feature_hw=32)
    np.testing.assert_allclose(np.asarray(ext2(rgb)), feats, atol=1e-5)
