"""DINOv2 Flax tower + loader parity vs a torch twin with random weights.

Real ViT-L/14 weights cannot enter this environment (PARITY.md); the twin is
built exactly like facebookresearch/dinov2's vision transformer (pre-norm
blocks with LayerScale, GELU MLP, final LayerNorm, x_norm_patchtokens output)
and its state_dict goes through `load_dinov2_state_dict`.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from manigaussian_tpu.models.dinov2 import (DinoV2ViT, dims_from_state_dict,
                                            load_dinov2_state_dict)

PATCH, WIDTH, LAYERS, HEADS, GRID = 2, 32, 2, 4, 4  # img 8x8 -> 4x4 patches


class _LayerScale(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = tnn.Parameter(torch.randn(dim) * 0.1)

    def forward(self, x):
        return x * self.gamma


class _Attn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, L, D = x.shape
        d = D // self.heads
        qkv = self.qkv(x).reshape(B, L, 3, self.heads, d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) / np.sqrt(d)
        o = (att.softmax(-1) @ v).transpose(1, 2).reshape(B, L, D)
        return self.proj(o)


class _Mlp(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.fc2(tnn.functional.gelu(self.fc1(x)))


class _Block(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = _Attn(dim, heads)
        self.ls1 = _LayerScale(dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim)
        self.ls2 = _LayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class _TorchDinoTwin(tnn.Module):
    def __init__(self):
        super().__init__()
        self.cls_token = tnn.Parameter(torch.randn(1, 1, WIDTH) * 0.1)
        self.pos_embed = tnn.Parameter(
            torch.randn(1, 1 + GRID * GRID, WIDTH) * 0.1)
        self.patch_embed_proj = tnn.Conv2d(3, WIDTH, PATCH, stride=PATCH)
        self.blocks = tnn.ModuleList(
            [_Block(WIDTH, HEADS) for _ in range(LAYERS)])
        self.norm = tnn.LayerNorm(WIDTH, eps=1e-6)

    def forward_features(self, img):      # img [B,3,H,W] already normalized
        B = img.shape[0]
        x = self.patch_embed_proj(img).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, 1:]                   # x_norm_patchtokens

    def clip_state_dict(self):
        sd = {
            "cls_token": self.cls_token,
            "pos_embed": self.pos_embed,
            "patch_embed.proj.weight": self.patch_embed_proj.weight,
            "patch_embed.proj.bias": self.patch_embed_proj.bias,
            "norm.weight": self.norm.weight,
            "norm.bias": self.norm.bias,
        }
        for i, blk in enumerate(self.blocks):
            b = f"blocks.{i}"
            sd.update({
                f"{b}.norm1.weight": blk.norm1.weight,
                f"{b}.norm1.bias": blk.norm1.bias,
                f"{b}.norm2.weight": blk.norm2.weight,
                f"{b}.norm2.bias": blk.norm2.bias,
                f"{b}.attn.qkv.weight": blk.attn.qkv.weight,
                f"{b}.attn.qkv.bias": blk.attn.qkv.bias,
                f"{b}.attn.proj.weight": blk.attn.proj.weight,
                f"{b}.attn.proj.bias": blk.attn.proj.bias,
                f"{b}.mlp.fc1.weight": blk.mlp.fc1.weight,
                f"{b}.mlp.fc1.bias": blk.mlp.fc1.bias,
                f"{b}.mlp.fc2.weight": blk.mlp.fc2.weight,
                f"{b}.mlp.fc2.bias": blk.mlp.fc2.bias,
                f"{b}.ls1.gamma": blk.ls1.gamma,
                f"{b}.ls2.gamma": blk.ls2.gamma,
            })
        return {k: v.detach() for k, v in sd.items()}


def test_flax_dinov2_matches_torch_twin():
    torch.manual_seed(0)
    twin = _TorchDinoTwin().eval()
    sd = twin.clip_state_dict()
    dims = dims_from_state_dict(sd)
    assert dims["patch_size"] == PATCH and dims["width"] == WIDTH
    assert dims["layers"] == LAYERS and dims["pos_grid"] == GRID

    model = DinoV2ViT(patch_size=PATCH, width=WIDTH, layers=LAYERS,
                      heads=HEADS, pos_grid=GRID)
    variables = load_dinov2_state_dict(sd)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = twin.forward_features(
            torch.tensor(img).permute(0, 3, 1, 2)).numpy()
    out_j = np.asarray(model.apply(variables, img))
    np.testing.assert_allclose(out_j, out_t, atol=2e-5, rtol=1e-4)


def test_jax_extractor_end_to_end(tmp_path):
    """checkpoint file → DinoV2JaxExtractor → extract_gt_embed shapes/finite."""
    from manigaussian_tpu.models.dinov2 import DinoV2JaxExtractor
    from manigaussian_tpu.models.foundation import extract_gt_embed

    torch.manual_seed(1)
    twin = _TorchDinoTwin()
    ckpt = tmp_path / "tiny_dino.pt"
    torch.save(twin.clip_state_dict(), str(ckpt))

    ex = DinoV2JaxExtractor(str(ckpt))
    rgb = np.random.default_rng(2).uniform(
        0, 1, (1, 16, 16, 3)).astype(np.float32)
    embed = extract_gt_embed(rgb, ex, d_embed=3)
    assert embed.shape == (1, 16, 16, 3)
    assert bool(np.isfinite(np.asarray(embed)).all())


def test_diffusion_maps_to_stub_with_warning():
    """'diffusion' has no offline tower; must warn loudly, not silently stub
    (VERDICT.md item 4)."""
    from manigaussian_tpu.models.foundation import (StubFeatureExtractor,
                                                    create_feature_extractor)
    with pytest.warns(UserWarning, match="diffusion"):
        ex = create_feature_extractor("diffusion")
    assert isinstance(ex, StubFeatureExtractor)
