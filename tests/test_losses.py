"""Losses parity tests vs torch reference formulas (loss.py:9-73)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from manigaussian_tpu.ops import losses as L


def test_l1_l2():
    a = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    b = np.random.RandomState(1).rand(2, 8, 8, 3).astype(np.float32)
    np.testing.assert_allclose(float(L.l1_loss(jnp.array(a), jnp.array(b))),
                               float(torch.abs(torch.tensor(a) - torch.tensor(b)).mean()),
                               rtol=1e-6)
    np.testing.assert_allclose(float(L.l2_loss(jnp.array(a), jnp.array(b))),
                               float(((torch.tensor(a) - torch.tensor(b)) ** 2).mean()),
                               rtol=1e-6)


def test_cosine_matches_torch():
    a = np.random.RandomState(2).randn(2, 4, 4, 3).astype(np.float32)
    b = np.random.RandomState(3).randn(2, 4, 4, 3).astype(np.float32)
    ours = float(L.cosine_loss(jnp.array(a), jnp.array(b)))
    theirs = float(1 - F.cosine_similarity(torch.tensor(a), torch.tensor(b),
                                           dim=-1).mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_psnr():
    a = np.random.RandomState(4).rand(1, 8, 8, 3).astype(np.float32)
    b = np.random.RandomState(5).rand(1, 8, 8, 3).astype(np.float32)
    mse = np.mean((a - b) ** 2)
    expected = 20 * np.log10(1.0 / np.sqrt(mse))
    np.testing.assert_allclose(float(L.psnr(jnp.array(a), jnp.array(b))),
                               expected, rtol=1e-5)
    assert float(L.psnr(jnp.array(a), jnp.array(a))) == 100.0


def test_ssim_matches_torch_reference():
    """Compare against the exact torch implementation (loss.py:35-67)."""
    rs = np.random.RandomState(6)
    a = rs.rand(1, 16, 16, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rs.randn(1, 16, 16, 3).astype(np.float32), 0, 1)

    def torch_ssim(img1, img2, window_size=11):
        from math import exp
        g = torch.tensor([exp(-(x - window_size // 2) ** 2 / (2 * 1.5 ** 2))
                          for x in range(window_size)])
        g = (g / g.sum()).unsqueeze(1)
        w2 = g.mm(g.t()).unsqueeze(0).unsqueeze(0)
        c = img1.size(1)
        w = w2.expand(c, 1, window_size, window_size).contiguous()
        mu1 = F.conv2d(img1, w, padding=window_size // 2, groups=c)
        mu2 = F.conv2d(img2, w, padding=window_size // 2, groups=c)
        mu1_sq, mu2_sq, mu1mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, w, padding=window_size // 2, groups=c) - mu1_sq
        s2 = F.conv2d(img2 * img2, w, padding=window_size // 2, groups=c) - mu2_sq
        s12 = F.conv2d(img1 * img2, w, padding=window_size // 2, groups=c) - mu1mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
        return float(m.mean())

    ours = float(L.ssim(jnp.array(a), jnp.array(b)))
    theirs = torch_ssim(torch.tensor(a).permute(0, 3, 1, 2),
                        torch.tensor(b).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_cross_entropy_equivalence():
    rs = np.random.RandomState(7)
    logits = rs.randn(4, 10).astype(np.float32)
    labels = rs.randint(0, 10, size=(4,))
    onehot = np.eye(10, dtype=np.float32)[labels]
    ours_oh = float(L.softmax_cross_entropy_with_onehot(jnp.array(logits),
                                                        jnp.array(onehot)))
    ours_idx = float(L.softmax_cross_entropy_with_index(jnp.array(logits),
                                                        jnp.array(labels)))
    theirs = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    np.testing.assert_allclose(ours_oh, theirs, rtol=1e-5)
    np.testing.assert_allclose(ours_idx, theirs, rtol=1e-5)
