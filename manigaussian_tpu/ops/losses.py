"""Image / embedding losses for the Gaussian-splat world model.

Parity target: reference `agents/manigaussian_bc/loss.py:9-73` (l1/l2/cosine/ssim)
and `neural_rendering.py:22-27` (PSNR). All pure jnp, jit/vmap/grad-safe.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred - gt))


def masked_l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt) * mask)


def cosine_loss(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """1 - mean cosine similarity along the last axis (loss.py:17-22).

    SMOOTH eps (‖x‖ → sqrt(‖x‖²+eps²)) instead of torch.cosine_similarity's
    clamp at 1e-8: rendered embedding pixels are EXACTLY zero wherever nothing
    splats (the feature channels get no background, forward.cu:388-394), and a
    clamped norm there produces 1/eps ≈ 1e8-scale gradients per empty pixel —
    enough to blow up fp32 batch-1 training on sparse scenes. The smooth form
    bounds the gradient by ~1/eps = 1e4 (×λ_embed·λ_nerf = 1e-4 → O(1)) and
    deviates from the clamped value by O(eps²) on non-degenerate pixels.
    """
    pn = jnp.sqrt(jnp.sum(pred * pred, axis=-1) + eps * eps)
    gn = jnp.sqrt(jnp.sum(gt * gt, axis=-1) + eps * eps)
    cos = jnp.sum(pred * gt, axis=-1) / (pn * gn)
    return 1.0 - jnp.mean(cos)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Scalar PSNR over the whole batch (neural_rendering.py:22-27).

    The reference returns 100 when mse == 0; jnp.where keeps that jit-safe.
    """
    mse = jnp.mean(jnp.square(pred - gt))
    mse_safe = jnp.where(mse == 0, 1.0, mse)
    val = 20.0 * jnp.log10(max_val / jnp.sqrt(mse_safe))
    return jnp.where(mse == 0, 100.0, val)


def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    xs = jnp.arange(window_size, dtype=jnp.float32)
    g = jnp.exp(-jnp.square(xs - window_size // 2) / (2.0 * sigma * sigma))
    return g / jnp.sum(g)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM with an 11x11 gaussian window (loss.py:35-67).

    Args: img1, img2: [B, H, W, C] (channels-LAST here; the reference is NCHW).
    Depthwise conv with SAME (zero) padding, matching F.conv2d(padding=k//2).
    """
    g = _gaussian_window(window_size, 1.5)
    window = jnp.outer(g, g)[:, :, None, None]           # [K, K, 1, 1]
    c = img1.shape[-1]
    window = jnp.tile(window, (1, 1, 1, c))              # depthwise feature_group

    def dconv(x):
        return jax.lax.conv_general_dilated(
            x, window, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    mu1, mu2 = dconv(img1), dconv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = dconv(img1 * img1) - mu1_sq
    sigma2_sq = dconv(img2 * img2) - mu2_sq
    sigma12 = dconv(img1 * img2) - mu1_mu2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def softmax_cross_entropy_with_onehot(logits: jnp.ndarray,
                                      labels_onehot: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over the batch — the `_celoss` used for trans/rot/grip/collision heads
    (qattention_manigaussian_bc_agent.py:614-615)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(labels_onehot * logp, axis=-1))


def softmax_cross_entropy_with_index(logits: jnp.ndarray,
                                     label_idx: jnp.ndarray) -> jnp.ndarray:
    """Same loss with integer labels (avoids materializing 100^3 one-hots on TPU)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, label_idx[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)
