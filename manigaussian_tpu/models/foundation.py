"""Foundation-model feature extraction for semantic supervision (w_geo_sem).

Parity target: `neural_rendering.py:117-166` (extract_foundation_model_feature)
+ `dino_extractor.py:10-34`: a frozen vision model produces dense features for
the ground-truth view; per-image PCA (torch.pca_lowrank) compresses them to
`d_embed`=3 channels which supervise the rendered embedding image via cosine
loss. The reference offers ODISE Stable-Diffusion features ('diffusion') or
DINOv2 ViT-L/14 ('dinov2').

Providers here:
  * StubFeatureExtractor — deterministic multi-scale image statistics
    (gaussian-pyramid color/gradient features). Zero-egress environments have
    no pretrained weights; the stub gives CONSISTENT dense features so the
    semantic-loss pathway trains and tests end-to-end. Swap for a real tower
    when a checkpoint directory is available.
  * DINOv2FeatureExtractor — transformers ViT from a LOCAL checkpoint
    (no download), features = last-hidden patch tokens upsampled to the image.
  * pca_to_channels — the exact per-image PCA-reconstruction step
    (neural_rendering.py:155-163).

Everything returns channels-last [B, H, W, d_embed] float32.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np


def pca_lowrank_v(features: jnp.ndarray, q: int = 6, niter: int = 2,
                  key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Right singular vectors V [C, q] of the CENTERED features via randomized
    SVD — the torch.pca_lowrank algorithm (Halko et al.; torch
    _lowrank.py get_approximate_basis with niter=2), which is what the
    reference actually calls (neural_rendering.py:159). All matmuls + tiny
    QR/eigh — MXU-friendly, vs jnp.linalg.svd of [HW, C] which runs an
    iterative decomposition over the full 512-wide matrix on TPU."""
    hw, c = features.shape
    q = min(q, hw, c)
    mean = jnp.mean(features, axis=0, keepdims=True)
    a = features - mean                                     # [HW, C]
    if key is None:
        key = jax.random.PRNGKey(0)
    omega = jax.random.normal(key, (c, q), features.dtype)  # torch: randn
    qmat, _ = jnp.linalg.qr(a @ omega)                      # [HW, q]
    for _ in range(niter):
        qh, _ = jnp.linalg.qr(a.T @ qmat)                   # [C, q]
        qmat, _ = jnp.linalg.qr(a @ qh)                     # [HW, q]
    b = qmat.T @ a                                          # [q, C]
    # V of B = eigenvectors of BᵀB restricted to the q-dim row space: do the
    # tiny SVD via eigh of [q, q] gram in the B-row basis
    _ub, _s, vbt = jnp.linalg.svd(b, full_matrices=False)   # [q,C] svd: cheap
    return vbt.T                                            # [C, q]


def pca_to_channels(features: jnp.ndarray, d_embed: int = 3,
                    q: Optional[int] = None,
                    method: str = "lowrank") -> jnp.ndarray:
    """Per-image PCA projection, parity with torch.pca_lowrank usage.

    features: [HW, C] → [HW, d_embed]: center → top-q right singular vectors V
    → project the UNcentered features (A @ V[:, :d_embed]), exactly like
    neural_rendering.py:159-162 (pca_lowrank centers internally; the reference
    multiplies raw A by V).

    method: 'lowrank' (randomized q=6, niter=2 — the torch.pca_lowrank
    algorithm the reference runs) or 'exact' (full SVD; deterministic,
    sign-canonical upper bound used by tests)."""
    q = q or max(6, d_embed)
    if method == "lowrank":
        v = pca_lowrank_v(features, q=q)[:, :d_embed]
    else:
        mean = jnp.mean(features, axis=0, keepdims=True)
        _u, _s, vt = jnp.linalg.svd(features - mean, full_matrices=False)
        v = vt.T[:, :d_embed]
    return features @ v


def pca_to_channels_batch(features: jnp.ndarray, d_embed: int = 3,
                          method: str = "lowrank") -> jnp.ndarray:
    """[B, HW, C] → [B, HW, d_embed] (per-image PCA, like the reference loop)."""
    return jax.vmap(lambda f: pca_to_channels(f, d_embed, method=method))(
        features)


class FeatureExtractor(Protocol):
    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] in [0,1] → dense features [B, H, W, C]."""
        ...


class StubFeatureExtractor:
    """Deterministic dense features from fixed random projections of
    multi-scale color statistics. No learned weights, fully traced/jittable."""

    def __init__(self, out_channels: int = 32, seed: int = 0):
        self.out_channels = out_channels
        key = jax.random.PRNGKey(seed)
        # fixed random 1x1 mixing of the 12 stat channels
        self._w = jax.random.normal(key, (12, out_channels)) / np.sqrt(12)

    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = rgb.shape

        def blur(x):
            k = jnp.array([0.25, 0.5, 0.25])
            x = jax.vmap(lambda im: jnp.apply_along_axis(
                lambda v: jnp.convolve(v, k, mode="same"), 0, im))(x)
            x = jax.vmap(lambda im: jnp.apply_along_axis(
                lambda v: jnp.convolve(v, k, mode="same"), 1, im))(x)
            return x

        blur1 = blur(rgb)
        blur2 = blur(blur1)
        gx = jnp.roll(rgb, -1, axis=2) - rgb
        gy = jnp.roll(rgb, -1, axis=1) - rgb
        stats = jnp.concatenate([rgb, blur1, blur2 - blur1,
                                 jnp.abs(gx) + jnp.abs(gy)], axis=-1)  # 12ch
        return jnp.einsum("bhwc,cf->bhwf", stats, self._w)


class DINOv2FeatureExtractor:
    """DINOv2 patch features from a LOCAL transformers checkpoint."""

    def __init__(self, checkpoint_dir: str):
        from transformers import AutoImageProcessor, AutoModel
        import torch
        self._torch = torch
        self.processor = AutoImageProcessor.from_pretrained(checkpoint_dir)
        self.model = AutoModel.from_pretrained(checkpoint_dir).eval()

    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        torch = self._torch
        b, h, w, _ = rgb.shape
        with torch.no_grad():
            inputs = self.processor(
                images=[np.asarray(r) for r in np.asarray(rgb)],
                return_tensors="pt", do_rescale=False)
            out = self.model(**inputs).last_hidden_state[:, 1:]  # drop CLS
        n = out.shape[1]
        side = int(np.sqrt(n))
        feats = out.reshape(b, side, side, -1).float().numpy()
        return jax.image.resize(jnp.asarray(feats), (b, h, w, feats.shape[-1]),
                                method="bilinear")


def extract_gt_embed(rgb: jnp.ndarray, extractor: FeatureExtractor,
                     d_embed: int = 3) -> jnp.ndarray:
    """GT embedding image: dense features → per-image PCA → [B, H, W, d_embed].

    Parity: extract_foundation_model_feature (neural_rendering.py:117-166),
    minus the 512-resize round trip (our extractors match the input size).
    """
    feats = extractor(rgb)
    b, h, w, c = feats.shape
    proj = pca_to_channels_batch(feats.reshape(b, h * w, c), d_embed)
    return proj.reshape(b, h, w, d_embed)


def create_feature_extractor(name: Optional[str],
                             checkpoint_dir: Optional[str] = None
                             ) -> Optional[FeatureExtractor]:
    """Factory keyed by cfg.foundation_model_name (None/'diffusion'/'dinov2').

    'dinov2' + a torch-hub .pt checkpoint → the Flax DINOv2 tower
    (models/dinov2.DinoV2JaxExtractor, reference-exact pipeline); a directory
    → transformers. 'diffusion' (ODISE/StableDiffusion) has no
    offline-loadable equivalent — it maps to the stub WITH A LOUD WARNING
    (the supervision interface — 3-ch per-image PCA — is identical, the
    semantics are not).
    """
    import warnings

    if name is None:
        return None
    if name == "dinov2":
        if checkpoint_dir and os.path.isfile(checkpoint_dir):
            from manigaussian_tpu.models.dinov2 import DinoV2JaxExtractor
            return DinoV2JaxExtractor(checkpoint_dir)
        if checkpoint_dir:
            return DINOv2FeatureExtractor(checkpoint_dir)
        warnings.warn(
            "foundation_model_name='dinov2' without a checkpoint: semantic "
            "supervision falls back to StubFeatureExtractor statistics, NOT "
            "DINOv2 features. Provide neural_renderer.foundation_checkpoint.",
            UserWarning, stacklevel=2)
        return StubFeatureExtractor()
    if name == "diffusion":
        if checkpoint_dir == "random-init":
            # the REAL ODISE compute path with random-init VAE weights:
            # compute-identical to the released checkpoint (same graph, same
            # cost — R4_SWEEP sd_vae_extractor), features not semantic.
            # For campaigns in zero-egress environments where the 'does the
            # embed loss optimize at flagship scale' question must be
            # answered with the production extractor in the loop.
            return SDVaeFeatureExtractor(None)
        if checkpoint_dir and os.path.isfile(checkpoint_dir):
            return SDVaeFeatureExtractor(checkpoint_dir)
        warnings.warn(
            "foundation_model_name='diffusion' without a checkpoint: "
            "semantic supervision falls back to StubFeatureExtractor "
            "statistics. Mount a StableDiffusion checkpoint (CompVis .ckpt "
            "or a converted .msgpack from tools/convert_weights.py sd_vae) "
            "and set neural_renderer.foundation_checkpoint for the real "
            "ODISE feature path (models/sd_vae.py).",
            UserWarning, stacklevel=2)
        return StubFeatureExtractor()
    return StubFeatureExtractor()


class SDVaeFeatureExtractor:
    """The ODISE 'diffusion' feature path ManiGaussian actually uses
    (models/sd_vae.py docstring): resize to 512² (diffusion_preprocess,
    neural_rendering.py:67), normalize to [-1,1] (pixel_mean/std 0.5,
    ldm.py:70-71), VAE encode → clean-latent decode → decoder tap -1
    ([B, 128, 128, 512] for 512² input), resized back to the input size."""

    def __init__(self, checkpoint_path: Optional[str],
                 feature_hw: int = 512):
        from manigaussian_tpu.models import sd_vae as sv

        if checkpoint_path is None:
            # random-init: init at 64² (conv params are resolution-
            # independent) to keep host init cheap; apply at feature_hw
            self.model = sv.SDVae()
            self.variables = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
            self.feature_hw = feature_hw
            self._apply = jax.jit(self.model.apply)
            return
        if str(checkpoint_path).endswith(".msgpack"):
            from manigaussian_tpu.tools.convert_weights import load_converted
            payload = load_converted(checkpoint_path)
            dims, self.variables = payload["dims"], payload["variables"]
        else:
            import torch
            obj = torch.load(checkpoint_path, map_location="cpu")
            sd = obj.get("state_dict", obj) if isinstance(obj, dict) else \
                obj.state_dict()
            dims = sv.dims_from_state_dict(sd)
            self.variables = sv.load_sd_vae_state_dict(sd)
        self.model = sv.SDVae(**dims)
        self.feature_hw = feature_hw
        self._apply = jax.jit(self.model.apply)

    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:  # [B,H,W,3] in [0,1]
        b, h, w, _ = rgb.shape
        img = jax.image.resize(rgb, (b, self.feature_hw, self.feature_hw, 3),
                               method="bilinear")
        out = self._apply(self.variables, img * 2.0 - 1.0)
        feats = out["decoder_features"][-1]
        return jax.image.resize(feats, (b, h, w, feats.shape[-1]),
                                method="bilinear")

    def make_embed_fn(self, d_embed: int = 3):
        """One jitted (variables, rgb) → [B, H, W, d_embed] GT-embed pipeline
        (resize → VAE → decoder tap → resize → per-image PCA).

        The weights are jit ARGUMENTS, not closure constants: wrapping
        `extract_gt_embed(extractor=self)` in an outer jax.jit bakes the
        whole VAE state into the HLO as literals, and this environment's
        remote-compile tunnel rejects the oversized request (HTTP 413 —
        r5 flagship campaign failure mode)."""
        model, feature_hw = self.model, self.feature_hw

        @jax.jit
        def run(variables, rgb):
            b, h, w, _ = rgb.shape
            img = jax.image.resize(rgb, (b, feature_hw, feature_hw, 3),
                                   method="bilinear")
            out = model.apply(variables, img * 2.0 - 1.0)
            feats = out["decoder_features"][-1]
            feats = jax.image.resize(feats, (b, h, w, feats.shape[-1]),
                                    method="bilinear")
            proj = pca_to_channels_batch(
                feats.reshape(b, h * w, feats.shape[-1]), d_embed)
            return proj.reshape(b, h, w, d_embed)

        return lambda rgb: run(self.variables, rgb)
