"""Turnkey weight ingestion (VERDICT r2 item 8): convert_weights round-trips —
msgpack-converted towers produce bit-identical activations to the direct
torch-checkpoint path. CI runs on tiny random twin checkpoints; the
real-weight golden checks run when checkpoints are mounted via
MG_CLIP_CKPT / MG_DINOV2_CKPT / MG_T5_DIR (zero-egress image: skip cleanly)."""

import os

import numpy as np
import pytest
import torch

from manigaussian_tpu.tools.convert_weights import (convert_clip,
                                                    convert_dinov2,
                                                    load_converted)


def test_convert_clip_roundtrip(tmp_path):
    from manigaussian_tpu.data.language import ClipRN50TextModel
    from tests.test_clip_text import _TorchTextTwin

    torch.manual_seed(0)
    ckpt = str(tmp_path / "tiny_clip.pt")
    torch.save(_TorchTextTwin().clip_state_dict(), ckpt)
    out = str(tmp_path / "tiny_clip.msgpack")
    payload = convert_clip(ckpt, out)
    assert payload["tower"] == "clip_text"
    assert os.path.getsize(out) > 0

    direct = ClipRN50TextModel(ckpt)
    converted = ClipRN50TextModel(out)
    s1, t1 = direct.encode("open the drawer")
    s2, t2 = converted.encode("open the drawer")
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(t1, t2)


def test_convert_dinov2_roundtrip(tmp_path):
    import jax.numpy as jnp

    from manigaussian_tpu.models.dinov2 import DinoV2JaxExtractor
    from tests.test_dinov2 import _TorchDinoTwin

    torch.manual_seed(1)
    ckpt = str(tmp_path / "tiny_dino.pt")
    torch.save(_TorchDinoTwin().clip_state_dict(), ckpt)
    out = str(tmp_path / "tiny_dino.msgpack")
    payload = convert_dinov2(ckpt, out)
    assert payload["tower"] == "dinov2"

    rgb = jnp.linspace(0, 1, 2 * 16 * 16 * 3).reshape(2, 16, 16, 3)
    f1 = np.asarray(DinoV2JaxExtractor(ckpt)(rgb))
    f2 = np.asarray(DinoV2JaxExtractor(out)(rgb))
    np.testing.assert_array_equal(f1, f2)


def test_converted_dinov2_through_foundation_factory(tmp_path):
    """foundation_checkpoint=<msgpack> routes to the Flax tower."""
    from manigaussian_tpu.models.dinov2 import DinoV2JaxExtractor
    from manigaussian_tpu.models.foundation import create_feature_extractor
    from tests.test_dinov2 import _TorchDinoTwin

    torch.manual_seed(2)
    ckpt = str(tmp_path / "tiny_dino.pt")
    torch.save(_TorchDinoTwin().clip_state_dict(), ckpt)
    out = str(tmp_path / "tiny_dino.msgpack")
    convert_dinov2(ckpt, out)
    ext = create_feature_extractor("dinov2", out)
    assert isinstance(ext, DinoV2JaxExtractor)


# ----------------------------------------------------------------- real-weight
# golden checks: run only when checkpoints are mounted into the image.

@pytest.mark.skipif("MG_CLIP_CKPT" not in os.environ,
                    reason="mount OpenAI RN50.pt and set MG_CLIP_CKPT")
def test_real_clip_golden(tmp_path):
    from manigaussian_tpu.data.language import ClipRN50TextModel

    ckpt = os.environ["MG_CLIP_CKPT"]
    out = str(tmp_path / "clip.msgpack")
    payload = convert_clip(ckpt, out)
    assert payload["dims"]["width"] == 512           # RN50 text tower
    model = ClipRN50TextModel(out)
    sent, toks = model.encode("open the drawer")
    assert sent.shape == (1024,) and toks.shape == (77, 512)
    assert np.linalg.norm(sent) > 0
    golden = os.path.join(os.path.dirname(ckpt), "clip_text_golden.npz")
    if os.path.exists(golden):
        g = np.load(golden)
        np.testing.assert_allclose(sent, g["sent"], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(toks, g["toks"], rtol=1e-4, atol=1e-4)
    else:
        np.savez(golden, sent=sent, toks=toks)  # pin on first real-weight run


@pytest.mark.skipif("MG_DINOV2_CKPT" not in os.environ,
                    reason="mount dinov2 torch-hub .pth and set MG_DINOV2_CKPT")
def test_real_dinov2_golden(tmp_path):
    import jax.numpy as jnp

    from manigaussian_tpu.models.dinov2 import DinoV2JaxExtractor

    ckpt = os.environ["MG_DINOV2_CKPT"]
    out = str(tmp_path / "dinov2.msgpack")
    convert_dinov2(ckpt, out)
    ext = DinoV2JaxExtractor(out)
    rgb = jnp.linspace(0, 1, 128 * 128 * 3).reshape(1, 128, 128, 3)
    feats = np.asarray(ext(rgb))
    assert feats.shape[:3] == (1, 128, 128)
    golden = os.path.join(os.path.dirname(ckpt), "dinov2_golden.npz")
    if os.path.exists(golden):
        g = np.load(golden)
        np.testing.assert_allclose(feats, g["feats"], rtol=1e-3, atol=1e-3)
    else:
        np.savez(golden, feats=feats)


@pytest.mark.skipif("MG_T5_DIR" not in os.environ,
                    reason="mount a HF T5 dir and set MG_T5_DIR")
def test_real_t5_conversion(tmp_path):
    from manigaussian_tpu.tools.convert_weights import convert_t5

    out = convert_t5(os.environ["MG_T5_DIR"], str(tmp_path / "t5_flax"))
    assert os.path.exists(os.path.join(out, "flax_model.msgpack"))


@pytest.mark.skipif("MG_SD_CKPT" not in os.environ,
                    reason="mount a StableDiffusion v1 .ckpt and set MG_SD_CKPT")
def test_real_sd_vae_golden(tmp_path):
    import jax.numpy as jnp

    from manigaussian_tpu.models.foundation import SDVaeFeatureExtractor
    from manigaussian_tpu.tools.convert_weights import convert_sd_vae

    ckpt = os.environ["MG_SD_CKPT"]
    out = str(tmp_path / "sd_vae.msgpack")
    payload = convert_sd_vae(ckpt, out)
    assert payload["dims"]["ch"] == 128 and tuple(
        payload["dims"]["ch_mult"]) == (1, 2, 4, 4)
    ext = SDVaeFeatureExtractor(out)
    rgb = jnp.linspace(0, 1, 128 * 128 * 3).reshape(1, 128, 128, 3)
    feats = np.asarray(ext(rgb))
    # the ManiGaussian feature: 512ch decoder tap (neural_rendering.py:137)
    assert feats.shape == (1, 128, 128, 512)
    golden = os.path.join(os.path.dirname(ckpt), "sd_vae_golden.npz")
    if os.path.exists(golden):
        g = np.load(golden)
        np.testing.assert_allclose(feats, g["feats"], rtol=1e-3, atol=1e-3)
    else:
        np.savez(golden, feats=feats)
