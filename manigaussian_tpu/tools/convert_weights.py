"""Offline tower-weight conversion: torch checkpoints → Flax msgpack.

Turnkey ingestion for the three pretrained towers the reference depends on
(this image is zero-egress, so weights arrive as mounted files):

  CLIP RN50 text  — OpenAI `RN50.pt` (torch.jit archive or state_dict;
                    reference helpers/clip/core/clip.py:479)
  DINOv2 ViT      — torch-hub `dinov2_vitl14*.pth` state dict
                    (reference dino_extractor.py:10-34)
  T5 encoder      — a local HuggingFace directory (torch weights) → Flax
                    save_pretrained directory

Usage:
    python -m manigaussian_tpu.tools.convert_weights clip   RN50.pt  clip_text.msgpack
    python -m manigaussian_tpu.tools.convert_weights dinov2 vitl14.pth dinov2.msgpack
    python -m manigaussian_tpu.tools.convert_weights t5     /ckpts/t5-base t5_flax/

The .msgpack outputs load directly: `method.language_model_checkpoint` and
`method.neural_renderer.foundation_checkpoint` accept them (no torch needed at
train time). tests/test_weight_ingestion.py pins converted == direct-torch
activations on tiny twin checkpoints in CI, and runs golden-activation checks
when real checkpoints are mounted (MG_CLIP_CKPT / MG_DINOV2_CKPT / MG_T5_DIR).
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict

import numpy as np


def _to_numpy_tree(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def convert_clip(in_path: str, out_path: str) -> Dict[str, Any]:
    from flax import serialization as fser

    from manigaussian_tpu.models import clip_text as ct
    import torch
    try:
        sd = torch.jit.load(in_path, map_location="cpu").state_dict()
    except RuntimeError:
        obj = torch.load(in_path, map_location="cpu")
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    dims = ct.model_dims_from_state_dict(sd)
    variables = ct.load_openai_state_dict(sd)
    payload = {"tower": "clip_text", "dims": dims,
               "variables": _to_numpy_tree(variables)}
    with open(out_path, "wb") as f:
        f.write(fser.msgpack_serialize(payload))
    return payload


def convert_dinov2(in_path: str, out_path: str) -> Dict[str, Any]:
    from flax import serialization as fser

    from manigaussian_tpu.models import dinov2 as dv
    import torch
    obj = torch.load(in_path, map_location="cpu")
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    sd = sd.get("model", sd) if isinstance(sd, dict) else sd
    dims = dv.dims_from_state_dict(sd)
    variables = dv.load_dinov2_state_dict(sd)
    payload = {"tower": "dinov2", "dims": dims,
               "variables": _to_numpy_tree(variables)}
    with open(out_path, "wb") as f:
        f.write(fser.msgpack_serialize(payload))
    return payload


def convert_sd_vae(in_path: str, out_path: str) -> Dict[str, Any]:
    """CompVis SD checkpoint (first_stage_model.*) → SDVae msgpack."""
    from flax import serialization as fser

    from manigaussian_tpu.models import sd_vae as sv
    import torch
    obj = torch.load(in_path, map_location="cpu")
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else \
        obj.state_dict()
    dims = sv.dims_from_state_dict(sd)
    variables = sv.load_sd_vae_state_dict(sd)
    # msgpack cannot serialize tuples — lists round-trip (load_converted
    # restores tuples)
    dims_ser = {k: (list(v) if isinstance(v, tuple) else v)
                for k, v in dims.items()}
    payload = {"tower": "sd_vae", "dims": dims_ser,
               "variables": _to_numpy_tree(variables)}
    with open(out_path, "wb") as f:
        f.write(fser.msgpack_serialize(payload))
    return payload


def convert_t5(in_dir: str, out_dir: str) -> str:
    """HF torch T5 dir → Flax T5 dir (tokenizer files copied alongside)."""
    from transformers import AutoTokenizer, FlaxT5EncoderModel
    model = FlaxT5EncoderModel.from_pretrained(in_dir, from_pt=True)
    model.save_pretrained(out_dir)
    AutoTokenizer.from_pretrained(in_dir).save_pretrained(out_dir)
    return out_dir


def load_converted(path: str) -> Dict[str, Any]:
    """Read a .msgpack produced by this tool → {tower, dims, variables}."""
    from flax import serialization as fser
    with open(path, "rb") as f:
        payload = fser.msgpack_restore(f.read())

    # msgpack round-trips dims as numpy scalars/arrays; constructors want
    # python ints / tuples of ints
    def fix(v):
        if isinstance(v, (list, tuple)) or getattr(v, "ndim", 0) == 1:
            return tuple(int(x) for x in v)
        if isinstance(v, float) or (hasattr(v, "dtype")
                                    and np.issubdtype(v.dtype, np.floating)):
            return float(v)
        return int(v)

    payload["dims"] = {k: fix(v) for k, v in payload["dims"].items()}
    return payload


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert pretrained tower weights to Flax formats")
    parser.add_argument("tower", choices=["clip", "dinov2", "sd_vae", "t5"])
    parser.add_argument("input",
                        help=".pt/.pth/.ckpt file (clip/dinov2/sd_vae) or "
                             "HF dir (t5)")
    parser.add_argument("output",
                        help=".msgpack file (clip/dinov2/sd_vae) or dir (t5)")
    args = parser.parse_args(argv)
    if args.tower == "clip":
        p = convert_clip(args.input, args.output)
        print(f"[convert] clip text tower dims={p['dims']} -> {args.output}")
    elif args.tower == "dinov2":
        p = convert_dinov2(args.input, args.output)
        print(f"[convert] dinov2 tower dims={p['dims']} -> {args.output}")
    elif args.tower == "sd_vae":
        p = convert_sd_vae(args.input, args.output)
        print(f"[convert] sd vae (diffusion features) dims={p['dims']} "
              f"-> {args.output}")
    else:
        out = convert_t5(args.input, args.output)
        print(f"[convert] t5 encoder (flax) -> {out}")


if __name__ == "__main__":
    main()
