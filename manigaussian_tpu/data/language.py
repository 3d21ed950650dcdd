"""Language-goal embedding providers.

Parity target: the reference embeds each goal string once at replay-fill time with
the CLIP RN50 text tower (`helpers/clip/core/clip.py:479`
encode_text_with_embeddings → sentence emb [1024] + token embs [77, 512];
`launch_utils.py:228`) and stores the arrays in the replay buffer. The embedding
model is frozen — it never sees gradients — so it is a pure host-side provider.

Providers:
  * CachedLanguageModel — wraps any provider with an on-disk .npz cache keyed by
    the goal string (the 'precompute first' plan, SURVEY.md §7 stage 6).
  * HashedStubLanguageModel — deterministic pseudo-embeddings derived from token
    hashes. Used for tests/benchmarks and zero-egress environments where CLIP
    weights cannot be downloaded; the policy trains against CONSISTENT language
    vectors (same string → same embedding), which is all BC training requires
    mechanically. Swap in ClipLanguageModel for semantic transfer.
  * ClipLanguageModel — loads a local CLIP text tower via `transformers` when a
    checkpoint directory is provided (no network access assumed).
"""

from __future__ import annotations

import hashlib
import os
from typing import Protocol, Tuple

import numpy as np

SENTENCE_DIM = 1024
TOKEN_DIM = 512
MAX_TOKENS = 77


class LanguageModel(Protocol):
    def encode(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        """text → (sentence_emb [1024], token_embs [77, 512])."""
        ...


class HashedStubLanguageModel:
    """Deterministic per-word gaussian embeddings (seeded by word hash)."""

    def __init__(self, sentence_dim: int = SENTENCE_DIM,
                 token_dim: int = TOKEN_DIM, max_tokens: int = MAX_TOKENS):
        self.sentence_dim = sentence_dim
        self.token_dim = token_dim
        self.max_tokens = max_tokens

    def _vec(self, word: str, dim: int) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.sha256(word.encode()).digest()[:4], "little")
        return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)

    def encode(self, text: str):
        words = text.lower().split()[: self.max_tokens - 2]
        toks = np.zeros((self.max_tokens, self.token_dim), np.float32)
        toks[0] = self._vec("<sot>", self.token_dim)
        for i, w in enumerate(words):
            toks[i + 1] = self._vec(w, self.token_dim)
        toks[len(words) + 1] = self._vec("<eot>", self.token_dim)
        sent = self._vec("sent::" + text.lower(), self.sentence_dim)
        return sent, toks


class ClipRN50TextModel:
    """The reference's EXACT text interface from an OpenAI CLIP checkpoint:
    sentence = ln_final@EOT @ text_projection [1024], tokens = ln_final
    outputs [77, 512] (helpers/clip/core/clip.py:479
    encode_text_with_embeddings). Runs the Flax tower
    (models/clip_text.ClipTextTransformer) with our from-scratch BPE
    tokenizer; jitted once, frozen."""

    def __init__(self, checkpoint_path: str, bpe_path: str | None = None):
        import jax
        from manigaussian_tpu.data.clip_tokenizer import ClipBPETokenizer
        from manigaussian_tpu.models import clip_text as ct

        self.tokenizer = ClipBPETokenizer(bpe_path)
        if isinstance(checkpoint_path, str) and \
                checkpoint_path.endswith(".msgpack"):
            # pre-converted Flax weights (tools/convert_weights.py) — no torch
            from manigaussian_tpu.tools.convert_weights import load_converted
            payload = load_converted(checkpoint_path)
            dims, self.variables = payload["dims"], payload["variables"]
        else:
            if isinstance(checkpoint_path, str):
                import torch
                try:
                    sd = torch.jit.load(checkpoint_path,
                                        map_location="cpu").state_dict()
                except RuntimeError:
                    obj = torch.load(checkpoint_path, map_location="cpu")
                    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
            else:
                sd = checkpoint_path
            dims = ct.model_dims_from_state_dict(sd)
            self.variables = ct.load_openai_state_dict(sd)
        self.model = ct.ClipTextTransformer(**dims)
        self._apply = jax.jit(self.model.apply)

    def encode(self, text: str):
        toks = self.tokenizer.tokenize(
            text, context_length=self.model.context_length)[None]
        sent, embs = self._apply(self.variables, toks)
        sent = np.asarray(sent[0], np.float32)
        embs = np.asarray(embs[0], np.float32)
        # real RN50 dims are exactly (1024, 77x512); tiny test checkpoints are
        # zero-padded into the same slots
        if sent.shape[0] < SENTENCE_DIM:
            sent = np.concatenate(
                [sent, np.zeros(SENTENCE_DIM - sent.shape[0], np.float32)])
        if embs.shape[-1] < TOKEN_DIM:
            embs = np.concatenate(
                [embs, np.zeros((embs.shape[0], TOKEN_DIM - embs.shape[-1]),
                                np.float32)], axis=-1)
        if embs.shape[0] < MAX_TOKENS:
            embs = np.concatenate(
                [embs, np.zeros((MAX_TOKENS - embs.shape[0], embs.shape[-1]),
                                np.float32)], axis=0)
        return sent[:SENTENCE_DIM], embs[:MAX_TOKENS, :TOKEN_DIM]


class ClipLanguageModel:
    """CLIP text tower from a LOCAL huggingface checkpoint DIR (transformers).

    NOTE: this is the wrong architecture for strict reference parity (the
    reference uses the RN50 tower's 1024-d joint space); prefer
    ClipRN50TextModel with an OpenAI .pt checkpoint. Kept for environments
    that only have HF-format CLIP."""

    def __init__(self, checkpoint_dir: str):
        from transformers import CLIPTextModelWithProjection, CLIPTokenizerFast
        self.tokenizer = CLIPTokenizerFast.from_pretrained(checkpoint_dir)
        self.model = CLIPTextModelWithProjection.from_pretrained(checkpoint_dir)
        self.model.eval()

    def encode(self, text: str):
        import torch
        with torch.no_grad():
            toks = self.tokenizer(text, padding="max_length",
                                  max_length=MAX_TOKENS, truncation=True,
                                  return_tensors="pt")
            out = self.model(**toks, output_hidden_states=True)
            token_embs = out.last_hidden_state[0].float().numpy()
            sent = out.text_embeds[0].float().numpy()
        # pad/project the sentence embedding to the 1024-d RN50 slot
        if sent.shape[0] < SENTENCE_DIM:
            sent = np.concatenate(
                [sent, np.zeros(SENTENCE_DIM - sent.shape[0], np.float32)])
        return sent.astype(np.float32), token_embs.astype(np.float32)


class T5LanguageModel:
    """T5 encoder from a LOCAL checkpoint — reference-exact semantics
    (helpers/language_model.py:14-32 T5EmbeddingExtractor): the sentence
    embedding is ZEROS [1024] (the reference returns torch.zeros(1, 1024))
    and the token embeddings are the RAW T5 last_hidden_state padded to 77
    tokens — no projection. Set method.language_model_dim to the checkpoint's
    d_model (768 for t5-base) when using this provider."""

    def __init__(self, checkpoint_dir: str):
        from transformers import T5EncoderModel, T5TokenizerFast
        self.tokenizer = T5TokenizerFast.from_pretrained(checkpoint_dir)
        self.model = T5EncoderModel.from_pretrained(checkpoint_dir).eval()

    def encode(self, text: str):
        import torch
        with torch.no_grad():
            toks = self.tokenizer(text, padding="max_length",
                                  max_length=MAX_TOKENS, truncation=True,
                                  return_tensors="pt")
            hidden = self.model(**toks).last_hidden_state[0].float().numpy()
        if hidden.shape[0] < MAX_TOKENS:
            hidden = np.concatenate(
                [hidden, np.zeros((MAX_TOKENS - hidden.shape[0],
                                   hidden.shape[1]), np.float32)], axis=0)
        sent = np.zeros(SENTENCE_DIM, np.float32)
        return sent, hidden[:MAX_TOKENS].astype(np.float32)


class CachedLanguageModel:
    """On-disk cache: <cache_dir>/<sha1(text)>.npz."""

    def __init__(self, base: LanguageModel, cache_dir: str):
        self.base = base
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self._mem = {}

    def encode(self, text: str):
        if text in self._mem:
            return self._mem[text]
        key = hashlib.sha1(text.encode()).hexdigest()
        path = os.path.join(self.cache_dir, key + ".npz")
        if os.path.exists(path):
            z = np.load(path)
            out = (z["sent"], z["toks"])
        else:
            out = self.base.encode(text)
            np.savez(path, sent=out[0], toks=out[1])
        self._mem[text] = out
        return out


def create_language_model(name: str = "stub",
                          checkpoint_dir: str | None = None,
                          cache_dir: str | None = None) -> LanguageModel:
    """Factory (parity: helpers/language_model.py:15-33 create_language_model)."""
    if name in ("CLIP", "clip") and checkpoint_dir:
        if os.path.isfile(checkpoint_dir):
            # OpenAI-format .pt → the reference-exact RN50 text tower
            model: LanguageModel = ClipRN50TextModel(checkpoint_dir)
        else:
            model = ClipLanguageModel(checkpoint_dir)
    elif name in ("T5", "t5") and checkpoint_dir:
        model = T5LanguageModel(checkpoint_dir)
    else:
        model = HashedStubLanguageModel()
    if cache_dir:
        model = CachedLanguageModel(model, cache_dir)
    return model
