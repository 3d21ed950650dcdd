"""CLIP text tower parity: Flax implementation + loader vs a torch twin.

Real RN50 weights cannot enter this zero-egress environment (PARITY.md), so
the architecture and the checkpoint loader are pinned the strongest way
available: a small torch model built EXACTLY like OpenAI CLIP's text side
(nn.MultiheadAttention blocks, QuickGELU, pre-LN residuals, EOT-position
projection) is initialized with random weights, its state_dict (CLIP key
names) goes through `load_openai_state_dict`, and outputs must match to fp32
tolerance. With a real RN50.pt on disk the same loader path produces the real
tower. Tokenizer goldens use the published CLIP ids for a known prompt.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from manigaussian_tpu.models.clip_text import (ClipTextTransformer,
                                               load_openai_state_dict,
                                               model_dims_from_state_dict)

VOCAB, CTX, WIDTH, HEADS, LAYERS, EMBED = 100, 16, 64, 4, 2, 32


class _QuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _Block(tnn.Module):
    """Torch twin of CLIP's ResidualAttentionBlock (clip.py text side)."""

    def __init__(self, width, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(width, heads)
        self.ln_1 = tnn.LayerNorm(width)
        self.mlp = tnn.Sequential()
        self.mlp.add_module("c_fc", tnn.Linear(width, width * 4))
        self.mlp.add_module("gelu", _QuickGELU())
        self.mlp.add_module("c_proj", tnn.Linear(width * 4, width))
        self.ln_2 = tnn.LayerNorm(width)

    def forward(self, x, mask):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False, attn_mask=mask)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


class _TorchTextTwin(tnn.Module):
    def __init__(self):
        super().__init__()
        self.token_embedding = tnn.Embedding(VOCAB, WIDTH)
        self.positional_embedding = tnn.Parameter(torch.randn(CTX, WIDTH) * 0.1)
        self.blocks = tnn.ModuleList(
            [_Block(WIDTH, HEADS) for _ in range(LAYERS)])
        self.ln_final = tnn.LayerNorm(WIDTH)
        self.text_projection = tnn.Parameter(
            torch.randn(WIDTH, EMBED) * WIDTH ** -0.5)
        mask = torch.full((CTX, CTX), float("-inf")).triu_(1)
        self.register_buffer("mask", mask)

    def encode_text_with_embeddings(self, text):
        x = self.token_embedding(text) + self.positional_embedding
        x = x.permute(1, 0, 2)                       # NLD -> LND
        for blk in self.blocks:
            x = blk(x, self.mask)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        emb = x.clone()
        sent = x[torch.arange(x.shape[0]), text.argmax(dim=-1)] \
            @ self.text_projection
        return sent, emb

    def clip_state_dict(self):
        sd = {
            "token_embedding.weight": self.token_embedding.weight,
            "positional_embedding": self.positional_embedding,
            "ln_final.weight": self.ln_final.weight,
            "ln_final.bias": self.ln_final.bias,
            "text_projection": self.text_projection,
        }
        for i, blk in enumerate(self.blocks):
            p = f"transformer.resblocks.{i}"
            sd[f"{p}.attn.in_proj_weight"] = blk.attn.in_proj_weight
            sd[f"{p}.attn.in_proj_bias"] = blk.attn.in_proj_bias
            sd[f"{p}.attn.out_proj.weight"] = blk.attn.out_proj.weight
            sd[f"{p}.attn.out_proj.bias"] = blk.attn.out_proj.bias
            sd[f"{p}.ln_1.weight"] = blk.ln_1.weight
            sd[f"{p}.ln_1.bias"] = blk.ln_1.bias
            sd[f"{p}.ln_2.weight"] = blk.ln_2.weight
            sd[f"{p}.ln_2.bias"] = blk.ln_2.bias
            sd[f"{p}.mlp.c_fc.weight"] = blk.mlp.c_fc.weight
            sd[f"{p}.mlp.c_fc.bias"] = blk.mlp.c_fc.bias
            sd[f"{p}.mlp.c_proj.weight"] = blk.mlp.c_proj.weight
            sd[f"{p}.mlp.c_proj.bias"] = blk.mlp.c_proj.bias
        return {k: v.detach() for k, v in sd.items()}


def test_flax_tower_matches_torch_twin():
    torch.manual_seed(0)
    twin = _TorchTextTwin().eval()
    sd = twin.clip_state_dict()
    dims = model_dims_from_state_dict(sd)
    assert dims == dict(vocab_size=VOCAB, context_length=CTX, width=WIDTH,
                        layers=LAYERS, embed_dim=EMBED)

    model = ClipTextTransformer(vocab_size=VOCAB, context_length=CTX,
                                width=WIDTH, heads=HEADS, layers=LAYERS,
                                embed_dim=EMBED)
    variables = load_openai_state_dict(sd)

    rng = np.random.default_rng(1)
    toks = np.zeros((3, CTX), np.int64)
    for b in range(3):
        n = rng.integers(3, CTX - 1)
        toks[b, 0] = 1
        toks[b, 1:n] = rng.integers(2, VOCAB - 1, n - 1)
        toks[b, n] = VOCAB - 1   # eot = highest id (argmax semantics)

    with torch.no_grad():
        sent_t, emb_t = twin.encode_text_with_embeddings(torch.tensor(toks))
    sent_j, emb_j = model.apply(variables, np.asarray(toks, np.int32))

    np.testing.assert_allclose(np.asarray(emb_j), emb_t.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sent_j), sent_t.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_tokenizer_known_clip_ids():
    from manigaussian_tpu.data.clip_tokenizer import (ClipBPETokenizer,
                                                      find_bpe_vocab)
    if find_bpe_vocab() is None:
        pytest.skip("no BPE vocab file available")
    t = ClipBPETokenizer()
    # published CLIP tokenization of the canonical prompt
    ids = t.tokenize("a photo of a cat")
    np.testing.assert_array_equal(
        ids[:7], [49406, 320, 1125, 539, 320, 2368, 49407])
    assert (ids[7:] == 0).all()
    # round trip
    assert t.decode(t.encode("open the top drawer")).strip() \
        == "open the top drawer"
    # truncation keeps the final eot
    long = " ".join(["block"] * 200)
    ids = t.tokenize(long)
    assert ids[-1] == t.eot and len(ids) == 77


def test_language_model_uses_real_tower(tmp_path):
    """create_language_model('CLIP', <ckpt.pt>) must route through the JAX
    tower + BPE tokenizer and produce the reference interface shapes."""
    from manigaussian_tpu.data.clip_tokenizer import find_bpe_vocab
    if find_bpe_vocab() is None:
        pytest.skip("no BPE vocab file available")
    torch.manual_seed(0)
    twin = _TorchTextTwin()
    ckpt = tmp_path / "tiny_clip.pt"
    torch.save(twin.clip_state_dict(), str(ckpt))

    from manigaussian_tpu.data.language import create_language_model
    lm = create_language_model("CLIP", checkpoint_dir=str(ckpt))
    sent, toks = lm.encode("open the drawer")
    assert sent.shape == (1024,)   # zero-padded EMBED=32 -> 1024 slot
    assert toks.shape == (77, 512)
    # deterministic
    sent2, toks2 = lm.encode("open the drawer")
    np.testing.assert_array_equal(sent, sent2)
