"""Flash self-attention Pallas kernel for the perceiver latent transformer.

Why: the XLA attention path materializes the fp32 [H, N, N] probability
tensor in HBM (and its VJP re-reads it several times). At the flagship
config (H=8 heads, N=2048 latents, D=64) that is ~134 MB of fp32 traffic
per layer per direction — the r5 xplane trace attributes ~26 ms/step to the
six self-attention layers (R5_SWEEP.jsonl `hlo_attribution`), ~14x their
MXU roofline. This kernel keeps scores/probabilities in VMEM: a query block
of BQ rows holds its full [BQ, N] score row-block on chip, softmaxes it
there, and only [N, D]-shaped tensors ever touch HBM. The backward pass
recomputes probabilities flash-style (no residual prob tensor) and
accumulates dK/dV across query blocks via sequential-grid block revisiting.

Dropout (reference `perceiver_lang_io.py:131` applies it to the attention
probabilities) runs inside the kernel with the TPU PRNG: the mask is
regenerated bit-identically in the backward from the same per-(head, block)
seed, so nothing is saved.

Parity: `Attention` in models/perceiver.py with impl='xla'
(tests/test_flash_attention.py pins fwd values and all three input grads).
Semantics match `jax.nn.softmax(logits) -> dropout -> @ v` with fp32
softmax and matmuls accumulating in fp32 (`preferred_element_type`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _should_interpret() -> bool:
    # Mosaic compile only on real TPU; interpret elsewhere (same convention
    # as ops/pallas_conv._should_interpret / ops/rasterizer).
    default_dev = jax.config.jax_default_device
    if default_dev is not None:
        return getattr(default_dev, "platform", str(default_dev)) != "tpu"
    return jax.default_backend() != "tpu"


def _dropout_mask(seed_ref, bh, i, shape, rate):
    """Regenerable keep-mask from a counter-based hash (murmur3 finalizer over
    (seed, head, block, row, col)): pure uint32 VPU ops, so it runs compiled
    AND in interpret mode, and the backward regenerates it bit-identically on
    any platform (pltpu.prng_* has no CPU-interpret lowering)."""
    seed = seed_ref[0].astype(jnp.uint32)
    base = seed + jnp.uint32(bh * 65536 + i) * jnp.uint32(2654435761)
    r = lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = lax.broadcasted_iota(jnp.uint32, shape, 1)
    h = base ^ (r * jnp.uint32(0x9E3779B1)) ^ (c * jnp.uint32(0x85EBCA77))
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    thresh = jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return (h >= thresh).astype(jnp.float32)


def _softmax_block(q_blk, k, scale):
    """fp32 row-softmax of one query block against all keys: [BQ, N]."""
    qs = q_blk * jnp.asarray(scale, q_blk.dtype)   # bf16 mul, parity with XLA
    s = lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale, rate):
    bh, i = pl.program_id(0), pl.program_id(1)
    probs = _softmax_block(q_ref[0], k_ref[0], scale)
    if rate > 0.0:
        keep = _dropout_mask(seed_ref, bh, i, probs.shape, rate)
        probs = probs * keep * (1.0 / (1.0 - rate))
    o_ref[0] = lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, rate):
    bh, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _zero():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    probs = _softmax_block(q, k, scale)                       # [BQ, N] fp32
    if rate > 0.0:
        keep = _dropout_mask(seed_ref, bh, i, probs.shape, rate)
        keep = keep * (1.0 / (1.0 - rate))
        probs_d = probs * keep
    else:
        probs_d = probs

    # dV += P_d^T @ dO  (contraction over the BQ rows of this block)
    dv_ref[0] += lax.dot_general(
        probs_d.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dP = dO @ V^T, masked by the dropout keep/scale
    dp = lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    if rate > 0.0:
        dp = dp * keep
    # softmax VJP over the full row (exact — whole row is resident)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    ds = (ds * scale).astype(q.dtype)
    dq_ref[0] = lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    # dK += dS^T @ Q
    dk_ref[0] += lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _specs(n, d, bq):
    qspec = pl.BlockSpec((1, bq, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, n, d), lambda bh, i: (bh, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return seed, qspec, full


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, scale, rate, bq):
    return _flash_fwd_impl(q, k, v, scale, rate, bq, jnp.zeros((1,), jnp.int32))


def _flash_fwd_impl(q, k, v, scale, rate, bq, seed):
    bh, n, d = q.shape
    seed_spec, qspec, full = _specs(n, d, bq)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate),
        grid=(bh, n // bq),
        in_specs=[seed_spec, qspec, full, full],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=_should_interpret(),
    )(seed, q, k, v)


def _flash_vjp_fwd(q, k, v, scale, rate, bq):
    # custom_vjp wrapper cannot thread the seed as a traced nondiff arg, so
    # the public entry closes over it via `flash_self_attention` below; the
    # no-dropout path (rate=0) ignores the seed entirely.
    out = _flash(q, k, v, scale, rate, bq)
    return out, (q, k, v)


def _flash_vjp_bwd(scale, rate, bq, res, g):
    q, k, v = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, g, scale, rate, bq,
                                 jnp.zeros((1,), jnp.int32))
    return dq, dk, dv


def _flash_bwd_impl(q, k, v, g, scale, rate, bq, seed):
    bh, n, d = q.shape
    seed_spec, qspec, full = _specs(n, d, bq)
    full_f32 = pl.BlockSpec((1, n, d), lambda bhi, i: (bhi, 0, 0),
                            memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate),
        grid=(bh, n // bq),
        in_specs=[seed_spec, qspec, full, full, qspec],
        out_specs=(qspec, full_f32, full_f32),
        out_shape=(jax.ShapeDtypeStruct((bh, n, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
                   jax.ShapeDtypeStruct((bh, n, d), jnp.float32)),
        interpret=_should_interpret(),
    )(seed, q, k, v, g)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


# Dropout needs the seed inside the differentiated closure; custom_vjp over
# (q, k, v, seed) with seed as a traced-but-nondiff input:
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_dropout(q, k, v, seed, scale, rate, bq):
    return _flash_fwd_impl(q, k, v, scale, rate, bq, seed)


def _flash_dropout_fwd(q, k, v, seed, scale, rate, bq):
    return _flash_fwd_impl(q, k, v, scale, rate, bq, seed), (q, k, v, seed)


def _flash_dropout_bwd(scale, rate, bq, res, g):
    q, k, v, seed = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, g, scale, rate, bq, seed)
    return dq, dk, dv, jnp.zeros_like(seed)


_flash_dropout.defvjp(_flash_dropout_fwd, _flash_dropout_bwd)


def flash_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         dropout_rate: float = 0.0,
                         dropout_seed: Optional[jnp.ndarray] = None,
                         block_q: int = 256) -> jnp.ndarray:
    """Multi-head self-attention, [B, H, N, D] -> [B, H, N, D].

    `dropout_seed` (int32 [1]) is required when dropout_rate > 0; the same
    seed reproduces the same mask (pass a fresh one per training step).
    """
    b, h, n, d = q.shape
    if n % block_q:
        raise ValueError(f"N={n} must be a multiple of block_q={block_q}")
    scale = d ** -0.5
    fq, fk, fv = (t.reshape(b * h, n, d) for t in (q, k, v))
    if dropout_rate > 0.0:
        if dropout_seed is None:
            raise ValueError("dropout needs a seed")
        out = _flash_dropout(fq, fk, fv, dropout_seed.astype(jnp.int32),
                             scale, float(dropout_rate), block_q)
    else:
        out = _flash(fq, fk, fv, scale, 0.0, block_q)
    return out.reshape(b, h, n, d)
