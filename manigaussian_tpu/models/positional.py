"""NeRF-style positional encoding.

Parity target: reference `agents/manigaussian_bc/utils.py:133-176` (PositionalEncoding):
freqs = freq_factor * 2^i, interleaved (sin, cos) per frequency, input appended FIRST
(include_input prepends x). With the ManiGaussian config (num_freqs=6, freq_factor=1.5,
include_input=True, d_in=3) the output is 3 + 6*2*3 = 39 dims.
"""

from __future__ import annotations

import jax.numpy as jnp


class PositionalEncoding:
    def __init__(self, num_freqs: int = 6, d_in: int = 3,
                 freq_factor: float = jnp.pi, include_input: bool = True):
        self.num_freqs = num_freqs
        self.d_in = d_in
        self.include_input = include_input
        self.d_out = num_freqs * 2 * d_in + (d_in if include_input else 0)
        freqs = freq_factor * (2.0 ** jnp.arange(num_freqs, dtype=jnp.float32))
        # f1 f1 f2 f2 ... and phases 0, pi/2, ... so sin(fx), cos(fx) interleave
        self._freqs = jnp.repeat(freqs, 2)[None, :, None]        # [1, 2F, 1]
        phases = jnp.zeros((2 * num_freqs,), jnp.float32)
        self._phases = phases.at[1::2].set(jnp.pi * 0.5)[None, :, None]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [..., d_in] → [..., d_out] (ordering identical to the reference:
        [x, sin(f1 x), cos(f1 x), ..., interleaved across dims])."""
        lead = x.shape[:-1]
        flat = x.reshape(-1, self.d_in)
        embed = jnp.sin(self._phases + flat[:, None, :] * self._freqs)  # [N, 2F, D]
        embed = embed.reshape(flat.shape[0], -1)
        if self.include_input:
            embed = jnp.concatenate([flat, embed], axis=-1)
        return embed.reshape(*lead, self.d_out)
