"""PixelNeRF-style fully-connected ResNet with per-block latent injection.

Parity target: `agents/manigaussian_bc/resnetfc.py:10-191` (ResnetBlockFC/ResnetFC):
  * blocks: x + fc1(act(fc0(act(x)))), fc1 zero-init, fc0 kaiming,
  * a latent z (voxel feature) is re-injected before each block < combine_layer via
    per-block linear maps (optionally SPADE: scale·x + shift),
  * at combine_layer, multi-view features are averaged (num_views=1 here → no-op),
  * beta>0 selects softplus(beta) activation, else ReLU.

The `language_embed` argument of the reference forward is accepted but — exactly like
the reference (it is never used inside ResnetFC.forward) — ignored.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _act(beta: float):
    if beta > 0:
        return lambda x: jax.nn.softplus(beta * x) / beta
    return jax.nn.relu


class ResnetBlockFC(nn.Module):
    size_out: int
    beta: float = 0.0

    @nn.compact
    def __call__(self, x):
        act = _act(self.beta)
        size_in = x.shape[-1]
        h = nn.Dense(min(size_in, self.size_out),
                     kernel_init=nn.initializers.kaiming_normal())(act(x))
        dx = nn.Dense(self.size_out, kernel_init=nn.initializers.zeros)(act(h))
        if size_in == self.size_out:
            xs = x
        else:
            xs = nn.Dense(self.size_out, use_bias=False,
                          kernel_init=nn.initializers.kaiming_normal())(x)
        return xs + dx


class ResnetFC(nn.Module):
    d_out: int = 4
    n_blocks: int = 5
    d_latent: int = 0
    d_hidden: int = 128
    beta: float = 0.0
    combine_layer: int = 1000
    use_spade: bool = False

    @nn.compact
    def __call__(self, zx, ret_last_feat: bool = False):
        """zx: [..., d_latent + d_in]. Returns (out [..., d_out], last_feat)."""
        act = _act(self.beta)
        if self.d_latent > 0:
            z, x = zx[..., :self.d_latent], zx[..., self.d_latent:]
        else:
            z, x = None, zx

        x = nn.Dense(self.d_hidden,
                     kernel_init=nn.initializers.kaiming_normal())(x)
        n_lin_z = min(self.combine_layer, self.n_blocks)
        for blkid in range(self.n_blocks):
            if self.d_latent > 0 and blkid < n_lin_z:
                tz = nn.Dense(self.d_hidden,
                              kernel_init=nn.initializers.kaiming_normal(),
                              name=f"lin_z_{blkid}")(z)
                if self.use_spade:
                    sz = nn.Dense(self.d_hidden,
                                  kernel_init=nn.initializers.kaiming_normal(),
                                  name=f"scale_z_{blkid}")(z)
                    x = sz * x + tz
                else:
                    x = x + tz
            x = ResnetBlockFC(self.d_hidden, beta=self.beta,
                              name=f"block_{blkid}")(x)
        out = nn.Dense(self.d_out,
                       kernel_init=nn.initializers.kaiming_normal())(act(x))
        if ret_last_feat:
            return jnp.concatenate([out, x], axis=-1), x
        return out, x
