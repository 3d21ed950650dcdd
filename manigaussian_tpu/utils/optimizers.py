"""LAMB optimizer, reference-exact.

Parity target: `helpers/optim/lamb.py:60-110` (the default optimizer,
conf/method/ManiGaussian_BC.yaml:45). Differences from optax.lamb that matter:

  * NO bias correction ("Paper v3 does not use debiasing", lamb.py:88-92);
  * the WEIGHT norm is clamped to [0, 10] (lamb.py:93) — this bounds the
    layer-wise trust ratio on large layers (optax's unclamped norm gives e.g.
    the 8077×256 positional-encoding table a ~5× larger effective LR, which
    destabilizes batch-1 training);
  * trust_ratio = 1 when either norm is zero; `adam=True` degrades to Adam.

Implemented as an optax GradientTransformation so it composes with the rest of
the train state machinery.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class LambState(NamedTuple):
    mu: optax.Updates
    nu: optax.Updates


def lamb_reference(learning_rate, b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-6, weight_decay: float = 0.0,
                   adam: bool = False) -> optax.GradientTransformation:
    def init_fn(params):
        return LambState(
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params):
        assert params is not None, "lamb needs params"
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)

        lr = learning_rate
        if callable(lr):
            raise ValueError("pass schedules via optax.inject_hyperparams")

        def one(m, v, p):
            adam_step = m / (jnp.sqrt(v) + eps)
            if weight_decay != 0.0:
                adam_step = adam_step + weight_decay * p
            weight_norm = jnp.clip(jnp.linalg.norm(p.reshape(-1)), 0.0, 10.0)
            adam_norm = jnp.linalg.norm(adam_step.reshape(-1))
            trust = jnp.where((weight_norm == 0.0) | (adam_norm == 0.0),
                              1.0, weight_norm / jnp.maximum(adam_norm, 1e-30))
            if adam:
                trust = 1.0
            return -lr * trust * adam_step

        new_updates = jax.tree_util.tree_map(one, mu, nu, params)
        return new_updates, LambState(mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_lamb(learning_rate, b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.0,
              schedule: Optional[optax.Schedule] = None):
    """Reference LAMB, optionally with an LR schedule."""
    if schedule is not None:
        return optax.inject_hyperparams(
            lambda lr: lamb_reference(lr, b1, b2, eps, weight_decay))(
            lr=schedule)
    return lamb_reference(learning_rate, b1, b2, eps, weight_decay)
