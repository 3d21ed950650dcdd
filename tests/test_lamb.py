"""LAMB parity test vs a transcription of the reference torch algorithm
(helpers/optim/lamb.py:60-110: no debias, weight-norm clamp [0,10])."""

import jax
import jax.numpy as jnp
import numpy as np

from manigaussian_tpu.utils.optimizers import lamb_reference


def torch_style_lamb_steps(params, grads_seq, lr, b1=0.9, b2=0.999, eps=1e-6,
                           wd=0.0):
    p = {k: v.copy() for k, v in params.items()}
    m = {k: np.zeros_like(v) for k, v in params.items()}
    v = {k: np.zeros_like(x) for k, x in params.items()}
    for grads in grads_seq:
        for k in p:
            g = grads[k]
            m[k] = b1 * m[k] + (1 - b1) * g
            v[k] = b2 * v[k] + (1 - b2) * g * g
            adam_step = m[k] / (np.sqrt(v[k]) + eps)
            if wd != 0:
                adam_step = adam_step + wd * p[k]
            weight_norm = np.clip(np.linalg.norm(p[k]), 0, 10)
            adam_norm = np.linalg.norm(adam_step)
            trust = 1.0 if (weight_norm == 0 or adam_norm == 0) \
                else weight_norm / adam_norm
            p[k] = p[k] - lr * trust * adam_step
    return p


def test_lamb_matches_reference_formula():
    rs = np.random.RandomState(0)
    params = {
        "small": rs.randn(4).astype(np.float32) * 0.1,
        # norm > 10 → exercises the clamp (where optax.lamb diverges from ref)
        "big": rs.randn(100, 30).astype(np.float32),
    }
    grads_seq = [{k: rs.randn(*v.shape).astype(np.float32) * 0.01
                  for k, v in params.items()} for _ in range(5)]

    lr, wd = 5e-3, 1e-6
    opt = lamb_reference(lr, weight_decay=wd)
    jp = {k: jnp.array(v) for k, v in params.items()}
    state = opt.init(jp)
    for g in grads_seq:
        updates, state = opt.update({k: jnp.array(v) for k, v in g.items()},
                                    state, jp)
        jp = jax.tree_util.tree_map(lambda p, u: p + u, jp, updates)

    expected = torch_style_lamb_steps(params, grads_seq, lr, wd=wd)
    for k in params:
        np.testing.assert_allclose(np.asarray(jp[k]), expected[k],
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # the clamp actually binds for the big layer
    assert np.linalg.norm(params["big"]) > 10


def test_agent_uses_reference_lamb():
    from manigaussian_tpu.agents.bc_agent import make_optimizer
    from tests.test_agent import tiny_config
    opt = make_optimizer(tiny_config())
    p = {"w": jnp.ones((3, 3))}
    s = opt.init(p)
    u, _ = opt.update({"w": jnp.full((3, 3), 0.1)}, s, p)
    assert np.isfinite(np.asarray(u["w"])).all()
