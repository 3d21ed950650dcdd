"""Full BC train-step throughput on the current device (flagship config).

Reference budget: 100,010 iterations in < 2 days on 2× RTX 4090 at batch 1/GPU
(≈ 0.58 steps/s aggregate). Prints steps/s for the w_geo flagship at batch 1.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import __graft_entry__ as ge
from manigaussian_tpu import config as C
from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

cfg = C.w_geo()
agent = ManiGaussianBCAgent(cfg)
batch = ge._make_batch(jax.random.PRNGKey(0), b=1, ncam=1, h=128, w=128, img=128)
t0 = time.time()
state = agent.init_state(jax.random.PRNGKey(1), batch, training=True, lazy=True)
print("init", round(time.time() - t0, 1), flush=True)

upd = agent.jit_update(donate=False)
t0 = time.time()
state, metrics = upd(state, batch, jax.random.PRNGKey(2))
jax.block_until_ready(metrics)
print("compile", round(time.time() - t0, 1), flush=True)

iters = 20
t0 = time.time()
for i in range(iters):
    state, metrics = upd(state, batch, jax.random.PRNGKey(3 + i))
jax.block_until_ready(metrics)
dt = (time.time() - t0) / iters
print(json.dumps({
    "metric": "train_steps_per_s_w_geo_batch1",
    "value": round(1.0 / dt, 3),
    "unit": "steps/s",
    "total_loss": float(metrics["total_loss"]),
    "est_hours_100k_iters": round(100010 * dt / 3600, 2),
}), flush=True)
