"""Train-step cost split on the current device (VERDICT r1 item 10).

Ablation timing of the single-jit BC update: the renderer cost is the
difference between the full step and the renderer-off step (the policy path —
aug + voxelize + perceiver + CE losses + LAMB — is identical in both).
Also times the w_geo_sem_dyna tier (adds embed head + next-frame deformation
render) and reports the split as one JSON line.
"""
import os, sys, time, json, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import __graft_entry__ as ge
from manigaussian_tpu import config as C
from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent


def time_step(cfg, label, iters=20):
    agent = ManiGaussianBCAgent(cfg)
    batch = ge._make_batch(jax.random.PRNGKey(0), b=1, ncam=1, h=128, w=128,
                           img=cfg.method.neural_renderer.image_height)
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True,
                             lazy=True)
    upd = agent.jit_update(donate=False)
    t0 = time.time()
    state, metrics = upd(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(iters):
        state, metrics = upd(state, batch, jax.random.PRNGKey(3 + i))
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / iters
    print(f"{label:28s} {dt*1000:8.2f} ms/step  ({1/dt:6.2f} steps/s, "
          f"compile {compile_s:.0f}s)", flush=True)
    return dt


w_geo = C.w_geo()
no_render = dataclasses.replace(
    w_geo, method=dataclasses.replace(w_geo.method, use_neural_rendering=False))
sem_dyna = C.w_geo_sem_dyna()

t_policy = time_step(no_render, "policy only (renderer off)")
t_geo = time_step(w_geo, "w_geo (policy + render)")
t_full = time_step(sem_dyna, "w_geo_sem_dyna (full tier)")

print(json.dumps({
    "metric": "train_step_split_ms",
    "policy_ms": round(t_policy * 1e3, 2),
    "renderer_ms": round((t_geo - t_policy) * 1e3, 2),
    "sem_dyna_extra_ms": round((t_full - t_geo) * 1e3, 2),
    "w_geo_steps_per_s": round(1 / t_geo, 2),
    "sem_dyna_steps_per_s": round(1 / t_full, 2),
}), flush=True)
