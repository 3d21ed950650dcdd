"""Sub-component timing of the policy step (aug / voxelize / perceiver / LAMB)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import __graft_entry__ as ge
from manigaussian_tpu import config as C
from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent, normalize_rgb
from manigaussian_tpu.agents.qfunction import build_voxel_grid
from manigaussian_tpu.ops.augmentation import apply_se3_augmentation

cfg = C.w_geo()
m = cfg.method
agent = ManiGaussianBCAgent(cfg)
batch = ge._make_batch(jax.random.PRNGKey(0), b=1, ncam=1, h=128, w=128, img=128)
state = agent.init_state(jax.random.PRNGKey(1), batch, training=True, lazy=True)
bounds = agent.bounds


def timeit(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:32s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)
    return out


rgb = normalize_rgb(batch["rgb"])
pcd = batch["pcd"]

aug = jax.jit(lambda k, p: apply_se3_augmentation(
    k, p, batch["gripper_pose"], batch["trans_action_indicies"][:, :3],
    batch["rot_grip_action_indicies"], bounds,
    trans_aug_range=m.aug_xyz, rot_aug_range=m.aug_rpy,
    rot_aug_resolution=m.rotation_resolution, voxel_size=m.voxel_sizes[0],
    rot_resolution=m.rotation_resolution,
    camera_pose=batch["camera_extrinsics"]))
timeit("se3 augmentation", aug, jax.random.PRNGKey(0), pcd)

vox = jax.jit(lambda p, r: build_voxel_grid(p, r, bounds, m.voxel_sizes[0]))
grid = timeit("voxelize (scatter 100^3)", vox, pcd, rgb)

apply_fwd = jax.jit(lambda params, g: agent.qfn.apply(
    params, rgb, pcd, batch["low_dim_state"], batch["lang_goal_emb"],
    batch["lang_token_embs"], bounds, use_neural_rendering=False,
    deterministic=True).q_trans)
timeit("qfn fwd (incl voxelize)", apply_fwd, state.params, grid)


def loss(params):
    q = agent.qfn.apply(
        params, rgb, pcd, batch["low_dim_state"], batch["lang_goal_emb"],
        batch["lang_token_embs"], bounds, use_neural_rendering=False,
        deterministic=True)
    return jnp.sum(q.q_trans) + jnp.sum(q.q_rot_grip) + jnp.sum(q.q_collision)


grads = timeit("qfn fwd+bwd", jax.jit(jax.grad(loss)), state.params)

opt_step = jax.jit(lambda g, o, p: agent.opt.update(g, o, p))
timeit("LAMB update", opt_step, grads, state.opt_state, state.params)
