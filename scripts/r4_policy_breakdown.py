"""Per-stage cost breakdown of the flagship policy step (chained timing).

Times each heavy stage of the w_geo train step standalone at flagship shapes
(voxel 100³, 128 feature channels) with the fori_loop dependency-chain slope —
the only timing method the axon backend cannot fake (STATUS.md quirk). The
perceiver "middle" (patchify→attention→decoder) is reported as the residual:
   middle ≈ policy_step − (unet + softmax_feats + up0 + final + trans
            + voxelize + lamb + aug)
Appends rows to R4_SWEEP.jsonl; run AFTER any other TPU job finishes (one
process holds the chip claim at a time).

Usage: python scripts/r4_policy_breakdown.py [--skip a,b,...]
  sections: unet,softmax,up0,final,trans,voxelize,lamb,aug,policy
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "R4_SWEEP.jsonl"


def _setup_cache():
    """Persistent compile cache BEFORE the first trace (remote compiles are
    minutes each; __graft_entry__ sets this too, but only when imported)."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/root/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def record(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def _sync(out):
    """Force completion via a device→host fetch of ONE element.

    jax.block_until_ready is a silent no-op for some executables on the axon
    backend (STATUS.md quirk — the first breakdown run returned ~0 ms slopes
    for every stage). Indexing the first element launches a tiny dependent
    computation and device_get transfers 4 bytes; neither can be elided."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jax.device_get(leaf.ravel()[0]))


def timed_min(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def chained_slope(make_chain, x, k_lo=2, k_hi=8, reps=3):
    t_lo = timed_min(make_chain(k_lo), *x, reps=reps)
    t_hi = timed_min(make_chain(k_hi), *x, reps=reps)
    return (t_hi - t_lo) / (k_hi - k_lo), t_lo, t_hi


def _grad_chain(apply_fn, feed_fn):
    """Build chain(k): x ← x + feed(grad(loss(params, x))) per iteration."""
    import jax
    import jax.numpy as jnp

    def loss(p, x):
        return jnp.sum(apply_fn(p, x).astype(jnp.float32) ** 2)

    def chain(k):
        @jax.jit
        def f(p, x):
            def body(i, x):
                g = jax.grad(loss, argnums=1)(p, x)
                return feed_fn(x, g)
            return jax.lax.fori_loop(0, k, body, x)
        return f
    return chain


def stage_row(name, slope, extra=None):
    row = {"exp": "policy_breakdown", "stage": name,
           "fwd_bwd_ms": round(slope * 1e3, 2)}
    if extra:
        row.update(extra)
    record(row)


def bench_unet(impl):
    import jax
    import jax.numpy as jnp
    from manigaussian_tpu.models.unet3d import VoxelUNetShallow

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 100, 100, 100, 10))
    net = VoxelUNetShallow(dtype=jnp.bfloat16, impl=impl)
    p = net.init(jax.random.PRNGKey(1), x)
    chain = _grad_chain(lambda p, x: net.apply(p, x)[0],
                        lambda x, g: x + g * 1e-9)
    slope, *_ = chained_slope(chain, (p, x))
    stage_row(f"unet[{impl}]", slope)


def bench_softmax_feats():
    import jax
    import jax.numpy as jnp
    from manigaussian_tpu.models.blocks import SpatialSoftmax3D

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 100, 100, 100, 128),
                          jnp.float32)
    mod = SpatialSoftmax3D()
    p = mod.init(jax.random.PRNGKey(1), x)

    def apply(p, x):
        return jnp.concatenate(
            [mod.apply(p, x), jnp.max(x, axis=(1, 2, 3))], axis=1)

    chain = _grad_chain(apply, lambda x, g: x + g * 1e-9)
    slope, *_ = chained_slope(chain, (p, x))
    stage_row("spatial_softmax+max@100^3x128 (x1 of 3)", slope)


def bench_up0(conv_impl):
    import jax
    import jax.numpy as jnp
    from manigaussian_tpu.models.blocks import Conv3DUpsampleBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 20, 20, 20, 256))
    mod = Conv3DUpsampleBlock(128, 5, kernel_size=3, activation="lrelu",
                              dtype=jnp.bfloat16, pad_mode="zero",
                              impl=conv_impl)
    p = mod.init(jax.random.PRNGKey(1), x)
    chain = _grad_chain(mod.apply, lambda x, g: x + g * 1e-9)
    slope, *_ = chained_slope(chain, (p, x), 2, 6)
    stage_row(f"up0[{conv_impl}] 20^3x256->100^3x128", slope)


def bench_final(conv_impl):
    import jax
    import jax.numpy as jnp
    from manigaussian_tpu.models.blocks import Conv3DBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 100, 100, 100, 256),
                          jnp.bfloat16)
    mod = Conv3DBlock(128, 3, 1, "lrelu", dtype=jnp.bfloat16,
                      pad_mode="zero", impl=conv_impl)
    p = mod.init(jax.random.PRNGKey(1), x)
    chain = _grad_chain(mod.apply, lambda x, g: x + (g * 1e-9).astype(x.dtype))
    slope, *_ = chained_slope(chain, (p, x), 2, 6)
    stage_row(f"final_conv[{conv_impl}] 100^3 256->128", slope)


def bench_trans():
    import jax
    import jax.numpy as jnp
    from manigaussian_tpu.models.blocks import ChannelProjectConv3D

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 100, 100, 100, 128),
                          jnp.float32)
    mod = ChannelProjectConv3D(1, 3, None, dtype=jnp.bfloat16, pad_mode="zero")
    p = mod.init(jax.random.PRNGKey(1), x)
    chain = _grad_chain(mod.apply, lambda x, g: x + g * 1e-9)
    slope, *_ = chained_slope(chain, (p, x), 2, 6)
    stage_row("trans_decoder 100^3 128->1", slope)


def bench_voxelize():
    import jax
    import jax.numpy as jnp
    from manigaussian_tpu.agents.qfunction import build_voxel_grid

    pcd = jnp.array([0.2, 0.0, 1.1]) + \
        jax.random.normal(jax.random.PRNGKey(0), (1, 1, 128, 128, 3)) * 0.08
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 128, 128, 3))
    bounds = jnp.array([-0.3, -0.5, 0.6, 0.7, 0.5, 1.6], jnp.float32)

    def chain(k):
        import jax as J

        @J.jit
        def f(pcd, rgb):
            def body(i, p):
                g = build_voxel_grid(p, rgb, bounds, 100)
                return p + jnp.mean(g) * 1e-12
            return J.lax.fori_loop(0, k, body, pcd)
        return f

    slope, *_ = chained_slope(chain, (pcd, rgb), 2, 8)
    record({"exp": "policy_breakdown", "stage": "voxelize (fwd, stop-grad)",
            "fwd_ms": round(slope * 1e3, 2)})


def bench_lamb():
    import jax
    import optax

    import __graft_entry__ as ge
    from manigaussian_tpu import config as C
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

    cfg = C.w_geo()
    agent = ManiGaussianBCAgent(cfg)
    batch = ge._make_batch(jax.random.PRNGKey(0), b=1, ncam=1, h=128, w=128,
                           img=128)
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True,
                             lazy=True)
    grads = jax.tree.map(lambda x: x * 1e-3, state.params)

    def chain(k):
        @jax.jit
        def f(g, o, p):
            def body(i, carry):
                o, p = carry
                u, o = agent.opt.update(g, o, p)
                return o, optax.apply_updates(p, u)
            o, p = jax.lax.fori_loop(0, k, body, (o, p))
            return p
        return f

    slope, *_ = chained_slope(chain, (grads, state.opt_state, state.params))
    record({"exp": "policy_breakdown", "stage": "LAMB update+apply",
            "ms": round(slope * 1e3, 2)})


def bench_aug():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from manigaussian_tpu import config as C
    from manigaussian_tpu.ops.augmentation import apply_se3_augmentation

    cfg = C.w_geo()
    m = cfg.method
    batch = ge._make_batch(jax.random.PRNGKey(0), b=1, ncam=1, h=128, w=128,
                           img=128)
    bounds = jnp.asarray(cfg.rlbench.scene_bounds, jnp.float32)

    def chain(k):
        @jax.jit
        def f(key, pcd):
            def body(i, carry):
                key, pcd = carry
                key = jax.random.fold_in(key, i)
                out = apply_se3_augmentation(
                    key, pcd, batch["gripper_pose"],
                    batch["trans_action_indicies"][:, :3],
                    batch["rot_grip_action_indicies"], bounds,
                    trans_aug_range=m.aug_xyz, rot_aug_range=m.aug_rpy,
                    rot_aug_resolution=m.rotation_resolution,
                    voxel_size=m.voxel_sizes[0],
                    rot_resolution=m.rotation_resolution,
                    camera_pose=batch["camera_extrinsics"])
                return key, out.pcd
            return jax.lax.fori_loop(0, k, body, (key, pcd))
        return f

    slope, *_ = chained_slope(chain, (jax.random.PRNGKey(0), batch["pcd"]),
                              2, 8)
    record({"exp": "policy_breakdown", "stage": "se3_augmentation",
            "ms": round(slope * 1e3, 2)})


def bench_policy_step():
    """Full update with use_neural_rendering=False (chained) — the renderer
    branch is then (w_geo tier_step ms − this)."""
    import jax

    import __graft_entry__ as ge
    from manigaussian_tpu import config as C
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

    cfg = C.w_geo()
    cfg = dataclasses.replace(cfg, method=dataclasses.replace(
        cfg.method, use_neural_rendering=False))
    agent = ManiGaussianBCAgent(cfg)
    batch = ge._make_batch(jax.random.PRNGKey(0), b=1, ncam=1, h=128, w=128,
                           img=128)
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True,
                             lazy=True)

    def chain(k):
        @jax.jit
        def f(state, batch, key):
            def body(i, st):
                st, _ = agent.update(st, batch, jax.random.fold_in(key, i))
                return st
            return jax.lax.fori_loop(0, k, body, state)
        return f

    slope, t_lo, t_hi = chained_slope(
        chain, (state, batch, jax.random.PRNGKey(2)), 2, 6)
    record({"exp": "policy_breakdown", "stage": "policy_step (no renderer)",
            "method": "chained(k=2,6)", "t_lo_ms": round(t_lo * 1e3, 1),
            "t_hi_ms": round(t_hi * 1e3, 1), "ms": round(slope * 1e3, 2)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    ap.add_argument("--conv-impl", default="z2d")
    ap.add_argument("--unet-impl", default="packed")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    _setup_cache()
    import jax
    print(f"devices: {jax.devices()}", flush=True)

    def guard(name, fn, *a):
        if name in skip:
            return
        try:
            fn(*a)
        except Exception as e:  # noqa: BLE001
            record({"exp": "policy_breakdown", "stage": name,
                    "error": f"{type(e).__name__}: {e}"[:300]})

    guard("unet", bench_unet, args.unet_impl)
    guard("softmax", bench_softmax_feats)
    guard("up0", bench_up0, args.conv_impl)
    guard("final", bench_final, args.conv_impl)
    guard("trans", bench_trans)
    guard("voxelize", bench_voxelize)
    guard("lamb", bench_lamb)
    guard("aug", bench_aug)
    guard("policy", bench_policy_step)


if __name__ == "__main__":
    main()
