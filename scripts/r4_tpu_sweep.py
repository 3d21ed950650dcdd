"""Round-4 on-chip measurement sweep (VERDICT r3 items 2, 8, 9).

One TPU process at a time (STATUS.md). Appends JSON rows to R4_SWEEP.jsonl:

  1. renderer bench re-verify AFTER the patch-based blend refactor
     (rasterizer.py now returns tile patches + separate _untile) — direct and
     dependency-chained timing;
  2. re-measure the rows R3 flagged as bogus (conv100 ci=128, unet100) with
     the in-jit fori_loop slope method — the ONLY trustworthy microbench on
     the axon backend (STATUS.md timing quirk);
  3. the 4-variant tier table (w_geo / w_geo_dyna / w_geo_sem /
     w_geo_sem_dyna) at flagship shapes, policy_conv_impl=z2d, with the REAL
     SD-VAE tower cost measured separately (random-init weights are
     compute-identical; the reference pays a full SD pass per step,
     neural_rendering.py:125-148) and a combined serial-rate column;
  4. act() latency at flagship shapes (qattention:1063-1158 analog —
     voxelize → perceiver → argmax, no renderer), chained timing.

Usage:  timeout 5400 python scripts/r4_tpu_sweep.py [--skip a,b,...]
        sections: renderer,micro,tiers,extractor,act
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "R4_SWEEP.jsonl"


def record(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def timed(fn, *args):
    import jax
    out = fn(*args)          # warm-up / compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def timed_min(fn, *args, reps=3):
    return min(timed(fn, *args) for _ in range(reps))


def chained_slope(make_chain, x, k_lo, k_hi, reps=3):
    """Per-iteration time from a two-point fori_loop dependency chain
    (scripts/probe_timing3.py method; min-of-reps per point)."""
    t_lo = timed_min(make_chain(k_lo), *x, reps=reps)
    t_hi = timed_min(make_chain(k_hi), *x, reps=reps)
    return (t_hi - t_lo) / (k_hi - k_lo), t_lo, t_hi


# ------------------------------------------------------------- 1. renderer
def bench_renderer():
    import jax
    import jax.numpy as jnp

    import bench as B
    from manigaussian_tpu.ops.rasterizer import RasterizeConfig, rasterize

    n, size = 65536, 128
    camera = B.make_camera(size)
    scene = B.make_scene(jax.random.PRNGKey(0), n)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (size, size, 3))
    cfg = RasterizeConfig(width=size, height=size, tile=16,
                          max_tiles_per_gaussian=16, tile_capacity=8192,
                          chunk=512, sh_degree=1)

    def loss(means, scales, rotations, opacities, shs, lang):
        out, _ = rasterize(means, opacities, camera, cfg, (0., 0., 0.),
                           scales=scales, rotations=rotations, shs=shs,
                           language_features=lang)
        return (jnp.sum((out.color - tgt) ** 2)
                + jnp.sum(out.language_feature ** 2))

    grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))
    step = jax.jit(grad)
    # direct (this executable blocks correctly per the r3 probe)
    dt = timed_min(step, *scene)
    record({"exp": "renderer_bench", "config": "post_patch_refactor",
            "method": "direct", "per_iter_ms": round(dt * 1e3, 2),
            "renders_per_s": round(1.0 / dt, 2)})

    def chain(k):
        @jax.jit
        def f(*s):
            def body(i, s):
                g = grad(*s)
                return tuple(a - 1e-12 * b for a, b in zip(s, g))
            return jax.lax.fori_loop(0, k, body, s)
        return f

    slope, t_lo, t_hi = chained_slope(chain, scene, 2, 8)
    record({"exp": "renderer_bench", "config": "post_patch_refactor",
            "method": "chained(k=2,8)", "t_lo_ms": round(t_lo * 1e3, 1),
            "t_hi_ms": round(t_hi * 1e3, 1),
            "per_iter_ms": round(slope * 1e3, 2),
            "renders_per_s": round(1.0 / slope, 2)})


# -------------------------------------------------- 2. honest microbenches
def bench_micro():
    import jax
    import jax.numpy as jnp

    ci = co = 128
    x = jax.random.normal(jax.random.PRNGKey(0), (100, 100, 100, ci),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, ci, co),
                          jnp.bfloat16) * 0.02

    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v[None], w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]

    def chain_fwd(k):
        @jax.jit
        def f(x, w):
            return jax.lax.fori_loop(
                0, k, lambda i, v: conv(v, w) * jnp.bfloat16(0.5), x)
        return f

    slope, *_ = chained_slope(chain_fwd, (x, w), 4, 16)
    record({"exp": "conv100", "ci": ci, "co": co, "impl": "xla",
            "method": "chained(k=4,16)", "fwd_ms": round(slope * 1e3, 2)})

    def g_conv(v, w):
        return jax.grad(
            lambda v, w: jnp.sum(conv(v, w).astype(jnp.float32) ** 2),
            argnums=0)(v, w).astype(jnp.bfloat16)

    def chain_fb(k):
        @jax.jit
        def f(x, w):
            return jax.lax.fori_loop(
                0, k, lambda i, v: g_conv(v, w) * jnp.bfloat16(1e-6), x)
        return f

    slope_fb, *_ = chained_slope(chain_fb, (x, w), 2, 8)
    record({"exp": "conv100", "ci": ci, "co": co, "impl": "xla",
            "method": "chained(k=2,8)", "fwd_bwd_ms": round(slope_fb * 1e3, 2)})

    # whole U-Net at flagship dims
    from manigaussian_tpu.models.unet3d import VoxelUNetShallow

    xin = jax.random.normal(jax.random.PRNGKey(2), (1, 100, 100, 100, 10),
                            jnp.float32)
    net = VoxelUNetShallow(dtype=jnp.bfloat16)
    v = net.init(jax.random.PRNGKey(3), xin)

    def unet_fwd_chain(k):
        @jax.jit
        def f(p, x):
            def body(i, x):
                out, _ = net.apply(p, x)
                # feed 10 of the 128 output channels back as the next input
                return x + out[..., :10] * 1e-6
            return jax.lax.fori_loop(0, k, body, x)
        return f

    slope_u, *_ = chained_slope(unet_fwd_chain, (v, xin), 2, 8)
    record({"exp": "unet100", "method": "chained(k=2,8)",
            "fwd_ms": round(slope_u * 1e3, 2)})

    def unet_fb_chain(k):
        def loss(p, x):
            out, _ = net.apply(p, x)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        @jax.jit
        def f(p, x):
            def body(i, x):
                g = jax.grad(loss, argnums=1)(p, x)
                return x + g * 1e-9
            return jax.lax.fori_loop(0, k, body, x)
        return f

    slope_ufb, *_ = chained_slope(unet_fb_chain, (v, xin), 2, 6)
    record({"exp": "unet100", "method": "chained(k=2,6)",
            "fwd_bwd_ms": round(slope_ufb * 1e3, 2)})


# ------------------------------------------------------------ 3. tier table
def bench_tiers(conv_impl: str, tiers, unet_impl: str = "xla"):
    import dataclasses

    import jax

    import __graft_entry__ as ge
    from manigaussian_tpu import config as C
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

    rows = {}
    for tier in tiers:
        cfg = C.VARIANTS[tier]()
        cfg = dataclasses.replace(cfg, method=dataclasses.replace(
            cfg.method, policy_conv_impl=conv_impl,
            policy_unet_impl=unet_impl))
        agent = ManiGaussianBCAgent(cfg)
        batch = ge._make_batch(jax.random.PRNGKey(0), b=1, ncam=1, h=128,
                               w=128, img=128)
        if cfg.method.neural_renderer.foundation_model_name:
            batch["gt_embed"] = jax.random.normal(
                jax.random.PRNGKey(9), (1, 128, 128, 3)) * 0.1
        state = agent.init_state(jax.random.PRNGKey(1), batch, training=True,
                                 lazy=True)
        step = agent.jit_update(donate=False)
        _, m = step(state, batch, jax.random.PRNGKey(2))
        jax.block_until_ready(m)
        iters = 30
        t0 = time.perf_counter()
        for i in range(iters):
            _, m = step(state, batch, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / iters
        rows[tier] = dt
        record({"exp": "tier_step", "tier": tier, "conv_impl": conv_impl,
                "unet_impl": unet_impl,
                "steps_per_s": round(1.0 / dt, 3), "ms": round(dt * 1e3, 1)})
    return rows


# ------------------------------------------------ 4. real SD-VAE extractor
def bench_extractor():
    """Random-init Flax SD-VAE (compute-identical to real weights) running the
    exact ODISE 'diffusion' feature path per step: resize 512² → encode →
    clean-latent decode tap → resize → per-image PCA → 3ch."""
    import jax
    import jax.numpy as jnp

    from manigaussian_tpu.models import sd_vae as sv
    from manigaussian_tpu.models.foundation import pca_to_channels_batch

    model = sv.SDVae()
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (1, 128, 128, 3))
    img0 = jax.image.resize(rgb, (1, 512, 512, 3), "bilinear") * 2.0 - 1.0
    variables = model.init(jax.random.PRNGKey(1), img0[:, :64, :64, :])
    # init at 64² (conv params are resolution-independent) to keep host init
    # cheap; apply at the real 512²

    def extract(v, rgb):
        b, h, w, _ = rgb.shape
        img = jax.image.resize(rgb, (b, 512, 512, 3), "bilinear") * 2. - 1.
        out = model.apply(v, img)
        feats = out["decoder_features"][-1]
        feats = jax.image.resize(feats, (b, h, w, feats.shape[-1]),
                                 "bilinear")
        proj = pca_to_channels_batch(
            feats.reshape(b, h * w, feats.shape[-1]), 3)
        return proj.reshape(b, h, w, 3)

    def chain(k):
        @jax.jit
        def f(v, rgb):
            def body(i, r):
                e = extract(v, r)
                return r + jnp.mean(e) * 1e-9
            return jax.lax.fori_loop(0, k, body, rgb)
        return f

    slope, t_lo, t_hi = chained_slope(chain, (variables, rgb), 1, 4, reps=2)
    record({"exp": "sd_vae_extractor", "input": "128->512^2",
            "method": "chained(k=1,4)", "t_lo_ms": round(t_lo * 1e3, 1),
            "t_hi_ms": round(t_hi * 1e3, 1),
            "per_image_ms": round(slope * 1e3, 2)})
    return slope


# ------------------------------------------------------------ 5. act latency
def bench_act():
    import jax
    import jax.numpy as jnp

    from manigaussian_tpu import config as C
    from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent

    import dataclasses

    cfg = C.w_geo()
    cfg = dataclasses.replace(cfg, method=dataclasses.replace(
        cfg.method, use_neural_rendering=False, policy_conv_impl="z2d"))
    agent = ManiGaussianBCAgent(cfg)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    obs = {
        "rgb": jax.random.uniform(ks[0], (1, 1, 128, 128, 3)),
        "pcd": jnp.array([0.2, 0.0, 1.1]) +
        jax.random.normal(ks[1], (1, 1, 128, 128, 3)) * 0.08,
        "low_dim_state": jnp.zeros((1, 4)),
        "lang_goal_emb": jax.random.normal(ks[2], (1, 1024)) * 0.1,
        "lang_token_embs": jax.random.normal(ks[3], (1, 77, 512)) * 0.1,
    }
    params = agent.init_state(jax.random.PRNGKey(1), {**obs}, training=False,
                              lazy=True).params
    act = agent.jit_act()

    dt = timed_min(act, params, obs)
    record({"exp": "act_latency", "method": "direct",
            "ms": round(dt * 1e3, 2)})

    # chained: feed the predicted coords back into proprio to force the chain
    def chain(k):
        @jax.jit
        def f(params, obs):
            def body(i, o):
                r = agent.act(params, o)
                return dict(o, low_dim_state=o["low_dim_state"]
                            + jnp.sum(r.continuous_action) * 1e-9)
            return jax.lax.fori_loop(0, k, body, obs)
        return f

    slope, t_lo, t_hi = chained_slope(chain, (params, obs), 2, 8)
    record({"exp": "act_latency", "method": "chained(k=2,8)",
            "t_lo_ms": round(t_lo * 1e3, 1), "t_hi_ms": round(t_hi * 1e3, 1),
            "ms": round(slope * 1e3, 2)})


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip", default="",
                        help="comma list: renderer,micro,tiers,extractor,act")
    parser.add_argument("--tiers",
                        default="w_geo,w_geo_dyna,w_geo_sem,w_geo_sem_dyna")
    parser.add_argument("--conv-impl", default="z2d")
    parser.add_argument("--unet-impl", default="xla",
                        help="policy U-Net impl for the tier table: xla|packed")
    args = parser.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    print(f"devices: {jax.devices()}", flush=True)

    def guard(name, fn, *a):
        if name in skip:
            return None
        try:
            return fn(*a)
        except Exception as e:  # noqa: BLE001 — report and continue
            record({"exp": name, "error": f"{type(e).__name__}: {e}"[:300]})
            return None

    guard("renderer", bench_renderer)
    guard("micro", bench_micro)
    tier_rows = guard("tiers", bench_tiers, args.conv_impl,
                      args.tiers.split(","), args.unet_impl)
    # packed-unet head-to-head on the flagship tier (VERDICT r3 item 3):
    # measured as a FULL-STEP delta, not a microbench
    guard("packed", bench_tiers, args.conv_impl, ["w_geo"], "packed")
    t_ex = guard("extractor", bench_extractor)
    if tier_rows and t_ex:
        for tier, dt in tier_rows.items():
            if "sem" in tier:
                record({"exp": "tier_step_with_extractor", "tier": tier,
                        "combined_ms": round((dt + t_ex) * 1e3, 1),
                        "steps_per_s": round(1.0 / (dt + t_ex), 3)})
    guard("act", bench_act)


if __name__ == "__main__":
    main()
