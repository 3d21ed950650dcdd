"""Generate golden-frame parity fixtures (tests/goldens/*.npz).

BASELINE acceptance row 3 demands rasterizer parity on RLBench-like frames,
not just random blobs: these scenes are DEPTH-UNPROJECTED point clouds
(structured surfaces — a table plane with a sphere on it — through
ops/camera.depth_to_pointcloud, the exact loader convention of
data/pipeline.py:173-190) turned into Gaussians and rendered from a novel
camera. The ORACLE (ops/rasterizer_ref.py, which pins the CUDA semantics of
reference forward.cu:262-398) renders each scene once, gradients of a fixed
scalar loss are taken through it, and everything — inputs, rendered frames,
final transmittance, per-parameter grads — is frozen into .npz artifacts.

tests/test_goldens.py then asserts BOTH production backends (xla + pallas)
and the oracle itself against these pinned tensors forever after: a semantics
regression in any path fails CI instead of silently shifting training.

Rerun only when the blend semantics deliberately change:
    python scripts/make_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from manigaussian_tpu.data.synthetic import _intrinsics, _look_at  # noqa: E402
from manigaussian_tpu.ops import camera as cam  # noqa: E402
from manigaussian_tpu.ops.rasterizer_ref import rasterize_reference  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")

CENTER = np.array([0.2, 0.0, 1.1], np.float32)


def tabletop_depth(h, w):
    """Analytic depth: table plane + sphere sitting on it, viewed from above-
    front (RLBench tabletop geometry, deterministic)."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    u = (xs - w / 2.0) / w
    v = (ys - h / 2.0) / h
    depth = 1.05 + 0.25 * v                      # tilted table plane
    r2 = (u - 0.05) ** 2 + (v + 0.1) ** 2
    sphere = r2 < 0.09
    depth = np.where(sphere, depth - 0.35 * np.sqrt(np.maximum(0.09 - r2, 0)),
                     depth)
    return depth.astype(np.float32)


def scene_from_depth(h=32, w=32, key=0):
    """Depth map → unprojected pcd → Gaussian params (deterministic)."""
    obs_pose = _look_at(CENTER + np.array([0.0, -0.8, 0.5]), CENTER)
    intr = _intrinsics(h, w, focal=float(w))
    depth = tabletop_depth(h, w)
    w2c = np.linalg.inv(obs_pose)
    pcd = np.asarray(cam.depth_to_pointcloud(
        jnp.asarray(depth), jnp.asarray(w2c), jnp.asarray(intr)))
    means = pcd.reshape(-1, 3)
    n = means.shape[0]

    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    # colors: smooth position-derived pattern (surface-coherent like RGB obs)
    rgbn = (means - means.min(0)) / (np.ptp(means, 0) + 1e-6)
    sh_dc = (rgbn - 0.5) / 0.28209479177387814          # SH C0 inverse
    shs = np.zeros((n, 4, 3), np.float32)
    shs[:, 0] = sh_dc
    shs[:, 1:] = 0.15 * np.asarray(jax.random.normal(ks[0], (n, 3, 3)))
    scales = np.full((n, 3), 0.02, np.float32) * np.asarray(
        jax.random.uniform(ks[1], (n, 3), minval=0.5, maxval=2.0))
    q = np.asarray(jax.random.normal(ks[2], (n, 4)))
    rotations = (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(
        np.float32)
    opacities = np.asarray(jax.random.uniform(ks[3], (n,), minval=0.3,
                                              maxval=0.95), np.float32)
    lang = np.asarray(jax.random.normal(ks[4], (n, 3)), np.float32)
    return dict(means3d=means.astype(np.float32), scales=scales,
                rotations=rotations, opacities=opacities,
                shs=shs.astype(np.float32), language_features=lang)


def degenerate_scene(base):
    """Sparse variant exercising culls/clamps: every 8th splat, plus splats
    behind the camera, at the frustum edge, and one giant splat."""
    s = {k: v[::8].copy() for k, v in base.items()}
    s["means3d"] = np.concatenate([
        s["means3d"],
        CENTER + np.array([[0.0, -2.0, 0.0]], np.float32),     # behind camera
        CENTER + np.array([[5.0, 0.0, 0.0]], np.float32),      # far off-frustum
        CENTER[None] + 0.0,                                     # giant center
    ]).astype(np.float32)
    pad = lambda v, fill: np.concatenate(
        [v, np.broadcast_to(np.asarray(fill, v.dtype), (3,) + v.shape[1:])])
    s["scales"] = np.concatenate(
        [s["scales"], [[0.02] * 3, [0.02] * 3, [0.6] * 3]]).astype(np.float32)
    s["rotations"] = pad(s["rotations"], [1, 0, 0, 0])
    s["opacities"] = np.concatenate(
        [s["opacities"], [0.9, 0.9, 0.8]]).astype(np.float32)
    s["shs"] = pad(s["shs"], np.zeros((4, 3), np.float32))
    s["language_features"] = pad(s["language_features"], [1.0, -1.0, 0.5])
    return s


def render_and_grads(scene, novel_eye, width, height, znear=0.1, zfar=4.0):
    intr = _intrinsics(height, width, focal=float(width))
    c2w = _look_at(CENTER + np.asarray(novel_eye, np.float32), CENTER)
    camera = cam.novel_camera_calib(jnp.asarray(intr), jnp.asarray(c2w),
                                    znear, zfar, height, width)
    bg = jnp.zeros(3)

    kw = {k: jnp.asarray(v) for k, v in scene.items()}
    wc = jax.random.normal(jax.random.PRNGKey(7), (height * width, 3))
    wl = jax.random.normal(jax.random.PRNGKey(8), (height * width, 3))
    wt = jax.random.normal(jax.random.PRNGKey(9), (height * width,))

    def loss_fn(params):
        out = rasterize_reference(
            params["means3d"], params["opacities"], camera, width, height, bg,
            scales=params["scales"], rotations=params["rotations"],
            shs=params["shs"],
            language_features=params["language_features"], sh_degree=1)
        return (jnp.sum(out.color.reshape(-1, 3) * wc)
                + jnp.sum(out.language_feature.reshape(-1, 3) * wl)
                + jnp.sum(out.final_t.reshape(-1) * wt)), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(kw)
    rec = dict(scene)
    rec.update(
        intrinsic=intr, c2w=c2w, znear=znear, zfar=zfar,
        width=width, height=height, loss=np.float32(loss),
        golden_color=np.asarray(out.color),
        golden_lang=np.asarray(out.language_feature),
        golden_final_t=np.asarray(out.final_t),
        golden_radii=np.asarray(out.radii))
    for k, g in grads.items():
        rec[f"grad_{k}"] = np.asarray(g)
    return rec


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    base = scene_from_depth(32, 32, key=0)

    dense = render_and_grads(base, novel_eye=(0.55, -0.55, 0.45),
                             width=64, height=64)
    np.savez_compressed(os.path.join(GOLDEN_DIR, "tabletop_dense.npz"),
                        **dense)
    print(f"tabletop_dense: N={base['means3d'].shape[0]} "
          f"loss={dense['loss']:.6f}")

    sparse = render_and_grads(degenerate_scene(base),
                              novel_eye=(0.0, -0.75, 0.55),
                              width=32, height=32)
    np.savez_compressed(os.path.join(GOLDEN_DIR, "tabletop_sparse.npz"),
                        **sparse)
    print(f"tabletop_sparse: N={sparse['means3d'].shape[0]} "
          f"loss={sparse['loss']:.6f}")


if __name__ == "__main__":
    main()
