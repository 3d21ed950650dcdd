"""Camera math for the Gaussian-splat renderer.

Behavioral parity targets (see SURVEY.md §2 / §7 stage 1):
  - reference `agents/manigaussian_bc/graphics_utils.py:17-78`
    (getWorld2View2 / getProjectionMatrix / focal2fov / depth2pc)
  - reference `agents/manigaussian_bc/neural_rendering.py:205-248` (get_novel_calib)

Unlike the reference — which builds these matrices on CPU numpy one batch item at a
time inside the train step — everything here is pure jax.numpy, batched with vmap, and
jit-safe so camera preparation fuses into the compiled step.

Conventions (identical to the reference CUDA rasterizer, which consumes torch
row-major "transposed" matrices):
  * `world_view_transform` Vt is the TRANSPOSE of the standard world→camera matrix V,
    i.e. row-vector convention:  p_view = [p, 1] @ Vt.
  * `full_proj_transform` = Vt @ Pt where Pt is the transposed projection matrix:
    p_clip = [p, 1] @ full_proj_transform.
  * `camera_center` is the camera origin in world coordinates.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Geometry is precision-sensitive: force fp32 MXU passes even when inputs are f32
# (TPU default matmul precision is bf16x3/bf16).
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


class Camera(NamedTuple):
    """Static per-view camera state consumed by the rasterizer.

    All fields are arrays so a batch of cameras is just a stacked Camera (use
    jax.tree_util / vmap). Mirrors the fields of the reference
    `GaussianRasterizationSettings` (diff_gaussian_rasterization/__init__.py:166-179).
    """

    world_view_transform: jnp.ndarray  # [4, 4]  transposed world→cam
    full_proj_transform: jnp.ndarray   # [4, 4]  transposed world→clip
    camera_center: jnp.ndarray         # [3]
    tan_fovx: jnp.ndarray              # scalar
    tan_fovy: jnp.ndarray              # scalar


def focal2fov(focal, pixels):
    """Full field-of-view angle from focal length (graphics_utils.py:51)."""
    return 2.0 * jnp.arctan(pixels / (2.0 * focal))


def fov2focal(fov, pixels):
    return pixels / (2.0 * jnp.tan(fov / 2.0))


def world_to_view(R: jnp.ndarray, t: jnp.ndarray,
                  translate: jnp.ndarray | None = None,
                  scale: float = 1.0) -> jnp.ndarray:
    """Standard (non-transposed) world→camera 4x4.

    Parity with `getWorld2View2` (graphics_utils.py:17-28): R is the CAMERA→WORLD
    rotation (the reference passes `extr_w2c[:3,:3].T`), t the world→camera
    translation. `translate`/`scale` shift+scale the camera center in world space.
    """
    if translate is None:
        translate = jnp.zeros(3, dtype=jnp.float32)
    Rt = jnp.eye(4, dtype=jnp.float32)
    Rt = Rt.at[:3, :3].set(R.T)
    Rt = Rt.at[:3, 3].set(t)
    # camera center in world space: C = -R @ t  (inverse of [R.T | t])
    cam_center = -R @ t
    cam_center = (cam_center + translate) * scale
    # rebuild world→view with the adjusted center: V = [R.T | -R.T C]
    V = jnp.eye(4, dtype=jnp.float32)
    V = V.at[:3, :3].set(R.T)
    V = V.at[:3, 3].set(-R.T @ cam_center)
    return V


def projection_from_intrinsics(K: jnp.ndarray, znear: float, zfar: float,
                               h: int, w: int) -> jnp.ndarray:
    """OpenGL-style perspective projection from a pixel intrinsic matrix.

    Parity with `getProjectionMatrix` (graphics_utils.py:31-48): supports
    off-center principal points. Returns the standard (non-transposed) 4x4.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    near_fx = znear / fx
    near_fy = znear / fy
    left = -(w - cx) * near_fx
    right = cx * near_fx
    bottom = (cy - h) * near_fy
    top = cy * near_fy

    P = jnp.zeros((4, 4), dtype=jnp.float32)
    P = P.at[0, 0].set(2.0 * znear / (right - left))
    P = P.at[1, 1].set(2.0 * znear / (top - bottom))
    P = P.at[0, 2].set((right + left) / (right - left))
    P = P.at[1, 2].set((top + bottom) / (top - bottom))
    P = P.at[3, 2].set(1.0)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    return P


def novel_camera_calib(intrinsic: jnp.ndarray, extrinsic_c2w: jnp.ndarray,
                       znear: float, zfar: float, h: int, w: int,
                       translate: jnp.ndarray | None = None,
                       scale: float = 1.0) -> Camera:
    """Build the rasterizer Camera from a cam→world extrinsic + pixel intrinsic.

    Parity with `get_novel_calib` (neural_rendering.py:205-248), but fully traced:
    no host round-trip, vmap over a batch of views.
    """
    extr = jnp.linalg.inv(extrinsic_c2w)  # world→cam
    R = extr[:3, :3].T                    # cam→world rotation, as the reference passes it
    t = extr[:3, 3]
    V = world_to_view(R, t, translate=translate, scale=scale)
    P = projection_from_intrinsics(intrinsic, znear, zfar, h, w)
    Vt = V.T
    full_proj = _mm(Vt, P.T)
    cam_center = jnp.linalg.inv(Vt)[3, :3]
    tan_fovx = jnp.tan(focal2fov(intrinsic[0, 0], w) * 0.5)
    tan_fovy = jnp.tan(focal2fov(intrinsic[1, 1], h) * 0.5)
    return Camera(
        world_view_transform=Vt,
        full_proj_transform=full_proj,
        camera_center=cam_center,
        tan_fovx=tan_fovx,
        tan_fovy=tan_fovy,
    )


novel_camera_calib_batch = jax.vmap(
    novel_camera_calib, in_axes=(0, 0, None, None, None, None))


def depth_to_pointcloud(depth: jnp.ndarray, extrinsic_w2c: jnp.ndarray,
                        intrinsic: jnp.ndarray) -> jnp.ndarray:
    """Unproject a depth map to a world-space point cloud.

    Parity with `depth2pc` (graphics_utils.py:56-78): pixel centers at +0.5, depth
    interpreted as z-depth; extrinsic is world→camera ([R|t], cam = R x + t).

    Args:
      depth: [H, W]
      extrinsic_w2c: [4, 4]
      intrinsic: [3, 3]
    Returns: [H*W, 3] world points
    """
    H, W = depth.shape
    y = jnp.linspace(0.5, H - 0.5, H, dtype=jnp.float32)
    x = jnp.linspace(0.5, W - 0.5, W, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    z = depth
    px = (xx - cx) * z / fx
    py = (yy - cy) * z / fy
    pts_cam = jnp.stack([px, py, z], axis=-1).reshape(-1, 3)
    R = extrinsic_w2c[:3, :3]
    t = extrinsic_w2c[:3, 3]
    return _mm(pts_cam - t, R)  # R.T @ (p - t), row-vector form


def world_to_canonical(xyz: jnp.ndarray, bounds) -> jnp.ndarray:
    """Map world xyz into [0,1]^3 of the workspace bounding box.

    Parity with `world_to_canonical` (models_embed.py:147-165 / graphics_utils.py:82).
    bounds = [xmin, ymin, zmin, xmax, ymax, zmax].
    """
    bounds = jnp.asarray(bounds, dtype=xyz.dtype)
    bb_min, bb_max = bounds[:3], bounds[3:]
    return (xyz - bb_min) / (bb_max - bb_min)


def canonical_to_world(xyz: jnp.ndarray, bounds) -> jnp.ndarray:
    bounds = jnp.asarray(bounds, dtype=xyz.dtype)
    bb_min, bb_max = bounds[:3], bounds[3:]
    return xyz * (bb_max - bb_min) + bb_min
