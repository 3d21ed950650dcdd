"""Per-Gaussian math: quaternion→rotation, 3D/2D covariance (EWA), spherical
harmonics, and the full per-Gaussian "preprocess" step of the splat renderer.

Behavioral parity targets:
  - reference CUDA `cuda_rasterizer/forward.cu:21-153` (computeColorFromSH,
    computeCov2D, computeCov3D) and `forward.cu:155-257` (preprocessCUDA)
  - reference `cuda_rasterizer/auxiliary.h:41-56` (ndc2Pix, getRect)

Everything is expressed as vectorized jnp over the N-Gaussian axis — the per-thread
CUDA loop becomes one fused XLA computation. All functions are fp32: splat geometry
is precision-sensitive (conic inversions, tiny determinants).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

# Spherical-harmonics constants (auxiliary.h:22-39)
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)

# Numerical guards, identical to the reference kernels.
NEAR_CULL_Z = 0.2          # in_frustum: p_view.z <= 0.2 culls (auxiliary.h:152)
HOM_EPS = 1e-7             # p_w = 1/(p_hom.w + 1e-7) (forward.cu:200)
COV2D_LOWPASS = 0.3        # +0.3 on cov2d diagonal (forward.cu:111-112)
FOV_CLAMP = 1.3            # 1.3*tanfov clamp in EWA (forward.cu:83-88)
EIG_FLOOR = 0.1            # sqrt(max(0.1, ...)) eigenvalue floor (forward.cu:231-232)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) → 3x3 rotation matrix, batched over leading dims.

    NOTE: like the reference (forward.cu:128, normalization commented out there and
    done by the caller's activation), q is assumed already normalized.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return R.reshape(q.shape[:-1] + (3, 3))


def build_cov3d(scale: jnp.ndarray, q: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space covariance Σ = R S² Rᵀ, returned as the symmetric upper triangle
    [σxx, σxy, σxz, σyy, σyz, σzz]. Parity: computeCov3D (forward.cu:119-153).

    scale: [..., 3], q: [..., 4] (w, x, y, z)
    """
    R = quat_to_rotmat(q)                              # [..., 3, 3]
    s2 = jnp.square(scale * scale_modifier)            # [..., 3]
    # Σ = R diag(s²) Rᵀ, unrolled to elementwise VPU math — batched 3×3
    # einsums lower poorly on TPU (measured ~4x slower than the scalar form)
    r0, r1, r2 = R[..., 0, :], R[..., 1, :], R[..., 2, :]   # rows, [..., 3]
    w0, w1, w2 = r0 * s2, r1 * s2, r2 * s2
    return jnp.stack([
        jnp.sum(w0 * r0, -1), jnp.sum(w0 * r1, -1), jnp.sum(w0 * r2, -1),
        jnp.sum(w1 * r1, -1), jnp.sum(w1 * r2, -1), jnp.sum(w2 * r2, -1),
    ], axis=-1)


def cov3d_to_matrix(cov6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] upper triangle → [..., 3, 3] symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ], axis=-2)


def project_cov2d(mean_view: jnp.ndarray, cov3d6: jnp.ndarray,
                  view_rot: jnp.ndarray, focal_x, focal_y,
                  tan_fovx, tan_fovy) -> jnp.ndarray:
    """EWA projection of the 3D covariance to a 2D screen covariance (+low-pass).

    Parity: computeCov2D (forward.cu:75-114), including the 1.3·tanfov clamp of the
    view-space mean and the +0.3 diagonal low-pass.

    mean_view: [..., 3] gaussian mean in CAMERA space
    view_rot:  [3, 3]   world→camera rotation (V[:3,:3])
    Returns [..., 3]: (cov_xx, cov_xy, cov_yy)
    """
    tz = mean_view[..., 2]
    limx = FOV_CLAMP * tan_fovx
    limy = FOV_CLAMP * tan_fovy
    tx = jnp.clip(mean_view[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(mean_view[..., 1] / tz, -limy, limy) * tz

    # T = J @ W: each row of J has only 2 nonzeros → unrolled elementwise math
    # (batched tiny einsums lower poorly on TPU).
    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz2

    W = view_rot                                       # [3, 3] (constants)
    # rows of T = J @ W:  t0 = j00*W[0] + j02*W[2];  t1 = j11*W[1] + j12*W[2]
    t0 = j00[..., None] * W[0] + j02[..., None] * W[2]     # [..., 3]
    t1 = j11[..., None] * W[1] + j12[..., None] * W[2]     # [..., 3]

    # cov2d = T Σ Tᵀ with Σ from the packed upper triangle
    xx, xy, xz, yy, yz, zz = (cov3d6[..., i] for i in range(6))

    def sig_dot(v):  # Σ @ v for row-vector v = [..., 3]
        return jnp.stack([
            xx * v[..., 0] + xy * v[..., 1] + xz * v[..., 2],
            xy * v[..., 0] + yy * v[..., 1] + yz * v[..., 2],
            xz * v[..., 0] + yz * v[..., 1] + zz * v[..., 2],
        ], axis=-1)

    s0 = sig_dot(t0)
    s1 = sig_dot(t1)
    c00 = jnp.sum(t0 * s0, -1)
    c01 = jnp.sum(t0 * s1, -1)
    c11 = jnp.sum(t1 * s1, -1)
    return jnp.stack([c00 + COV2D_LOWPASS, c01, c11 + COV2D_LOWPASS], axis=-1)


def eval_sh(sh: jnp.ndarray, deg: int, dirs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate real SH at unit directions and clamp to ≥0.

    Parity: computeColorFromSH (forward.cu:21-72) — includes the +0.5 offset and
    the max(·, 0) clamp whose mask gates gradients in the reference backward.

    sh:   [..., (deg+1)^2, 3]
    dirs: [..., 3] (unnormalized; normalized here like the reference)
    Returns (rgb [..., 3], clamped_mask [..., 3]).
    """
    # guard: a regressed gaussian can land arbitrarily close to the camera
    # center; an unguarded normalize emits inf jacobians there (CUDA divides
    # unguarded too, forward.cu:29 — degenerate only in that measure-zero case)
    dirn = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    x, y, z = dirn[..., 0:1], dirn[..., 1:2], dirn[..., 2:3]

    result = SH_C0 * sh[..., 0, :]
    if deg > 0:
        result = (result - SH_C1 * y * sh[..., 1, :] + SH_C1 * z * sh[..., 2, :]
                  - SH_C1 * x * sh[..., 3, :])
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + SH_C2[0] * xy * sh[..., 4, :]
                      + SH_C2[1] * yz * sh[..., 5, :]
                      + SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                      + SH_C2[3] * xz * sh[..., 7, :]
                      + SH_C2[4] * (xx - yy) * sh[..., 8, :])
            if deg > 2:
                result = (result
                          + SH_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                          + SH_C3[1] * xy * z * sh[..., 10, :]
                          + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                          + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                          + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                          + SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
                          + SH_C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :])
    result = result + 0.5
    clamped = result < 0.0
    return jnp.maximum(result, 0.0), clamped


def ndc2pix(v: jnp.ndarray, size) -> jnp.ndarray:
    """NDC [-1,1] → continuous pixel coordinate (auxiliary.h:41-44)."""
    return ((v + 1.0) * size - 1.0) * 0.5


class ProjectedGaussians(NamedTuple):
    """Output of `preprocess`: everything the blend stage needs, all [N, ...]."""

    means2d: jnp.ndarray       # [N, 2] pixel-space centers
    depths: jnp.ndarray        # [N] view-space z
    conic: jnp.ndarray         # [N, 3] inverse 2D covariance (a, b, c)
    opacity: jnp.ndarray       # [N]
    radii: jnp.ndarray         # [N] int32 screen-space 3σ radius (0 = culled)
    rgb: jnp.ndarray           # [N, 3] SH-evaluated color (or precomputed)
    rect_min: jnp.ndarray      # [N, 2] int32 tile rect (x, y), inclusive
    rect_max: jnp.ndarray      # [N, 2] int32 tile rect (x, y), exclusive
    valid: jnp.ndarray         # [N] bool — survived cull + det + rect tests
    tiles_touched: jnp.ndarray # [N] int32 rect area (0 if culled)


def get_rect(point_image: jnp.ndarray, radius: jnp.ndarray,
             tiles_x: int, tiles_y: int, tile: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tile-rect bounds of a splat (auxiliary.h:46-56). radius in pixels."""
    rmin_x = jnp.clip(((point_image[..., 0] - radius) / tile).astype(jnp.int32), 0, tiles_x)
    rmin_y = jnp.clip(((point_image[..., 1] - radius) / tile).astype(jnp.int32), 0, tiles_y)
    rmax_x = jnp.clip(((point_image[..., 0] + radius + tile - 1) / tile).astype(jnp.int32), 0, tiles_x)
    rmax_y = jnp.clip(((point_image[..., 1] + radius + tile - 1) / tile).astype(jnp.int32), 0, tiles_y)
    return (jnp.stack([rmin_x, rmin_y], axis=-1),
            jnp.stack([rmax_x, rmax_y], axis=-1))


def preprocess(means3d: jnp.ndarray,
               opacities: jnp.ndarray,
               camera,
               width: int, height: int, tile: int,
               scales: jnp.ndarray | None = None,
               rotations: jnp.ndarray | None = None,
               cov3d_precomp: jnp.ndarray | None = None,
               shs: jnp.ndarray | None = None,
               colors_precomp: jnp.ndarray | None = None,
               sh_degree: int = 1,
               scale_modifier: float = 1.0) -> ProjectedGaussians:
    """Vectorized per-Gaussian preprocess. Parity: preprocessCUDA (forward.cu:155-257).

    camera: ops.camera.Camera (single view).
    """
    N = means3d.shape[0]
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile

    ones = jnp.ones((N, 1), dtype=means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=-1)

    # row-vector convention: p @ M (transposed matrices, see ops/camera.py)
    p_view = jnp.matmul(hom, camera.world_view_transform[:, :3],
                        precision=_HI)                           # [N, 3]
    p_hom = jnp.matmul(hom, camera.full_proj_transform, precision=_HI)  # [N, 4]
    in_front = p_view[:, 2] > NEAR_CULL_Z
    # (same NaN-guard rationale as below: culled points can have w ~ 0)
    hom_w_safe = jnp.where(in_front, p_hom[:, 3], 1.0)
    p_w = 1.0 / (hom_w_safe + HOM_EPS)
    p_proj = p_hom[:, :3] * p_w[:, None]

    if cov3d_precomp is None:
        cov3d6 = build_cov3d(scales, rotations, scale_modifier)
    else:
        cov3d6 = cov3d_precomp

    focal_x = width / (2.0 * camera.tan_fovx)
    focal_y = height / (2.0 * camera.tan_fovy)
    # Guard culled gaussians against divide-by-(z<=0): NaNs inside a jnp.where still
    # poison gradients, so substitute a safe z before the EWA projection.
    p_view_safe = jnp.where(in_front[:, None], p_view,
                            jnp.array([0.0, 0.0, 1.0], dtype=p_view.dtype))
    cov2d = project_cov2d(p_view_safe, cov3d6, camera.world_view_transform[:3, :3].T,
                          focal_x, focal_y, camera.tan_fovx, camera.tan_fovy)

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    det_inv = 1.0 / det_safe
    conic = jnp.stack([cov2d[:, 2] * det_inv,
                       -cov2d[:, 1] * det_inv,
                       cov2d[:, 0] * det_inv], axis=-1)

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    disc = jnp.sqrt(jnp.maximum(EIG_FLOOR, mid * mid - det))
    lambda1 = mid + disc
    lambda2 = mid - disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, lambda2)))

    point_image = jnp.stack([ndc2pix(p_proj[:, 0], width),
                             ndc2pix(p_proj[:, 1], height)], axis=-1)
    rect_min, rect_max = get_rect(point_image, radius_f, tiles_x, tiles_y, tile)
    rect_area = ((rect_max[:, 0] - rect_min[:, 0])
                 * (rect_max[:, 1] - rect_min[:, 1]))
    rect_ok = rect_area > 0

    valid = in_front & det_ok & rect_ok

    if colors_precomp is None:
        view_dirs = means3d - camera.camera_center
        rgb, _clamped = eval_sh(shs, sh_degree, view_dirs)
    else:
        rgb = colors_precomp

    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid, rect_area, 0).astype(jnp.int32)

    return ProjectedGaussians(
        means2d=point_image,
        depths=p_view[:, 2],
        conic=conic,
        opacity=opacities.reshape(N),
        radii=radii,
        rgb=rgb,
        rect_min=rect_min,
        rect_max=rect_max,
        valid=valid,
        tiles_touched=tiles_touched,
    )
