"""Rotation conversions: quaternion / euler / matrix, plus the discrete-euler action
codec used by the Q-attention policy.

Parity targets:
  * `helpers/utils.py:50-79` — normalize_quaternion, quaternion_to_discrete_euler
    (scipy extrinsic-'xyz' degrees + 180 offset, rounded at `resolution`°, 360→0),
    discrete_euler_to_quaternion.
  * pytorch3d `euler_angles_to_matrix(..., "XYZ")` / `matrix_to_quaternion` as used by
    `voxel/augmentation.py:211-224` for the SE(3) perturbation.

All functions are pure jnp, batched over leading dims, jit/vmap-safe (branch-free).
Quaternions: `_wxyz` suffix = scalar-first (pytorch3d), `_xyzw` = scalar-last
(scipy/RLBench gripper poses).
"""

from __future__ import annotations

import jax.numpy as jnp

from manigaussian_tpu.ops.gaussian_math import quat_to_rotmat as quat_wxyz_to_matrix


def normalize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_xyzw_to_wxyz(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q[..., 3:4], q[..., :3]], axis=-1)


def quat_wxyz_to_xyzw(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def _axis_rot(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        rows = [o, z, z, z, c, -s, z, s, c]
    elif axis == "Y":
        rows = [c, z, s, z, o, z, -s, z, c]
    else:
        rows = [c, -s, z, s, c, z, z, z, o]
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_to_matrix(euler: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """pytorch3d-compatible: R = R_c0(e0) @ R_c1(e1) @ R_c2(e2) (intrinsic).

    euler: [..., 3] radians.
    """
    R = _axis_rot(convention[0], euler[..., 0])
    for i in (1, 2):
        R = jnp.matmul(R, _axis_rot(convention[i], euler[..., i]))
    return R


def matrix_to_quat_wxyz(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix → unit quaternion (w, x, y, z), branch-free.

    Uses the numerically-stable variant: compute all four candidate forms and pick
    the one keyed to the largest of (trace, R00, R11, R22) with jnp.where — no
    data-dependent control flow, so it vmaps/jits cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # case 0: trace dominant
    q0 = jnp.stack([safe_sqrt(1.0 + tr),
                    (m21 - m12) / safe_sqrt(1.0 + tr),
                    (m02 - m20) / safe_sqrt(1.0 + tr),
                    (m10 - m01) / safe_sqrt(1.0 + tr)], axis=-1) * 0.5
    # case 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22)
    q1 = jnp.stack([(m21 - m12) / s1, s1, (m01 + m10) / s1, (m02 + m20) / s1],
                   axis=-1) * 0.5
    # case 2: m11 dominant
    s2 = safe_sqrt(1.0 - m00 + m11 - m22)
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, s2, (m12 + m21) / s2],
                   axis=-1) * 0.5
    # case 3: m22 dominant
    s3 = safe_sqrt(1.0 - m00 - m11 + m22)
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, s3],
                   axis=-1) * 0.5

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(cond0[..., None], q0,
                  jnp.where(cond1[..., None], q1,
                            jnp.where(cond2[..., None], q2, q3)))
    return normalize_quaternion(q)


def matrix_to_euler_xyz_extrinsic(R: jnp.ndarray) -> jnp.ndarray:
    """Extract (a, b, c) with R = Rz(c) @ Ry(b) @ Rx(a) — scipy's 'xyz' (extrinsic),
    the convention of quaternion_to_discrete_euler (helpers/utils.py:68-73)."""
    b = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    a = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    c = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def euler_xyz_extrinsic_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """R = Rz(e2) @ Ry(e1) @ Rx(e0) (scipy 'xyz' extrinsic)."""
    return jnp.matmul(_axis_rot("Z", euler[..., 2]),
                      jnp.matmul(_axis_rot("Y", euler[..., 1]),
                                 _axis_rot("X", euler[..., 0])))


def quaternion_to_discrete_euler(quat_xyzw: jnp.ndarray,
                                 resolution: float) -> jnp.ndarray:
    """Quaternion → discretized euler bin indices in [0, 360/res).

    Parity: helpers/utils.py:68-73 (scipy as_euler('xyz', degrees=True) + 180,
    rounded, 360-bin wraps to 0).
    """
    R = quat_wxyz_to_matrix(quat_xyzw_to_wxyz(normalize_quaternion(quat_xyzw)))
    euler_deg = jnp.degrees(matrix_to_euler_xyz_extrinsic(R)) + 180.0
    disc = jnp.round(euler_deg / resolution).astype(jnp.int32)
    nbins = int(360 / resolution)
    return jnp.where(disc == nbins, 0, disc)


def discrete_euler_to_quaternion(disc: jnp.ndarray,
                                 resolution: float) -> jnp.ndarray:
    """Inverse codec → quaternion xyzw (helpers/utils.py:76-78)."""
    euler = jnp.radians(disc.astype(jnp.float32) * resolution - 180.0)
    R = euler_xyz_extrinsic_to_matrix(euler)
    return quat_wxyz_to_xyzw(matrix_to_quat_wxyz(R))
