"""SE(3) scene/action augmentation for behavior cloning, pure-jax and jit-safe.

Parity target: `voxel/augmentation.py:133-416` (apply_se3_augmentation[_with_camera_pose]):
  * random bounded translation (fraction of scene extent per axis) + discretized
    euler rotation (±range at `rot_aug_resolution`° steps) about the keyframe
    gripper position,
  * the gripper pose is right-multiplied by the rotation (R_a @ R_s) and shifted;
    points/cameras rotate by R_sᵀ about the gripper origin (the reference's
    row-vector bmm convention, augmentation.py:45-47) and the new origin is clamped
    into the scene bounds,
  * the perturbed action is re-discretized (voxel index + euler bins); attempts
    whose voxel index leaves the grid are rejected and resampled, up to 10 tries,
    then fall back to the unperturbed data (augmentation.py:181-189).

TPU-native redesign: the reference's data-dependent retry loop (host numpy +
scipy round-trips per attempt) becomes K=10 pre-sampled perturbations per batch
element with a masked first-valid selection — one fused compiled region, no host
sync. Per-ELEMENT selection (the reference retries the whole batch jointly) is an
equivalent distribution at bs=1 and strictly fewer fallbacks at bs>1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from manigaussian_tpu.ops import rotation as rot

MAX_ATTEMPTS = 10


class AugmentOutput(NamedTuple):
    action_trans: jnp.ndarray      # [B, 3] int32 voxel indices
    action_rot_grip: jnp.ndarray   # [B, 4] int32 (euler bins ×3, grip)
    pcd: jnp.ndarray               # [B, ..., 3] perturbed points
    camera_pose: jnp.ndarray | None  # [B, n_cam, 4, 4] perturbed c2w extrinsics


def _unclamped_voxel_index(point, bounds, voxel_size):
    """floor index, top-clamped only (helpers/utils.py:81-93): negatives stay
    negative so out-of-bounds perturbations are detectable."""
    bb_min = bounds[..., :3]
    res = (bounds[..., 3:] - bb_min) / (voxel_size + 1e-12)
    idx = jnp.floor((point - bb_min) / (res + 1e-12)).astype(jnp.int32)
    return jnp.minimum(idx, voxel_size - 1)


def apply_se3_augmentation(key: jax.Array,
                           pcd: jnp.ndarray,
                           action_gripper_pose: jnp.ndarray,
                           action_trans: jnp.ndarray,
                           action_rot_grip: jnp.ndarray,
                           bounds: jnp.ndarray,
                           trans_aug_range=(0.125, 0.125, 0.125),
                           rot_aug_range=(0.0, 0.0, 45.0),
                           rot_aug_resolution: float = 5.0,
                           voxel_size: int = 100,
                           rot_resolution: float = 5.0,
                           camera_pose: jnp.ndarray | None = None) -> AugmentOutput:
    """
    Args:
      key: PRNG key.
      pcd: [B, ..., 3] world points (any middle shape; flattened internally).
      action_gripper_pose: [B, 7] gripper keyframe pose (xyz + quat xyzw).
      action_trans: [B, 3] int discretized translation action.
      action_rot_grip: [B, 4] int (rx, ry, rz bins, grip).
      bounds: [6] or [B, 6] scene bounds.
      camera_pose: optional [B, n_cam, 4, 4] c2w extrinsics to co-perturb.
    """
    b = action_gripper_pose.shape[0]
    bounds = jnp.broadcast_to(jnp.asarray(bounds, jnp.float32).reshape(-1, 6), (b, 6))
    trans_aug_range = jnp.asarray(trans_aug_range, jnp.float32)

    k_trans, k_rot = jax.random.split(key)
    # K pre-sampled attempts (replaces the host retry loop)
    trans_range = (bounds[:, 3:] - bounds[:, :3]) * trans_aug_range  # [B, 3]
    trans_shift = trans_range[None] * jax.random.uniform(
        k_trans, (MAX_ATTEMPTS, b, 3), minval=-1.0, maxval=1.0)

    steps = jnp.asarray([int(r // rot_aug_resolution) for r in rot_aug_range])
    rot_steps = jax.random.randint(
        k_rot, (MAX_ATTEMPTS, b, 3), -steps, steps + 1)  # zero-range axes → 0
    euler = rot_steps.astype(jnp.float32) * jnp.radians(rot_aug_resolution)
    rot_shift = rot.euler_to_matrix(euler, "XYZ")        # [K, B, 3, 3]

    # keyframe gripper 4x4
    grip_R = rot.quat_wxyz_to_matrix(
        rot.quat_xyzw_to_wxyz(action_gripper_pose[:, 3:7]))
    grip_t = action_gripper_pose[:, :3]                  # [B, 3]

    # perturbed gripper: R_a @ R_s, t_a + t_shift (augmentation.py:216-218)
    pert_R = jnp.einsum("bij,kbjl->kbil", grip_R, rot_shift)
    pert_t = grip_t[None] + trans_shift                  # [K, B, 3]

    trans_idx = _unclamped_voxel_index(pert_t, bounds[None], voxel_size)  # [K,B,3]
    valid = jnp.all(trans_idx >= 0, axis=-1)             # [K, B]

    first = jnp.argmax(valid, axis=0)                    # [B]
    any_valid = jnp.any(valid, axis=0)                   # [B]

    def pick(x):  # [K, B, ...] → [B, ...]
        return jnp.take_along_axis(
            x, first.reshape((1, b) + (1,) * (x.ndim - 2)), axis=0)[0]

    sel_R = jnp.where(any_valid[:, None, None], pick(rot_shift),
                      jnp.eye(3)[None])                  # [B, 3, 3]
    sel_shift = jnp.where(any_valid[:, None], pick(trans_shift), 0.0)
    sel_pert_R = pick(pert_R)
    sel_trans_idx = pick(trans_idx)

    # re-discretized rotation bins of the perturbed gripper orientation
    quat_xyzw = rot.quat_wxyz_to_xyzw(rot.matrix_to_quat_wxyz(sel_pert_R))
    # scipy convention: flip so qw >= 0 (augmentation.py:230-232)
    quat_xyzw = jnp.where(quat_xyzw[:, 3:4] < 0, -quat_xyzw, quat_xyzw)
    rot_bins = rot.quaternion_to_discrete_euler(quat_xyzw, rot_resolution)

    new_action_trans = jnp.where(any_valid[:, None], sel_trans_idx,
                                 action_trans.astype(jnp.int32))
    new_rot_grip = jnp.concatenate(
        [jnp.where(any_valid[:, None], rot_bins, action_rot_grip[:, :3].astype(jnp.int32)),
         action_rot_grip[:, 3:4].astype(jnp.int32)], axis=-1)

    # clamped new origin (augmentation.py:49-66)
    lo = jnp.array([jnp.min(bounds[:, 0]), jnp.min(bounds[:, 1]), jnp.min(bounds[:, 2])])
    hi = jnp.array([jnp.max(bounds[:, 3]), jnp.max(bounds[:, 4]), jnp.max(bounds[:, 5])])
    new_origin = jnp.clip(grip_t + sel_shift, lo, hi)    # [B, 3]

    # perturb points: x' = R_sᵀ (x - t_a) + new_origin (row-vector bmm parity)
    lead = pcd.shape
    flat = pcd.reshape(b, -1, 3)
    centered = flat - grip_t[:, None, :]
    rotated = jnp.einsum("bnj,bji->bni", centered, sel_R)  # x @ R == Rᵀ x
    new_pcd = (rotated + new_origin[:, None, :]).reshape(lead)

    new_cam = None
    if camera_pose is not None:
        cam_R = camera_pose[..., :3, :3]                  # [B, C, 3, 3]
        cam_t = camera_pose[..., :3, 3]
        new_cam_t = jnp.einsum("bcj,bji->bci", cam_t - grip_t[:, None], sel_R) \
            + new_origin[:, None]
        # cam_R' = R_sᵀ @ cam_R (augmentation.py:104 row-vector form)
        new_cam_R = jnp.einsum("bji,bcjk->bcik", sel_R, cam_R)
        new_cam = camera_pose.at[..., :3, :3].set(new_cam_R)
        new_cam = new_cam.at[..., :3, 3].set(new_cam_t)

    return AugmentOutput(new_action_trans, new_rot_grip, new_pcd, new_cam)
