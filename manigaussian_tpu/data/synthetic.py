"""Synthetic stored-demo fixture generator (no CoppeliaSim dependency).

Builds fake-but-well-formed task datasets in the exact on-disk episode format
(data/episode.py) so the entire train stack — replay fill, keypoint discovery,
nerf-view sampling, camera parsing, voxelization — runs in CI and benchmarks.
Replaces the reference's RLBench demo generation
(`tools/nerf_dataset_generator.py` + `NeRFTaskRecorder`, SURVEY.md §3.4) for
testing purposes; geometry is a colored blob scene with a moving 'gripper'.
"""

from __future__ import annotations

import numpy as np

from manigaussian_tpu.data import episode as ep

SCENE_BOUNDS = (-0.3, -0.5, 0.6, 0.7, 0.5, 1.6)


def _look_at(eye, target, up=(0.0, 0.0, 1.0)):
    """c2w pose with +z forward (OpenCV convention, matches RLBench cameras)."""
    eye, target = np.asarray(eye, np.float64), np.asarray(target, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
    return c2w.astype(np.float32)


def _intrinsics(h, w, focal):
    return np.array([[focal, 0, w / 2.0], [0, focal, h / 2.0], [0, 0, 1.0]],
                    np.float32)


def generate_task(root: str, task: str, num_episodes: int = 2,
                  timesteps: int = 24, h: int = 32, w: int = 32,
                  nerf_views: int = 5, nerf_hw: int = 32,
                  seed: int = 0, cameras=("front",)) -> None:
    rng = np.random.default_rng(seed)
    center = np.array([0.2, 0.0, 1.1], np.float32)

    for e in range(num_episodes):
        # gripper trajectory: start → grasp (close) → lift (open at end)
        t_axis = np.linspace(0, 1, timesteps)
        pos = center + np.stack([
            0.2 * np.cos(2 * np.pi * t_axis * 0.25 + e),
            0.2 * np.sin(2 * np.pi * t_axis * 0.25 + e),
            0.1 * t_axis], -1).astype(np.float32)
        quat = np.tile(np.array([0, 0, 0, 1.0], np.float32), (timesteps, 1))
        gripper_pose = np.concatenate([pos, quat], -1)
        gripper_open = np.ones(timesteps, np.float32)
        gripper_open[timesteps // 3: 2 * timesteps // 3] = 0.0
        joint_vel = rng.normal(0, 1.0, (timesteps, 7)).astype(np.float32)
        joint_vel[timesteps // 2] = 0.0  # one stopped keyframe
        grip_joints = np.tile(np.array([0.02, 0.02], np.float32), (timesteps, 1))
        ignore_coll = np.zeros(timesteps, np.float32)

        front_pose = _look_at(center + np.array([0.0, -0.8, 0.5]), center)
        intr = _intrinsics(h, w, focal=float(w))
        rgb = (rng.uniform(0, 120, (timesteps, h, w, 3))).astype(np.uint8)
        depth = rng.uniform(0.8, 1.2, (timesteps, h, w)).astype(np.float32)

        # Make the task LEARNABLE: paint a bright depth-consistent blob at the
        # NEXT keyframe's gripper position in every frame — unprojecting the
        # blob pixels reconstructs the BC translation target, so a trained
        # voxel policy can actually succeed in the mock env (without this the
        # observations are pure noise and 0% success is structural). The blob
        # COLOR encodes the next keyframe's gripper bit (white=open, red=
        # close): (time, proprio) alone don't determine the grip label for
        # start-augmented transitions, so without a visual cue the grip head
        # can only memorize — like a real scene, the object's appearance
        # signals grasp vs release.
        from manigaussian_tpu.data.keypoints import keypoint_discovery
        kps = keypoint_discovery(gripper_open, joint_vel)
        w2c = np.linalg.inv(front_pose)
        for t in range(timesteps):
            nxt = [k for k in kps if k > t]
            kp = nxt[0] if nxt else (kps[-1] if kps else -1)
            target = pos[kp]
            color = (np.array([255, 255, 255], np.uint8)
                     if gripper_open[kp] > 0.5
                     else np.array([255, 0, 0], np.uint8))
            xc = w2c[:3, :3] @ target + w2c[:3, 3]
            if xc[2] <= 0.05:
                continue
            u = int(intr[0, 0] * xc[0] / xc[2] + intr[0, 2])
            v = int(intr[1, 1] * xc[1] / xc[2] + intr[1, 2])
            u0, u1 = max(0, u - 1), min(w, u + 2)
            v0, v1 = max(0, v - 1), min(h, v + 2)
            if u0 < u1 and v0 < v1:
                depth[t, v0:v1, u0:u1] = xc[2]
                rgb[t, v0:v1, u0:u1] = color

        nerf = {}
        for t in range(timesteps - 1):  # last step has no nerf data (reference)
            views_rgb = rng.uniform(0, 255, (nerf_views, nerf_hw, nerf_hw, 3)
                                    ).astype(np.uint8)
            views_depth = rng.uniform(0, 200, (nerf_views, nerf_hw, nerf_hw)
                                      ).astype(np.float32)
            extrs, intrs = [], []
            for v in range(nerf_views):
                ang = 2 * np.pi * v / nerf_views
                eye = center + np.array([0.8 * np.cos(ang), 0.8 * np.sin(ang), 0.6])
                extrs.append(_look_at(eye, center))
                intrs.append(_intrinsics(nerf_hw, nerf_hw, float(nerf_hw)))
            nerf[t] = (views_rgb, views_depth, np.stack(extrs), np.stack(intrs))

        ep.write_episode(
            root, task, e,
            rgb={c: rgb for c in cameras},
            depth={c: depth for c in cameras},
            low_dim=dict(
                gripper_open=gripper_open, gripper_pose=gripper_pose,
                gripper_joint_positions=grip_joints,
                joint_velocities=joint_vel, ignore_collisions=ignore_coll),
            camera_extrinsics={c: np.tile(front_pose, (timesteps, 1, 1))
                               for c in cameras},
            camera_intrinsics={c: np.tile(intr, (timesteps, 1, 1))
                               for c in cameras},
            descriptions=[f"{task.replace('_', ' ')} demo"],
            nerf_views=nerf)
