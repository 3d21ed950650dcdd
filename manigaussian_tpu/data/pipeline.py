"""Host data pipeline: stored demos → keyframe transitions → device batches.

Parity targets:
  * replay fill: `agents/manigaussian_bc/launch_utils.py:191-330`
    (fill_replay / _add_keypoints_to_replay / _get_action) — start-point demo
    augmentation every N steps, keyframe trimming, per-keyframe action
    discretization, language embedding attached per transition;
  * batch assembly: `qattention_manigaussian_bc_agent.py:680-739` — random
    nerf view selection with the user-view interval subsampling, camera txt
    parsing, RGB [0,1] — but executed in a background PREFETCH thread, not
    inside the train step (SURVEY.md §7 hard part 4).

The transition stores image PATHS (like the reference replay) and the assembler
unprojects depth → point cloud at load time using the exact depth2pc convention
(ops/camera.depth_to_pointcloud, graphics_utils.py:56-78).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
from scipy.spatial.transform import Rotation as ScipyRotation

from manigaussian_tpu.data import episode as ep
from manigaussian_tpu.data.keypoints import keypoint_discovery
from manigaussian_tpu.data.language import LanguageModel
from manigaussian_tpu.data.replay import (TaskUniformReplay, Transition,
                                          stack_transitions)

REWARD_SCALE = 100.0


# --------------------------------------------------------------------- actions
def point_to_voxel_index_np(point, voxel_size, bounds):
    """helpers/utils.py:81-93 numpy parity (top-clamped floor index)."""
    bb_mins = np.array(bounds[0:3])
    bb_maxs = np.array(bounds[3:])
    res = (bb_maxs - bb_mins) / (np.array([voxel_size] * 3) + 1e-12)
    return np.minimum(np.floor((point - bb_mins) / (res + 1e-12)).astype(np.int32),
                      voxel_size - 1)


def quaternion_to_discrete_euler_np(quat_xyzw, resolution):
    """helpers/utils.py:68-73 (scipy path, exact)."""
    euler = ScipyRotation.from_quat(quat_xyzw).as_euler("xyz", degrees=True) + 180
    disc = np.around(euler / resolution).astype(np.int32)
    disc[disc == int(360 / resolution)] = 0
    return disc


def get_action(demo: ep.EpisodeData, keypoint: int, scene_bounds,
               voxel_size: int, rotation_resolution: int):
    """launch_utils._get_action (:148-188) on array episodes."""
    pose = demo.gripper_pose[keypoint]
    quat = pose[3:7] / np.linalg.norm(pose[3:7])
    if quat[-1] < 0:
        quat = -quat
    disc_rot = quaternion_to_discrete_euler_np(quat, rotation_resolution)
    trans_idx = point_to_voxel_index_np(pose[:3], voxel_size, scene_bounds)
    grip = float(demo.gripper_open[keypoint])
    ignore_collisions = int(demo.ignore_collisions[max(0, keypoint - 1)])
    action = np.concatenate([pose, [grip]]).astype(np.float32)
    rot_grip = np.concatenate([disc_rot, [int(grip)]]).astype(np.int32)
    return (trans_idx.astype(np.int32), rot_grip,
            np.array([ignore_collisions], np.int32), action)


# ----------------------------------------------------------------- replay fill
def make_transition(demo: ep.EpisodeData, t: int, keypoint: int, k_index: int,
                    cameras: Sequence[str], scene_bounds, voxel_size: int,
                    rotation_resolution: int, episode_length: int,
                    description: str, lang: LanguageModel,
                    next_t: Optional[int], task: str,
                    terminal: bool) -> Transition:
    trans_idx, rot_grip, ignore_coll, action = get_action(
        demo, keypoint, scene_bounds, voxel_size, rotation_resolution)
    sent, toks = lang.encode(description)

    # 4-d proprio + normalized time (helpers/utils.py:357-390)
    time_v = (1.0 - (k_index / float(episode_length - 1))) * 2.0 - 1.0
    low_dim = np.array([
        demo.gripper_open[t],
        *np.clip(demo.gripper_joint_positions[t], 0.0, 0.04),
        time_v], np.float32)

    tr: Transition = {
        "task": task,
        "lang_goal": description,
        "low_dim_state": low_dim,
        "trans_action_indicies": trans_idx,
        "rot_grip_action_indicies": rot_grip,
        "ignore_collisions": ignore_coll,
        "gripper_pose": demo.gripper_pose[keypoint].astype(np.float32),
        "action": action,
        "reward": np.float32(REWARD_SCALE if terminal else 0.0),
        "terminal": np.bool_(terminal),
        "lang_goal_emb": sent,
        "lang_token_embs": toks,
        "rgb_paths": np.array([demo.rgb_paths[c][t] for c in cameras],
                              dtype=object),
        "depth_paths": np.array([demo.depth_paths[c][t] for c in cameras],
                                dtype=object),
        "camera_extrinsics": np.stack(
            [demo.camera_extrinsics[c][t] for c in cameras]).astype(np.float32),
        "camera_intrinsics": np.stack(
            [demo.camera_intrinsics[c][t] for c in cameras]).astype(np.float32),
        "nerf_multi_view_rgb": demo.nerf_rgb_paths[t],
        "nerf_multi_view_depth": demo.nerf_depth_paths[t],
        "nerf_multi_view_camera": demo.nerf_camera_paths[t],
    }
    nt = next_t if next_t is not None else t
    tr["nerf_next_multi_view_rgb"] = demo.nerf_rgb_paths[nt]
    tr["nerf_next_multi_view_depth"] = demo.nerf_depth_paths[nt]
    tr["nerf_next_multi_view_camera"] = demo.nerf_camera_paths[nt]
    return tr


def fill_replay(replay: TaskUniformReplay, root: str, task: str,
                num_demos: int, cameras: Sequence[str], scene_bounds,
                voxel_size: int, rotation_resolution: int,
                episode_length: int, lang: LanguageModel,
                demo_augmentation: bool = True,
                demo_augmentation_every_n: int = 10,
                keypoint_method: str = "heuristic") -> int:
    """fill_replay parity (launch_utils.py:270-330). Returns #transitions."""
    count = 0
    paths = ep.list_episodes(root, task)[:num_demos]
    for ep_path in paths:
        demo = ep.load_episode(ep_path, cameras)
        keypoints_all = keypoint_discovery(
            demo.gripper_open, demo.joint_velocities, method=keypoint_method)
        desc = demo.descriptions[0]
        for i in range(len(demo) - 1):
            if not demo_augmentation and i > 0:
                break
            if i % demo_augmentation_every_n != 0:
                continue
            keypoints = [k for k in keypoints_all if i < k]
            if not keypoints:
                break
            t = i
            for k_idx, kp in enumerate(keypoints):
                terminal = k_idx == len(keypoints) - 1
                next_t = kp if not terminal else max(0, kp - 1)
                replay.add(task, make_transition(
                    demo, t, kp, k_idx, cameras, scene_bounds, voxel_size,
                    rotation_resolution, episode_length, desc, lang,
                    next_t, task, terminal))
                count += 1
                t = kp
    return count


# -------------------------------------------------------------- batch assembly
def _select_view(paths_rgb, paths_depth, paths_cam, num_view_by_user: int,
                 rng: np.random.Generator):
    """Random target view with interval subsampling (qattention:694-713)."""
    num_view = len(paths_rgb)
    interval = max(1, num_view // min(num_view_by_user, num_view))
    sub = list(range(0, num_view, interval))[:num_view_by_user]
    vi = sub[rng.integers(len(sub))]
    return paths_rgb[vi], paths_depth[vi], paths_cam[vi]


def assemble_batch(transitions: List[Transition], rng: np.random.Generator,
                   num_view_for_nerf: int = 20,
                   load_nerf_targets: bool = True,
                   embed_fn=None) -> Dict[str, np.ndarray]:
    """Transitions → numpy batch matching the agent.update schema."""
    from manigaussian_tpu.ops.camera import depth_to_pointcloud
    import jax.numpy as jnp

    stacked = stack_transitions(transitions)
    b = len(transitions)

    rgbs, pcds = [], []
    for tr in transitions:
        cam_rgb, cam_pcd = [], []
        for ci in range(len(tr["rgb_paths"])):
            rgb = ep.load_image(tr["rgb_paths"][ci])
            depth = ep.load_depth(tr["depth_paths"][ci])
            extr_c2w = tr["camera_extrinsics"][ci]
            intr = tr["camera_intrinsics"][ci]
            pcd = np.asarray(depth_to_pointcloud(
                jnp.asarray(depth), jnp.asarray(np.linalg.inv(extr_c2w)),
                jnp.asarray(intr))).reshape(depth.shape[0], depth.shape[1], 3)
            cam_rgb.append(rgb)
            cam_pcd.append(pcd)
        rgbs.append(np.stack(cam_rgb))
        pcds.append(np.stack(cam_pcd))

    batch: Dict[str, np.ndarray] = {
        "rgb": np.stack(rgbs).astype(np.float32),
        "pcd": np.stack(pcds).astype(np.float32),
        "low_dim_state": stacked["low_dim_state"],
        "lang_goal_emb": stacked["lang_goal_emb"],
        "lang_token_embs": stacked["lang_token_embs"],
        "trans_action_indicies": stacked["trans_action_indicies"],
        "rot_grip_action_indicies": stacked["rot_grip_action_indicies"],
        "ignore_collisions": stacked["ignore_collisions"],
        "gripper_pose": stacked["gripper_pose"],
        "action": stacked["action"],
        "camera_extrinsics": stacked["camera_extrinsics"],
    }

    if load_nerf_targets and transitions[0]["nerf_multi_view_rgb"] is not None:
        tgt_rgb, tgt_pose, tgt_intr = [], [], []
        nxt_rgb, nxt_pose, nxt_intr = [], [], []
        for tr in transitions:
            r, _d, c = _select_view(tr["nerf_multi_view_rgb"],
                                    tr["nerf_multi_view_depth"],
                                    tr["nerf_multi_view_camera"],
                                    num_view_for_nerf, rng)
            extr, intr, _f = ep.parse_camera_txt(c)
            tgt_rgb.append(ep.load_image(r))
            tgt_pose.append(extr)
            tgt_intr.append(intr)
            r2, _d2, c2 = _select_view(tr["nerf_next_multi_view_rgb"],
                                       tr["nerf_next_multi_view_depth"],
                                       tr["nerf_next_multi_view_camera"],
                                       num_view_for_nerf, rng)
            extr2, intr2, _ = ep.parse_camera_txt(c2)
            nxt_rgb.append(ep.load_image(r2))
            nxt_pose.append(extr2)
            nxt_intr.append(intr2)
        batch.update(
            nerf_target_rgb=np.stack(tgt_rgb),
            nerf_target_pose=np.stack(tgt_pose),
            nerf_target_intrinsic=np.stack(tgt_intr),
            nerf_next_target_rgb=np.stack(nxt_rgb),
            nerf_next_target_pose=np.stack(nxt_pose),
            nerf_next_target_intrinsic=np.stack(nxt_intr))
        if embed_fn is not None:
            # semantic GT: frozen features + PCA (neural_rendering.py:117-166),
            # computed in the prefetch thread — not inside the train step
            batch["gt_embed"] = np.asarray(embed_fn(batch["nerf_target_rgb"]))
    return batch


class BatchIterator:
    """Replay → assembled batches with background prefetch (the reference does
    this I/O inside the train step; we overlap it with device compute)."""

    def __init__(self, replay: TaskUniformReplay, batch_size: int,
                 seed: int = 0, num_view_for_nerf: int = 20,
                 load_nerf_targets: bool = True, prefetch: int = 2,
                 embed_fn=None):
        self.replay = replay
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.num_view_for_nerf = num_view_for_nerf
        self.load_nerf_targets = load_nerf_targets
        self.embed_fn = embed_fn
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _make(self):
        transitions = self.replay.sample(self.batch_size, self.rng)
        return assemble_batch(transitions, self.rng, self.num_view_for_nerf,
                              self.load_nerf_targets, embed_fn=self.embed_fn)

    def _worker(self):
        while not self._stop.is_set():
            try:
                item = self._make()
            except Exception as e:  # surface loader errors to the consumer
                self._q.put(e)
                return
            # retry the SAME batch on a full queue — re-making would advance
            # the rng and silently drop batches (timing-dependent sampling;
            # broke multi-process step parity, tests/test_multihost.py)
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=1.0)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        item = self._q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
