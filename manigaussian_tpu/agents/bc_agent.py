"""ManiGaussian behavior-cloning agent: jitted train step + act (inference).

Parity target: `agents/manigaussian_bc/qattention_manigaussian_bc_agent.py`
QAttentionPerActBCAgent.update (:654-920) and .act (:1063-1158), plus the
continuous-action assembly of QAttentionStackAgent.act
(qattention_stack_agent.py:54-98) and PreprocessAgent's RGB normalization
(helpers/preprocess_agent.py:25-26).

TPU-first redesign of update():
  * the whole step — SE(3) augmentation, voxelization, perceiver, Gaussian
    regression, tile rasterization, all losses, LAMB update — is ONE jitted pure
    function `train_step(state, batch, key)`; the reference does file I/O, numpy
    camera math and host loops inside the step;
  * CE losses use integer labels (no 100³ one-hot materialization,
    qattention:806-812 builds them per-batch-item on host);
  * data parallelism: jit with a sharded batch — XLA inserts the grad all-reduce
    (the reference's fabric.backward NCCL boundary, qattention:918);
  * optimizer: optax.lamb (helpers/optim/lamb.py port; trust-ratio Adam,
    weight_decay 1e-6, betas (0.9, 0.999)).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from manigaussian_tpu.agents.qfunction import QFunction, choose_highest_action
from manigaussian_tpu.config import ManiGaussianConfig
from manigaussian_tpu.ops import losses as L
from manigaussian_tpu.ops.augmentation import apply_se3_augmentation
from manigaussian_tpu.ops.rotation import discrete_euler_to_quaternion


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


class ActResult(NamedTuple):
    continuous_action: jnp.ndarray   # [B, 9]: xyz(3) quat_xyzw(4) grip(1) collision(1)
    trans_coords: jnp.ndarray        # [B, 3] int32 voxel index
    rot_grip_indices: jnp.ndarray    # [B, 4] int32
    collision_indices: jnp.ndarray   # [B, 1] int32


def make_optimizer(cfg: ManiGaussianConfig) -> optax.GradientTransformation:
    from manigaussian_tpu.utils.optimizers import make_lamb

    m = cfg.method
    sched = None
    if m.lr_scheduler:
        # cosine-with-warmup analog of transformers.get_cosine_..._with_warmup
        # (qattention:499-505)
        sched = optax.warmup_cosine_decay_schedule(
            0.0, m.lr, m.num_warmup_steps, cfg.framework.training_iterations)
    if m.optimizer == "lamb":
        # reference-exact LAMB (weight-norm clamp, no bias correction) —
        # optax.lamb's unclamped trust ratio destabilizes batch-1 training
        opt = make_lamb(m.lr, weight_decay=m.lambda_weight_l2, schedule=sched)
    elif m.optimizer == "adam":
        opt = optax.adamw(sched or m.lr, weight_decay=m.lambda_weight_l2)
    else:
        raise ValueError(f"unknown optimizer {m.optimizer}")
    if m.grad_clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(m.grad_clip_norm), opt)
    return opt


def normalize_rgb(rgb_01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB → [-1,1] (helpers/preprocess_agent.py:25-26)."""
    return rgb_01 * 2.0 - 1.0


class ManiGaussianBCAgent:
    """Builds the QFunction + optimizer and exposes jitted update/act closures.

    Host-side state (params/opt) lives in the returned TrainState — this object
    holds only static config, so it is safe to use from any process.
    """

    def __init__(self, cfg: ManiGaussianConfig, tile_mesh=None):
        """tile_mesh: optional jax.sharding.Mesh with a 'tile' axis — the
        renderer shards image tiles over it inside the jitted train step
        (train.py --mesh-tile)."""
        self.cfg = cfg
        self.qfn = QFunction(cfg.method, tile_mesh=tile_mesh)
        self.opt = make_optimizer(cfg)
        self.bounds = jnp.asarray(cfg.rlbench.scene_bounds, jnp.float32)

    # ---------------------------------------------------------------- build
    def init_state(self, key: jax.Array, example_batch: Dict[str, jnp.ndarray],
                   training: bool = True, lazy: bool = False) -> TrainState:
        # Initialize through a mesh-FREE QFunction: the tile shard_map is
        # partial-manual over 'tile' and only composes with a 'data' axis
        # inside the sharded jit of the train step — eager/lazy init would
        # trace it unsharded and fail on 2D meshes. The rasterizer holds no
        # parameters, so the param tree is identical.
        qfn = (QFunction(self.cfg.method) if self.qfn.tile_mesh is not None
               else self.qfn)
        init_fn = qfn.lazy_init if lazy else qfn.init
        params = init_fn(
            {"params": key, "dropout": key},
            example_batch["rgb"], example_batch["pcd"],
            example_batch["low_dim_state"], example_batch["lang_goal_emb"],
            example_batch["lang_token_embs"], self.bounds,
            use_neural_rendering=training and self.cfg.method.use_neural_rendering,
            nerf_target_rgb=example_batch.get("nerf_target_rgb"),
            nerf_target_pose=example_batch.get("nerf_target_pose"),
            nerf_target_intrinsic=example_batch.get("nerf_target_intrinsic"),
            nerf_next_target_rgb=example_batch.get("nerf_next_target_rgb"),
            nerf_next_target_pose=example_batch.get("nerf_next_target_pose"),
            nerf_next_target_intrinsic=example_batch.get("nerf_next_target_intrinsic"),
            gt_embed=example_batch.get("gt_embed"),
            action=example_batch.get("action"),
            step=0, deterministic=True)
        opt_state = self.opt.init(params) if training else None
        return TrainState(jnp.zeros((), jnp.int32), params, opt_state)

    # ---------------------------------------------------------------- update
    def update(self, state: TrainState, batch: Dict[str, jnp.ndarray],
               key: jax.Array):
        """One BC step. All inputs are device arrays; see tests for the schema."""
        m = self.cfg.method
        key_aug, key_drop = jax.random.split(key)

        rgb = normalize_rgb(batch["rgb"])                    # [B,ncam,H,W,3]
        pcd = batch["pcd"]
        action_trans = batch["trans_action_indicies"][:, :3]
        action_rot_grip = batch["rot_grip_action_indicies"]
        camera_pose = batch.get("camera_extrinsics")         # [B,ncam,4,4] c2w

        if m.apply_se3:
            out = apply_se3_augmentation(
                key_aug, pcd, batch["gripper_pose"], action_trans,
                action_rot_grip, self.bounds,
                trans_aug_range=m.aug_xyz, rot_aug_range=m.aug_rpy,
                rot_aug_resolution=m.rotation_resolution,
                voxel_size=m.voxel_sizes[0],
                rot_resolution=m.rotation_resolution,
                camera_pose=camera_pose)
            action_trans, action_rot_grip = out.action_trans, out.action_rot_grip
            pcd = out.pcd

        nrot = int(360 // m.rotation_resolution)
        v = m.voxel_sizes[0]

        def loss_fn(params):
            q = self.qfn.apply(
                params, rgb, pcd, batch["low_dim_state"],
                batch["lang_goal_emb"], batch["lang_token_embs"], self.bounds,
                use_neural_rendering=m.use_neural_rendering,
                nerf_target_rgb=batch.get("nerf_target_rgb"),
                nerf_target_pose=batch.get("nerf_target_pose"),
                nerf_target_intrinsic=batch.get("nerf_target_intrinsic"),
                nerf_next_target_rgb=batch.get("nerf_next_target_rgb"),
                nerf_next_target_pose=batch.get("nerf_next_target_pose"),
                nerf_next_target_intrinsic=batch.get("nerf_next_target_intrinsic"),
                gt_embed=batch.get("gt_embed"),
                action=batch.get("action"), step=state.step,
                deterministic=False, rngs={"dropout": key_drop})

            b = q.q_trans.shape[0]
            trans_idx = (action_trans[:, 0] * v + action_trans[:, 1]) * v \
                + action_trans[:, 2]
            q_trans_loss = L.softmax_cross_entropy_with_index(
                q.q_trans.reshape(b, -1), trans_idx)

            q_rot = q.q_rot_grip[:, : nrot * 3].reshape(b, 3, nrot)
            q_rot_loss = sum(
                L.softmax_cross_entropy_with_index(q_rot[:, i],
                                                   action_rot_grip[:, i])
                for i in range(3))
            q_grip_loss = L.softmax_cross_entropy_with_index(
                q.q_rot_grip[:, nrot * 3:], action_rot_grip[:, 3])
            q_coll_loss = L.softmax_cross_entropy_with_index(
                q.q_collision, batch["ignore_collisions"][:, 0])

            combined = (q_trans_loss * m.trans_loss_weight
                        + q_rot_loss * m.rot_loss_weight
                        + q_grip_loss * m.grip_loss_weight
                        + q_coll_loss * m.collision_loss_weight)
            total = m.lambda_bc * combined
            metrics = {"trans_loss": q_trans_loss, "rot_loss": q_rot_loss,
                       "grip_loss": q_grip_loss, "collision_loss": q_coll_loss,
                       "bc_loss": combined}
            if q.render_losses is not None:
                total = total + m.neural_renderer.lambda_nerf * q.render_losses.loss
                metrics.update(rgb_loss=q.render_losses.loss_rgb,
                               embed_loss=q.render_losses.loss_embed,
                               dyna_loss=q.render_losses.loss_dyna,
                               psnr=q.render_losses.psnr,
                               overflow_splats=q.render_losses.overflow_splats,
                               overflow_gaussians=q.render_losses.overflow_gaussians)
            metrics["total_loss"] = total
            return total, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    # ---------------------------------------------------------------- act
    def act(self, params, observation: Dict[str, jnp.ndarray]) -> ActResult:
        """Greedy policy (qattention:1063-1158 + stack agent assembly).

        observation keys: rgb [B,ncam,H,W,3] in [0,1], pcd, low_dim_state,
        lang_goal_emb, lang_token_embs.
        """
        m = self.cfg.method
        rgb = normalize_rgb(observation["rgb"])
        q = self.qfn.apply(
            params, rgb, observation["pcd"], observation["low_dim_state"],
            observation["lang_goal_emb"], observation["lang_token_embs"],
            self.bounds, use_neural_rendering=False, deterministic=True)
        coords, rot_grip, coll = choose_highest_action(
            q.q_trans, q.q_rot_grip, q.q_collision, m.rotation_resolution)

        bounds = self.bounds
        res = (bounds[3:] - bounds[:3]) / m.voxel_sizes[0]
        # attention coordinate = voxel center (qattention:1120-1123)
        attention_coord = bounds[:3] + res * coords.astype(jnp.float32) + res / 2
        quat = discrete_euler_to_quaternion(rot_grip[:, :3],
                                            float(m.rotation_resolution))
        continuous = jnp.concatenate(
            [attention_coord, quat, rot_grip[:, 3:4].astype(jnp.float32),
             coll.astype(jnp.float32)], axis=-1)
        return ActResult(continuous, coords, rot_grip, coll)

    # ------------------------------------------------------------- rendering
    def render_for_vis(self, params, batch: Dict[str, jnp.ndarray]):
        """Inference-mode novel-view render for the recon panels
        (QFunction.render parity, qattention:289-359). Returns RenderResult.
        Runs mesh-free: a visualization render happens outside the sharded
        jit, where the partial-manual tile shard_map cannot trace."""
        m = self.cfg.method
        qfn = (QFunction(m) if self.qfn.tile_mesh is not None else self.qfn)
        q = qfn.apply(
            params, normalize_rgb(batch["rgb"]), batch["pcd"],
            batch["low_dim_state"], batch["lang_goal_emb"],
            batch["lang_token_embs"], self.bounds,
            use_neural_rendering=True,
            nerf_target_rgb=None,  # training=False path: render only
            nerf_target_pose=batch.get("nerf_target_pose"),
            nerf_target_intrinsic=batch.get("nerf_target_intrinsic"),
            nerf_next_target_pose=batch.get("nerf_next_target_pose"),
            nerf_next_target_intrinsic=batch.get("nerf_next_target_intrinsic"),
            action=batch.get("action"), step=0, deterministic=True)
        return q.render_result

    # ---------------------------------------------------------------- jit
    def jit_update(self, donate: bool = True):
        return jax.jit(self.update, donate_argnums=(0,) if donate else ())

    def jit_act(self):
        return jax.jit(self.act)
