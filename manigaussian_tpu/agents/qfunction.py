"""QFunction: voxelize → Perceiver Q-heads → (auxiliary) Gaussian-splat rendering.

Parity target: reference `agents/manigaussian_bc/qattention_manigaussian_bc_agent.py`
QFunction (:130-359): one flax module owning the policy net and the neural renderer
so a single parameter tree / optimizer state covers both (the reference wraps both
in DDP separately; here one pjit region covers everything).

Differences (TPU-first):
  * voxelization is a pure function fused into the jit region (ops/voxelize.py), not
    a stateful VoxelGrid object;
  * the renderer consumes decoded camera tensors (pose/intrinsic arrays) — file
    parsing happens in the host data pipeline, not inside the train step
    (the reference PIL-loads inside update(), qattention:716-739);
  * argmax decoding returns index tensors; continuous-action assembly lives in
    bc_agent.act (parity with QAttentionStackAgent, qattention_stack_agent.py:89-98).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from manigaussian_tpu.config import MethodConfig
from manigaussian_tpu.models.perceiver import PerceiverVoxelLangEncoder
from manigaussian_tpu.ops.voxelize import voxelize
from manigaussian_tpu.rendering.nerf_renderer import GNFactorNeRFRenderer
from manigaussian_tpu.rendering.neural_renderer import (NeuralRenderer,
                                                        RenderLosses,
                                                        RenderResult)


class QOutput(NamedTuple):
    q_trans: jnp.ndarray               # [B, V, V, V, 1]
    q_rot_grip: jnp.ndarray            # [B, 3R+2]
    q_collision: jnp.ndarray           # [B, 2]
    voxel_grid: jnp.ndarray            # [B, V, V, V, 10]
    render_losses: Optional[RenderLosses]
    render_result: Optional[RenderResult]


def build_voxel_grid(pcd: jnp.ndarray, rgb: jnp.ndarray, bounds: jnp.ndarray,
                     voxel_size: int) -> jnp.ndarray:
    """Multi-camera point clouds + RGB → [B, V, V, V, 10] voxel grid.

    pcd/rgb: [B, ncam, H, W, 3] (rgb already normalized to [-1, 1] by the
    preprocess step, helpers/preprocess_agent.py:25-26).
    """
    b = pcd.shape[0]
    pcd_flat = pcd.reshape(b, -1, 3)
    rgb_flat = rgb.reshape(b, -1, 3)
    return voxelize(pcd_flat, rgb_flat, bounds, voxel_size)


class QFunction(nn.Module):
    cfg: MethodConfig
    # Optional jax.sharding.Mesh with a 'tile' axis: the renderer shards image
    # tiles over it inside the train step (parallel/rasterizer_sharded.py).
    tile_mesh: Optional[object] = None

    def _perceiver(self) -> PerceiverVoxelLangEncoder:
        m = self.cfg
        return PerceiverVoxelLangEncoder(
            dtype=jnp.dtype(getattr(m, "policy_dtype", "float32")),
            pad_mode=getattr(m, "policy_pad_mode", "edge"),
            conv_impl=getattr(m, "policy_conv_impl", "xla"),
            unet_impl=getattr(m, "policy_unet_impl", "xla"),
            attn_impl=getattr(m, "policy_attn_impl", "xla"),
            depth=m.transformer_depth,
            iterations=m.transformer_iterations,
            voxel_size=m.voxel_sizes[0],
            initial_dim=10,
            low_dim_size=4,
            num_rotation_classes=int(360 // m.rotation_resolution),
            num_latents=m.num_latents,
            im_channels=m.final_dim,
            latent_dim=m.latent_dim,
            cross_heads=m.cross_heads,
            latent_heads=m.latent_heads,
            cross_dim_head=m.cross_dim_head,
            latent_dim_head=m.latent_dim_head,
            activation=m.activation,
            lang_emb_dim=m.language_model_dim,
            input_dropout=m.input_dropout,
            attn_dropout=m.attn_dropout,
            decoder_dropout=m.decoder_dropout,
            voxel_patch_size=m.voxel_patch_size,
            voxel_patch_stride=m.voxel_patch_stride,
            final_dim=m.final_dim,
            no_skip_connection=m.no_skip_connection,
            no_perceiver=m.no_perceiver,
            no_language=m.no_language,
            name="qnet")

    def _nerf_renderer(self) -> GNFactorNeRFRenderer:
        """GNFactor volumetric baseline (reference agents/gnfactor_bc/
        neural_rendering.py; selected by neural_renderer.renderer_type='nerf')."""
        r = self.cfg.neural_renderer
        return GNFactorNeRFRenderer(
            coordinate_bounds=tuple(r.coordinate_bounds),
            image_width=r.image_width, image_height=r.image_height,
            z_near=r.znear, z_far=r.zfar,
            n_coarse=r.n_coarse, n_fine=r.n_fine,
            n_fine_depth=r.n_fine_depth, depth_std=r.depth_std,
            ray_chunk_size=r.ray_chunk_size, d_latent=r.d_latent,
            d_embed=r.d_embed, d_hidden=r.mlp.d_hidden,
            n_blocks=r.mlp.n_blocks, combine_layer=r.mlp.combine_layer,
            lambda_rgb=r.lambda_rgb, lambda_embed=r.lambda_embed,
            noise_std=r.noise_std, white_bkgd=r.white_bkgd,
            name="neural_renderer")

    def _renderer(self) -> NeuralRenderer:
        r = self.cfg.neural_renderer
        return NeuralRenderer(
            coordinate_bounds=tuple(r.coordinate_bounds),
            image_width=r.image_width, image_height=r.image_height,
            znear=r.znear, zfar=r.zfar, bg_color=tuple(r.bg_color),
            use_dynamic_field=r.use_dynamic_field,
            use_semantic_feature=(r.foundation_model_name == "diffusion"),
            loss_embed_fn=r.loss_embed_fn, lambda_embed=r.lambda_embed,
            lambda_rgb=r.lambda_rgb, lambda_dyna=r.lambda_dyna,
            warm_up=r.next_mlp.warm_up, d_latent=r.d_latent,
            tile=r.tile, max_tiles_per_gaussian=r.max_tiles_per_gaussian,
            tile_capacity=r.tile_capacity, chunk=r.chunk, backend=r.backend,
            tile_mesh=self.tile_mesh,
            feature_norm_eps=getattr(r, "feature_norm_eps", 1e-6),
            name="neural_renderer")

    @nn.compact
    def __call__(self,
                 rgb: jnp.ndarray,            # [B, ncam, H, W, 3] in [-1, 1]
                 pcd: jnp.ndarray,            # [B, ncam, H, W, 3]
                 proprio: jnp.ndarray,        # [B, 4]
                 lang_goal_emb: jnp.ndarray,  # [B, 1024]
                 lang_token_embs: jnp.ndarray,  # [B, 77, 512]
                 bounds: jnp.ndarray,         # [6] or [B, 6]
                 use_neural_rendering: bool = False,
                 nerf_target_rgb: Optional[jnp.ndarray] = None,   # [B, H, W, 3]
                 nerf_target_pose: Optional[jnp.ndarray] = None,  # [B, 4, 4] c2w
                 nerf_target_intrinsic: Optional[jnp.ndarray] = None,
                 nerf_next_target_rgb: Optional[jnp.ndarray] = None,
                 nerf_next_target_pose: Optional[jnp.ndarray] = None,
                 nerf_next_target_intrinsic: Optional[jnp.ndarray] = None,
                 gt_embed: Optional[jnp.ndarray] = None,
                 action: Optional[jnp.ndarray] = None,
                 step: jnp.ndarray | int = 0,
                 deterministic: bool = True) -> QOutput:
        m = self.cfg
        voxel_grid = jax.lax.stop_gradient(
            build_voxel_grid(pcd, rgb, bounds, m.voxel_sizes[0]))

        q_trans, q_rot_grip, q_coll, d0, _lang = self._perceiver()(
            voxel_grid, proprio, lang_goal_emb, lang_token_embs,
            deterministic=deterministic)

        render_losses, render_result = None, None
        if (use_neural_rendering and m.use_neural_rendering
                and m.neural_renderer.renderer_type == "nerf"):
            render_losses, render_result = self._nerf_branch(
                d0, nerf_target_rgb, nerf_target_pose, nerf_target_intrinsic,
                gt_embed, deterministic)
        elif use_neural_rendering and m.use_neural_rendering:
            # front camera only (qattention:252-258)
            front_pcd = pcd[:, 0].reshape(pcd.shape[0], -1, 3)
            render_losses, render_result = self._renderer()(
                front_pcd, d0,
                gt_rgb=nerf_target_rgb, gt_pose=nerf_target_pose,
                gt_intrinsic=nerf_target_intrinsic,
                next_gt_rgb=nerf_next_target_rgb,
                next_gt_pose=nerf_next_target_pose,
                next_gt_intrinsic=nerf_next_target_intrinsic,
                gt_embed=gt_embed, action=action, step=step,
                training=nerf_target_rgb is not None)

        return QOutput(q_trans, q_rot_grip, q_coll, voxel_grid,
                       render_losses, render_result)

    def _nerf_branch(self, d0, gt_rgb, gt_pose, gt_intrinsic, gt_embed,
                     deterministic):
        """GNFactor aux loss: volume-render random ray chunks against the GT
        view (qattention_gnfactor_bc_agent analog). Returns the same
        RenderLosses/RenderResult shapes as the splat path so bc_agent's
        metric plumbing is renderer-agnostic."""
        renderer = self._nerf_renderer()
        if gt_rgb is None:
            if gt_pose is not None:  # vis path: full-image render
                rgb, _depth = renderer.render_image(
                    d0[0], gt_pose[0], gt_intrinsic[0], jax.random.PRNGKey(0))
                return None, RenderResult(render_novel=rgb[None],
                                          next_render_novel=None,
                                          render_embed=None)
            return None, None
        key = (self.make_rng("dropout") if not deterministic
               else jax.random.PRNGKey(0))
        r = self.cfg.neural_renderer
        have_embed = gt_embed is not None
        if not have_embed:
            b, h, w = gt_rgb.shape[0], gt_rgb.shape[1], gt_rgb.shape[2]
            gt_embed = jnp.zeros((b, h, w, r.d_embed), jnp.float32)
        nl = renderer(d0, gt_rgb, gt_pose, gt_intrinsic, gt_embed, key,
                      training=not deterministic)
        zero = jnp.zeros((), jnp.float32)
        embed_loss = (nl.loss_embed_coarse + nl.loss_embed_fine
                      if have_embed else zero)
        loss = (nl.loss if have_embed
                else nl.loss_rgb_coarse + nl.loss_rgb_fine)
        losses = RenderLosses(
            loss=loss,
            loss_rgb=nl.loss_rgb_coarse + nl.loss_rgb_fine,
            loss_embed=embed_loss, loss_dyna=zero, l1=zero, psnr=nl.psnr,
            overflow_splats=jnp.zeros((), jnp.int32),
            overflow_gaussians=jnp.zeros((), jnp.int32))
        return losses, None


def choose_highest_action(q_trans: jnp.ndarray, q_rot_grip: jnp.ndarray,
                          q_collision: jnp.ndarray, rotation_resolution: int):
    """argmax decode (qattention:165-188). q_trans is [B, V, V, V, 1] channels-last.

    Returns (coords [B,3] int32, rot_grip [B,4] int32, collision [B,1] int32).
    """
    b = q_trans.shape[0]
    v = q_trans.shape[1]
    flat = q_trans.reshape(b, -1)
    idx = jnp.argmax(flat, axis=-1)
    coords = jnp.stack([idx // (v * v), (idx // v) % v, idx % v],
                       axis=-1).astype(jnp.int32)
    nrot = int(360 // rotation_resolution)
    q_rot = q_rot_grip[:, : nrot * 3].reshape(b, 3, nrot)
    rot_idx = jnp.argmax(q_rot, axis=-1)
    grip_idx = jnp.argmax(q_rot_grip[:, nrot * 3:], axis=-1, keepdims=True)
    coll_idx = jnp.argmax(q_collision, axis=-1, keepdims=True)
    return (coords,
            jnp.concatenate([rot_idx, grip_idx], axis=-1).astype(jnp.int32),
            coll_idx.astype(jnp.int32))
