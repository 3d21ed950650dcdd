"""NeuralRenderer: voxel features + point cloud → Gaussians → rendered views → losses.

Parity target: reference `agents/manigaussian_bc/neural_rendering.py:30-402`
(NeuralRenderer.forward / encode_data / get_novel_calib / pts2render) and
`gaussian_renderer/__init__.py:17-94` (render glue: L2-normalized language features,
sh_degree 1, scale_modifier 1).

TPU-first redesign:
  * get_novel_calib's per-item CPU numpy loop (neural_rendering.py:205-248) becomes
    traced, vmapped camera math (ops/camera.novel_camera_calib_batch) — no host sync.
  * pts2render's bs==1 assert (neural_rendering.py:386) is gone: rendering vmaps
    over the batch (SURVEY.md §7 hard part 6).
  * losses (L2 rgb, cosine/L2 embed, L2 next-frame with warm-up gate) are computed
    in the same jit region; the warm-up gate is a traced jnp.where on `step`, so one
    compiled step serves the whole schedule.

The foundation-model GT embedding (ODISE/DINOv2 + PCA, neural_rendering.py:117-166)
is NOT computed here — it arrives precomputed via `gt_embed` (see
manigaussian_tpu/data pipeline), keeping the train step pure TPU compute.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from manigaussian_tpu.models.gaussian_regressor import GeneralizableGSEmbedNet
from manigaussian_tpu.ops import losses as L
from manigaussian_tpu.ops.camera import novel_camera_calib_batch
from manigaussian_tpu.ops.rasterizer import RasterizeConfig, rasterize
from manigaussian_tpu.parallel.rasterizer_sharded import rasterize_sharded


class RenderLosses(NamedTuple):
    loss: jnp.ndarray
    loss_rgb: jnp.ndarray
    loss_embed: jnp.ndarray
    loss_dyna: jnp.ndarray
    l1: jnp.ndarray
    psnr: jnp.ndarray
    # capacity-truncation diagnostics (ops/rasterizer.py static-shape design):
    # splats dropped by tile_capacity / rect slots dropped by R_cap, summed
    # over the batch. Surfaced into train metrics so silent truncation is
    # visible — on the single-chip AND the tile-sharded path (psum'd counters).
    overflow_splats: jnp.ndarray = 0
    overflow_gaussians: jnp.ndarray = 0


class RenderResult(NamedTuple):
    render_novel: jnp.ndarray              # [B, H, W, 3]
    next_render_novel: Optional[jnp.ndarray]
    render_embed: Optional[jnp.ndarray]    # [B, H, W, 3]


def _render_batch(params: dict, cameras, cfg: RasterizeConfig, bg_color,
                  tile_mesh=None, tile_axis: str = "tile",
                  feature_norm_eps: float = 1e-6):
    """vmap the tile rasterizer over the batch of per-point gaussian params.

    With `tile_mesh` set, each sample renders through the tile-sharded
    shard_map pipeline (parallel/rasterizer_sharded.py) — image tiles owned
    per-device, blended locally, reassembled with all_gather; backward
    transposes to psum (the train-step integration of SURVEY.md §5's
    'long-context analog'). Returns ((color, lang), (overflow_s, overflow_g)).
    """

    def one(xyz, sh, rot, scale, opacity, feat, camera):
        # L2-normalize language features (gaussian_renderer/__init__.py:65-68).
        # eps 1e-6 (not 1e-12): the normalize gradient scales as 1/eps for
        # near-zero vectors — at 1e-12 a fresh regressor's ~0 embeddings emit
        # ~1e12-scale gradients into the shared voxel features and destabilize
        # the whole policy. sqrt(max(Σx², eps²)) rather than max(‖x‖, eps):
        # ‖·‖'s own gradient at exactly zero is NaN even under the max
        # (see models/gaussian_regressor._safe_normalize).
        feat = feat / jnp.sqrt(jnp.maximum(
            jnp.sum(feat * feat, axis=-1, keepdims=True),
            feature_norm_eps * feature_norm_eps))
        if tile_mesh is not None:
            out, extras = rasterize_sharded(
                tile_mesh, xyz, opacity[..., 0], camera, cfg, bg_color,
                scales=scale, rotations=rot, shs=sh, language_features=feat,
                axis=tile_axis)
        else:
            out, extras = rasterize(
                means3d=xyz, opacities=opacity[..., 0], camera=camera, cfg=cfg,
                bg_color=bg_color, scales=scale, rotations=rot, shs=sh,
                language_features=feat)
        return (out.color, out.language_feature,
                extras.overflow_splats, extras.overflow_gaussians)

    color, lang, ov_s, ov_g = jax.vmap(one)(
        params["xyz"], params["sh"], params["rot"], params["scale"],
        params["opacity"], params["feature"], cameras)
    return (color, lang), (jnp.sum(ov_s), jnp.sum(ov_g))


class NeuralRenderer(nn.Module):
    coordinate_bounds: tuple = (-0.3, -0.5, 0.6, 0.7, 0.5, 1.6)
    image_width: int = 128
    image_height: int = 128
    znear: float = 0.1
    zfar: float = 4.0
    bg_color: tuple = (0.0, 0.0, 0.0)
    use_dynamic_field: bool = False
    use_semantic_feature: bool = False
    loss_embed_fn: str = "cosine"
    lambda_embed: float = 0.01
    lambda_rgb: float = 1.0
    lambda_dyna: float = 0.01
    warm_up: int = 3000
    d_latent: int = 128
    tile: int = 16
    max_tiles_per_gaussian: int = 16
    tile_capacity: int = 2048
    chunk: int = 256
    backend: str = "pallas"
    # Optional jax.sharding.Mesh with a `tile_axis` axis: renders through the
    # tile-sharded shard_map pipeline inside the train step. Static module
    # attribute (Mesh is hashable), set by QFunction from the agent config.
    tile_mesh: Optional[object] = None
    tile_axis: str = "tile"
    # eps for the pre-blend L2-normalize of per-gaussian language features.
    # The normalize backward amplifies upstream gradients by up to 1/eps for
    # near-zero features — a fresh regressor's ~0 embeddings route
    # (1/eps)-scale cosine-loss gradients into the shared trunk the moment
    # the embed head ignites (r5 flagship sem_dyna campaign: BC trans_loss
    # 3 → 13 exactly when embed_loss left 1.0). 1e-6 keeps reference
    # F.normalize semantics; raise (e.g. 1e-2, bounding amplification at
    # 100×) to stabilize embed-supervised tiers at flagship scale.
    feature_norm_eps: float = 1e-6

    def _raster_cfg(self) -> RasterizeConfig:
        return RasterizeConfig(
            width=self.image_width, height=self.image_height, tile=self.tile,
            max_tiles_per_gaussian=self.max_tiles_per_gaussian,
            tile_capacity=self.tile_capacity, chunk=self.chunk, sh_degree=1,
            backend=self.backend)

    def _embed_loss(self, render_embed, gt_embed):
        """neural_rendering.py:91-108."""
        if self.loss_embed_fn == "l2_norm":
            lo, hi = jnp.min(gt_embed), jnp.max(gt_embed)
            gt = (gt_embed - lo) / (hi - lo + 1e-12)
            return L.l2_loss(render_embed, gt)
        if self.loss_embed_fn == "l2":
            return L.l2_loss(render_embed, gt_embed)
        if self.loss_embed_fn == "cosine":
            return L.cosine_loss(render_embed, gt_embed)
        raise ValueError(f"unknown loss_embed_fn {self.loss_embed_fn}")

    @nn.compact
    def __call__(self,
                 pcd: jnp.ndarray,            # [B, N, 3] world points
                 dec_fts: jnp.ndarray,        # [B, V, V, V, d_latent]
                 gt_rgb: Optional[jnp.ndarray] = None,       # [B, H, W, 3]
                 gt_pose: Optional[jnp.ndarray] = None,      # [B, 4, 4] c2w
                 gt_intrinsic: Optional[jnp.ndarray] = None, # [B, 3, 3]
                 next_gt_rgb: Optional[jnp.ndarray] = None,
                 next_gt_pose: Optional[jnp.ndarray] = None,
                 next_gt_intrinsic: Optional[jnp.ndarray] = None,
                 gt_embed: Optional[jnp.ndarray] = None,     # [B, H, W, 3]
                 action: Optional[jnp.ndarray] = None,       # [B, 8]
                 step: jnp.ndarray | int = 0,
                 training: bool = True):
        """Returns (RenderLosses, RenderResult)."""
        gs = GeneralizableGSEmbedNet(
            coordinate_bounds=self.coordinate_bounds,
            d_latent=self.d_latent,
            use_dynamic_field=self.use_dynamic_field,
            use_semantic_feature=self.use_semantic_feature,
            name="gs_model")
        params = gs(pcd, dec_fts, action=action)

        cfg = self._raster_cfg()
        bg = jnp.asarray(self.bg_color, jnp.float32)
        cameras = novel_camera_calib_batch(
            gt_intrinsic, gt_pose, self.znear, self.zfar,
            self.image_height, self.image_width)

        (render_novel, render_embed), (ov_s, ov_g) = _render_batch(
            params, cameras, cfg, bg, tile_mesh=self.tile_mesh,
            tile_axis=self.tile_axis,
            feature_norm_eps=self.feature_norm_eps)

        next_render = None
        if self.use_dynamic_field and next_gt_pose is not None:
            next_cameras = novel_camera_calib_batch(
                next_gt_intrinsic, next_gt_pose, self.znear, self.zfar,
                self.image_height, self.image_width)

            def render_next(_):
                (img, _feat), _ov = _render_batch(
                    params["next"], next_cameras, cfg, bg,
                    tile_mesh=self.tile_mesh, tile_axis=self.tile_axis,
                    feature_norm_eps=self.feature_norm_eps)
                return img

            # Warm-up gate via lax.cond, NOT `0 × loss`: the reference computes
            # the next-frame render every step and multiplies its loss by 0
            # during warm-up (neural_rendering.py:323-329) — but a zero
            # cotangent still traverses the branch's jacobian and any inf in it
            # yields 0×inf = NaN that poisons shared parameters (STATUS.md).
            # cond removes the branch (forward AND backward) until warm-up.
            step_arr = jnp.asarray(step)
            next_render = jax.lax.cond(
                step_arr >= self.warm_up, render_next,
                lambda _: jnp.zeros(
                    (pcd.shape[0], self.image_height, self.image_width, 3),
                    jnp.float32),
                operand=None)

        zero = jnp.zeros(())
        if not training or gt_rgb is None:
            zeros = RenderLosses(zero, zero, zero, zero, zero, zero, ov_s, ov_g)
            return zeros, RenderResult(render_novel, next_render, render_embed)

        loss_rgb = L.l2_loss(render_novel, gt_rgb)
        l1 = loss_rgb  # reference logs Ll1 = l2_loss (neural_rendering.py:300-305)
        psnr_v = L.psnr(render_novel, gt_rgb)
        # loss_rgb enters unweighted, like the reference forward — its cfg.lambda_rgb
        # is constructed but never applied inside forward (neural_rendering.py:300-310)
        loss = loss_rgb

        if gt_embed is not None:
            loss_embed = self._embed_loss(render_embed, gt_embed)
            loss = loss + self.lambda_embed * loss_embed
        else:
            loss_embed = zero

        if next_render is not None and next_gt_rgb is not None:
            loss_dyna = L.l2_loss(next_render, next_gt_rgb)
            step_arr = jnp.asarray(step)
            lam = jnp.where(step_arr >= self.warm_up, self.lambda_dyna, 0.0)
            loss = loss + lam * loss_dyna
        else:
            loss_dyna = zero

        return (RenderLosses(loss, loss_rgb, loss_embed, loss_dyna, l1, psnr_v,
                             ov_s, ov_g),
                RenderResult(render_novel, next_render, render_embed))
