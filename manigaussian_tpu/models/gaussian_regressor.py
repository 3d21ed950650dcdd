"""Voxel-conditioned per-point Gaussian regressor + action-conditioned deformation.

Parity target: reference `agents/manigaussian_bc/models_embed.py:21-307`
(GSPointCloudRegresser, GeneralizableGSEmbedNet):
  * world→canonical([0,1]³) point mapping over the workspace bounds,
  * trilinear sampling of the 128-ch voxel feature volume at each point,
  * 39-d positional encoding (num_freqs 6, factor 1.5, include_input),
  * ResnetFC backbone (d_latent 128 + d_in 39 → 26) with 5×512 blocks,
  * GSPointCloudRegresser = Linear(26→26) over softplus(x, beta=100)
    (models_embed.py:20-34; its scale/bias ctor args are dead in the reference and
    are likewise unused here),
  * splits (Δxyz 3, opacity 1, scale 3, rot 4, SH-DC 3, embed 3, SH-rest 9) with
    activations: xyz = input + Δ, scale = min(exp, 0.05), opacity = sigmoid,
    rot = L2-normalized quat, SH stacked to [N, 4, 3] (models_embed.py:233-253),
  * deformation field: concat(point_latent, DETACHED gaussian params, z_feature
    [, action tiled per point]) → second ResnetFC → (Δxyz, Δrot); next-frame params
    inherit everything else detached (models_embed.py:256-304).

TPU-first: the whole thing is one fused jit region — no .detach() host syncs
(jax.lax.stop_gradient), voxel volume is channels-last, batch handled by vmap.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from manigaussian_tpu.models.positional import PositionalEncoding
from manigaussian_tpu.models.resnetfc import ResnetFC
from manigaussian_tpu.ops.camera import world_to_canonical
from manigaussian_tpu.ops.sampling import trilinear_sample


class GSPointCloudRegresser(nn.Module):
    """softplus(beta=100) → Linear, dims preserved (models_embed.py:20-34)."""

    d: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.softplus(100.0 * x) / 100.0
        return nn.Dense(self.d)(h)


class GaussianParams(dict):
    """dict of per-point gaussian parameter maps (keys mirror the reference's
    data['*_maps']): xyz [B,N,3], sh [B,N,4,3], rot [B,N,4], scale [B,N,3],
    opacity [B,N,1], feature [B,N,3]."""


SPLIT_DIMS = (3, 1, 3, 4, 3, 3, 9)  # Δxyz, opacity, scale, rot, sh_dc, embed, sh_rest
MAX_SCALE = 0.05                    # clamp_max (models_embed.py:245-246)


def _safe_normalize(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """x/‖x‖ with a bounded, NaN-free gradient everywhere.

    Two hazards in the naive x / max(‖x‖, eps) (the reference's F.normalize
    semantics, eps 1e-12): (a) the gradient is O(1/‖x‖) — near-zero raw
    quaternions emit unbounded gradients into the shared trunk (same rationale
    as the renderer's feature normalize); (b) ‖·‖'s own gradient at exactly
    zero is 0/0 = NaN, which the outer max cannot mask (0-cotangent × NaN).
    sqrt(max(Σx², eps²)) avoids both and equals x/‖x‖ for ‖x‖ ≥ eps."""
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


class GeneralizableGSEmbedNet(nn.Module):
    coordinate_bounds: tuple = (-0.3, -0.5, 0.6, 0.7, 0.5, 1.6)
    d_latent: int = 128
    d_hidden: int = 512
    n_blocks: int = 5
    combine_layer: int = 3
    num_freqs: int = 6
    freq_factor: float = 1.5
    use_dynamic_field: bool = False
    use_action: bool = True
    use_semantic_feature: bool = False   # foundation_model_name == 'diffusion'
    next_d_hidden: int = 512
    next_n_blocks: int = 5

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, voxel_feat: jnp.ndarray,
                 action: Optional[jnp.ndarray] = None) -> GaussianParams:
        """
        Args:
          xyz: [B, N, 3] world-space points (front-cam unprojection).
          voxel_feat: [B, V, V, V, d_latent] channels-last voxel feature volume
            (the reference's dec_fts, models_embed.py:167-188).
          action: [B, 8] current gripper action (deformation conditioning).
        Returns GaussianParams; with use_dynamic_field also params['next'].
        """
        B, N, _ = xyz.shape
        code = PositionalEncoding(self.num_freqs, 3, self.freq_factor, True)

        canon = world_to_canonical(xyz, jnp.asarray(self.coordinate_bounds))
        grid_coords = canon * 2.0 - 1.0                           # [-1,1]
        # voxel_feat may arrive bf16 (policy_dtype storage of d0): gather the
        # half-width volume, upcast at the MLP boundary — the regressor math
        # itself stays float32
        point_latent = jax.vmap(trilinear_sample)(
            voxel_feat, grid_coords).astype(jnp.float32)          # [B,N,128]

        z_feature = code(canon)                                   # [B, N, 39]
        d_out = sum(SPLIT_DIMS)

        latent = jnp.concatenate([point_latent, z_feature], axis=-1)
        enc, _ = ResnetFC(d_out=d_out, n_blocks=self.n_blocks,
                          d_latent=self.d_latent, d_hidden=self.d_hidden,
                          combine_layer=self.combine_layer, name="encoder")(latent)
        raw = GSPointCloudRegresser(d_out, name="regresser")(enc)  # [B, N, 26]

        idx = [sum(SPLIT_DIMS[: i + 1]) for i in range(len(SPLIT_DIMS) - 1)]
        (d_xyz, opacity_raw, scale_raw, rot_raw,
         sh_dc, embed, sh_rest) = jnp.split(raw, idx, axis=-1)

        sh = jnp.concatenate([sh_dc[..., None, :],
                              sh_rest.reshape(B, N, 3, 3)], axis=-2)  # [B,N,4,3]
        rot = _safe_normalize(rot_raw)
        # clamp BEFORE exp: min(exp(x), c) == exp(min(x, log c)) forward, but
        # the former's backward is 0·exp(x) = 0·inf = NaN once exp overflows
        # fp32 (x > ~88; measured as the root cause of a mid-training NaN —
        # the reference's clamp_max(exp(...)) carries the same hazard)
        scale = jnp.exp(jnp.minimum(scale_raw, jnp.log(MAX_SCALE)))

        params = GaussianParams(
            xyz=xyz + d_xyz,
            sh=sh,
            rot=rot,
            scale=scale,
            opacity=jax.nn.sigmoid(opacity_raw),
            feature=embed,
        )

        if self.use_dynamic_field:
            sg = jax.lax.stop_gradient
            pieces = [
                point_latent,
                sg(params["xyz"]),
                sg(sh_dc),
                sg(sh_rest),
                sg(rot),
                sg(scale),
                sg(params["opacity"]),
            ]
            if self.use_semantic_feature:
                pieces.append(sg(embed))
            pieces.append(z_feature)
            if self.use_action and action is not None:
                pieces.append(jnp.broadcast_to(action[:, None, :], (B, N, 8)))
            dyna_in = jnp.concatenate(pieces, axis=-1)

            delta, _ = ResnetFC(d_out=7, n_blocks=self.next_n_blocks,
                                d_latent=self.d_latent, d_hidden=self.next_d_hidden,
                                combine_layer=self.combine_layer,
                                name="deformation")(dyna_in)
            next_xyz_d, next_rot_d = delta[..., :3], delta[..., 3:]
            next_rot = _safe_normalize(sg(rot) + next_rot_d)
            params["next"] = GaussianParams(
                xyz=sg(params["xyz"]) + next_xyz_d,
                sh=sg(sh),
                rot=next_rot,
                scale=sg(scale),
                opacity=sg(params["opacity"]),
                feature=sg(embed),
            )
        return params
