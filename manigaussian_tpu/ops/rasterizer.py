"""Production TPU Gaussian-splat rasterizer: project → bin → sort → tile blend.

TPU-native redesign of the reference CUDA pipeline
(`cuda_rasterizer/rasterizer_impl.cu:198-355`):

  CUDA                                      here (XLA/TPU)
  ----------------------------------------  -----------------------------------------
  preprocessCUDA per-thread loop            vectorized jnp over N (ops/gaussian_math)
  cub InclusiveSum over tiles_touched       static-capacity duplication (no scan)
  duplicateWithKeys 64-bit [tile|depth]     (tile_id, depth_rank) two-key lax.sort
  cub DeviceRadixSort                       jax.lax.sort (stable)
  identifyTileRanges kernel                 jnp.searchsorted over sorted tile ids
  renderCUDA 16x16 thread blocks,           per-tile gather + chunked scan where the
    sequential shared-mem batches             blend is a cumulative-sum reformulation:
                                              weights w_i = a_i·exp(Σ_{j<i}log(1-a_j))
                                              and color = wᵀ·rgb runs on the MXU
  atomicAdd gradient scatter (backward.cu)  jax autodiff through the (associative)
                                              formulation → deterministic segment math

Static-shape design (XLA requires it):
  * each Gaussian emits up to `max_tiles_per_gaussian` (tile-rect slots, row-major);
    splats with larger rects are truncated — tracked in `overflow_gaussians`.
  * each tile blends at most `tile_capacity` front-most splats; the overflowed tail
    is dropped — tracked in `overflow_splats`. Set capacities ≥ worst case for exact
    parity with the oracle/CUDA; the defaults comfortably cover the ManiGaussian
    workload (16k–65k Gaussians at 128², SURVEY.md §6).

Blend semantics (skip rules, 0.99 alpha clamp, T<1e-4 termination latch, background
composite) are bit-for-bit the ones in `forward.cu:262-398` — shared with the oracle
via ops/rasterizer_ref.effective_alpha/blend_weights equations.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from manigaussian_tpu.ops import gaussian_math as gm
from manigaussian_tpu.ops.rasterizer_ref import (ALPHA_MAX, ALPHA_MIN, T_EPS,
                                                 RenderOutput)


class RasterizeConfig(NamedTuple):
    width: int = 128
    height: int = 128
    tile: int = 16
    max_tiles_per_gaussian: int = 16   # R_cap: per-splat duplicate slots
    tile_capacity: int = 2048          # K_cap: blended splats per tile
    chunk: int = 256                   # splats blended per scan step
    sh_degree: int = 1
    backend: str = "pallas"            # "pallas" (TPU kernel) | "xla" (lax.scan)
    # Two-level duplication (0 = off): most gaussians touch few tiles, so the
    # sorted duplicate list is ~85% invalid padding at r_cap=16. With
    # small_rect_cap=s > 0, every gaussian gets s slots and only the first
    # big_table_cap gaussians with rects larger than s get full r_cap rows in
    # a compacted side table — shrinking the sort from N·r_cap to
    # N·s + big_table_cap·r_cap entries. Gaussians past the big-table
    # capacity degrade gracefully to s slots (counted in overflow_gaussians).
    small_rect_cap: int = 0
    big_table_cap: int = 8192


class RasterizeExtras(NamedTuple):
    overflow_splats: jnp.ndarray     # scalar int32: splats dropped by tile_capacity
    overflow_gaussians: jnp.ndarray  # scalar int32: rect slots dropped by R_cap
    tile_counts: jnp.ndarray         # [tiles] int32 splats binned per tile


def _build_keys(pre: gm.ProjectedGaussians, cfg: RasterizeConfig,
                tile_range=None):
    """Duplicate each Gaussian into its tile-rect slots and sort by (tile, depth).

    Replaces duplicateWithKeys + radix sort (rasterizer_impl.cu:70-111, 303-311).
    Returns (sorted_tile_ids [D], sorted_gaussian_idx [D]) with invalid entries
    carrying tile_id == num_tiles (sorted to the end).

    `tile_range=(tile_lo, n_local)` restricts binning to the global-tile window
    [tile_lo, tile_lo + n_local) and emits LOCAL ids in [0, n_local] — the
    per-device path of the tile-sharded renderer (the cross-chip analog of cub
    radix partitioning). tile_lo may be traced (lax.axis_index); n_local must
    be static.
    """
    n = pre.depths.shape[0]
    tiles_x = (cfg.width + cfg.tile - 1) // cfg.tile
    tiles_y = (cfg.height + cfg.tile - 1) // cfg.tile
    num_tiles = tiles_x * tiles_y
    r_cap = cfg.max_tiles_per_gaussian

    # Front-to-back rank per gaussian (the depth part of the CUDA 64-bit key).
    sort_depth = jnp.where(pre.valid, pre.depths, jnp.inf)
    order = jnp.argsort(sort_depth)                      # rank -> gaussian
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1))

    rect_w = pre.rect_max[:, 0] - pre.rect_min[:, 0]     # [N]
    slot = jax.lax.broadcasted_iota(jnp.int32, (n, r_cap), 1)
    rect_w_safe = jnp.maximum(rect_w, 1)[:, None]
    dx = slot % rect_w_safe
    dy = slot // rect_w_safe
    tile_x = pre.rect_min[:, 0:1] + dx
    tile_y = pre.rect_min[:, 1:2] + dy
    in_rect = slot < pre.tiles_touched[:, None]
    dup_valid = in_rect & pre.valid[:, None]
    tile_id_global = tile_y * tiles_x + tile_x
    if tile_range is not None:
        tile_lo, out_tiles = tile_range
        local = tile_id_global - tile_lo
        dup_valid = dup_valid & (local >= 0) & (local < out_tiles)
        tile_id = jnp.where(dup_valid, local, out_tiles)
    else:
        out_tiles = num_tiles
        tile_id = jnp.where(dup_valid, tile_id_global, num_tiles)

    gidx = jax.lax.broadcasted_iota(jnp.int32, (n, r_cap), 0)
    rank_b = jnp.broadcast_to(ranks[:, None], (n, r_cap))

    if cfg.small_rect_cap and cfg.small_rect_cap < r_cap:
        tile_id, gidx, rank_b = _two_level_dup(
            pre, cfg, tile_id, ranks, out_tiles)

    # Fuse (tile, depth_rank) into ONE int32 key when it fits (the CUDA code
    # fuses [tile|depth] into a single 64-bit radix key the same way,
    # rasterizer_impl.cu:70-85): a 1-key + 1-payload sort moves 2/3 the bytes
    # of the 2-key + 1-payload one through the sorting network — measured
    # 4.04 -> ~2.7 ms at D = 1M on a real chip. Tile ranges are then found by
    # searchsorted directly on the fused keys.
    rank_bits = max(1, (n - 1).bit_length())
    if ((out_tiles << rank_bits) | (n - 1)) < 2 ** 31:
        key = (tile_id << rank_bits) | rank_b
        sorted_key, sorted_gidx = jax.lax.sort(
            (key.reshape(-1), gidx.reshape(-1)), num_keys=1, is_stable=False)
        sorted_tile = (sorted_key, rank_bits)
    else:  # huge-N fallback: two int32 keys (same semantics)
        st, _sr, sorted_gidx = jax.lax.sort(
            (tile_id.reshape(-1), rank_b.reshape(-1), gidx.reshape(-1)),
            num_keys=2, is_stable=True)
        sorted_tile = (st, 0)

    if cfg.small_rect_cap and cfg.small_rect_cap < r_cap:
        # tabled gaussians truncate at r_cap; untabled big ones at small_rect_cap
        is_big = pre.tiles_touched > cfg.small_rect_cap
        n_big = jnp.sum(is_big.astype(jnp.int32))
        # the first big_table_cap big gaussians (by index) are tabled
        big_rank_of = jnp.cumsum(is_big.astype(jnp.int32)) - 1
        tabled = is_big & (big_rank_of < cfg.big_table_cap)
        cap_per = jnp.where(tabled, r_cap,
                            jnp.where(is_big, cfg.small_rect_cap, r_cap))
        overflow_gaussians = jnp.sum(
            jnp.maximum(pre.tiles_touched - cap_per, 0)).astype(jnp.int32)
        del n_big
    else:
        overflow_gaussians = jnp.sum(
            jnp.maximum(pre.tiles_touched - r_cap, 0)).astype(jnp.int32)
    return sorted_tile, sorted_gidx, overflow_gaussians, out_tiles


def _two_level_dup(pre, cfg, tile_id_full, ranks, num_tiles):
    """Shrink the duplicate list: s slots per gaussian + a compacted big table.

    Returns (tile_id [*, ·], gidx, rank) flattened-compatible arrays whose
    VALID entries are exactly the valid entries of the full [N, r_cap] table
    (identical splat set ⇒ identical render), provided at most big_table_cap
    gaussians touch more than small_rect_cap tiles — the excess ones keep
    their first small_rect_cap slots and the dropped rect slots are already
    counted by overflow_gaussians' caller via tiles_touched clamping below.
    """
    n = ranks.shape[0]
    s_cap, m_cap = cfg.small_rect_cap, cfg.big_table_cap
    r_cap = cfg.max_tiles_per_gaussian

    is_big = pre.tiles_touched > s_cap
    # stable order: first m_cap big gaussians (by index) get big-table rows
    big_order = jnp.argsort(~is_big, stable=True)          # big first
    big_rank = jnp.zeros((n,), jnp.int32).at[big_order].set(
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1))
    in_table = is_big & (big_rank < m_cap)

    # small level: every gaussian's first s_cap slots, minus tabled gaussians
    small_tile = jnp.where(in_table[:, None], num_tiles,
                           tile_id_full[:, :s_cap])
    small_gidx = jax.lax.broadcasted_iota(jnp.int32, (n, s_cap), 0)
    small_rank = jnp.broadcast_to(ranks[:, None], (n, s_cap))

    # big level: compacted rows carry the tabled gaussians' FULL r_cap slots
    big_ids = big_order[:m_cap]                             # [M]
    row_valid = in_table[big_ids]
    big_tile = jnp.where(row_valid[:, None], tile_id_full[big_ids], num_tiles)
    big_gidx = jnp.broadcast_to(big_ids[:, None], (m_cap, r_cap))
    big_rank_b = jnp.broadcast_to(ranks[big_ids][:, None], (m_cap, r_cap))

    tile_id = jnp.concatenate([small_tile.reshape(-1), big_tile.reshape(-1)])
    gidx = jnp.concatenate([small_gidx.reshape(-1), big_gidx.reshape(-1)])
    rank = jnp.concatenate([small_rank.reshape(-1), big_rank_b.reshape(-1)])
    return tile_id, gidx, rank


def _tile_gather(sorted_tile, sorted_gidx, num_tiles, k_cap):
    """Per-tile front-most splat lists (identifyTileRanges analog).

    `sorted_tile` is (keys [D], rank_bits) from _build_keys — tile ranges come
    from searchsorted on the (fused) keys; each tile's splat list is then a
    CONTIGUOUS run of `sorted_gidx`, read with vmapped dynamic_slice instead
    of an arbitrary [T, K] gather (contiguous slices stream from HBM; the
    elementwise gather measured 5.16 ms vs ~0.5 ms for slices at T=64/K=8k).

    Returns (gidx [T, K], in_list [T, K] bool, counts [T], overflow scalar).
    """
    keys, rank_bits = sorted_tile
    d = sorted_gidx.shape[0]
    tids = jax.lax.broadcasted_iota(jnp.int32, (num_tiles + 1, 1),
                                    0).squeeze(-1)
    bounds = jnp.searchsorted(keys, tids << rank_bits,
                              side="left").astype(jnp.int32)
    starts, ends = bounds[:-1], bounds[1:]
    counts = ends - starts
    k = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, k_cap), 1)
    in_list = k < jnp.minimum(counts, k_cap)[:, None]
    # pad so a slice starting at d-1 stays in bounds (tail entries are masked
    # off by in_list anyway)
    padded = jnp.concatenate(
        [sorted_gidx, jnp.zeros((k_cap,), sorted_gidx.dtype)])
    gidx = jax.vmap(
        lambda s: jax.lax.dynamic_slice(padded, (s,), (k_cap,)))(starts)
    overflow = jnp.sum(jnp.maximum(counts - k_cap, 0)).astype(jnp.int32)
    return gidx, in_list, counts, overflow


def _untile(img: jnp.ndarray, cfg: RasterizeConfig) -> jnp.ndarray:
    """[T, P, C] tile patches → [H, W, C] image (row-major tile order)."""
    tiles_x = (cfg.width + cfg.tile - 1) // cfg.tile
    tiles_y = (cfg.height + cfg.tile - 1) // cfg.tile
    c = img.shape[-1]
    img = img.reshape(tiles_y, tiles_x, cfg.tile, cfg.tile, c)
    img = jnp.moveaxis(img, 2, 1).reshape(tiles_y * cfg.tile,
                                          tiles_x * cfg.tile, c)
    return img[:cfg.height, :cfg.width]


def _blend_tiles(pre: gm.ProjectedGaussians, lang: jnp.ndarray,
                 gidx: jnp.ndarray, in_list: jnp.ndarray,
                 cfg: RasterizeConfig, bg_color: jnp.ndarray, tile_lo=0):
    """Chunked front-to-back blend over each tile's splat list.

    The per-chunk math mirrors renderCUDA's inner loop exactly but is expressed as
    cumulative sums + two matmuls per chunk so the MXU does the heavy lifting.

    Returns PATCHES (color [T,P,3], lang [T,P,F], final_t [T,P]) — callers
    assemble images with `_untile`. `tile_lo` (may be traced, e.g.
    lax.axis_index) offsets local tile indices to GLOBAL ids so a sharded
    caller owning tiles [tile_lo, tile_lo+T) blends at the right pixels — any
    contiguous window works, not just whole tile rows.
    """
    tiles_x = (cfg.width + cfg.tile - 1) // cfg.tile
    num_tiles, k_cap = gidx.shape
    p = cfg.tile * cfg.tile
    chunk = min(cfg.chunk, k_cap)
    assert k_cap % chunk == 0, "tile_capacity must be a multiple of chunk"
    n_chunks = k_cap // chunk

    # Pixel coordinates per tile: [T, P, 2]
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, 1), 0).squeeze(-1) \
        + tile_lo
    origin_x = (t_ids % tiles_x) * cfg.tile
    origin_y = (t_ids // tiles_x) * cfg.tile
    local = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0).squeeze(-1)
    lx = (local % cfg.tile)[None, :] + origin_x[:, None]
    ly = (local // cfg.tile)[None, :] + origin_y[:, None]
    pix_x = lx.astype(jnp.float32)
    pix_y = ly.astype(jnp.float32)

    n_channels = pre.rgb.shape[-1]
    f_channels = lang.shape[-1]

    gidx_c = gidx.reshape(num_tiles, n_chunks, chunk)
    in_list_c = in_list.reshape(num_tiles, n_chunks, chunk)

    def body(carry, inputs):
        log_t_raw, log_t_final, fail_any, color_acc, lang_acc = carry
        gi, live = inputs                                  # [T, CH], [T, CH]
        xy = pre.means2d[gi]                               # [T, CH, 2]
        con = pre.conic[gi]                                # [T, CH, 3]
        op = pre.opacity[gi]                               # [T, CH]
        rgb = pre.rgb[gi]                                  # [T, CH, 3]
        lf = lang[gi]                                      # [T, CH, F]

        dx = xy[..., 0][:, :, None] - pix_x[:, None, :]    # [T, CH, P]
        dy = xy[..., 1][:, :, None] - pix_y[:, None, :]
        power = (-0.5 * (con[..., 0][:, :, None] * dx * dx
                         + con[..., 2][:, :, None] * dy * dy)
                 - con[..., 1][:, :, None] * dx * dy)
        power_safe = jnp.minimum(power, 0.0)
        alpha = jnp.minimum(ALPHA_MAX, op[:, :, None] * jnp.exp(power_safe))
        active = (power <= 0.0) & (alpha >= ALPHA_MIN) & live[:, :, None]
        a = jnp.where(active, alpha, 0.0)                  # [T, CH, P]

        log1m = jnp.log1p(-a)
        csum = jnp.cumsum(log1m, axis=1)
        t_before = jnp.exp(csum - log1m + log_t_raw[:, None, :])
        test_t = t_before * (1.0 - a)
        fail = test_t < T_EPS
        fail_i = fail.astype(jnp.int32)
        term_before = ((jnp.cumsum(fail_i, axis=1) - fail_i) > 0) | fail_any[:, None, :]
        contrib = jnp.logical_not(term_before) & jnp.logical_not(fail)
        w = jnp.where(contrib, a * t_before, 0.0)          # [T, CH, P]

        color_acc = color_acc + jnp.einsum(
            "tkp,tkc->tpc", w, rgb, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        lang_acc = lang_acc + jnp.einsum(
            "tkp,tkc->tpc", w, lf, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        log_t_raw = log_t_raw + csum[:, -1, :]
        log_t_final = log_t_final + jnp.sum(jnp.where(contrib, log1m, 0.0), axis=1)
        fail_any = fail_any | jnp.any(fail, axis=1)
        return (log_t_raw, log_t_final, fail_any, color_acc, lang_acc), None

    init = (jnp.zeros((num_tiles, p), jnp.float32),
            jnp.zeros((num_tiles, p), jnp.float32),
            jnp.zeros((num_tiles, p), jnp.bool_),
            jnp.zeros((num_tiles, p, n_channels), jnp.float32),
            jnp.zeros((num_tiles, p, f_channels), jnp.float32))
    xs = (jnp.moveaxis(gidx_c, 1, 0), jnp.moveaxis(in_list_c, 1, 0))
    (_, log_t_final, _, color_acc, lang_acc), _ = jax.lax.scan(
        jax.checkpoint(body), init, xs)

    final_t = jnp.exp(log_t_final)                          # [T, P]
    color = color_acc + final_t[..., None] * bg_color[None, None, :]
    return color, lang_acc, final_t


def _blend_tiles_pallas_path(pre: gm.ProjectedGaussians, lang: jnp.ndarray,
                             gidx: jnp.ndarray, in_list: jnp.ndarray,
                             cfg: RasterizeConfig, bg_color: jnp.ndarray,
                             tile_lo=0):
    """Gather per-tile splat lists and run the Pallas blend kernel.

    The gathers/transposes stay in XLA (autodiff turns them into the
    deterministic segment-sum accumulation replacing CUDA's atomicAdd); only
    the pixel-blend recurrence runs in the hand-written kernel. Returns
    PATCHES like `_blend_tiles`; `tile_lo` globalizes the tile window for
    sharded callers.
    """
    from manigaussian_tpu.ops.pallas_blend import (blend_tiles_pallas,
                                                   gather_splats)

    tiles_x = (cfg.width + cfg.tile - 1) // cfg.tile
    num_tiles, k_cap = gidx.shape
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, 1), 0).squeeze(-1) \
        + tile_lo
    origins = jnp.stack([(t_ids % tiles_x) * cfg.tile,
                         (t_ids // tiles_x) * cfg.tile],
                        axis=-1).astype(jnp.float32)

    # Pack every per-splat attribute channel-first [C, N] and gather ONCE into
    # [C, T, K] (pallas_blend layout notes). The kernel forms tile-local
    # coordinates itself from `origins`.
    n_feat = lang.shape[-1]
    table = jnp.concatenate([
        pre.means2d.T,                       # rows 0:2
        pre.conic.T,                         # rows 2:5
        pre.opacity[None, :],                # row 5
        pre.rgb.T,                           # rows 6:9
        lang.T,                              # rows 9:9+F
    ], axis=0)                               # [9+F, N]
    # [C,T,K] → [T,C,K]: a MAJOR-axis swap (lane dim stays minor — cheap),
    # required because Pallas squeezes only leading block axes
    attrs = jnp.swapaxes(gather_splats(table, gidx), 0, 1)
    livet = in_list.astype(jnp.float32)[:, None, :]         # [T, 1, K]

    # per-tile live-splat counts bound the kernel's chunk loop (early exit)
    counts = jnp.sum(in_list, axis=1, dtype=jnp.int32)[:, None]  # [T, 1]

    # Mosaic compile only on real TPU; interpret elsewhere — including when a
    # jax.default_device(cpu) override routes this trace to CPU.
    default_dev = jax.config.jax_default_device
    if default_dev is not None:
        interpret = getattr(default_dev, "platform", str(default_dev)) != "tpu"
    else:
        interpret = jax.default_backend() != "tpu"
    color_t, lang_t, logtf = blend_tiles_pallas(
        counts, origins, attrs, livet, n_feat,
        (cfg.tile, min(cfg.chunk, k_cap), interpret))

    final_t = jnp.exp(logtf[:, 0, :])                       # [T, P]
    color = jnp.swapaxes(color_t, 1, 2) + final_t[..., None] * bg_color[None, None, :]
    lang_img = jnp.swapaxes(lang_t, 1, 2)
    return color, lang_img, final_t


def rasterize(means3d: jnp.ndarray,
              opacities: jnp.ndarray,
              camera,
              cfg: RasterizeConfig,
              bg_color,
              scales: jnp.ndarray | None = None,
              rotations: jnp.ndarray | None = None,
              cov3d_precomp: jnp.ndarray | None = None,
              shs: jnp.ndarray | None = None,
              colors_precomp: jnp.ndarray | None = None,
              language_features: jnp.ndarray | None = None,
              scale_modifier: float = 1.0) -> tuple[RenderOutput, RasterizeExtras]:
    """Render one view with the production tile pipeline. Differentiable.

    API parity: GaussianRasterizer.__call__
    (diff_gaussian_rasterization/__init__.py:181-233) → (color, language_feature,
    radii); plus final_T and overflow diagnostics.
    """
    pre = gm.preprocess(means3d, opacities, camera, cfg.width, cfg.height, cfg.tile,
                        scales=scales, rotations=rotations,
                        cov3d_precomp=cov3d_precomp, shs=shs,
                        colors_precomp=colors_precomp, sh_degree=cfg.sh_degree,
                        scale_modifier=scale_modifier)

    sorted_tile, sorted_gidx, overflow_g, num_tiles = _build_keys(pre, cfg)
    gidx, in_list, counts, overflow_s = _tile_gather(
        sorted_tile, sorted_gidx, num_tiles, cfg.tile_capacity)

    if language_features is None:
        lang = jnp.zeros((means3d.shape[0], 3), dtype=jnp.float32)
    else:
        lang = language_features

    bg = jnp.asarray(bg_color, dtype=jnp.float32)
    blend = (_blend_tiles_pallas_path if cfg.backend == "pallas"
             else _blend_tiles)
    color_p, lang_p, final_t_p = blend(pre, lang, gidx, in_list, cfg, bg)
    color = _untile(color_p, cfg)
    lang_img = _untile(lang_p, cfg)
    final_t = _untile(final_t_p[..., None], cfg)[..., 0]

    out = RenderOutput(color=color, language_feature=lang_img,
                       radii=pre.radii, final_t=final_t)
    extras = RasterizeExtras(overflow_splats=overflow_s,
                             overflow_gaussians=overflow_g,
                             tile_counts=counts)
    return out, extras
