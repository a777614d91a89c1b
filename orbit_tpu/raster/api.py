"""Rasterizer front-end: geometry -> binning -> tiled raster."""

from __future__ import annotations

from dataclasses import dataclass

import jax

from orbit_tpu.raster.binning import BinLists, bin_meshlets
from orbit_tpu.raster.geometry import GeometryBuffers
from orbit_tpu.raster.raster_pallas import (
    rasterize_pallas,
    rasterize_pallas_gbuffer,
)
from orbit_tpu.raster.raster_xla import rasterize_xla, rasterize_xla_gbuffer


@dataclass(frozen=True)
class RasterConfig:
    tile_h: int = 16
    tile_w: int = 128
    pair_capacity: int = 1 << 14
    backend: str = "auto"  # auto | pallas | xla | pallas_interpret
    # pairs processed per Pallas grid step: amortizes the ~0.4us/step
    # grid+DMA machinery (measured with an empty kernel body). The pair
    # stream is padded so one step never spans two fb block groups.
    pairs_per_step: int = 8
    # row chunks per tile (pixel phases run per chunk): more chunks =
    # finer bbox/early-z skips and a smaller per-chunk live set — 8
    # chunks keep 512-px phases at tile_h=32, which is what lets the
    # G-buffer kernel use 32-row tiles without spilling VMEM
    n_chunks: int = 4

    def resolve_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        return (
            "pallas" if jax.default_backend() == "tpu" else "xla"
        )


def rasterize(
    geom: GeometryBuffers,
    height: int,
    width: int,
    cfg: RasterConfig,
    init=None,
    vis_base_offset: int = 0,
    row_window=None,
):
    """Returns (depth [H,W] f32 reverse-Z, vis [H,W] i32, bins).

    row_window: optional (row0_tiles, num_rows_tiles) — rasterize only the
    framebuffer band covering those global tile rows (multi-chip 'fb'
    sharding). The returned images then have num_rows*tile_h rows, and
    `init` must be band-sized. Band output is bit-identical to the same
    rows of a full-screen rasterization."""
    row0, local_h = _window(height, cfg, row_window)
    bins = bin_meshlets(
        geom.bbox,
        geom.inst_valid,
        width,
        height,
        cfg.tile_h,
        cfg.tile_w,
        cfg.pair_capacity,
        max_z=geom.max_z,
        row0=row0,
        num_rows=None if row_window is None else row_window[1],
        group_align=cfg.pairs_per_step,
        n_chunks=cfg.n_chunks,
    )
    backend = cfg.resolve_backend()
    if backend == "xla":
        depth, vis = rasterize_xla(
            geom.setup, bins, local_h, width, cfg.tile_h, cfg.tile_w,
            init=init, vis_base_offset=vis_base_offset,
            tile_row_offset=row0, n_chunks=cfg.n_chunks,
        )
    else:
        depth, vis = rasterize_pallas(
            geom.setup, bins, local_h, width, cfg.tile_h, cfg.tile_w,
            interpret=(backend == "pallas_interpret"),
            init=init, vis_base_offset=vis_base_offset,
            tile_row_offset=row0, pairs_per_step=cfg.pairs_per_step,
            n_chunks=cfg.n_chunks,
        )
    return depth, vis, bins


def rasterize_depth_alpha(
    geom: GeometryBuffers,
    height: int,
    width: int,
    cfg: RasterConfig,
    alpha_masks,
    tri_ac,
    init=None,
    vis_base_offset: int = 0,
):
    """Depth-only raster WITH the winner-level alpha test — the cheap
    path for shadow cascades of scenes with MASKED materials (reference:
    the depth-only shadow pipeline, shadow_renderer.rs:341-430 +
    shadow.frag:23-38 alpha discard). No G-buffer rows are computed or
    exchanged; cutout holes are bit-identical to the G-buffer path's.

    Returns (depth [H,W] f32, vis [H,W] i32, bins)."""
    from orbit_tpu.raster.raster_pallas import rasterize_pallas_depth_alpha
    from orbit_tpu.raster.raster_xla import rasterize_xla_depth_alpha

    bins = bin_meshlets(
        geom.bbox,
        geom.inst_valid,
        width,
        height,
        cfg.tile_h,
        cfg.tile_w,
        cfg.pair_capacity,
        max_z=geom.max_z,
        group_align=cfg.pairs_per_step,
        n_chunks=cfg.n_chunks,
    )
    backend = cfg.resolve_backend()
    if backend == "xla":
        depth, vis = rasterize_xla_depth_alpha(
            geom.setup, tri_ac, bins, height, width,
            cfg.tile_h, cfg.tile_w, alpha_masks,
            geom.mask_slot, geom.inst_mid,
            init=init, vis_base_offset=vis_base_offset,
            n_chunks=cfg.n_chunks,
        )
    else:
        depth, vis = rasterize_pallas_depth_alpha(
            geom.setup, tri_ac, bins, height, width,
            cfg.tile_h, cfg.tile_w, alpha_masks,
            geom.mask_slot, geom.inst_mid,
            interpret=(backend == "pallas_interpret"),
            init=init, vis_base_offset=vis_base_offset,
            pairs_per_step=cfg.pairs_per_step,
            n_chunks=cfg.n_chunks,
        )
    return depth, vis, bins


def _merge_view_bins(bins_list, slot_bases, pair_bases, n_tiles_view):
    """Concatenate per-view BinLists into one atlas stream: tile ids get
    each view's tile-row base, slots get each view's base into the
    concatenated setup array, per-tile ranges get the stream offset."""
    import functools as _ft

    import jax.numpy as jnp

    out = {}
    for f in ("pair_slot", "pair_tile", "tile_start", "tile_count",
              "pair_maxz", "pair_qr"):
        parts = []
        for v, b in enumerate(bins_list):
            a = getattr(b, f)
            if f == "pair_slot":
                a = jnp.where(a >= 0, a + slot_bases[v], -1)
            elif f == "pair_tile":
                a = jnp.where(a >= 0, a + v * n_tiles_view, -1)
            elif f == "tile_start":
                a = a + pair_bases[v]
            parts.append(a)
        out[f] = jnp.concatenate(parts)
    overflow = _ft.reduce(
        lambda x, y: x | y, [b.overflow for b in bins_list]
    )
    return BinLists(overflow=overflow, **out)


def rasterize_depth_views(
    geoms,  # list[GeometryBuffers], one per view (same SxS target)
    size: int,
    cfg: RasterConfig,
    alpha_masks=None,
    tri_ac=None,
    pair_capacities=None,  # per-view opaque-stream caps
    masked_pair_capacities=None,  # per-view masked-stream caps (alpha)
):
    """Render V same-sized depth views (shadow cascades) as ONE stacked
    atlas raster — the TPU answer to the reference's shared cascade
    cull+draw path into per-cascade targets (shadow_renderer.rs:341-430).

    Two levers vs one raster call per view:
      * fixed per-call cost (grid machinery, dispatch, chunk padding)
        is paid once for the whole stack, not per cascade;
      * with alpha masks, OPAQUE pairs (the bulk) run through the plain
        immediate-commit depth kernel, and only MASKED pairs pay the
        deferred-commit + mask-test kernel, composited on top. Final
        depth is identical to the single mixed-stream raster (the
        winner is the max over fragments, so commit order is free).

    Returns (depth [V, S, S] f32, opaque overflow, masked overflow)."""
    import jax.numpy as jnp

    from orbit_tpu.raster.binning import bin_meshlets
    from orbit_tpu.raster.raster_pallas import (
        rasterize_pallas_depth_alpha as _rp_alpha,
    )
    from orbit_tpu.raster.raster_xla import rasterize_xla_depth_alpha

    V = len(geoms)
    S = size
    th, tw = cfg.tile_h, cfg.tile_w
    nrows = -(-S // th)
    ntc = -(-S // tw) * nrows
    pack = cfg.pairs_per_step
    backend = cfg.resolve_backend()
    caps = pair_capacities or (cfg.pair_capacity,) * V
    split = alpha_masks is not None
    mcaps = masked_pair_capacities or (
        tuple(max(c // 4, pack) for c in caps) if split else None
    )

    setup_cat = jnp.concatenate([g.setup for g in geoms])
    slot_bases, b = [], 0
    for g in geoms:
        slot_bases.append(b)
        b += g.setup.shape[0]

    def merged(valid_of, cap_list):
        bins_v, pair_bases, pb = [], [], 0
        for v, g in enumerate(geoms):
            bins_v.append(
                bin_meshlets(
                    g.bbox, valid_of(g), S, S, th, tw, cap_list[v],
                    max_z=g.max_z, group_align=pack,
                    n_chunks=cfg.n_chunks,
                )
            )
            pair_bases.append(pb)
            pb += cap_list[v]
        return _merge_view_bins(bins_v, slot_bases, pair_bases, ntc)

    obins = merged(
        lambda g: g.inst_valid & (g.mask_slot < 0) if split
        else g.inst_valid,
        caps,
    )
    H_atlas = V * nrows * th
    if backend == "xla":
        depth, vis = rasterize_xla(
            setup_cat, obins, H_atlas, S, th, tw, rows_per_view=nrows,
            n_chunks=cfg.n_chunks,
        )
    else:
        depth, vis = rasterize_pallas(
            setup_cat, obins, H_atlas, S, th, tw,
            interpret=(backend == "pallas_interpret"),
            pairs_per_step=pack, rows_per_view=nrows,
            n_chunks=cfg.n_chunks,
        )
    overflow = obins.overflow

    if split:
        mbins = merged(
            lambda g: g.inst_valid & (g.mask_slot >= 0), mcaps
        )
        mask_cat = jnp.concatenate([g.mask_slot for g in geoms])
        mid_cat = jnp.concatenate([g.inst_mid for g in geoms])
        if backend == "xla":
            depth, vis = rasterize_xla_depth_alpha(
                setup_cat, tri_ac, mbins, H_atlas, S, th, tw,
                alpha_masks, mask_cat, mid_cat,
                init=(depth, vis), rows_per_view=nrows,
                n_chunks=cfg.n_chunks,
            )
        else:
            depth, vis = _rp_alpha(
                setup_cat, tri_ac, mbins, H_atlas, S, th, tw,
                alpha_masks, mask_cat, mid_cat,
                interpret=(backend == "pallas_interpret"),
                init=(depth, vis), pairs_per_step=pack,
                rows_per_view=nrows,
                n_chunks=cfg.n_chunks,
            )
        ovf_masked = mbins.overflow
    else:
        import jax.numpy as _jnp

        ovf_masked = _jnp.zeros((), bool)

    # atlas rows may carry tile padding per view when S % th != 0
    view_h = nrows * th
    depth_views = depth.reshape(V, view_h, S)[:, :S]
    return depth_views, overflow, ovf_masked


def _window(height, cfg, row_window):
    """(tile_row0, local pixel height) for an optional band window."""
    if row_window is None:
        return 0, height
    row0, num_rows = row_window
    assert height % cfg.tile_h == 0, (
        "band rendering requires height to be a multiple of tile_h"
    )
    return row0, num_rows * cfg.tile_h


def rasterize_gbuffer(
    geom: GeometryBuffers,
    height: int,
    width: int,
    cfg: RasterConfig,
    init=None,
    vis_base_offset: int = 0,
    row_window=None,
    tiled_io: bool = False,
    alpha_masks=None,
    tri_ac=None,
    overdraw=True,
    a2c_samples=1,
):
    """G-buffer raster: returns (depth, vis, gbuf [GB_ROWS,H,W], bins).

    tri_ac: the asset-side corner-attr array (assets.tri_ac) the kernel
    gathers per pair by meshlet id (geom.inst_mid).
    row_window: see `rasterize`. tiled_io: exchange framebuffers in the
    kernel's native tile layout (raster.layout) — no image transposes.
    alpha_masks: assets.alpha_masks when the scene has MASKED materials;
    enables the rasterizer's winner-level alpha test."""
    assert tri_ac is not None, "rasterize_gbuffer requires assets.tri_ac"
    row0, local_h = _window(height, cfg, row_window)
    bins = bin_meshlets(
        geom.bbox,
        geom.inst_valid,
        width,
        height,
        cfg.tile_h,
        cfg.tile_w,
        cfg.pair_capacity,
        max_z=geom.max_z,
        row0=row0,
        num_rows=None if row_window is None else row_window[1],
        group_align=cfg.pairs_per_step,
        n_chunks=cfg.n_chunks,
    )
    backend = cfg.resolve_backend()
    if backend == "xla":
        depth, vis, gb = rasterize_xla_gbuffer(
            geom.setup, tri_ac, bins, local_h, width,
            cfg.tile_h, cfg.tile_w,
            init=init, vis_base_offset=vis_base_offset,
            tile_row_offset=row0, tiled_io=tiled_io,
            alpha_masks=alpha_masks, inst_mask_slot=geom.mask_slot,
            inst_mid=geom.inst_mid, overdraw=overdraw,
            a2c_samples=a2c_samples, n_chunks=cfg.n_chunks,
        )
    else:
        depth, vis, gb = rasterize_pallas_gbuffer(
            geom.setup, tri_ac, bins, local_h, width,
            cfg.tile_h, cfg.tile_w,
            interpret=(backend == "pallas_interpret"),
            init=init, vis_base_offset=vis_base_offset,
            tile_row_offset=row0, tiled_io=tiled_io,
            pairs_per_step=cfg.pairs_per_step,
            alpha_masks=alpha_masks, inst_mask_slot=geom.mask_slot,
            inst_mid=geom.inst_mid, overdraw=overdraw,
            a2c_samples=a2c_samples, n_chunks=cfg.n_chunks,
        )
    return depth, vis, gb, bins
