"""Rasterizer front-end: geometry -> binning -> tiled raster."""

from __future__ import annotations

from dataclasses import dataclass

import jax

from orbit_tpu.raster.binning import bin_meshlets
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
    )
    backend = cfg.resolve_backend()
    if backend == "xla":
        depth, vis = rasterize_xla(
            geom.setup, bins, local_h, width, cfg.tile_h, cfg.tile_w,
            init=init, vis_base_offset=vis_base_offset,
            tile_row_offset=row0,
        )
    else:
        depth, vis = rasterize_pallas(
            geom.setup, bins, local_h, width, cfg.tile_h, cfg.tile_w,
            interpret=(backend == "pallas_interpret"),
            init=init, vis_base_offset=vis_base_offset,
            tile_row_offset=row0, pairs_per_step=cfg.pairs_per_step,
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
    )
    backend = cfg.resolve_backend()
    if backend == "xla":
        depth, vis = rasterize_xla_depth_alpha(
            geom.setup, tri_ac, bins, height, width,
            cfg.tile_h, cfg.tile_w, alpha_masks,
            geom.mask_slot, geom.inst_mid,
            init=init, vis_base_offset=vis_base_offset,
        )
    else:
        depth, vis = rasterize_pallas_depth_alpha(
            geom.setup, tri_ac, bins, height, width,
            cfg.tile_h, cfg.tile_w, alpha_masks,
            geom.mask_slot, geom.inst_mid,
            interpret=(backend == "pallas_interpret"),
            init=init, vis_base_offset=vis_base_offset,
            pairs_per_step=cfg.pairs_per_step,
        )
    return depth, vis, bins


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
            a2c_samples=a2c_samples,
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
            a2c_samples=a2c_samples,
        )
    return depth, vis, gb, bins
