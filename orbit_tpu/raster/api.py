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
):
    """Returns (depth [H,W] f32 reverse-Z, vis [H,W] i32, bins)."""
    bins = bin_meshlets(
        geom.bbox,
        geom.inst_valid,
        width,
        height,
        cfg.tile_h,
        cfg.tile_w,
        cfg.pair_capacity,
        max_z=geom.max_z,
    )
    backend = cfg.resolve_backend()
    if backend == "xla":
        depth, vis = rasterize_xla(
            geom.setup, bins, height, width, cfg.tile_h, cfg.tile_w,
            init=init, vis_base_offset=vis_base_offset,
        )
    else:
        depth, vis = rasterize_pallas(
            geom.setup, bins, height, width, cfg.tile_h, cfg.tile_w,
            interpret=(backend == "pallas_interpret"),
            init=init, vis_base_offset=vis_base_offset,
        )
    return depth, vis, bins


def rasterize_gbuffer(
    geom: GeometryBuffers,
    height: int,
    width: int,
    cfg: RasterConfig,
    init=None,
    vis_base_offset: int = 0,
):
    """G-buffer raster: returns (depth, vis, gbuf [GB_ROWS,H,W], bins)."""
    bins = bin_meshlets(
        geom.bbox,
        geom.inst_valid,
        width,
        height,
        cfg.tile_h,
        cfg.tile_w,
        cfg.pair_capacity,
        max_z=geom.max_z,
    )
    backend = cfg.resolve_backend()
    if backend == "xla":
        depth, vis, gb = rasterize_xla_gbuffer(
            geom.setup, geom.attrs, bins, height, width,
            cfg.tile_h, cfg.tile_w,
            init=init, vis_base_offset=vis_base_offset,
        )
    else:
        depth, vis, gb = rasterize_pallas_gbuffer(
            geom.setup, geom.attrs, bins, height, width,
            cfg.tile_h, cfg.tile_w,
            interpret=(backend == "pallas_interpret"),
            init=init, vis_base_offset=vis_base_offset,
        )
    return depth, vis, gb, bins
