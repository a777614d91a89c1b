"""Pallas TPU visibility-buffer rasterizer.

Grid iterates the *sorted pair stream* (one step = one meshlet x one tile),
so there are zero wasted steps for empty tiles. Scalar-prefetch index maps
perform the meshlet-setup gather — Pallas double-buffers those DMAs
automatically — and the output depth/vis tile block stays resident in VMEM
across consecutive pairs of the same tile (pairs are tile-sorted), giving
the accumulation pattern of a classic matmul K-loop.

This replaces the reference's vkCmdDrawIndexedIndirectCount consumption of
GPU-generated draw lists (graph.rs:222-229): the pair stream *is* the
indirect draw buffer, with capacity MAX_DRAW-style ceilings
(draw_gen.rs:15-16)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbit_tpu.raster.binning import BinLists
from orbit_tpu.raster.kernel_common import raster_meshlet_on_tile


def _kernel(meta_ref, ty_ref, tx_ref, setup_ref, depth_ref, vis_ref, *, tile_h, tile_w):
    p = pl.program_id(0)
    m = meta_ref[p]
    valid = (m & 1) == 1
    first = (m & 2) != 0
    slot = m >> 2

    @pl.when(first)
    def _():
        depth_ref[...] = jnp.zeros_like(depth_ref)
        vis_ref[...] = jnp.zeros_like(vis_ref)

    @pl.when(valid)
    def _():
        ty = ty_ref[p].astype(jnp.float32)
        tx = tx_ref[p].astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1)
        ys = ty * tile_h + rows + 0.5
        xs = tx * tile_w + cols + 0.5

        setup_m = setup_ref[0]  # [64, 12]
        vis_base = (slot << 6) + 1
        new_depth, new_vis = raster_meshlet_on_tile(
            setup_m, vis_base, xs, ys, depth_ref[...], vis_ref[...]
        )
        depth_ref[...] = new_depth
        vis_ref[...] = new_vis


def rasterize_pallas(
    setup,
    bins: BinLists,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    interpret: bool = False,
):
    """setup: [I, 64, 12] f32. Returns (depth [H,W] f32, vis [H,W] i32)."""
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    P = bins.pair_slot.shape[0]

    pvalid = bins.pair_tile >= 0
    # padding pairs inherit the last valid tile so the out block never
    # changes during the padded suffix (single final writeback)
    filled_tile = jax.lax.cummax(jnp.where(pvalid, bins.pair_tile, -1))
    filled_tile = jnp.maximum(filled_tile, 0)
    prev_tile = jnp.concatenate([jnp.full((1,), -1, jnp.int32), filled_tile[:-1]])
    first = pvalid & (filled_tile != prev_tile)
    slot = jnp.maximum(bins.pair_slot, 0)
    meta = (slot << 2) | (first.astype(jnp.int32) << 1) | pvalid.astype(jnp.int32)
    ty = filled_tile // ntx
    tx = filled_tile % ntx

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(P,),
        in_specs=[
            pl.BlockSpec(
                (1, 64, 12),
                lambda p, meta, ty, tx: (meta[p] >> 2, 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_h, tile_w), lambda p, meta, ty, tx: (ty[p], tx[p])
            ),
            pl.BlockSpec(
                (tile_h, tile_w), lambda p, meta, ty, tx: (ty[p], tx[p])
            ),
        ],
    )

    depth, vis = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, tile_w=tile_w),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nty * tile_h, ntx * tile_w), jnp.float32),
            jax.ShapeDtypeStruct((nty * tile_h, ntx * tile_w), jnp.int32),
        ],
        interpret=interpret,
    )(meta, ty, tx, setup)

    # tiles that no pair ever visited hold garbage: clear via tile_count
    occupied = (bins.tile_count > 0).reshape(nty, ntx)
    occupied = jnp.repeat(jnp.repeat(occupied, tile_h, 0), tile_w, 1)
    depth = jnp.where(occupied, depth, 0.0)
    vis = jnp.where(occupied, vis, 0)
    return depth[:height, :width], vis[:height, :width]
