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


def _kernel(
    meta_ref, ty_ref, tx_ref, setup_ref, init_d_ref, init_v_ref,
    depth_ref, vis_ref, *, tile_h, tile_w, vis_base_offset,
):
    p = pl.program_id(0)
    m = meta_ref[p]
    valid = (m & 1) == 1
    first = (m & 2) != 0
    slot = m >> 2

    @pl.when(first)
    def _():
        depth_ref[...] = init_d_ref[...]
        vis_ref[...] = init_v_ref[...]

    @pl.when(valid)
    def _():
        ty = ty_ref[p].astype(jnp.float32)
        tx = tx_ref[p].astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1)
        ys = ty * tile_h + rows + 0.5
        xs = tx * tile_w + cols + 0.5

        setup_m = setup_ref[0]  # [64, 12]
        vis_base = ((slot + vis_base_offset) << 6) + 1
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
    init=None,
    vis_base_offset: int = 0,
):
    """setup: [I, 64, 12] f32. Returns (depth [H,W] f32, vis [H,W] i32).

    init: optional (depth [H,W], vis [H,W]) composited under this pass.
    """
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    P = bins.pair_slot.shape[0]

    pad_h, pad_w = nty * tile_h - height, ntx * tile_w - width
    if init is None:
        init_d = jnp.zeros((nty * tile_h, ntx * tile_w), jnp.float32)
        init_v = jnp.zeros((nty * tile_h, ntx * tile_w), jnp.int32)
    else:
        init_d = jnp.pad(init[0], ((0, pad_h), (0, pad_w)))
        init_v = jnp.pad(init[1], ((0, pad_h), (0, pad_w)))

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

    tile_spec = pl.BlockSpec(
        (tile_h, tile_w), lambda p, meta, ty, tx: (ty[p], tx[p])
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(P,),
        in_specs=[
            pl.BlockSpec(
                (1, 64, 12),
                lambda p, meta, ty, tx: (meta[p] >> 2, 0, 0),
            ),
            tile_spec,
            tile_spec,
        ],
        out_specs=[tile_spec, tile_spec],
    )

    depth, vis = pl.pallas_call(
        functools.partial(
            _kernel,
            tile_h=tile_h,
            tile_w=tile_w,
            vis_base_offset=vis_base_offset,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nty * tile_h, ntx * tile_w), jnp.float32),
            jax.ShapeDtypeStruct((nty * tile_h, ntx * tile_w), jnp.int32),
        ],
        interpret=interpret,
    )(meta, ty, tx, setup, init_d, init_v)

    # tiles that no pair ever visited hold garbage: restore init values
    occupied = (bins.tile_count > 0).reshape(nty, ntx)
    occupied = jnp.repeat(jnp.repeat(occupied, tile_h, 0), tile_w, 1)
    depth = jnp.where(occupied, depth, init_d)
    vis = jnp.where(occupied, vis, init_v)
    return depth[:height, :width], vis[:height, :width]
