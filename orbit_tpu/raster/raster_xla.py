"""Pure-XLA tiled rasterizer (fallback + differential reference).

Same math as the Pallas kernel (kernel_common), structured as a vmap over
tiles with an inner fori over the tile's pair range. Used for CPU tests,
the multi-chip dry run, and as the correctness oracle for the TPU kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orbit_tpu.raster.binning import BinLists
from orbit_tpu.raster.kernel_common import (
    VIS_TRI_BITS,
    raster_meshlet_on_tile,
    tile_pixel_centers,
)


def rasterize_xla(
    setup, bins: BinLists, height, width, tile_h, tile_w,
    init=None, vis_base_offset: int = 0,
):
    """setup: [I, 64, 12]; returns (depth [H,W] f32, vis [H,W] i32).

    init: optional (depth [H,W], vis [H,W]) to composite over (late
    occlusion pass). vis_base_offset shifts instance slots so two passes
    share one id space.
    """
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty
    tpx = tile_h * tile_w
    setup_flat = setup.reshape(setup.shape[0], -1)

    if init is not None:
        pad_h, pad_w = nty * tile_h - height, ntx * tile_w - width
        init_d = jnp.pad(init[0], ((0, pad_h), (0, pad_w)))
        init_v = jnp.pad(init[1], ((0, pad_h), (0, pad_w)))
        init_d = (
            init_d.reshape(nty, tile_h, ntx, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(n_tiles, tpx)
        )
        init_v = (
            init_v.reshape(nty, tile_h, ntx, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(n_tiles, tpx)
        )

    def do_tile(t):
        start = bins.tile_start[t]
        count = bins.tile_count[t]
        xs, ys = tile_pixel_centers(t // ntx, t % ntx, tile_h, tile_w)

        def body(k, carry):
            depth, vis = carry
            slot = bins.pair_slot[start + k]
            setup_m = setup_flat[slot].reshape(-1, 12)
            vis_base = ((slot + vis_base_offset) << VIS_TRI_BITS) + 1
            return raster_meshlet_on_tile(setup_m, vis_base, xs, ys, depth, vis)

        if init is None:
            depth0 = jnp.zeros((tpx,), jnp.float32)
            vis0 = jnp.zeros((tpx,), jnp.int32)
        else:
            depth0 = init_d[t]
            vis0 = init_v[t]
        depth, vis = jax.lax.fori_loop(0, count, body, (depth0, vis0))
        return depth.reshape(tile_h, tile_w), vis.reshape(tile_h, tile_w)

    depth_t, vis_t = jax.vmap(do_tile)(jnp.arange(n_tiles, dtype=jnp.int32))
    depth = (
        depth_t.reshape(nty, ntx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(nty * tile_h, ntx * tile_w)
    )
    vis = (
        vis_t.reshape(nty, ntx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(nty * tile_h, ntx * tile_w)
    )
    return depth[:height, :width], vis[:height, :width]
