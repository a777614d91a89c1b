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
    GB_ROWS,
    VIS_TRI_BITS,
    raster_meshlet_depth_alpha,
    raster_meshlet_gbuffer,
    raster_meshlet_on_tile,
    tile_pixel_centers,
)


def rasterize_xla(
    setup, bins: BinLists, height, width, tile_h, tile_w,
    init=None, vis_base_offset: int = 0, tile_row_offset=0,
    rows_per_view: int = 0, n_chunks: int = 4,
):
    """setup: [I, 12, 64] coefficient-major; returns (depth [H,W] f32,
    vis [H,W] i32).

    init: optional (depth [H,W], vis [H,W]) to composite over (late
    occlusion pass). vis_base_offset shifts instance slots so two passes
    share one id space. tile_row_offset (may be traced): this image is a
    band starting at that global tile row — pixel centers are computed in
    global coordinates so band raster is bit-identical to full-screen.
    rows_per_view: the target is an atlas of stacked views that many
    tile rows tall each — pixel centers are view-LOCAL (shadow-cascade
    atlas; mirrors the Pallas kernel exactly).
    """
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty
    tpx = tile_h * tile_w
    nc = n_chunks if (n_chunks > 1 and tile_h % n_chunks == 0) else 1
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
        ty = (
            (t // ntx) % rows_per_view
            if rows_per_view
            else t // ntx + tile_row_offset
        )
        xs, ys = tile_pixel_centers(ty, t % ntx, tile_h, tile_w)

        def body(k, carry):
            depth, vis, cur_min = carry
            slot = bins.pair_slot[start + k]
            setup_m = setup_flat[slot].reshape(12, -1).T
            vis_base = ((slot + vis_base_offset) << VIS_TRI_BITS) + 1
            # early-z skip (must mirror the Pallas kernel exactly): a pair
            # whose conservative nearest depth cannot beat the tile's
            # current min depth cannot win any pixel
            active = bins.pair_maxz[start + k] > cur_min
            # quarter-row bbox mask (mirrors the kernel's chunk skip)
            qr = bins.pair_qr[start + k]
            cr = tile_h // nc
            row_l = jnp.arange(tpx, dtype=jnp.int32) // tile_w
            mask = (row_l >= (qr // nc) * cr) & (row_l < (qr % nc + 1) * cr)
            nd, nv = raster_meshlet_on_tile(
                setup_m, vis_base, xs, ys, depth, vis, pix_mask=mask
            )
            nd = jnp.where(active, nd, depth)
            nv = jnp.where(active, nv, vis)
            cur_min = jnp.where(active, jnp.min(nd), cur_min)
            return nd, nv, cur_min

        if init is None:
            depth0 = jnp.zeros((tpx,), jnp.float32)
            vis0 = jnp.zeros((tpx,), jnp.int32)
        else:
            depth0 = init_d[t]
            vis0 = init_v[t]
        depth, vis, _ = jax.lax.fori_loop(
            0, count, body, (depth0, vis0, jnp.min(depth0))
        )
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


def rasterize_xla_depth_alpha(
    setup, attrs, bins: BinLists, height, width, tile_h, tile_w,
    alpha_masks, inst_mask_slot, inst_mid,
    init=None, vis_base_offset: int = 0, tile_row_offset=0,
    rows_per_view: int = 0, n_chunks: int = 4,
):
    """Depth+alpha rasterizer, XLA twin of rasterize_pallas_depth_alpha
    (shadow cascades of MASKED materials). Returns (depth, vis)."""
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty
    tpx = tile_h * tile_w
    nc = n_chunks if (n_chunks > 1 and tile_h % n_chunks == 0) else 1
    setup_flat = setup.reshape(setup.shape[0], -1)
    from orbit_tpu.raster.kernel_common import CA_ROWS as _ACR

    ac_rows = _ACR
    attrs_flat = attrs.reshape(-1, _ACR * attrs.shape[-1])

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
        ty = (
            (t // ntx) % rows_per_view
            if rows_per_view
            else t // ntx + tile_row_offset
        )
        xs, ys = tile_pixel_centers(ty, t % ntx, tile_h, tile_w)

        def body(k, carry):
            depth, vis, cur_min = carry
            slot = bins.pair_slot[start + k]
            setup_m = setup_flat[slot].reshape(12, -1).T
            attrs_m = attrs_flat[inst_mid[slot]].reshape(ac_rows, -1)
            vis_base = ((slot + vis_base_offset) << VIS_TRI_BITS) + 1
            active = bins.pair_maxz[start + k] > cur_min
            qr = bins.pair_qr[start + k]
            cr = tile_h // nc
            row_l = jnp.arange(tpx, dtype=jnp.int32) // tile_w
            mask = (row_l >= (qr // nc) * cr) & (row_l < (qr % nc + 1) * cr)
            nd, nv = raster_meshlet_depth_alpha(
                setup_m, attrs_m, vis_base, xs, ys, depth, vis,
                pix_mask=mask, alpha_masks=alpha_masks,
                mask_slot=inst_mask_slot[slot],
            )
            nd = jnp.where(active, nd, depth)
            nv = jnp.where(active, nv, vis)
            cur_min = jnp.where(active, jnp.min(nd), cur_min)
            return nd, nv, cur_min

        if init is None:
            depth0 = jnp.zeros((tpx,), jnp.float32)
            vis0 = jnp.zeros((tpx,), jnp.int32)
        else:
            depth0 = init_d[t]
            vis0 = init_v[t]
        depth, vis, _ = jax.lax.fori_loop(
            0, count, body, (depth0, vis0, jnp.min(depth0))
        )
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


def rasterize_xla_gbuffer(
    setup, attrs, bins: BinLists, height, width, tile_h, tile_w,
    init=None, vis_base_offset: int = 0, tile_row_offset=0,
    tiled_io: bool = False, alpha_masks=None, inst_mask_slot=None,
    inst_mid=None, overdraw=True, a2c_samples=1, n_chunks: int = 4,
):
    """G-buffer rasterizer (XLA fallback / differential reference).

    setup: [I,12,64] coefficient-major; attrs: the asset-side corner-attr array tri_ac
    [M, CA_ROWS, 64]; inst_mid: [I] i32 meshlet id per instance slot.
    Returns (depth [H,W], vis [H,W], gbuf [GB_ROWS, H, W]).
    init: optional (depth, vis, gbuf) to composite over.
    tiled_io: exchange buffers in the Pallas kernel's tile layout (see
    raster_pallas.rasterize_pallas_gbuffer / raster.layout).
    """
    from orbit_tpu.raster.layout import GROUP

    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty
    n_tiles_pad = -(-n_tiles // GROUP) * GROUP
    tpx = tile_h * tile_w
    nc = n_chunks if (n_chunks > 1 and tile_h % n_chunks == 0) else 1
    setup_flat = setup.reshape(setup.shape[0], -1)
    from orbit_tpu.raster.kernel_common import CA_ROWS as _ACR

    ac_rows = _ACR
    attrs_flat = attrs.reshape(-1, _ACR * attrs.shape[-1])
    if inst_mid is None:
        inst_mid = jnp.zeros((setup.shape[0],), jnp.int32)

    def to_tiles(img):
        pad_h, pad_w = nty * tile_h - height, ntx * tile_w - width
        lead = img.shape[:-2]
        x = jnp.pad(
            img, [(0, 0)] * len(lead) + [(0, pad_h), (0, pad_w)]
        )
        x = x.reshape(lead + (nty, tile_h, ntx, tile_w))
        perm = tuple(range(len(lead))) + tuple(
            len(lead) + i for i in (0, 2, 1, 3)
        )
        return x.transpose(perm).reshape(lead + (n_tiles, tpx))

    if init is not None and tiled_io:
        # tiled init: depth/vis [n_tiles_pad, tpx], gb [n_tiles_pad*GB, tpx]
        init_d = init[0][:n_tiles]
        init_v = init[1][:n_tiles]
        init_g = (
            init[2]
            .reshape(n_tiles_pad, GB_ROWS, tpx)[:n_tiles]
            .transpose(1, 0, 2)
        )
    elif init is not None:
        init_d = to_tiles(init[0])
        init_v = to_tiles(init[1])
        init_g = to_tiles(init[2])

    def do_tile(t):
        start = bins.tile_start[t]
        count = bins.tile_count[t]
        xs, ys = tile_pixel_centers(
            t // ntx + tile_row_offset, t % ntx, tile_h, tile_w
        )

        cpx = tpx // nc

        def seg_min(d):
            return d.reshape(nc, cpx).min(axis=1)

        def body(k, carry):
            depth, vis, gb, cur4 = carry
            slot = bins.pair_slot[start + k]
            setup_m = setup_flat[slot].reshape(12, -1).T
            attrs_m = attrs_flat[inst_mid[slot]].reshape(ac_rows, -1)
            vis_base = ((slot + vis_base_offset) << VIS_TRI_BITS) + 1
            # early-z skip — mirrors the Pallas kernel's PER-CHUNK
            # running mins exactly; a skipped pair (or chunk) contributes
            # nothing, including overdraw coverage
            maxz = bins.pair_maxz[start + k]
            active = maxz > jnp.min(cur4)
            qr = bins.pair_qr[start + k]
            cr = tile_h // nc
            row_l = jnp.arange(tpx, dtype=jnp.int32) // tile_w
            mask = (row_l >= (qr // nc) * cr) & (row_l < (qr % nc + 1) * cr)
            if nc > 1:
                mask = mask & (maxz > cur4[row_l // cr])
            ms = (
                inst_mask_slot[slot] if inst_mask_slot is not None else None
            )
            nd, nv, ng = raster_meshlet_gbuffer(
                setup_m, attrs_m, vis_base, xs, ys, depth, vis, gb,
                pix_mask=mask, alpha_masks=alpha_masks, mask_slot=ms,
                overdraw=overdraw, a2c_samples=a2c_samples,
            )
            nd = jnp.where(active, nd, depth)
            nv = jnp.where(active, nv, vis)
            ng = jnp.where(active, ng, gb)
            return nd, nv, ng, seg_min(nd)

        if init is None:
            c0 = (
                jnp.zeros((tpx,), jnp.float32),
                jnp.zeros((tpx,), jnp.int32),
                jnp.zeros((GB_ROWS, tpx), jnp.float32),
            )
        else:
            c0 = (init_d[t], init_v[t], init_g[:, t])
        depth, vis, gb, _ = jax.lax.fori_loop(
            0, count, body, c0 + (seg_min(c0[0]),)
        )
        return (
            depth.reshape(tile_h, tile_w),
            vis.reshape(tile_h, tile_w),
            gb.reshape(GB_ROWS, tile_h, tile_w),
        )

    depth_t, vis_t, gb_t = jax.vmap(do_tile)(
        jnp.arange(n_tiles, dtype=jnp.int32)
    )

    if tiled_io:
        pad = n_tiles_pad - n_tiles
        d_t = jnp.pad(depth_t.reshape(n_tiles, tpx), ((0, pad), (0, 0)))
        v_t = jnp.pad(vis_t.reshape(n_tiles, tpx), ((0, pad), (0, 0)))
        g_t = jnp.pad(
            gb_t.reshape(n_tiles, GB_ROWS, tpx), ((0, pad), (0, 0), (0, 0))
        ).reshape(n_tiles_pad * GB_ROWS, tpx)
        return d_t, v_t, g_t

    def from_tiles(t, lead=()):
        x = t.reshape(lead + (nty, ntx, tile_h, tile_w))
        perm = tuple(range(len(lead))) + tuple(
            len(lead) + i for i in (0, 2, 1, 3)
        )
        img = x.transpose(perm).reshape(
            lead + (nty * tile_h, ntx * tile_w)
        )
        return img[..., :height, :width]

    depth = from_tiles(depth_t)
    vis = from_tiles(vis_t)
    gb = from_tiles(gb_t.transpose(1, 0, 2, 3), lead=(GB_ROWS,))
    return depth, vis, gb
