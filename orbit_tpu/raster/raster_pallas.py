"""Pallas TPU visibility-buffer rasterizer.

Grid iterates the *sorted pair stream* (one step = one meshlet x one tile),
so there are zero wasted steps for empty tiles. Scalar-prefetch index maps
perform the meshlet-setup gather — Pallas double-buffers those DMAs
automatically — and the output depth/vis blocks stay resident in VMEM
across consecutive pairs (the accumulation pattern of a matmul K-loop).

Mosaic layout: every in-kernel array is rank-2. Triangle functionals are
[64, TILE_PX] (triangles on sublanes, pixels on lanes). The framebuffer is
stored as [n_tile_groups * 8, TILE_PX] — blocks cover 8 consecutive tiles
(to satisfy the (8,128) min block shape) and the pair's tile selects one
row group dynamically.

This replaces the reference's consumption of GPU-generated indirect draw
lists (vkCmdDrawIndexedIndirectCount, graph.rs:222-229): the pair stream
*is* the indirect draw buffer, with MAX_DRAW-style capacity ceilings
(draw_gen.rs:15-16).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbit_tpu.raster.binning import BinLists
from orbit_tpu.raster.kernel_common import (
    CA_ROWS,
    GB_OVERDRAW,
    GB_ROWS,
    eval_gbuffer_channels,
)

_GROUP = 8  # tiles per framebuffer block

# scoped-VMEM ceiling: 32-row depth-only tiles need framebuffer block
# groups beyond the 16 MB default scoped limit. (Measured round 5: the
# G-buffer kernel's phase-2 live set exceeds the real budget at
# tile_px 4096 with the alpha branch and collapses 10x regardless of
# this limit — raising it is necessary for big tiles but not magic.)
_VMEM_MB = int(os.environ.get("ORBIT_VMEM_MB", "64"))
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=_VMEM_MB * 1024 * 1024
)


def _setup_cols(st):
    """[12, 64] coefficient-major setup block -> [64, 12] (triangles on
    sublanes, the eval layout). Mosaic lowers rank-2 transposes natively
    (pure data movement — exact, so both backends stay bit-identical)."""
    return jnp.transpose(st)


# one pallas_call's scalar-prefetch arrays must fit the 1 MB SMEM budget;
# larger pair capacities run as a chain of calls over stream chunks
_MAX_PAIRS_PER_CALL = 49152


def _chunk_slices(P: int, pack: int):
    """Split a pair stream into pallas_call chunks: full _MAX-sized
    chunks plus one remainder (any multiple of `pack`). Each call's
    scalar-prefetch arrays must fit the 1 MB SMEM budget."""
    assert P % pack == 0, f"pair capacity {P} not divisible by {pack}"
    sizes = [_MAX_PAIRS_PER_CALL] * (P // _MAX_PAIRS_PER_CALL)
    rem = P % _MAX_PAIRS_PER_CALL
    if rem:
        sizes.append(rem)
    out, off = [], 0
    for s in sizes:
        out.append(slice(off, off + s))
        off += s
    return out


def _slice_bins(bins: BinLists, s: slice) -> BinLists:
    """Chunk view of the pair stream (per-tile ranges unused here)."""
    import dataclasses

    return dataclasses.replace(
        bins,
        pair_slot=bins.pair_slot[s],
        pair_tile=bins.pair_tile[s],
        pair_maxz=bins.pair_maxz[s],
        pair_qr=bins.pair_qr[s],
    )


def _pair_meta(bins: BinLists, P: int, inst_mask_slot=None):
    """Pack per-pair scalars into TWO SMEM arrays (prefetch SMEM is 1 MB;
    at 64k-pair capacity every word counts):
      meta = slot<<3 | first_tile<<2 | first_group<<1 | valid
      tq   = forward-filled tile | qr<<18  (padding pairs revisit the
             last real tile so the out-block index stays put; qr is the
             packed q0*n_chunks+q1 chunk range, up to 6 bits)
    """
    pvalid = bins.pair_tile >= 0
    filled_tile = jax.lax.cummax(jnp.where(pvalid, bins.pair_tile, -1))
    filled_tile = jnp.maximum(filled_tile, 0)
    group = filled_tile // _GROUP
    prev_group = jnp.concatenate([jnp.full((1,), -1, jnp.int32), group[:-1]])
    first_group = pvalid & (group != prev_group)
    prev_tile = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), filled_tile[:-1]]
    )
    first_tile = pvalid & (filled_tile != prev_tile)
    slot = jnp.maximum(bins.pair_slot, 0)
    meta = (
        (slot << 3)
        | (first_tile.astype(jnp.int32) << 2)
        | (first_group.astype(jnp.int32) << 1)
        | pvalid.astype(jnp.int32)
    )
    if inst_mask_slot is not None:
        # alpha-mask slot rides in meta bits 26.. (slot must fit 23 bits)
        meta = meta | ((inst_mask_slot[slot] + 1) << 26)
    tq = filled_tile | (bins.pair_qr << 18)
    # EXACT f32 early-z bound as its own prefetch array: quantized
    # bounds either drop winners (floor) or cannot skip same-depth ties
    # (ceil) — see binning.pair_maxz
    return meta, tq, bins.pair_maxz.astype(jnp.float32)


def _kernel(
    meta_ref, tq_ref, maxz_ref, pslot_ref, rowoff_ref, *refs,
    tile_h, tile_w, ntx, vis_base_offset, pack, rows_per_view=0,
    n_chunks=4,
):
    # refs: pack setup blocks, init_d, init_v (aliased), depth, vis, scratch
    setup_refs = refs[:pack]
    depth_ref, vis_ref, cur_min_ref = refs[pack + 2], refs[pack + 3], refs[pack + 4]
    p = pl.program_id(0)
    tpx = tile_h * tile_w
    if tile_h % n_chunks:
        n_chunks = 1
    cpx = tpx // n_chunks
    rows_per_chunk = tile_h // n_chunks

    # pair-packed step: `pack` pairs share one framebuffer block (the
    # binner's group_align padding guarantees they are in one tile group)
    for j in range(pack):
        i = p * pack + j
        m = meta_ref[i]
        valid = (m & 1) == 1
        first_tile = (m & 4) != 0
        slot = m >> 3

        # framebuffer blocks are input-output ALIASED to the init
        # buffers: the kernel reads/updates them in place, untouched
        # groups keep the init content, and no per-group copy is needed

        tq = tq_ref[i]
        tile = tq & 0x3FFFF
        r = tile % _GROUP

        # the tile's PER-CHUNK running min depths (SMEM [1, 4]): the
        # early-z reference. Initialized at each tile's first pair — for
        # a late pass this starts at the early pass's depth — and
        # updated from the in-register post-commit chunk values (a
        # [1, CPX] reduce only for chunks a pair actually won, replacing
        # the old per-active-pair full-tile reduce). Chunk-grained mins
        # also let a pair skip individual chunks it cannot win.
        @pl.when(valid & first_tile)
        def _(r=r):
            for q in range(n_chunks):
                cur_min_ref[0, q] = jnp.min(
                    depth_ref[pl.ds(r, 1), pl.ds(q * cpx, cpx)]
                )

        # early-z skip: if this meshlet's conservative nearest depth
        # cannot beat the tile's farthest pixel, nothing can win
        maxz = maxz_ref[i]
        tile_min = cur_min_ref[0, 0]
        for q in range(1, n_chunks):
            tile_min = jnp.minimum(tile_min, cur_min_ref[0, q])
        active = valid & (maxz > tile_min)

        # the ENTIRE pair body gates on `active`: a skipped or PADDING
        # pair costs only the decode above — measured ~0.4 us/pair
        # otherwise, which made capacity slack as expensive as real work
        @pl.when(active)
        def _(j=j, m=m, tq=tq, r=r, maxz=maxz):
            slot = m >> 3
            qr = (tq >> 18) & 63
            q0 = qr // n_chunks
            q1 = qr % n_chunks
            # rows_per_view: atlas raster of several stacked views
            # (shadow cascades) — edge functionals are in each view's
            # own pixel space, so ty is the view-LOCAL tile row (exact
            # integer mod: bit-identical to per-view rendering)
            if rows_per_view:
                ty = ((tile // ntx) % rows_per_view).astype(jnp.float32)
            else:
                ty = (tile // ntx + rowoff_ref[0]).astype(jnp.float32)
            tx = (tile % ntx).astype(jnp.float32)
            st = setup_refs[j][0]  # [12, 64] (in-kernel slot gather)
            s = _setup_cols(st)  # [64, 12] eval layout

            def coef(k, s=s):
                return s[:, k][:, None]  # [64, 1]

            vis_base = ((slot + vis_base_offset) << 6) + 1

            for q in range(n_chunks):
                # chunk skip: pixels outside the meshlet's bbox rows
                # can't be covered (only the spanned quarter-row
                # chunks run), and a chunk whose min depth already
                # beats the pair's conservative nearest depth cannot
                # be won either
                run_q = jnp.bool_(True) if n_chunks == 1 else (
                    (q >= q0) & (q <= q1)
                    & (maxz > cur_min_ref[0, q])
                )

                @pl.when(run_q)
                def _(q=q, r=r, coef=coef, vis_base=vis_base):
                    lanes = pl.ds(q * cpx, cpx)
                    flat = jax.lax.broadcasted_iota(
                        jnp.int32, (1, cpx), 1
                    )
                    col = (flat % tile_w).astype(jnp.float32)
                    row = (
                        flat // tile_w + q * rows_per_chunk
                    ).astype(jnp.float32)
                    xs = tx * tile_w + col + 0.5  # [1, CPX]
                    ys = ty * tile_h + row + 0.5

                    e0 = coef(0) * xs + coef(1) * ys + coef(2)
                    e1 = coef(3) * xs + coef(4) * ys + coef(5)
                    e2 = coef(6) * xs + coef(7) * ys + coef(8)
                    z = coef(9) * xs + coef(10) * ys + coef(11)

                    inside = (
                        (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                        & (z <= 1.0)
                    )
                    cand = jnp.where(inside, z, -1.0)
                    best_z = jnp.max(cand, axis=0, keepdims=True)
                    best_tri = jnp.argmax(
                        cand, axis=0, keepdims=True
                    ).astype(jnp.int32)

                    cur_d = depth_ref[pl.ds(r, 1), lanes]
                    win = best_z > cur_d

                    @pl.when(jnp.any(win))
                    def _():
                        cur_v = vis_ref[pl.ds(r, 1), lanes]
                        new_d = jnp.where(win, best_z, cur_d)
                        depth_ref[pl.ds(r, 1), lanes] = new_d
                        vis_ref[pl.ds(r, 1), lanes] = jnp.where(
                            win, vis_base + best_tri, cur_v
                        )
                        cur_min_ref[0, q] = jnp.min(new_d)


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
    tile_row_offset=0,
    pairs_per_step: int = 1,
    rows_per_view: int = 0,
    tiled_io: bool = False,
    n_chunks: int = 4,
):
    """setup: [I, 12, 64] f32 (coefficient-major). Returns (depth [H,W] f32, vis [H,W] i32).

    init: optional (depth [H,W], vis [H,W]) composited under this pass.
    pairs_per_step > 1 requires bins built with group_align=pairs_per_step
    (the per-pair setup is pre-gathered into pair order so blocks stream
    sequentially, and each step touches one framebuffer block group).
    rows_per_view: the target is an atlas of stacked views that many tile
    rows tall each (shadow-cascade atlas); pair setups are in view-local
    pixel space. tiled_io: return (depth, vis) in the native tile layout.
    """
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty
    n_tiles_pad = -(-n_tiles // _GROUP) * _GROUP
    tpx = tile_h * tile_w
    P = bins.pair_slot.shape[0]

    def to_tiles(img):
        pad_h, pad_w = nty * tile_h - height, ntx * tile_w - width
        x = jnp.pad(img, ((0, pad_h), (0, pad_w)))
        t = (
            x.reshape(nty, tile_h, ntx, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(n_tiles, tpx)
        )
        return jnp.pad(t, ((0, n_tiles_pad - n_tiles), (0, 0)))

    def from_tiles(t):
        img = (
            t[:n_tiles]
            .reshape(nty, ntx, tile_h, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(nty * tile_h, ntx * tile_w)
        )
        return img[:height, :width]

    if init is None:
        init_d = jnp.zeros((n_tiles_pad, tpx), jnp.float32)
        init_v = jnp.zeros((n_tiles_pad, tpx), jnp.int32)
    elif tiled_io:
        init_d, init_v = init
    else:
        init_d = to_tiles(init[0])
        init_v = to_tiles(init[1])

    rowoff = jnp.full((1,), tile_row_offset, jnp.int32)
    pack = pairs_per_step
    if tile_h % n_chunks:
        n_chunks = 1

    fb_spec = pl.BlockSpec(
        (_GROUP, tpx),
        lambda p, meta, tq, mz, ps, ro: (
            (tq[p * pack] & 0x3FFFF) // _GROUP, 0
        ),
    )
    # per-pair setup blocks are gathered IN-KERNEL from the [I, 12, 64]
    # array: the block index map reads the pair's slot from the
    # prefetched pslot array (Pallas double-buffers the DMAs). This
    # replaces a [P, 12, 64] HBM pre-gather + layout copy.
    setup_specs = [
        pl.BlockSpec(
            (1, 12, 64),
            functools.partial(
                lambda p, meta, tq, mz, ps, ro, j: (
                    ps[p * pack + j], 0, 0
                ),
                j=j,
            ),
        )
        for j in range(pack)
    ]

    # the framebuffer inputs are ALIASED to the outputs: raster updates
    # them in place and untouched tile groups keep their init content.
    # The prefetch SMEM budget (1 MB) caps one call at ~64k pairs; larger
    # capacities run as a chain of calls over stream chunks, each aliased
    # in-place onto the running framebuffer (raster is order-compositing,
    # so chunk boundaries — even mid-tile — are transparent)
    depth_t, vis_t = init_d, init_v
    base_io = 5 + pack  # prefetch args + setup blocks
    for s in _chunk_slices(P, pack):
        chunk = s.stop - s.start
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(chunk // pack,),
            in_specs=setup_specs + [fb_spec, fb_spec],
            out_specs=[fb_spec, fb_spec],
            scratch_shapes=[pltpu.SMEM((1, max(n_chunks, 1)), jnp.float32)],
        )
        # per-chunk metadata: each call's first pair of a tile re-reads
        # the running tile min (the cur_min scratch starts cold per call)
        meta, tq, maxz = _pair_meta(_slice_bins(bins, s), chunk)
        pslot = jnp.maximum(bins.pair_slot[s], 0)
        depth_t, vis_t = pl.pallas_call(
            functools.partial(
                _kernel,
                tile_h=tile_h,
                tile_w=tile_w,
                ntx=ntx,
                vis_base_offset=vis_base_offset,
                pack=pack,
                rows_per_view=rows_per_view,
                n_chunks=n_chunks,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles_pad, tpx), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles_pad, tpx), jnp.int32),
            ],
            input_output_aliases={base_io: 0, base_io + 1: 1},
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
            name="raster_depth",
        )(
            meta, tq, maxz, pslot, rowoff,
            *([setup] * pack), depth_t, vis_t,
        )
    if tiled_io:
        return depth_t, vis_t
    return from_tiles(depth_t), from_tiles(vis_t)


def _depth_alpha_kernel(
    meta_ref, tq_ref, maxz_ref, pslot_ref, pmid_ref, rowoff_ref, *refs,
    tile_h, tile_w, ntx, vis_base_offset, pack, rows_per_view=0,
    n_chunks=4,
):
    """Depth-only raster with the winner-level alpha test: the shadow-
    cascade path for MASKED materials. The alpha test is evaluated
    PER CHUNK (chunks partition the tile's pixels, so each chunk's
    depth-test winner is independent): a small foliage meshlet spanning
    one quarter-row chunk pays the uv/mask matmuls on [*, cpx] lanes
    only, not the whole tile — and only when it won a pixel there."""
    setup_refs = refs[:pack]
    attrs_refs = refs[pack : 2 * pack]
    (mask_ref, _i1, _i2, depth_ref, vis_ref, cur_min_ref) = refs[2 * pack :]
    del _i1, _i2  # aliased to depth/vis (in-place update)
    p = pl.program_id(0)
    tpx = tile_h * tile_w
    if tile_h % n_chunks:
        n_chunks = 1
    cpx = tpx // n_chunks
    rows_per_chunk = tile_h // n_chunks

    for j in range(pack):
        i = p * pack + j
        m = meta_ref[i]
        valid = (m & 1) == 1
        first_tile = (m & 4) != 0
        slot = (m >> 3) & 0x7FFFFF
        mslot = (m >> 26) - 1

        tq = tq_ref[i]
        tile = tq & 0x3FFFF
        r = tile % _GROUP

        # per-chunk running min depths (see _kernel)
        @pl.when(valid & first_tile)
        def _(r=r):
            for q in range(n_chunks):
                cur_min_ref[0, q] = jnp.min(
                    depth_ref[pl.ds(r, 1), pl.ds(q * cpx, cpx)]
                )

        maxz = maxz_ref[i]
        tile_min = cur_min_ref[0, 0]
        for q in range(1, n_chunks):
            tile_min = jnp.minimum(tile_min, cur_min_ref[0, q])
        active = valid & (maxz > tile_min)


        # whole pair body gated on `active` (see _kernel): padding /
        # early-z-skipped pairs cost only the decode above
        @pl.when(active)
        def _(j=j, tq=tq, r=r, maxz=maxz, slot=slot, mslot=mslot):
            qr = (tq >> 18) & 63
            q0 = qr // n_chunks
            q1 = qr % n_chunks
            if rows_per_view:  # stacked-view atlas: view-local tile row
                ty = ((tile // ntx) % rows_per_view).astype(jnp.float32)
            else:
                ty = (tile // ntx + rowoff_ref[0]).astype(jnp.float32)
            tx = (tile % ntx).astype(jnp.float32)
            st = setup_refs[j][0]  # [12, 64]
            s = _setup_cols(st)

            def coef(k, s=s):
                return s[:, k][:, None]

            vis_base = ((slot + vis_base_offset) << 6) + 1

            for q in range(n_chunks):
                run_q = jnp.bool_(True) if n_chunks == 1 else (
                    (q >= q0) & (q <= q1)
                    & (maxz > cur_min_ref[0, q])
                )

                @pl.when(run_q)
                def _(q=q, r=r, j=j, s=s, coef=coef, vis_base=vis_base,
                      mslot=mslot):
                    lanes = pl.ds(q * cpx, cpx)
                    flat = jax.lax.broadcasted_iota(jnp.int32, (1, cpx), 1)
                    col = (flat % tile_w).astype(jnp.float32)
                    row = (
                        flat // tile_w + q * rows_per_chunk
                    ).astype(jnp.float32)
                    xs = tx * tile_w + col + 0.5
                    ys = ty * tile_h + row + 0.5

                    e0 = coef(0) * xs + coef(1) * ys + coef(2)
                    e1 = coef(3) * xs + coef(4) * ys + coef(5)
                    e2 = coef(6) * xs + coef(7) * ys + coef(8)
                    z = coef(9) * xs + coef(10) * ys + coef(11)

                    inside = (
                        (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & (z <= 1.0)
                    )
                    cand = jnp.where(inside, z, -1.0)
                    best_z = jnp.max(cand, axis=0, keepdims=True)
                    best_tri = jnp.argmax(cand, axis=0, keepdims=True).astype(
                        jnp.int32
                    )

                    cur_d = depth_ref[pl.ds(r, 1), lanes]
                    win = best_z > cur_d
                    won = jnp.any(win)

                    def commit(winm, q=q, r=r, lanes=lanes, cur_d=cur_d,
                               best_z=best_z, best_tri=best_tri,
                               vis_base=vis_base):
                        cur_v = vis_ref[pl.ds(r, 1), lanes]
                        new_d = jnp.where(winm, best_z, cur_d)
                        depth_ref[pl.ds(r, 1), lanes] = new_d
                        vis_ref[pl.ds(r, 1), lanes] = jnp.where(
                            winm, vis_base + best_tri, cur_v
                        )
                        cur_min_ref[0, q] = jnp.min(new_d)

                    # OPAQUE pairs commit straight from the depth test
                    @pl.when(won & (mslot < 0))
                    def _():
                        commit(win)

                    # MASKED pairs: refine this chunk's winners by the
                    # material's alpha mask before commit (one-hot MXU
                    # selects on [*, cpx] lanes only — a foliage meshlet
                    # spanning one quarter-row chunk never touches the
                    # rest of the tile)
                    @pl.when(won & (mslot >= 0))
                    def _():
                        from orbit_tpu.raster.kernel_common import (
                            ALPHA_MASK_RES,
                            CA_CH,
                            alpha_mask_texel_index,
                            eval_uv,
                        )

                        attrs_m = attrs_refs[j][...]  # [CA_ROWS, 64]
                        oh = (
                            jax.lax.broadcasted_iota(jnp.int32, (64, cpx), 0)
                            == jnp.broadcast_to(best_tri, (64, cpx))
                        ).astype(jnp.float32)
                        uv_rows = jnp.concatenate(
                            [
                                attrs_m[0:2],
                                attrs_m[CA_CH : CA_CH + 2],
                                attrs_m[2 * CA_CH : 2 * CA_CH + 2],
                            ],
                            axis=0,
                        )  # [6, 64]
                        sel_uv = jax.lax.dot_general(
                            uv_rows, oh, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                        )
                        sel_s = jax.lax.dot_general(
                            s, oh, (((0,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                        )
                        u, v = eval_uv(sel_uv, sel_s, xs, ys)

                        R = ALPHA_MASK_RES
                        ui, vi = alpha_mask_texel_index(u, v, R)
                        mblk = mask_ref[
                            pl.ds(jnp.maximum(mslot, 0) * R, R), :
                        ]
                        iota_r = jax.lax.broadcasted_iota(
                            jnp.int32, (R, cpx), 0
                        )
                        oh_v = (iota_r == vi).astype(jnp.float32)
                        B = jax.lax.dot_general(
                            mblk, oh_v, (((0,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                        )
                        iota_c = jax.lax.broadcasted_iota(
                            jnp.int32, (128, cpx), 0
                        )
                        oh_u = (iota_c == ui).astype(jnp.float32)
                        a = jnp.sum(B * oh_u, axis=0, keepdims=True)
                        # signed alpha field: keep iff alpha > cutoff
                        commit(win & (a > 0.0))


def rasterize_pallas_depth_alpha(
    setup,
    attrs,
    bins: BinLists,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    alpha_masks,
    inst_mask_slot,
    inst_mid,
    interpret: bool = False,
    init=None,
    vis_base_offset: int = 0,
    tile_row_offset=0,
    pairs_per_step: int = 1,
    rows_per_view: int = 0,
    tiled_io: bool = False,
    n_chunks: int = 4,
):
    """Depth+alpha rasterizer (see _depth_alpha_kernel). Returns
    (depth [H,W] f32, vis [H,W] i32). rows_per_view/tiled_io: see
    rasterize_pallas."""
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty
    n_tiles_pad = -(-n_tiles // _GROUP) * _GROUP
    tpx = tile_h * tile_w
    P = bins.pair_slot.shape[0]

    def to_tiles(img):
        pad_h, pad_w = nty * tile_h - height, ntx * tile_w - width
        x = jnp.pad(img, ((0, pad_h), (0, pad_w)))
        t = (
            x.reshape(nty, tile_h, ntx, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(n_tiles, tpx)
        )
        return jnp.pad(t, ((0, n_tiles_pad - n_tiles), (0, 0)))

    def from_tiles(t):
        img = (
            t[:n_tiles]
            .reshape(nty, ntx, tile_h, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(nty * tile_h, ntx * tile_w)
        )
        return img[:height, :width]

    if init is None:
        init_d = jnp.zeros((n_tiles_pad, tpx), jnp.float32)
        init_v = jnp.zeros((n_tiles_pad, tpx), jnp.int32)
    elif tiled_io:
        init_d, init_v = init
    else:
        init_d = to_tiles(init[0])
        init_v = to_tiles(init[1])

    rowoff = jnp.full((1,), tile_row_offset, jnp.int32)
    pack = pairs_per_step
    if tile_h % n_chunks:
        n_chunks = 1

    fb_spec = pl.BlockSpec(
        (_GROUP, tpx),
        lambda p, meta, tq, mz, ps, pm, ro: (
            (tq[p * pack] & 0x3FFFF) // _GROUP, 0
        ),
    )

    def _slot_spec(shape, j):
        return pl.BlockSpec(
            (1,) + shape,
            functools.partial(
                lambda p, meta, tq, mz, ps, pm, ro, j: (
                    ps[p * pack + j], 0, 0
                ),
                j=j,
            ),
        )

    def _mid_spec(shape, j):
        # tri_ac is flat [M * CA_ROWS, 64]: block row pm == meshlet pm
        return pl.BlockSpec(
            shape,
            functools.partial(
                lambda p, meta, tq, mz, ps, pm, ro, j: (
                    pm[p * pack + j], 0
                ),
                j=j,
            ),
        )

    in_specs = [_slot_spec((12, 64), j) for j in range(pack)]
    in_specs += [_mid_spec((CA_ROWS, 64), j) for j in range(pack)]
    in_specs.append(
        pl.BlockSpec(
            alpha_masks.shape,
            lambda p, meta, tq, mz, ps, pm, ro: (0, 0),
        )
    )
    in_specs += [fb_spec, fb_spec]
    n_lead = 2 * pack + 1

    depth_t, vis_t = init_d, init_v
    for s in _chunk_slices(P, pack):
        chunk = s.stop - s.start
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(chunk // pack,),
            in_specs=in_specs,
            out_specs=[fb_spec, fb_spec],
            scratch_shapes=[pltpu.SMEM((1, max(n_chunks, 1)), jnp.float32)],
        )
        meta, tq, maxz = _pair_meta(
            _slice_bins(bins, s), chunk, inst_mask_slot=inst_mask_slot
        )
        pslot = jnp.maximum(bins.pair_slot[s], 0)
        # OPAQUE pairs never read their corner-attr block (the kernel's
        # masked branch is the only consumer): point them all at block 0
        # so runs of opaque pairs keep revisiting the same block and the
        # 12 KB/pair attrs DMA disappears for the bulk of the stream
        pmid = jnp.where(
            inst_mask_slot[pslot] >= 0, inst_mid[pslot], 0
        )
        base_io = 6 + 2 * pack + 1
        depth_t, vis_t = pl.pallas_call(
            functools.partial(
                _depth_alpha_kernel,
                tile_h=tile_h,
                tile_w=tile_w,
                ntx=ntx,
                vis_base_offset=vis_base_offset,
                pack=pack,
                rows_per_view=rows_per_view,
                n_chunks=n_chunks,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles_pad, tpx), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles_pad, tpx), jnp.int32),
            ],
            input_output_aliases={base_io: 0, base_io + 1: 1},
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
            name="raster_depth_alpha",
        )(
            meta, tq, maxz, pslot, pmid, rowoff,
            *([setup] * pack), *([attrs] * pack), alpha_masks,
            depth_t, vis_t,
        )
    if tiled_io:
        return depth_t, vis_t
    return from_tiles(depth_t), from_tiles(vis_t)


def _gbuffer_kernel(
    meta_ref, tq_ref, maxz_ref, pslot_ref, pmid_ref, rowoff_ref, *refs,
    tile_h, tile_w, ntx, vis_base_offset, pack, use_alpha, overdraw,
    a2c_samples=1, n_chunks=4,
):
    setup_refs = refs[:pack]
    attrs_refs = refs[pack : 2 * pack]
    rest = refs[2 * pack :]
    if use_alpha:
        (mask_ref, _i1, _i2, _i3,
         depth_ref, vis_ref, gb_ref, cur_min_ref) = rest
    else:
        (_i1, _i2, _i3,
         depth_ref, vis_ref, gb_ref, cur_min_ref) = rest
        mask_ref = None
    del _i1, _i2, _i3  # aliased to depth/vis/gb (in-place update)
    p = pl.program_id(0)
    tpx = tile_h * tile_w
    if tile_h % n_chunks:
        n_chunks = 1
    cpx = tpx // n_chunks
    rows_per_chunk = tile_h // n_chunks

    for j in range(pack):
        i = p * pack + j
        m = meta_ref[i]
        valid = (m & 1) == 1
        first_tile = (m & 4) != 0
        # with alpha masks, meta bits 26.. carry (mask_slot + 1)
        slot = (m >> 3) & 0x7FFFFF if use_alpha else (m >> 3)
        mslot = (m >> 26) - 1 if use_alpha else -1

        # framebuffer blocks are input-output ALIASED to the init
        # buffers (in-place update; untouched groups keep init content)

        tq = tq_ref[i]
        tile = tq & 0x3FFFF
        r = tile % _GROUP

        # per-chunk running min depths (see _kernel)
        @pl.when(valid & first_tile)
        def _(r=r):
            for q in range(n_chunks):
                cur_min_ref[0, q] = jnp.min(
                    depth_ref[pl.ds(r, 1), pl.ds(q * cpx, cpx)]
                )

        # early-z skip (see _kernel): with front-to-back pair ordering,
        # pairs fully occluded by already-drawn geometry skip everything
        # — including the attribute phase and the overdraw coverage,
        # exactly as a hardware early-Z test discards their fragments
        maxz = maxz_ref[i]
        tile_min = cur_min_ref[0, 0]
        for q in range(1, n_chunks):
            tile_min = jnp.minimum(tile_min, cur_min_ref[0, q])
        active = valid & (maxz > tile_min)


        # whole pair body gated on `active` (see _kernel): padding /
        # early-z-skipped pairs cost only the decode above
        @pl.when(active)
        def _(j=j, tq=tq, r=r, maxz=maxz, slot=slot, mslot=mslot):
            qr = (tq >> 18) & 63
            q0 = qr // n_chunks
            q1 = qr % n_chunks
            ty = (tile // ntx + rowoff_ref[0]).astype(jnp.float32)
            tx = (tile % ntx).astype(jnp.float32)
            st = setup_refs[j][0]  # [12, 64] (in-kernel gather by pair slot)
            s = _setup_cols(st)  # [64, 12] eval layout

            def coef(k, s=s):
                return s[:, k][:, None]  # [64, 1]

            vis_base = ((slot + vis_base_offset) << 6) + 1

            # one pass over the quarter-row chunks the meshlet bbox spans
            # (chunks partition the tile's pixels, so each chunk's winner is
            # independent): edge/depth functionals + depth test, then the
            # attribute interpolation + alpha refine + commit on THIS
            # chunk's lanes only, and only when the pair won a pixel here.
            # A ~30 px meshlet spanning one chunk touches [*, cpx] lanes
            # once instead of paying a full-tile [*, tpx] phase 2.
            for q in range(n_chunks):
                run_q = jnp.bool_(True) if n_chunks == 1 else (
                    (q >= q0) & (q <= q1)
                    & (maxz > cur_min_ref[0, q])
                )

                @pl.when(run_q)
                def _(q=q, r=r, j=j, s=s, coef=coef, vis_base=vis_base,
                      mslot=mslot):
                    lanes = pl.ds(q * cpx, cpx)
                    flat = jax.lax.broadcasted_iota(jnp.int32, (1, cpx), 1)
                    col = (flat % tile_w).astype(jnp.float32)
                    row = (
                        flat // tile_w + q * rows_per_chunk
                    ).astype(jnp.float32)
                    xs = tx * tile_w + col + 0.5  # [1, CPX]
                    ys = ty * tile_h + row + 0.5

                    e0 = coef(0) * xs + coef(1) * ys + coef(2)  # [64, CPX]
                    e1 = coef(3) * xs + coef(4) * ys + coef(5)
                    e2 = coef(6) * xs + coef(7) * ys + coef(8)
                    z = coef(9) * xs + coef(10) * ys + coef(11)

                    inside = (
                        (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & (z <= 1.0)
                    )
                    cand = jnp.where(inside, z, -1.0)
                    best_z = jnp.max(cand, axis=0, keepdims=True)  # [1, CPX]
                    best_tri = jnp.argmax(cand, axis=0, keepdims=True).astype(
                        jnp.int32
                    )

                    cur_d = depth_ref[pl.ds(r, 1), lanes]
                    win = best_z > cur_d

                    if overdraw:
                        # overdraw accumulates over all covering fragments
                        od_row = r * GB_ROWS + GB_OVERDRAW
                        coverage = jnp.sum(
                            inside.astype(jnp.float32), axis=0, keepdims=True
                        )
                        gb_ref[pl.ds(od_row, 1), lanes] = (
                            gb_ref[pl.ds(od_row, 1), lanes] + coverage
                        )

                    # attribute interpolation + commit for pairs that won a
                    # pixel IN THIS CHUNK; occluded/losing pairs skip it
                    @pl.when(jnp.any(win))
                    def _():
                        # winner select as ONE-HOT MXU MATMULS: both the
                        # corner-attr rows (tri_ac block, gathered from the
                        # ASSET array by meshlet id — never materialized per
                        # frame) and the winning triangle's 12 setup
                        # coefficients. A one-hot select is EXACT in f32
                        # (products v*1 and v*0, one nonzero addend), so it
                        # matches the XLA twin's gather bit-for-bit.
                        attrs_m = attrs_refs[j][...]  # [CA_ROWS, 64]
                        oh = (
                            jax.lax.broadcasted_iota(jnp.int32, (64, cpx), 0)
                            == jnp.broadcast_to(best_tri, (64, cpx))
                        ).astype(jnp.float32)
                        sel_f = jax.lax.dot_general(
                            attrs_m, oh, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                        )  # [CA_ROWS, CPX]
                        sel_s = jax.lax.dot_general(
                            s, oh, (((0,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                        )  # [12, CPX]
                        channels = eval_gbuffer_channels(sel_f, sel_s, xs, ys)

                        def commit(winm):
                            cur_v = vis_ref[pl.ds(r, 1), lanes]
                            new_d = jnp.where(winm, best_z, cur_d)
                            depth_ref[pl.ds(r, 1), lanes] = new_d
                            vis_ref[pl.ds(r, 1), lanes] = jnp.where(
                                winm, vis_base + best_tri, cur_v
                            )
                            cur_min_ref[0, q] = jnp.min(new_d)
                            # write only the interpolated rows — GB_OVERDRAW
                            # is an accumulator and must not be clobbered
                            gb_base = r * GB_ROWS
                            cur_g = gb_ref[pl.ds(gb_base, GB_OVERDRAW), lanes]
                            gb_ref[pl.ds(gb_base, GB_OVERDRAW), lanes] = (
                                jnp.where(
                                    winm, channels[:GB_OVERDRAW], cur_g
                                )
                            )

                        if not use_alpha:
                            commit(win)
                        else:
                            @pl.when(mslot < 0)
                            def _():
                                commit(win)

                            # winner-level alpha test against the material's
                            # VMEM-resident 64x64 mask: one-hot over the v
                            # texel row feeds an MXU matmul with the mask
                            # block, then the u one-hot selects the texel
                            # (values are exact 0/1, so any matmul precision
                            # is exact)
                            @pl.when(mslot >= 0)
                            def _():
                                from orbit_tpu.raster.kernel_common import (
                                    ALPHA_MASK_RES,
                                    GB_DUDX,
                                    GB_DUDY,
                                    GB_DVDX,
                                    GB_DVDY,
                                    GB_U,
                                    GB_V,
                                    alpha_coverage_test,
                                    alpha_mask_texel_index,
                                )

                                R = ALPHA_MASK_RES
                                u = channels[GB_U : GB_U + 1]
                                v = channels[GB_V : GB_V + 1]
                                ui, vi = alpha_mask_texel_index(u, v, R)
                                mblk = mask_ref[
                                    pl.ds(jnp.maximum(mslot, 0) * R, R), :
                                ]  # [R, 128]
                                iota_r = jax.lax.broadcasted_iota(
                                    jnp.int32, (R, cpx), 0
                                )
                                oh_v = (iota_r == vi).astype(jnp.float32)
                                # B[c,p] = sum_i mblk[i,c] * oh_v[i,p]: one
                                # matmul materializes BOTH mask channels (s
                                # in cols 0..R-1, gradient in R..2R-1)
                                B = jax.lax.dot_general(
                                    mblk, oh_v, (((0,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                )  # [128, cpx]
                                iota_c = jax.lax.broadcasted_iota(
                                    jnp.int32, (128, cpx), 0
                                )
                                oh_u = (iota_c == ui).astype(jnp.float32)
                                s_a = jnp.sum(B * oh_u, axis=0, keepdims=True)
                                oh_g = (iota_c == ui + R).astype(jnp.float32)
                                g_a = jnp.sum(B * oh_g, axis=0, keepdims=True)
                                duv = jnp.maximum(
                                    jnp.maximum(
                                        jnp.abs(
                                            channels[GB_DUDX : GB_DUDX + 1]
                                        ),
                                        jnp.abs(
                                            channels[GB_DVDX : GB_DVDX + 1]
                                        ),
                                    ),
                                    jnp.maximum(
                                        jnp.abs(
                                            channels[GB_DUDY : GB_DUDY + 1]
                                        ),
                                        jnp.abs(
                                            channels[GB_DVDY : GB_DVDY + 1]
                                        ),
                                    ),
                                )
                                xi = (tile % ntx * tile_w + flat % tile_w)
                                yi = (
                                    (tile // ntx + rowoff_ref[0]) * tile_h
                                    + flat // tile_w
                                    + q * rows_per_chunk
                                )
                                ok = alpha_coverage_test(
                                    s_a, g_a, duv, xi, yi, a2c_samples
                                )
                                commit(win & ok)


def rasterize_pallas_gbuffer(
    setup,
    attrs,
    bins: BinLists,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    interpret: bool = False,
    init=None,
    vis_base_offset: int = 0,
    tile_row_offset=0,
    tiled_io: bool = False,
    pairs_per_step: int = 1,
    alpha_masks=None,
    inst_mask_slot=None,
    inst_mid=None,
    overdraw=True,
    a2c_samples=1,
    n_chunks: int = 4,
):
    """G-buffer rasterizer. setup: [I,12,64] coefficient-major; attrs: the ASSET-side
    corner-attr array tri_ac [M, CA_ROWS, 64] (baked once at load),
    gathered in-kernel per pair by meshlet id — inst_mid [I] i32 maps
    instance slots to meshlet ids.

    Returns (depth [H,W], vis [H,W], gbuf [GB_ROWS, H, W]).
    init: optional (depth, vis, gbuf) composited under this pass.

    tiled_io: exchange framebuffers in the kernel's native tile layout —
    depth/vis [n_tiles_pad, tile_px], gbuf [n_tiles_pad*GB_ROWS, tile_px]
    (G-buffer rows interleaved per tile) — skipping the image<->tile
    transposes entirely. The fused deferred-shade kernel and the late
    occlusion pass consume this layout directly; convert with
    raster.layout helpers only where an image is actually needed.
    """
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty
    n_tiles_pad = -(-n_tiles // _GROUP) * _GROUP
    tpx = tile_h * tile_w
    P = bins.pair_slot.shape[0]

    def to_tiles(img):
        pad_h, pad_w = nty * tile_h - height, ntx * tile_w - width
        lead = img.shape[:-2]
        x = jnp.pad(img, [(0, 0)] * len(lead) + [(0, pad_h), (0, pad_w)])
        x = x.reshape(lead + (nty, tile_h, ntx, tile_w))
        perm = tuple(range(len(lead))) + tuple(
            len(lead) + i for i in (0, 2, 1, 3)
        )
        t = x.transpose(perm).reshape(lead + (n_tiles, tpx))
        pad = [(0, 0)] * len(lead) + [(0, n_tiles_pad - n_tiles), (0, 0)]
        return jnp.pad(t, pad)

    def from_tiles(t, lead=()):
        x = t[..., :n_tiles, :].reshape(lead + (nty, ntx, tile_h, tile_w))
        perm = tuple(range(len(lead))) + tuple(
            len(lead) + i for i in (0, 2, 1, 3)
        )
        img = x.transpose(perm).reshape(lead + (nty * tile_h, ntx * tile_w))
        return img[..., :height, :width]

    if init is None:
        init_d = jnp.zeros((n_tiles_pad, tpx), jnp.float32)
        init_v = jnp.zeros((n_tiles_pad, tpx), jnp.int32)
        init_g = jnp.zeros((n_tiles_pad * GB_ROWS, tpx), jnp.float32)
    elif tiled_io:
        init_d, init_v, init_g = init
    else:
        init_d = to_tiles(init[0])
        init_v = to_tiles(init[1])
        # gbuf [GB, H, W] -> [tiles, GB, tpx] -> interleave rows per tile
        g = to_tiles(init[2])  # [GB, n_tiles_pad, tpx]
        init_g = g.transpose(1, 0, 2).reshape(n_tiles_pad * GB_ROWS, tpx)

    rowoff = jnp.full((1,), tile_row_offset, jnp.int32)
    pack = pairs_per_step
    if tile_h % n_chunks:
        n_chunks = 1
    assert P % pack == 0, f"pair capacity {P} not divisible by {pack}"
    use_alpha = alpha_masks is not None

    fb_spec = pl.BlockSpec(
        (_GROUP, tpx),
        lambda p, meta, tq, mz, ps, pm, ro: (
            (tq[p * pack] & 0x3FFFF) // _GROUP, 0
        ),
    )
    gb_spec = pl.BlockSpec(
        (_GROUP * GB_ROWS, tpx),
        lambda p, meta, tq, mz, ps, pm, ro: (
            (tq[p * pack] & 0x3FFFF) // _GROUP, 0
        ),
    )
    chunk = P if P <= _MAX_PAIRS_PER_CALL else _MAX_PAIRS_PER_CALL
    assert P % chunk == 0, (
        f"pair capacity {P} must be a multiple of {chunk} for chaining"
    )

    # per-pair setup blocks are gathered IN-KERNEL from the [I, 12, 64]
    # per-frame array (index = instance slot, via prefetched pslot) and
    # corner-attr blocks from the [M, CA_ROWS, 64] ASSET array (index =
    # meshlet id, via prefetched pmid); Pallas double-buffers the DMAs.
    # This replaces the [P, 64, 12] + [P, rows, 64] HBM pre-gathers AND
    # the entire per-frame attribute-stream materialization.
    def _slot_spec(shape, j):
        return pl.BlockSpec(
            (1,) + shape,
            functools.partial(
                lambda p, meta, tq, mz, ps, pm, ro, j: (
                    ps[p * pack + j], 0, 0
                ),
                j=j,
            ),
        )

    def _mid_spec(shape, j):
        # tri_ac is flat [M * CA_ROWS, 64]: block row pm == meshlet pm
        return pl.BlockSpec(
            shape,
            functools.partial(
                lambda p, meta, tq, mz, ps, pm, ro, j: (
                    pm[p * pack + j], 0
                ),
                j=j,
            ),
        )

    in_specs = [_slot_spec((12, 64), j) for j in range(pack)]
    in_specs += [_mid_spec((CA_ROWS, 64), j) for j in range(pack)]
    if use_alpha:
        # the whole mask atlas stays VMEM-resident (constant block index)
        in_specs.append(
            pl.BlockSpec(
                alpha_masks.shape,
                lambda p, meta, tq, mz, ps, pm, ro: (0, 0),
            )
        )
    in_specs += [fb_spec, fb_spec, gb_spec]
    n_lead = 2 * pack + (1 if use_alpha else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(chunk // pack,),
        in_specs=in_specs,
        out_specs=[fb_spec, fb_spec, gb_spec],
        scratch_shapes=[pltpu.SMEM((1, max(n_chunks, 1)), jnp.float32)],
    )

    if inst_mid is None:
        inst_mid = jnp.zeros((setup.shape[0],), jnp.int32)
    depth_t, vis_t, gb_t = init_d, init_v, init_g
    for c in range(P // chunk):
        s = slice(c * chunk, (c + 1) * chunk)
        meta, tq, maxz = _pair_meta(
            _slice_bins(bins, s), chunk,
            inst_mask_slot=inst_mask_slot if use_alpha else None,
        )
        pslot = jnp.maximum(bins.pair_slot[s], 0)
        pmid = inst_mid[pslot]
        operands = [meta, tq, maxz, pslot, pmid, rowoff]
        operands += [setup] * pack + [attrs] * pack
        if use_alpha:
            operands.append(alpha_masks)
        operands += [depth_t, vis_t, gb_t]
        base_io = 6 + n_lead  # prefetch args + leading operands
        depth_t, vis_t, gb_t = pl.pallas_call(
            functools.partial(
                _gbuffer_kernel,
                tile_h=tile_h,
                tile_w=tile_w,
                ntx=ntx,
                vis_base_offset=vis_base_offset,
                pack=pack,
                use_alpha=use_alpha,
                overdraw=overdraw,
                a2c_samples=a2c_samples,
                n_chunks=n_chunks,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles_pad, tpx), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles_pad, tpx), jnp.int32),
                jax.ShapeDtypeStruct(
                    (n_tiles_pad * GB_ROWS, tpx), jnp.float32
                ),
            ],
            input_output_aliases={
                base_io: 0, base_io + 1: 1, base_io + 2: 2
            },
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
            name="raster_gbuffer",
        )(*operands)

    if tiled_io:
        return depth_t, vis_t, gb_t
    gb_tiles = gb_t.reshape(n_tiles_pad, GB_ROWS, tpx).transpose(1, 0, 2)
    return (
        from_tiles(depth_t),
        from_tiles(vis_t),
        from_tiles(gb_tiles, lead=(GB_ROWS,)),
    )
