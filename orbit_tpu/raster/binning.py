"""Exact sort-based meshlet -> screen-tile binning (no atomics).

The reference lets the GPU append draw commands with atomicAdd
(meshlet_cull.comp:228). XLA has no atomics; instead:
  1. per-meshlet tile span from its screen bbox -> pair count
  2. exclusive cumsum -> pair offsets
  3. *inverse expansion*: for each pair slot p in a fixed-capacity buffer,
     searchsorted(offsets, p) recovers its meshlet; span arithmetic recovers
     its tile (no scatter, fully static shapes)
  4. one stable sort by tile id groups pairs per tile; per-tile ranges come
     from searchsorted of the tile boundaries.
Overflow beyond pair capacity is dropped and reported via `overflow`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class BinLists:
    """pair_slot: [P] i32 meshlet-instance slot, sorted by tile (pad: -1)
    pair_tile: [P] i32 tile id per pair (pad: -1)
    tile_start/tile_count: [T] i32 range into pair_slot per tile
    overflow: [] bool — pair capacity exceeded this frame
    pair_maxz: [P] f32 conservative nearest depth (early-z skip)
    pair_qr: [P] i32 packed q0*4+q1 — the quarter-row chunks of the tile
    covered by the meshlet's bbox (rasterizer skips the others; pixels
    outside the bbox cannot be covered, so this is semantics-preserving
    and also suppresses FP-noise phantom fragments of sliver triangles
    beyond their bbox rows)
    """

    pair_slot: jax.Array
    pair_tile: jax.Array
    tile_start: jax.Array
    tile_count: jax.Array
    overflow: jax.Array
    pair_maxz: jax.Array
    pair_qr: jax.Array


def bin_meshlets(
    bbox, inst_valid, width, height, tile_h, tile_w, pair_capacity,
    max_z=None, row0=0, num_rows=None, group_align: int = 1,
) -> BinLists:
    """bbox: [I,4] screen bounds; inst_valid: [I] bool.

    max_z: optional [I] f32 conservative nearest depth per meshlet
    (reverse-Z). When given, pairs within a tile are ordered front to back
    (by a 10-bit depth bucket) and pair_maxz carries the full-precision
    bound for the rasterizer's early-z skip — the sort-based stand-in for
    hardware early-Z + front-to-back draw ordering. Without it pair_maxz
    is 2.0 (skip never fires).

    row0/num_rows: optional tile-row window (multi-chip framebuffer
    bands): only tiles in rows [row0, row0+num_rows) are binned, and tile
    ids are band-local. row0 may be traced (e.g. from axis_index). The
    per-tile pair order is identical to a full-screen binning of the same
    tile, so band rasterization is bit-identical to the full screen's.

    group_align: pad the sorted stream with invalid pairs so that pairs
    of different 8-tile framebuffer groups never share a group_align-wide
    step — the Pallas rasterizer processes that many pairs per grid step
    with ONE framebuffer block (pair-packing amortizes the ~0.4us/step
    grid+DMA machinery). Padding counts against pair_capacity."""
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    if num_rows is None:
        num_rows = nty
    n_tiles = ntx * num_rows

    tx0 = jnp.clip(jnp.floor(bbox[:, 0] / tile_w).astype(jnp.int32), 0, ntx)
    ty0 = jnp.clip(
        jnp.floor(bbox[:, 1] / tile_h).astype(jnp.int32) - row0, 0, num_rows
    )
    # exclusive upper corner: a bbox touching x=tile edge exactly stays out
    tx1 = jnp.clip(jnp.ceil(bbox[:, 2] / tile_w).astype(jnp.int32), 0, ntx)
    ty1 = jnp.clip(
        jnp.ceil(bbox[:, 3] / tile_h).astype(jnp.int32) - row0, 0, num_rows
    )

    empty = (bbox[:, 2] <= bbox[:, 0]) | (bbox[:, 3] <= bbox[:, 1])
    use = inst_valid & ~empty
    span_x = jnp.where(use, jnp.maximum(tx1 - tx0, 0), 0)
    span_y = jnp.where(use, jnp.maximum(ty1 - ty0, 0), 0)
    counts = span_x * span_y  # [I]

    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = offsets[-1] + counts[-1] if counts.shape[0] > 0 else jnp.int32(0)

    P = pair_capacity
    p = jnp.arange(P, dtype=jnp.int32)
    # which meshlet does pair slot p belong to? scatter + cummax
    # forward-fill (O(P), no binary search)
    starts = jnp.where(counts > 0, offsets, P)
    mark = jnp.full((P,), -1, jnp.int32).at[starts].max(
        jnp.arange(counts.shape[0], dtype=jnp.int32), mode="drop"
    )
    slot = jnp.maximum(jax.lax.cummax(mark), 0)
    local = p - offsets[slot]
    sx = jnp.maximum(span_x[slot], 1)
    tile_x = tx0[slot] + local % sx
    tile_y = ty0[slot] + local // sx
    tile = tile_y * ntx + tile_x
    pair_valid = p < total

    # sort by (tile, depth bucket); invalid pairs to the end
    if max_z is None:
        maxz_i = jnp.full((counts.shape[0],), 2.0, jnp.float32)
        bucket = jnp.zeros((counts.shape[0],), jnp.int32)
    else:
        maxz_i = max_z.astype(jnp.float32)
        # front-to-back: nearest (largest reverse-Z bound) first
        bucket = 1023 - jnp.round(
            jnp.clip(maxz_i, 0.0, 1.0) * 1023.0
        ).astype(jnp.int32)
    key = jnp.where(pair_valid, tile * 1024 + bucket[slot], n_tiles * 1024)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    in_range = sorted_key < n_tiles * 1024
    pair_slot = jnp.where(in_range, slot[order], -1)
    # 10-bit quantized (floor -> conservative) so the Pallas kernel can
    # carry it inside the packed tq SMEM word; both backends consume the
    # same dequantized value so early-z skipping stays bit-consistent
    pair_maxz = jnp.where(in_range, maxz_i[slot[order]], -1.0)
    pair_maxz = jnp.floor(jnp.clip(pair_maxz, 0.0, 1.0) * 1023.0) / 1023.0

    # per-pair quarter-row range of the tile covered by the bbox
    if tile_h % 4 == 0:
        cr = tile_h // 4
        base = (row0 + tile_y) * tile_h
        ly0 = jnp.clip(
            jnp.floor(bbox[:, 1]).astype(jnp.int32)[slot] - base,
            0, tile_h - 1,
        )
        ly1 = jnp.clip(
            jnp.ceil(bbox[:, 3]).astype(jnp.int32)[slot] - 1 - base,
            0, tile_h - 1,
        )
        qr = (ly0 // cr) * 4 + jnp.maximum(ly1, ly0) // cr
    else:
        qr = jnp.full_like(slot, 3)  # q0=0, q1=3: full tile
    pair_qr = jnp.where(in_range, qr[order], 0)

    # per-tile ranges via bincount + cumsum (no binary searches)
    per_tile = jnp.zeros((n_tiles,), jnp.int32).at[
        jnp.where(pair_valid, tile, n_tiles)
    ].add(1, mode="drop")
    tile_end = jnp.cumsum(per_tile)
    tile_start = tile_end - per_tile
    sorted_tile = jnp.where(in_range, sorted_key // 1024, -1)
    overflow = total > P

    if group_align > 1:
        # insert invalid padding at 8-tile-group boundaries so that each
        # group_align-wide kernel step touches exactly one fb block group
        K = group_align
        idx = jnp.arange(P, dtype=jnp.int32)
        gid = jnp.where(in_range, sorted_tile // 8, jnp.int32(1 << 30))
        prev_gid = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), gid[:-1]]
        )
        boundary = in_range & (gid != prev_gid) & (idx > 0)
        start = jnp.maximum(
            jax.lax.cummax(jnp.where(boundary, idx, 0)), 0
        )
        start_before = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), start[:-1]]
        )
        plen = idx - start_before  # at a boundary: ending segment's length
        pad = jnp.where(boundary, (-plen) % K, 0)
        cum_pad = jnp.cumsum(pad)
        new_idx = idx + cum_pad
        last_new = jnp.max(jnp.where(in_range, new_idx, -1)) + 1
        overflow = overflow | (last_new > P)
        tgt = jnp.where(in_range, new_idx, P)

        def scat(arr, fill):
            out = jnp.full((P,), fill, arr.dtype)
            return out.at[tgt].set(arr, mode="drop")

        pair_slot = scat(pair_slot, -1)
        pair_maxz = scat(pair_maxz, -1.0)
        pair_qr = scat(pair_qr, 0)
        sorted_tile = scat(sorted_tile, -1)
        shift = cum_pad[jnp.clip(tile_start, 0, P - 1)]
        tile_start = jnp.minimum(tile_start + shift, P)

    return BinLists(
        pair_slot=pair_slot,
        pair_tile=sorted_tile,
        tile_start=tile_start,
        tile_count=per_tile,
        overflow=overflow,
        pair_maxz=pair_maxz,
        pair_qr=pair_qr,
    )
