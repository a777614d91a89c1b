"""Exact sort-based meshlet -> screen-tile binning (no atomics).

The reference lets the GPU append draw commands with atomicAdd
(meshlet_cull.comp:228). XLA has no atomics; instead:
  1. per-meshlet tile span from its screen bbox -> pair count
  2. exclusive cumsum -> pair offsets
  3. *inverse expansion*: for each pair slot p in a fixed-capacity buffer,
     scatter+cummax recovers its meshlet; span arithmetic recovers its
     tile (no atomics, fully static shapes)
  4. one stable sort by tile id groups pairs per tile; per-tile ranges come
     from a bincount + cumsum of the tile ids.
Overflow beyond pair capacity is dropped and reported via `overflow`.

TPU shape discipline: random gathers cost ~5-9 ns/row REGARDLESS of row
width, so all per-instance fields are packed into ONE [I, 8] i32 record
gathered once per pair (vs ~10 separate [P]<-[I] gathers, which were
~60% of binning's device time), and the sort carries a single packed
payload word instead of an index payload + post-sort gathers.
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
    pair_maxz: [P] f32 EXACT conservative nearest depth (early-z skip;
    both backends consume the same f32, regathered by slot post-sort)
    pair_qr: [P] i32 packed q0*n_chunks+q1 — the row chunks of the tile
    covered by the meshlet's bbox (rasterizer skips the others; pixels
    outside the bbox cannot be covered, so this is semantics-preserving
    and also suppresses FP-noise phantom fragments of sliver triangles
    beyond their bbox rows). n_chunks is the bin_meshlets argument and
    must match the consuming kernel's chunk count.
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
    n_chunks: int = 4,
) -> BinLists:
    """bbox: [I,4] screen bounds; inst_valid: [I] bool.

    max_z: optional [I] f32 conservative nearest depth per meshlet
    (reverse-Z). When given, pairs within a tile are ordered front to back
    (by a 10-bit depth bucket) and pair_maxz carries the quantized bound
    for the rasterizer's early-z skip — the sort-based stand-in for
    hardware early-Z + front-to-back draw ordering. Without it pair_maxz
    is 1.0 (skip never fires against a tile min < 1).

    row0/num_rows: optional tile-row window (multi-chip framebuffer
    bands): only tiles in rows [row0, row0+num_rows) are binned, and tile
    ids are band-local. row0 may be traced (e.g. from axis_index). The
    per-tile pair order is identical to a full-screen binning of the same
    tile, so band rasterization is bit-identical to the full screen's.

    group_align: pad the sorted stream with invalid pairs so that pairs
    of different 8-tile framebuffer groups never share a group_align-wide
    step — the Pallas rasterizer processes that many pairs per grid step
    with ONE framebuffer block group. Padding counts against
    pair_capacity.

    n_chunks: row chunks per tile for pair_qr (must equal the consuming
    kernel's chunk count; tile_h must divide evenly). More chunks =
    finer bbox-row and early-z skipping and a smaller per-chunk live
    set in the G-buffer kernel (what unlocks 32-row tiles)."""
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    if num_rows is None:
        num_rows = nty
    n_tiles = ntx * num_rows
    I = bbox.shape[0]
    P = pair_capacity
    assert I < 1 << 17, "packed sort payload requires < 131072 instances"
    assert P <= 1 << 18, "pair capacity exceeds packed index range"

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

    if max_z is None:
        bucket = jnp.zeros((I,), jnp.int32)
    else:
        # front-to-back sort bucket: nearest (largest reverse-Z bound)
        # first. Only an ORDERING hint — the rasterizer's early-z skip
        # consumes the EXACT f32 bound (pair_maxz, regathered by slot
        # below), so quantization here cannot drop or miss winners.
        bucket = 1023 - jnp.round(
            jnp.clip(max_z.astype(jnp.float32), 0.0, 1.0) * 1023.0
        ).astype(jnp.int32)

    # row-chunk coordinates (global chunk rows of the bbox's vertical
    # extent; per-pair qr derives exactly because tile bases are
    # chunk-aligned: clip((y - ty*th)//cr) == clip(y//cr - ty*n_chunks)).
    # Packed into ONE word, regathered by slot post-sort (like
    # pair_maxz) — qr no longer rides the sort payload, which frees it
    # from the packed word's bit budget and allows n_chunks > 4.
    if n_chunks > 1 and tile_h % n_chunks == 0:
        cr = tile_h // n_chunks
        y0c = jnp.floor(bbox[:, 1]).astype(jnp.int32) // cr
        y1c = (
            jnp.maximum(
                jnp.ceil(bbox[:, 3]).astype(jnp.int32) - 1,
                jnp.floor(bbox[:, 1]).astype(jnp.int32),
            )
            // cr
        )
        qword = y0c * 4096 + y1c  # chunk rows < 4096 at any target size
    else:
        n_chunks = 1
        qword = jnp.zeros((I,), jnp.int32)

    # ONE per-instance record -> ONE gather per pair (rows cost the same
    # as scalars on TPU)
    inst_rec = jnp.stack(
        [offsets, tx0, ty0, jnp.maximum(span_x, 1), bucket],
        axis=1,
    )  # [I, 5]

    p = jnp.arange(P, dtype=jnp.int32)
    # which meshlet does pair slot p belong to? scatter + cummax
    # forward-fill (O(P), no binary search)
    starts = jnp.where(counts > 0, offsets, P)
    mark = jnp.full((P,), -1, jnp.int32).at[starts].max(
        jnp.arange(I, dtype=jnp.int32), mode="drop"
    )
    slot = jnp.maximum(jax.lax.cummax(mark), 0)
    rec = inst_rec[slot]  # [P, 5]
    local = p - rec[:, 0]
    sx = rec[:, 3]
    tile_x = rec[:, 1] + local % sx
    tile_y = rec[:, 2] + local // sx
    tile = tile_y * ntx + tile_x
    pair_valid = p < total

    # sort by (tile, depth bucket); invalid pairs to the end. The
    # payload is just the slot — qr/maxz are regathered by slot after.
    key = jnp.where(pair_valid, tile * 1024 + rec[:, 4], n_tiles * 1024)
    sorted_key, sorted_pay = jax.lax.sort(
        (key, slot), num_keys=1, is_stable=True
    )
    in_range = sorted_key < n_tiles * 1024
    pair_slot = jnp.where(in_range, sorted_pay, -1)

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

        # TWO packed scatters: (slot+1) + tile
        w_s = jnp.zeros((P,), jnp.int32).at[tgt].set(
            sorted_pay + 1, mode="drop"
        )
        sorted_tile = (
            jnp.full((P,), -1, jnp.int32).at[tgt].set(
                sorted_tile, mode="drop"
            )
        )
        pair_slot = w_s - 1
        shift = cum_pad[jnp.clip(tile_start, 0, P - 1)]
        tile_start = jnp.minimum(tile_start + shift, P)

    # EXACT f32 early-z bound per pair, regathered by slot after the
    # sort (the sort key only carries a 10-bit ORDERING bucket).
    # Exactness matters both ways: round 2's floor-quantized bound
    # wrongly dropped winners one bucket above the tile min (missing
    # distant geometry), while a ceil-quantized bound cannot skip the
    # ubiquitous same-depth ties and cost ~2x raster time at bench
    # scale. skip iff maxz <= tile_min is lossless with the true value.
    if max_z is None:
        pair_maxz = jnp.where(pair_slot >= 0, 1.0, 0.0)
    else:
        pair_maxz = jnp.where(
            pair_slot >= 0,
            max_z.astype(jnp.float32)[jnp.maximum(pair_slot, 0)],
            0.0,
        )

    # per-pair chunk range, regathered by slot (chunk rows of the bbox
    # clipped to the pair's own tile row — exact, see qword above)
    if n_chunks > 1:
        qw = qword[jnp.maximum(pair_slot, 0)]
        base_c = (row0 + jnp.maximum(sorted_tile, 0) // ntx) * n_chunks
        q0 = jnp.clip(qw // 4096 - base_c, 0, n_chunks - 1)
        q1 = jnp.maximum(jnp.clip(qw % 4096 - base_c, 0, n_chunks - 1), q0)
        pair_qr = jnp.where(pair_slot >= 0, q0 * n_chunks + q1, 0)
    else:
        pair_qr = jnp.zeros((P,), jnp.int32)
    return BinLists(
        pair_slot=pair_slot,
        pair_tile=sorted_tile,
        tile_start=tile_start,
        tile_count=per_tile,
        overflow=overflow,
        pair_maxz=pair_maxz,
        pair_qr=pair_qr,
    )
