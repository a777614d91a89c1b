"""Vectorized BC7 / BC6H block decompression (numpy, no per-block loops).

Completes the BCn matrix of assets/dds.py: the reference maps the full
DXGI BC1-7 range onto VkFormats and lets GPU samplers read the blocks
(gltf_loader.rs:95-105); the TPU analog decodes at load time into the
flat mip atlas. BC1-5 live in dds.py; the two 8-mode bit-packed formats
live here:

  * BC7  (DXGI 97-99): 8 modes, 1-3 subsets, per-mode endpoint/index
    widths, rotation + index-swap in modes 4/5. Decodes to RGBA8.
  * BC6H (DXGI 94-96): 14 modes, 1-2 regions, delta-transformed
    endpoints, half-float HDR output. Decodes to float32 RGB.

Layout constants (partition/anchor tables, per-mode field maps) are from
the public Khronos/D3D11 BPTC specification. The whole decode is one
pass of integer ops over [N, 128] unpacked bit arrays; differential
tests fuzz every mode against Pillow's independent BCn decoder
(tests/test_bc67.py).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------- tables

# 2-subset partition patterns (BPTC spec; BC6H uses the first 32)
_PART2 = np.array([
    [0,0,1,1,0,0,1,1,0,0,1,1,0,0,1,1],
    [0,0,0,1,0,0,0,1,0,0,0,1,0,0,0,1],
    [0,1,1,1,0,1,1,1,0,1,1,1,0,1,1,1],
    [0,0,0,1,0,0,1,1,0,0,1,1,0,1,1,1],
    [0,0,0,0,0,0,0,1,0,0,0,1,0,0,1,1],
    [0,0,1,1,0,1,1,1,0,1,1,1,1,1,1,1],
    [0,0,0,1,0,0,1,1,0,1,1,1,1,1,1,1],
    [0,0,0,0,0,0,0,1,0,0,1,1,0,1,1,1],
    [0,0,0,0,0,0,0,0,0,0,0,1,0,0,1,1],
    [0,0,1,1,0,1,1,1,1,1,1,1,1,1,1,1],
    [0,0,0,0,0,0,0,1,0,1,1,1,1,1,1,1],
    [0,0,0,0,0,0,0,0,0,0,0,1,0,1,1,1],
    [0,0,0,1,0,1,1,1,1,1,1,1,1,1,1,1],
    [0,0,0,0,0,0,0,0,1,1,1,1,1,1,1,1],
    [0,0,0,0,1,1,1,1,1,1,1,1,1,1,1,1],
    [0,0,0,0,0,0,0,0,0,0,0,0,1,1,1,1],
    [0,0,0,0,1,0,0,0,1,1,1,0,1,1,1,1],
    [0,1,1,1,0,0,0,1,0,0,0,0,0,0,0,0],
    [0,0,0,0,0,0,0,0,1,0,0,0,1,1,1,0],
    [0,1,1,1,0,0,1,1,0,0,0,1,0,0,0,0],
    [0,0,1,1,0,0,0,1,0,0,0,0,0,0,0,0],
    [0,0,0,0,1,0,0,0,1,1,0,0,1,1,1,0],
    [0,0,0,0,0,0,0,0,1,0,0,0,1,1,0,0],
    [0,1,1,1,0,0,1,1,0,0,1,1,0,0,0,1],
    [0,0,1,1,0,0,0,1,0,0,0,1,0,0,0,0],
    [0,0,0,0,1,0,0,0,1,0,0,0,1,1,0,0],
    [0,1,1,0,0,1,1,0,0,1,1,0,0,1,1,0],
    [0,0,1,1,0,1,1,0,0,1,1,0,1,1,0,0],
    [0,0,0,1,0,1,1,1,1,1,1,0,1,0,0,0],
    [0,0,0,0,1,1,1,1,1,1,1,1,0,0,0,0],
    [0,1,1,1,0,0,0,1,1,0,0,0,1,1,1,0],
    [0,0,1,1,1,0,0,1,1,0,0,1,1,1,0,0],
    [0,1,0,1,0,1,0,1,0,1,0,1,0,1,0,1],
    [0,0,0,0,1,1,1,1,0,0,0,0,1,1,1,1],
    [0,1,0,1,1,0,1,0,0,1,0,1,1,0,1,0],
    [0,0,1,1,0,0,1,1,1,1,0,0,1,1,0,0],
    [0,0,1,1,1,1,0,0,0,0,1,1,1,1,0,0],
    [0,1,0,1,0,1,0,1,1,0,1,0,1,0,1,0],
    [0,1,1,0,1,0,0,1,0,1,1,0,1,0,0,1],
    [0,1,0,1,1,0,1,0,1,0,1,0,0,1,0,1],
    [0,1,1,1,0,0,1,1,1,1,0,0,1,1,1,0],
    [0,0,0,1,0,0,1,1,1,1,0,0,1,0,0,0],
    [0,0,1,1,0,0,1,0,0,1,0,0,1,1,0,0],
    [0,0,1,1,1,0,1,1,1,1,0,1,1,1,0,0],
    [0,1,1,0,1,0,0,1,1,0,0,1,0,1,1,0],
    [0,0,1,1,1,1,0,0,1,1,0,0,0,0,1,1],
    [0,1,1,0,0,1,1,0,1,0,0,1,1,0,0,1],
    [0,0,0,0,0,1,1,0,0,1,1,0,0,0,0,0],
    [0,1,0,0,1,1,1,0,0,1,0,0,0,0,0,0],
    [0,0,1,0,0,1,1,1,0,0,1,0,0,0,0,0],
    [0,0,0,0,0,0,1,0,0,1,1,1,0,0,1,0],
    [0,0,0,0,0,1,0,0,1,1,1,0,0,1,0,0],
    [0,1,1,0,1,1,0,0,1,0,0,1,0,0,1,1],
    [0,0,1,1,0,1,1,0,1,1,0,0,1,0,0,1],
    [0,1,1,0,0,0,1,1,1,0,0,1,1,1,0,0],
    [0,0,1,1,1,0,0,1,1,1,0,0,0,1,1,0],
    [0,1,1,0,1,1,0,0,1,1,0,0,1,0,0,1],
    [0,1,1,0,0,0,1,1,0,0,1,1,1,0,0,1],
    [0,1,1,1,1,1,1,0,1,0,0,0,0,0,0,1],
    [0,0,0,1,1,0,0,0,1,1,1,0,0,1,1,1],
    [0,0,0,0,1,1,1,1,0,0,1,1,0,0,1,1],
    [0,0,1,1,0,0,1,1,1,1,1,1,0,0,0,0],
    [0,0,1,0,0,0,1,0,1,1,1,0,1,1,1,0],
    [0,1,0,0,0,1,0,0,0,1,1,1,0,1,1,1],
], np.uint8)

# 3-subset partition patterns (BC7 modes 0 and 2)
_PART3 = np.array([
    [0,0,1,1,0,0,1,1,0,2,2,1,2,2,2,2],
    [0,0,0,1,0,0,1,1,2,2,1,1,2,2,2,1],
    [0,0,0,0,2,0,0,1,2,2,1,1,2,2,1,1],
    [0,2,2,2,0,0,2,2,0,0,1,1,0,1,1,1],
    [0,0,0,0,0,0,0,0,1,1,2,2,1,1,2,2],
    [0,0,1,1,0,0,1,1,0,0,2,2,0,0,2,2],
    [0,0,2,2,0,0,2,2,1,1,1,1,1,1,1,1],
    [0,0,1,1,0,0,1,1,2,2,1,1,2,2,1,1],
    [0,0,0,0,0,0,0,0,1,1,1,1,2,2,2,2],
    [0,0,0,0,1,1,1,1,1,1,1,1,2,2,2,2],
    [0,0,0,0,1,1,1,1,2,2,2,2,2,2,2,2],
    [0,0,1,2,0,0,1,2,0,0,1,2,0,0,1,2],
    [0,1,1,2,0,1,1,2,0,1,1,2,0,1,1,2],
    [0,1,2,2,0,1,2,2,0,1,2,2,0,1,2,2],
    [0,0,1,1,0,1,1,2,1,1,2,2,1,2,2,2],
    [0,0,1,1,2,0,0,1,2,2,0,0,2,2,2,0],
    [0,0,0,1,0,0,1,1,0,1,1,2,1,1,2,2],
    [0,1,1,1,0,0,1,1,2,0,0,1,2,2,0,0],
    [0,0,0,0,1,1,2,2,1,1,2,2,1,1,2,2],
    [0,0,2,2,0,0,2,2,0,0,2,2,1,1,1,1],
    [0,1,1,1,0,1,1,1,0,2,2,2,0,2,2,2],
    [0,0,0,1,0,0,0,1,2,2,2,1,2,2,2,1],
    [0,0,0,0,0,0,1,1,0,1,2,2,0,1,2,2],
    [0,0,0,0,1,1,0,0,2,2,1,0,2,2,1,0],
    [0,1,2,2,0,1,2,2,0,0,1,1,0,0,0,0],
    [0,0,1,2,0,0,1,2,1,1,2,2,2,2,2,2],
    [0,1,1,0,1,2,2,1,1,2,2,1,0,1,1,0],
    [0,0,0,0,0,1,1,0,1,2,2,1,1,2,2,1],
    [0,0,2,2,1,1,0,2,1,1,0,2,0,0,2,2],
    [0,1,1,0,0,1,1,0,2,0,0,2,2,2,2,2],
    [0,0,1,1,0,1,2,2,0,1,2,2,0,0,1,1],
    [0,0,0,0,2,0,0,0,2,2,1,1,2,2,2,1],
    [0,0,0,0,0,0,0,2,1,1,2,2,1,2,2,2],
    [0,2,2,2,0,0,2,2,0,0,1,2,0,0,1,1],
    [0,0,1,1,0,0,1,2,0,0,2,2,0,2,2,2],
    [0,1,2,0,0,1,2,0,0,1,2,0,0,1,2,0],
    [0,0,0,0,1,1,1,1,2,2,2,2,0,0,0,0],
    [0,1,2,0,1,2,0,1,2,0,1,2,0,1,2,0],
    [0,1,2,0,2,0,1,2,1,2,0,1,0,1,2,0],
    [0,0,1,1,2,2,0,0,1,1,2,2,0,0,1,1],
    [0,0,1,1,1,1,2,2,2,2,0,0,0,0,1,1],
    [0,1,0,1,0,1,0,1,2,2,2,2,2,2,2,2],
    [0,0,0,0,0,0,0,0,2,1,2,1,2,1,2,1],
    [0,0,2,2,1,1,2,2,0,0,2,2,1,1,2,2],
    [0,0,2,2,0,0,1,1,0,0,2,2,0,0,1,1],
    [0,2,2,0,1,2,2,1,0,2,2,0,1,2,2,1],
    [0,1,0,1,2,2,2,2,2,2,2,2,0,1,0,1],
    [0,0,0,0,2,1,2,1,2,1,2,1,2,1,2,1],
    [0,1,0,1,0,1,0,1,0,1,0,1,2,2,2,2],
    [0,2,2,2,0,1,1,1,0,2,2,2,0,1,1,1],
    [0,0,0,2,1,1,1,2,0,0,0,2,1,1,1,2],
    [0,0,0,0,2,1,1,2,2,1,1,2,2,1,1,2],
    [0,2,2,2,0,1,1,1,0,1,1,1,0,2,2,2],
    [0,0,0,2,1,1,1,2,1,1,1,2,0,0,0,2],
    [0,1,1,0,0,1,1,0,0,1,1,0,2,2,2,2],
    [0,0,0,0,0,0,0,0,2,1,1,2,2,1,1,2],
    [0,1,1,0,0,1,1,0,2,2,2,2,2,2,2,2],
    [0,0,2,2,0,0,1,1,0,0,1,1,0,0,2,2],
    [0,0,2,2,1,1,2,2,1,1,2,2,0,0,2,2],
    [0,0,0,0,0,0,0,0,0,0,0,0,2,1,1,2],
    [0,0,0,2,0,0,0,1,0,0,0,2,0,0,0,1],
    [0,2,2,2,1,2,2,2,0,2,2,2,1,2,2,2],
    [0,1,0,1,2,2,2,2,2,2,2,2,2,2,2,2],
    [0,1,1,1,2,0,1,1,2,2,0,1,2,2,2,0],
], np.uint8)

# anchor (fix-up) index of subset 1 for 2-subset partitions
_ANCHOR2 = np.array([
    15,15,15,15,15,15,15,15,15,15,15,15,15,15,15,15,
    15, 2, 8, 2, 2, 8, 8,15, 2, 8, 2, 2, 8, 8, 2, 2,
    15,15, 6, 8, 2, 8,15,15, 2, 8, 2, 2, 2,15,15, 6,
     6, 2, 6, 8,15,15, 2, 2,15,15,15,15,15, 2, 2,15,
], np.int64)
# anchors of subsets 1 and 2 for 3-subset partitions
_ANCHOR3A = np.array([
     3, 3,15,15, 8, 3,15,15, 8, 8, 6, 6, 6, 5, 3, 3,
     3, 3, 8,15, 3, 3, 6,10, 5, 8, 8, 6, 8, 5,15,15,
     8,15, 3, 5, 6,10, 8,15,15, 3,15, 5,15,15,15,15,
     3,15, 5, 5, 5, 8, 5,10, 5,10, 8,13,15,12, 3, 3,
], np.int64)
_ANCHOR3B = np.array([
    15, 8, 8, 3,15,15, 3, 8,15,15,15,15,15,15,15, 8,
    15, 8,15, 3,15, 8,15, 8, 3,15, 6,10,15,15,10, 8,
    15, 3,15,10,10, 8, 9,10, 6,15, 8,15, 3, 6, 6, 8,
    15, 3,15,15,15,15,15,15,15,15,15,15, 3,15,15, 8,
], np.int64)

_W2 = np.array([0, 21, 43, 64], np.int64)
_W3 = np.array([0, 9, 18, 27, 37, 46, 55, 64], np.int64)
_W4 = np.array(
    [0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64],
    np.int64,
)
_WEIGHTS = {2: _W2, 3: _W3, 4: _W4}


def _get(bits, off, n):
    """bits [R, >=off+n] 0/1 -> [R] int64 (LSB-first field at `off`)."""
    return (
        bits[:, off : off + n].astype(np.int64)
        << np.arange(n, dtype=np.int64)
    ).sum(axis=1)


def _get_at(bits, offs, n):
    """Per-row offsets: bits [R, B], offs [R, T] -> [R, T] values."""
    cols = offs[..., None] + np.arange(n, dtype=np.int64)
    g = np.take_along_axis(
        bits, cols.reshape(offs.shape[0], -1), axis=1
    ).reshape(*offs.shape, n)
    return (g.astype(np.int64) << np.arange(n, dtype=np.int64)).sum(-1)


def _indices(bits, base, ibits, anchors, total=16):
    """BPTC index field: texel 0 and each anchor texel store ibits-1
    bits. anchors: list of [R] arrays (per-block anchor positions).
    Returns [R, 16] indices."""
    R = bits.shape[0]
    t = np.arange(total, dtype=np.int64)[None, :]
    shortened = t == 0
    for a in anchors:
        shortened = shortened | (t == a[:, None])
    w = np.broadcast_to(
        np.where(shortened, ibits - 1, ibits), (R, total)
    )
    offs = base + np.cumsum(w, axis=1) - w
    raw = _get_at(bits, offs, ibits)
    return raw & ((1 << w) - 1)


# ------------------------------------------------------------------ BC7

# mode -> (partition_bits, n_subsets, color_bits, alpha_bits, p_mode,
#          index_bits, index2_bits, rotation_bits, idx_select_bits)
_BC7_MODES = {
    0: (4, 3, 4, 0, "unique", 3, 0, 0, 0),
    1: (6, 2, 6, 0, "shared", 3, 0, 0, 0),
    2: (6, 3, 5, 0, None, 2, 0, 0, 0),
    3: (6, 2, 7, 0, "unique", 2, 0, 0, 0),
    4: (0, 1, 5, 6, None, 2, 3, 2, 1),
    5: (0, 1, 7, 8, None, 2, 2, 2, 0),
    6: (0, 1, 7, 7, "unique", 4, 0, 0, 0),
    7: (6, 2, 5, 5, "unique", 2, 0, 0, 0),
}


def _bc7_mode(bits, mode):
    """bits [R, 128+pad] of blocks all in `mode` -> [R, 16, 4] u8."""
    pb, ns, cb, ab, pmode, ib, ib2, rb, isb = _BC7_MODES[mode]
    R = bits.shape[0]
    ne = 2 * ns
    off = mode + 1
    part = _get(bits, off, pb) if pb else np.zeros(R, np.int64)
    off += pb
    rot = _get(bits, off, rb) if rb else np.zeros(R, np.int64)
    off += rb
    idx_sel = _get(bits, off, isb) if isb else np.zeros(R, np.int64)
    off += isb

    nch = 4 if ab else 3
    ep = np.zeros((R, ne, 4), np.int64)
    ep[:, :, 3] = 255
    for ch in range(3):
        for e in range(ne):
            ep[:, e, ch] = _get(bits, off, cb)
            off += cb
    if ab:
        for e in range(ne):
            ep[:, e, 3] = _get(bits, off, ab)
            off += ab

    # endpoint expansion to 8 bits (p-bit becomes the LSB first)
    if pmode == "unique":
        pbits_n = ne
    elif pmode == "shared":
        pbits_n = ns
    else:
        pbits_n = 0
    for ch in range(nch):
        t = (ab if ch == 3 else cb) + (1 if pbits_n else 0)
        for e in range(ne):
            v = ep[:, e, ch]
            if pmode == "unique":
                p = bits[:, off + e].astype(np.int64)
                v = (v << 1) | p
            elif pmode == "shared":
                p = bits[:, off + e // 2].astype(np.int64)
                v = (v << 1) | p
            v = v << (8 - t)
            ep[:, e, ch] = v | (v >> t)
    off += pbits_n

    anchors = []
    if ns >= 2:
        a1 = (_ANCHOR2 if ns == 2 else _ANCHOR3A)[part]
        anchors.append(a1)
    if ns == 3:
        anchors.append(_ANCHOR3B[part])
    idx1 = _indices(bits, off, ib, anchors)  # [R, 16]
    off += 16 * ib - 1 - len(anchors)
    idx2 = _indices(bits, off, ib2, []) if ib2 else None

    if ns == 1:
        subset = np.zeros((R, 16), np.int64)
    elif ns == 2:
        subset = _PART2[part].astype(np.int64)
    else:
        subset = _PART3[part].astype(np.int64)

    cidx, aidx = idx1, (idx2 if idx2 is not None else idx1)
    cw, aw = ib, (ib2 if ib2 else ib)
    if isb:  # mode 4: idx_sel swaps which index set drives color/alpha
        sel = (idx_sel == 1)[:, None]
        cidx = np.where(sel, idx2, idx1)
        aidx = np.where(sel, idx1, idx2)
        # weights differ per index set: select the weight VALUE per texel
        w_c = np.where(sel, _WEIGHTS[ib2][idx2], _WEIGHTS[ib][idx1])
        w_a = np.where(sel, _WEIGHTS[ib][idx1], _WEIGHTS[ib2][idx2])
    else:
        w_c = _WEIGHTS[cw][cidx]
        w_a = _WEIGHTS[aw][aidx]

    e0 = np.take_along_axis(ep, subset[:, :, None] * 2, axis=1)
    e1 = np.take_along_axis(ep, subset[:, :, None] * 2 + 1, axis=1)
    out = np.empty((R, 16, 4), np.uint8)
    for ch in range(3):
        out[:, :, ch] = (
            (e0[:, :, ch] * (64 - w_c) + e1[:, :, ch] * w_c + 32) >> 6
        ).astype(np.uint8)
    out[:, :, 3] = (
        (e0[:, :, 3] * (64 - w_a) + e1[:, :, 3] * w_a + 32) >> 6
    ).astype(np.uint8)

    if rb:  # rotation: swap alpha with one color channel (0 = none)
        for r in (1, 2, 3):
            m = rot == r
            if m.any():
                a = out[m, :, 3].copy()
                out[m, :, 3] = out[m, :, r - 1]
                out[m, :, r - 1] = a
    return out


def decode_bc7_blocks(blk: np.ndarray) -> np.ndarray:
    """blk [N, 16] u8 -> [N, 16, 4] u8 RGBA texels (row-major in block)."""
    N = blk.shape[0]
    bits = np.unpackbits(blk, axis=1, bitorder="little")
    bits = np.pad(bits, ((0, 0), (0, 8)))  # guard for shortened reads
    out = np.zeros((N, 16, 4), np.uint8)
    b0 = blk[:, 0]
    # mode = index of lowest set bit; byte0 == 0 is an invalid block
    mode = np.where(b0 == 0, 8, np.int64(0))
    nz = b0 != 0
    mode[nz] = np.array(
        [(int(v) & -int(v)).bit_length() - 1 for v in range(256)],
        np.int64,
    )[b0[nz]]
    for m in range(8):
        rows = np.nonzero(mode == m)[0]
        if rows.size:
            out[rows] = _bc7_mode(bits[rows], m)
    return out


# ----------------------------------------------------------------- BC6H

# field map per mode: list of (dest, dest_bit, count) consumed in stream
# order after the mode bits. dest: 0..11 = rw,gw,bw, rx,gx,bx, ry,gy,by,
# rz,gz,bz; 12 = partition d. Negative count = bits arrive MSB-first
# (reversed), e.g. mode 13's rw[15:10].
_RW, _GW, _BW = 0, 1, 2
_RX, _GX, _BX = 3, 4, 5
_RY, _GY, _BY = 6, 7, 8
_RZ, _GZ, _BZ = 9, 10, 11
_D = 12

_EP2 = [  # shared tail of most two-region modes (from rx onward)
    # filled per mode below; kept for readability only
]


def _m(*segs):
    return list(segs)


# (epbits, delta bits (r,g,b) or None if untransformed, fields)
_BC6_MODES = {
    # --- two-region, 2-bit mode codes
    0: (10, (5, 5, 5), _m(
        (_GY, 4, 1), (_BY, 4, 1), (_BZ, 4, 1),
        (_RW, 0, 10), (_GW, 0, 10), (_BW, 0, 10),
        (_RX, 0, 5), (_GZ, 4, 1), (_GY, 0, 4),
        (_GX, 0, 5), (_BZ, 0, 1), (_GZ, 0, 4),
        (_BX, 0, 5), (_BZ, 1, 1), (_BY, 0, 4),
        (_RY, 0, 5), (_BZ, 2, 1),
        (_RZ, 0, 5), (_BZ, 3, 1),
        (_D, 0, 5),
    )),
    1: (7, (6, 6, 6), _m(
        (_GY, 5, 1), (_GZ, 4, 1), (_GZ, 5, 1),
        (_RW, 0, 7), (_BZ, 0, 1), (_BZ, 1, 1), (_BY, 4, 1),
        (_GW, 0, 7), (_BY, 5, 1), (_BZ, 2, 1), (_GY, 4, 1),
        (_BW, 0, 7), (_BZ, 3, 1), (_BZ, 5, 1), (_BZ, 4, 1),
        (_RX, 0, 6), (_GY, 0, 4),
        (_GX, 0, 6), (_GZ, 0, 4),
        (_BX, 0, 6), (_BY, 0, 4),
        (_RY, 0, 6), (_RZ, 0, 6),
        (_D, 0, 5),
    )),
    # --- two-region, 5-bit mode codes
    2: (11, (5, 4, 4), _m(
        (_RW, 0, 10), (_GW, 0, 10), (_BW, 0, 10),
        (_RX, 0, 5), (_RW, 10, 1), (_GY, 0, 4),
        (_GX, 0, 4), (_GW, 10, 1), (_BZ, 0, 1), (_GZ, 0, 4),
        (_BX, 0, 4), (_BW, 10, 1), (_BZ, 1, 1), (_BY, 0, 4),
        (_RY, 0, 5), (_BZ, 2, 1),
        (_RZ, 0, 5), (_BZ, 3, 1),
        (_D, 0, 5),
    )),
    6: (11, (4, 5, 4), _m(
        (_RW, 0, 10), (_GW, 0, 10), (_BW, 0, 10),
        (_RX, 0, 4), (_RW, 10, 1), (_GZ, 4, 1), (_GY, 0, 4),
        (_GX, 0, 5), (_GW, 10, 1), (_GZ, 0, 4),
        (_BX, 0, 4), (_BW, 10, 1), (_BZ, 1, 1), (_BY, 0, 4),
        (_RY, 0, 4), (_BZ, 0, 1), (_BZ, 2, 1),
        (_RZ, 0, 4), (_GY, 4, 1), (_BZ, 3, 1),
        (_D, 0, 5),
    )),
    10: (11, (4, 4, 5), _m(
        (_RW, 0, 10), (_GW, 0, 10), (_BW, 0, 10),
        (_RX, 0, 4), (_RW, 10, 1), (_BY, 4, 1), (_GY, 0, 4),
        (_GX, 0, 4), (_GW, 10, 1), (_BZ, 0, 1), (_GZ, 0, 4),
        (_BX, 0, 5), (_BW, 10, 1), (_BY, 0, 4),
        (_RY, 0, 4), (_BZ, 1, 1), (_BZ, 2, 1),
        (_RZ, 0, 4), (_BZ, 4, 1), (_BZ, 3, 1),
        (_D, 0, 5),
    )),
    14: (9, (5, 5, 5), _m(
        (_RW, 0, 9), (_BY, 4, 1),
        (_GW, 0, 9), (_GY, 4, 1),
        (_BW, 0, 9), (_BZ, 4, 1),
        (_RX, 0, 5), (_GZ, 4, 1), (_GY, 0, 4),
        (_GX, 0, 5), (_BZ, 0, 1), (_GZ, 0, 4),
        (_BX, 0, 5), (_BZ, 1, 1), (_BY, 0, 4),
        (_RY, 0, 5), (_BZ, 2, 1),
        (_RZ, 0, 5), (_BZ, 3, 1),
        (_D, 0, 5),
    )),
    18: (8, (6, 5, 5), _m(
        (_RW, 0, 8), (_GZ, 4, 1), (_BY, 4, 1),
        (_GW, 0, 8), (_BZ, 2, 1), (_GY, 4, 1),
        (_BW, 0, 8), (_BZ, 3, 1), (_BZ, 4, 1),
        (_RX, 0, 6), (_GY, 0, 4),
        (_GX, 0, 5), (_BZ, 0, 1), (_GZ, 0, 4),
        (_BX, 0, 5), (_BZ, 1, 1), (_BY, 0, 4),
        (_RY, 0, 6), (_RZ, 0, 6),
        (_D, 0, 5),
    )),
    22: (8, (5, 6, 5), _m(
        (_RW, 0, 8), (_BZ, 0, 1), (_BY, 4, 1),
        (_GW, 0, 8), (_GY, 5, 1), (_GY, 4, 1),
        (_BW, 0, 8), (_GZ, 5, 1), (_BZ, 4, 1),
        (_RX, 0, 5), (_GZ, 4, 1), (_GY, 0, 4),
        (_GX, 0, 6), (_GZ, 0, 4),
        (_BX, 0, 5), (_BZ, 1, 1), (_BY, 0, 4),
        (_RY, 0, 5), (_BZ, 2, 1),
        (_RZ, 0, 5), (_BZ, 3, 1),
        (_D, 0, 5),
    )),
    26: (8, (5, 5, 6), _m(
        (_RW, 0, 8), (_BZ, 1, 1), (_BY, 4, 1),
        (_GW, 0, 8), (_BY, 5, 1), (_GY, 4, 1),
        (_BW, 0, 8), (_BZ, 5, 1), (_BZ, 4, 1),
        (_RX, 0, 5), (_GZ, 4, 1), (_GY, 0, 4),
        (_GX, 0, 5), (_BZ, 0, 1), (_GZ, 0, 4),
        (_BX, 0, 6), (_BY, 0, 4),
        (_RY, 0, 5), (_BZ, 2, 1),
        (_RZ, 0, 5), (_BZ, 3, 1),
        (_D, 0, 5),
    )),
    30: (6, None, _m(
        (_RW, 0, 6), (_GZ, 4, 1), (_BZ, 0, 1), (_BZ, 1, 1), (_BY, 4, 1),
        (_GW, 0, 6), (_GY, 5, 1), (_BY, 5, 1), (_BZ, 2, 1), (_GY, 4, 1),
        (_BW, 0, 6), (_GZ, 5, 1), (_BZ, 3, 1), (_BZ, 5, 1), (_BZ, 4, 1),
        (_RX, 0, 6), (_GY, 0, 4),
        (_GX, 0, 6), (_GZ, 0, 4),
        (_BX, 0, 6), (_BY, 0, 4),
        (_RY, 0, 6), (_RZ, 0, 6),
        (_D, 0, 5),
    )),
    # --- one-region, 5-bit mode codes
    3: (10, None, _m(
        (_RW, 0, 10), (_GW, 0, 10), (_BW, 0, 10),
        (_RX, 0, 10), (_GX, 0, 10), (_BX, 0, 10),
    )),
    7: (11, (9, 9, 9), _m(
        (_RW, 0, 10), (_GW, 0, 10), (_BW, 0, 10),
        (_RX, 0, 9), (_RW, 10, 1),
        (_GX, 0, 9), (_GW, 10, 1),
        (_BX, 0, 9), (_BW, 10, 1),
    )),
    11: (12, (8, 8, 8), _m(
        (_RW, 0, 10), (_GW, 0, 10), (_BW, 0, 10),
        (_RX, 0, 8), (_RW, 10, -2),
        (_GX, 0, 8), (_GW, 10, -2),
        (_BX, 0, 8), (_BW, 10, -2),
    )),
    15: (16, (4, 4, 4), _m(
        (_RW, 0, 10), (_GW, 0, 10), (_BW, 0, 10),
        (_RX, 0, 4), (_RW, 10, -6),
        (_GX, 0, 4), (_GW, 10, -6),
        (_BX, 0, 4), (_BW, 10, -6),
    )),
}
_BC6_ONE_REGION = {3, 7, 11, 15}


def _bc6_unquantize(x, bits, signed):
    """Raw endpoint -> ~17-bit linear scale (per the BPTC spec)."""
    x = x.astype(np.int64)
    if not signed:
        if bits >= 15:
            return x
        mask = (1 << bits) - 1
        u = ((x << 16) + 0x8000) >> bits
        u = np.where(x == 0, 0, np.where(x == mask, 0xFFFF, u))
        return u
    if bits >= 16:
        return x
    s = x < 0
    ax = np.abs(x)
    mx = (1 << (bits - 1)) - 1
    u = ((ax << 15) + 0x4000) >> (bits - 1)
    u = np.where(ax == 0, 0, np.where(ax >= mx, 0x7FFF, u))
    return np.where(s, -u, u)


def _bc6_finish(x, signed):
    """Interpolated value -> float16 bit pattern."""
    if not signed:
        return ((x.astype(np.int64) * 31) >> 6).astype(np.uint16)
    x = x.astype(np.int64)
    s = x < 0
    v = (np.abs(x) * 31) >> 5
    return (np.where(s, v | 0x8000, v)).astype(np.uint16)


def _sign_extend(x, bits):
    m = np.int64(1) << (bits - 1)
    return (x ^ m) - m


def decode_bc6h_blocks(blk: np.ndarray, signed: bool) -> np.ndarray:
    """blk [N, 16] u8 -> [N, 16, 3] float32 HDR texels."""
    N = blk.shape[0]
    bits = np.unpackbits(blk, axis=1, bitorder="little")
    bits = np.pad(bits, ((0, 0), (0, 8)))
    two = (blk[:, 0] & 3) < 2
    mode = np.where(two, (blk[:, 0] & 3).astype(np.int64),
                    (blk[:, 0] & 31).astype(np.int64))
    # map 2-bit codes 0/1 onto distinct keys (0, 1); 5-bit keep value
    half = np.zeros((N, 16, 3), np.uint16)
    for mcode, (epb, delta, fields) in _BC6_MODES.items():
        rows = np.nonzero(mode == mcode)[0]
        if not rows.size:
            continue
        rb = bits[rows]
        off = 2 if mcode < 2 else 5
        ep = np.zeros((rows.size, 13), np.int64)  # 12 endpoints + d
        for dest, dbit, cnt in fields:
            n = abs(cnt)
            v = _get(rb, off, n)
            if cnt < 0:  # MSB-first (reversed) extra-precision bits
                r = np.zeros_like(v)
                for k in range(n):
                    r |= ((v >> k) & 1) << (n - 1 - k)
                v = r
            ep[:, dest] |= v << dbit
            off += n
        one = mcode in _BC6_ONE_REGION
        d = np.zeros(rows.size, np.int64) if one else ep[:, _D]

        # sign extension: base endpoint when signed; deltas always
        if signed:
            for c in range(3):
                ep[:, c] = _sign_extend(ep[:, c], epb)
        if delta is not None:
            mask = (1 << epb) - 1
            for c in range(3):
                db = delta[c]
                for e in (1, 2, 3):
                    idx = 3 * e + c
                    dv = _sign_extend(ep[:, idx], db)
                    v = (ep[:, c] + dv) & mask
                    if signed:
                        # spec + DirectXTex: the wrapped sum is
                        # re-sign-extended at the endpoint width.
                        # (Pillow's BcnDecode skips this for epb < 16,
                        # clamping legitimately-negative transformed
                        # endpoints to +max — the differential test
                        # masks that divergence.)
                        v = _sign_extend(v, epb)
                    ep[:, idx] = v
        elif signed:
            for c in range(3):
                for e in (1, 2, 3):
                    ep[:, 3 * e + c] = _sign_extend(ep[:, 3 * e + c], epb)

        uq = np.stack(
            [
                _bc6_unquantize(ep[:, 3 * e + c], epb, signed)
                for e in range(4)
                for c in range(3)
            ],
            axis=1,
        ).reshape(rows.size, 4, 3)

        if one:
            idx = _indices(rb, off, 4, [])
            w = _W4[idx]  # [R, 16]
            e0 = uq[:, 0:1]
            e1 = uq[:, 1:2]
            interp = (e0 * (64 - w[..., None]) + e1 * w[..., None] + 32) >> 6
        else:
            a1 = _ANCHOR2[d]
            idx = _indices(rb, off, 3, [a1])
            w = _W3[idx]
            sub = _PART2[d].astype(np.int64)  # [R, 16]
            e0 = np.take_along_axis(uq, (sub * 2)[..., None], axis=1)
            e1 = np.take_along_axis(uq, (sub * 2 + 1)[..., None], axis=1)
            interp = (e0 * (64 - w[..., None]) + e1 * w[..., None] + 32) >> 6
        half[rows] = _bc6_finish(interp, signed)

    return np.frombuffer(
        half.astype("<u2").tobytes(), dtype=np.float16
    ).reshape(N, 16, 3).astype(np.float32)


def decode_bc7(data: bytes, h: int, w: int) -> np.ndarray:
    """One BC7 mip -> RGBA8 [h, w, 4]."""
    from orbit_tpu.assets.dds import _blocks_to_image

    bh, bw = -(-h // 4), -(-w // 4)
    n = bh * bw
    blk = np.frombuffer(data, np.uint8, count=n * 16).reshape(n, 16)
    return _blocks_to_image(decode_bc7_blocks(blk), h, w)


def decode_bc6h(data: bytes, h: int, w: int, signed: bool) -> np.ndarray:
    """One BC6H mip -> float32 HDR [h, w, 3]."""
    from orbit_tpu.assets.dds import _blocks_to_image

    bh, bw = -(-h // 4), -(-w // 4)
    n = bh * bw
    blk = np.frombuffer(data, np.uint8, count=n * 16).reshape(n, 16)
    return _blocks_to_image(decode_bc6h_blocks(blk, signed), h, w)
