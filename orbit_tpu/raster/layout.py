"""Framebuffer tile-layout helpers.

The Pallas rasterizer's native framebuffer layout is [n_tiles_pad,
tile_px] (one row per screen tile, tiles padded to groups of 8) with the
G-buffer's rows interleaved per tile: [n_tiles_pad * GB_ROWS, tile_px].
Keeping buffers in this layout between the raster passes and the fused
deferred-shade kernel removes the image<->tile transposes from the frame
(the round-1 "long tail"); convert to a [H, W] image only where a real
image is needed (HiZ pyramid input, final outputs).
"""

from __future__ import annotations

import jax.numpy as jnp

GROUP = 8  # tiles per framebuffer block (min f32 sublane count)


def tile_grid(height: int, width: int, tile_h: int, tile_w: int):
    """(ntx, nty, n_tiles, n_tiles_pad, tile_px)."""
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty
    n_tiles_pad = -(-n_tiles // GROUP) * GROUP
    return ntx, nty, n_tiles, n_tiles_pad, tile_h * tile_w


def image_to_tiles(img, height, width, tile_h, tile_w):
    """[..., H, W] -> [..., n_tiles_pad, tile_px]."""
    ntx, nty, n_tiles, n_tiles_pad, tpx = tile_grid(
        height, width, tile_h, tile_w
    )
    lead = img.shape[:-2]
    nl = len(lead)
    pad_h, pad_w = nty * tile_h - height, ntx * tile_w - width
    x = jnp.pad(img, [(0, 0)] * nl + [(0, pad_h), (0, pad_w)])
    x = x.reshape(lead + (nty, tile_h, ntx, tile_w))
    perm = tuple(range(nl)) + tuple(nl + i for i in (0, 2, 1, 3))
    t = x.transpose(perm).reshape(lead + (n_tiles, tpx))
    return jnp.pad(t, [(0, 0)] * nl + [(0, n_tiles_pad - n_tiles), (0, 0)])


def tiles_to_image(t, height, width, tile_h, tile_w):
    """[..., n_tiles_pad, tile_px] -> [..., H, W]."""
    ntx, nty, n_tiles, _, _ = tile_grid(height, width, tile_h, tile_w)
    lead = t.shape[:-2]
    nl = len(lead)
    x = t[..., :n_tiles, :].reshape(lead + (nty, ntx, tile_h, tile_w))
    perm = tuple(range(nl)) + tuple(nl + i for i in (0, 2, 1, 3))
    img = x.transpose(perm).reshape(lead + (nty * tile_h, ntx * tile_w))
    return img[..., :height, :width]


def gbuf_tiles_to_rows(gb_t, gb_rows: int):
    """Interleaved [n_tiles_pad*GB, tpx] -> row-major [GB, n_tiles_pad, tpx]
    (the fused shade kernel's block layout: one G-buffer channel spans the
    8 tiles of a block as full sublanes)."""
    ntp = gb_t.shape[0] // gb_rows
    return gb_t.reshape(ntp, gb_rows, gb_t.shape[1]).transpose(1, 0, 2)
