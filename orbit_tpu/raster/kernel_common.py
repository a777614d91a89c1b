"""Rasterizer inner-loop math, shared by the Pallas kernel and the XLA
fallback so both paths are bit-identical.

One step rasterizes one meshlet (64 triangles) against one tile:
edge/depth functionals are evaluated as [64, TILE_PX] VPU broadcasts,
reduced over the triangle axis, then merged into the running
(depth, visibility id) with a reverse-Z GREATER test — the traced
equivalent of the reference's depth-test + draw (graph.rs RenderPass with
GREATER compare, app.rs:562-563 D32 reverse-Z convention).
"""

from __future__ import annotations

import jax.numpy as jnp

# functional layout inside setup[..., 12]
E0X, E0Y, E0C = 0, 1, 2
E1X, E1Y, E1C = 3, 4, 5
E2X, E2Y, E2C = 6, 7, 8
ZA, ZB, ZC = 9, 10, 11

VIS_TRI_BITS = 6  # 64 triangles per meshlet
VIS_NONE = 0  # background visibility id


def raster_meshlet_on_tile(setup_m, vis_base, xs, ys, depth, vis):
    """setup_m: [64, 12] triangle coefficients (flattened meshlet)
    vis_base: scalar i32 (slot << 6) + 1
    xs, ys:   [*pix] pixel-center coordinates (any shape, e.g. [TPX] or [TH,TW])
    depth:    [*pix] f32 running reverse-Z depth (0 = far/background)
    vis:      [*pix] i32 running visibility ids
    Returns updated (depth, vis).
    """
    pix_rank = xs.ndim
    c = setup_m.reshape((setup_m.shape[0], 12) + (1,) * pix_rank)
    x = xs[None]  # [1, *pix]
    y = ys[None]

    e0 = c[:, E0X] * x + c[:, E0Y] * y + c[:, E0C]
    e1 = c[:, E1X] * x + c[:, E1Y] * y + c[:, E1C]
    e2 = c[:, E2X] * x + c[:, E2Y] * y + c[:, E2C]
    z = c[:, ZA] * x + c[:, ZB] * y + c[:, ZC]

    inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & (z <= 1.0)
    cand = jnp.where(inside, z, -1.0)  # [64, TPX]

    best_z = jnp.max(cand, axis=0)  # [TPX]
    best_tri = jnp.argmax(cand, axis=0).astype(jnp.int32)

    win = best_z > depth
    new_depth = jnp.where(win, best_z, depth)
    new_vis = jnp.where(win, vis_base + best_tri, vis)
    return new_depth, new_vis


def tile_pixel_centers(tile_y, tile_x, tile_h, tile_w):
    """Flattened pixel-center coords of tile (tile_y, tile_x) — traced ok."""
    rows = jnp.arange(tile_h, dtype=jnp.float32)
    cols = jnp.arange(tile_w, dtype=jnp.float32)
    ys = (tile_y * tile_h + rows)[:, None] + 0.5
    xs = (tile_x * tile_w + cols)[None, :] + 0.5
    ys = jnp.broadcast_to(ys, (tile_h, tile_w)).reshape(-1)
    xs = jnp.broadcast_to(xs, (tile_h, tile_w)).reshape(-1)
    return xs, ys
