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

import jax
import jax.numpy as jnp

# functional layout inside setup[..., 12]
E0X, E0Y, E0C = 0, 1, 2
E1X, E1Y, E1C = 3, 4, 5
E2X, E2Y, E2C = 6, 7, 8
ZA, ZB, ZC = 9, 10, 11

VIS_TRI_BITS = 6  # 64 triangles per meshlet
VIS_NONE = 0  # background visibility id

# ---------------------------------------------------------------------------
# Attribute-coefficient stream layout (v2 in-raster interpolation).
#
# Per-pixel HBM gathers cost ~5 ns/row on TPU (see MEMORY: axon-tpu-quirks),
# so the rasterizer interpolates ALL surface attributes in-kernel: the
# geometry stage emits, per triangle, affine numerator coefficients
#   attr(p) = (a*px + b*py + c) / S(p),  S = sum of the edge functionals
# plus per-meshlet material constants. Layout [I, AC_ROWS, 64]: rows =
# channels below, lanes = triangles (transposed for the in-kernel one-hot
# MXU select). Affine channels occupy 3 rows (a, b, c); constants 1 row.
# Per-TRIANGLE affine rows come first (rows < AC_SELECT_ROWS are run
# through the per-pixel winner select); per-MESHLET constant rows follow
# (identical across the meshlet's triangles — the kernel broadcasts them
# as scalars instead of selecting). All selection is exact f32: the
# coefficients are pixel-scale x w magnitude and the affine evaluation
# cancels catastrophically, so bf16 selection is NOT allowed.
AC_U = 0          # uv.x numerator (3 rows)
AC_V = 3          # uv.y numerator (3)
AC_S = 6          # denominator: sum of edge coeffs (3)
AC_NRM = 9        # normal xyz numerators (9)
AC_TAN = 18       # tangent xyzw numerators (12)
AC_SELECT_ROWS = 32  # rows 0..31 go through the winner select (30 used)
AC_CTEX = 32      # combined-texture layer id (float-encoded, -1 none)
AC_MATID = 33     # material id (float-encoded, for debug modes)
AC_ALPHA_CUTOFF = 34
AC_BASE = 35      # base color RGBA constants (4)
AC_EMISSIVE = 39  # emissive RGB constants (3)
AC_METALLIC = 42
AC_ROUGHNESS = 43
AC_ROWS = 48      # padded to a multiple of 8 sublanes

# G-buffer row layout emitted by the rasterizer, per tile
GB_U = 0
GB_V = 1
GB_DUDX = 2
GB_DVDX = 3
GB_DUDY = 4
GB_DVDY = 5
GB_NRM = 6        # xyz (unnormalized; normalize at shade)
GB_TAN = 9        # xyzw
GB_BASE = 13      # rgba
GB_EMISSIVE = 17  # rgb
GB_METALLIC = 20
GB_ROUGHNESS = 21
GB_ALPHA_CUTOFF = 22
GB_CTEX = 23
GB_MATID = 24
GB_OVERDRAW = 25  # accumulated covering-fragment count (render mode 7)
GB_ROWS = 32      # padded


def raster_meshlet_on_tile(setup_m, vis_base, xs, ys, depth, vis,
                           pix_mask=None):
    """setup_m: [64, 12] triangle coefficients (flattened meshlet)
    vis_base: scalar i32 (slot << 6) + 1
    xs, ys:   [*pix] pixel-center coordinates (any shape, e.g. [TPX] or [TH,TW])
    depth:    [*pix] f32 running reverse-Z depth (0 = far/background)
    vis:      [*pix] i32 running visibility ids
    pix_mask: optional [*pix] bool — pixels this meshlet may cover (its
    bbox quarter-row range; must mirror the Pallas kernel's chunk skip)
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
    if pix_mask is not None:
        inside = inside & pix_mask[None]
    cand = jnp.where(inside, z, -1.0)  # [64, TPX]

    best_z = jnp.max(cand, axis=0)  # [TPX]
    best_tri = jnp.argmax(cand, axis=0).astype(jnp.int32)

    win = best_z > depth
    new_depth = jnp.where(win, best_z, depth)
    new_vis = jnp.where(win, vis_base + best_tri, vis)
    return new_depth, new_vis


def eval_gbuffer_channels(sel, xs, ys):
    """Evaluate interpolated surface channels from the winning triangle's
    selected coefficient rows. Rank-2 throughout (Mosaic-friendly).

    sel: [AC_ROWS, NP] (per-pixel coefficients after the one-hot select)
    xs, ys: [NP] or [1, NP] pixel centers.
    Returns [GB_ROWS, NP] — see GB_* layout. All attributes are rational
    interpolants attr = (a*px + b*py + c) / S with analytic screen
    derivatives for the uv channels (used for texture LOD).
    """
    x = xs.reshape(1, -1)
    y = ys.reshape(1, -1)

    def row(r):
        return sel[r : r + 1]  # [1, NP]

    def affine(base):
        return row(base) * x + row(base + 1) * y + row(base + 2)

    s_val = affine(AC_S)
    inv_s = 1.0 / jnp.where(jnp.abs(s_val) < 1e-24, 1.0, s_val)
    u_num = affine(AC_U)
    v_num = affine(AC_V)
    u = u_num * inv_s
    v = v_num * inv_s
    # d(U/S)/dx = (Ua - u*Sa)/S etc.
    dudx = (row(AC_U) - u * row(AC_S)) * inv_s
    dvdx = (row(AC_V) - v * row(AC_S)) * inv_s
    dudy = (row(AC_U + 1) - u * row(AC_S + 1)) * inv_s
    dvdy = (row(AC_V + 1) - v * row(AC_S + 1)) * inv_s

    rows = [u, v, dudx, dvdx, dudy, dvdy]
    for k in range(3):  # normal xyz
        rows.append(affine(AC_NRM + 3 * k) * inv_s)
    for k in range(4):  # tangent xyzw
        rows.append(affine(AC_TAN + 3 * k) * inv_s)
    # constant channels in GB order (GB_BASE..GB_MATID)
    for r in (
        AC_BASE, AC_BASE + 1, AC_BASE + 2, AC_BASE + 3,
        AC_EMISSIVE, AC_EMISSIVE + 1, AC_EMISSIVE + 2,
        AC_METALLIC, AC_ROUGHNESS, AC_ALPHA_CUTOFF, AC_CTEX, AC_MATID,
    ):
        rows.append(row(r))
    while len(rows) < GB_ROWS:
        rows.append(jnp.zeros_like(u))
    return jnp.concatenate(rows, axis=0)


def raster_meshlet_gbuffer(
    setup_m, attrs_m, vis_base, xs, ys, depth, vis, gb, pix_mask=None
):
    """G-buffer variant of raster_meshlet_on_tile. Rank-2 pure.

    setup_m: [64, 12]; attrs_m: [AC_ROWS, 64]; xs/ys/depth: [NP] flat;
    vis: [NP] i32; gb: [GB_ROWS, NP]. Returns (depth, vis, gb).
    The winning triangle's coefficient rows are selected with a one-hot
    matmul (MXU) and evaluated per pixel — zero memory gathers.
    pix_mask: see raster_meshlet_on_tile.
    """
    # single evaluation of the candidates: the SAME argmax must drive the
    # vis id AND the attribute select (recomputing it in a second fusion
    # can flip FP contraction order and disagree on shared-edge pixels)
    c = setup_m[:, :, None]  # [64, 12, 1]
    x = xs[None]
    y = ys[None]
    e0 = c[:, E0X] * x + c[:, E0Y] * y + c[:, E0C]
    e1 = c[:, E1X] * x + c[:, E1Y] * y + c[:, E1C]
    e2 = c[:, E2X] * x + c[:, E2Y] * y + c[:, E2C]
    z = c[:, ZA] * x + c[:, ZB] * y + c[:, ZC]
    inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & (z <= 1.0)
    if pix_mask is not None:
        inside = inside & pix_mask[None]
    cand = jnp.where(inside, z, -1.0)
    best_z = jnp.max(cand, axis=0)
    best_tri = jnp.argmax(cand, axis=0).astype(jnp.int32)
    win = best_z > depth
    new_depth = jnp.where(win, best_z, depth)
    new_vis = jnp.where(win, vis_base + best_tri, vis)

    # exact select of the winner's coefficient rows (the Pallas kernel
    # uses tpu.dynamic_gather; this must match it bit-for-bit)
    sel = attrs_m[:, best_tri]  # [AC, NP]
    channels = eval_gbuffer_channels(sel, xs, ys)
    new_gb = jnp.where(win[None], channels, gb)
    # overdraw accumulates over ALL covering fragments (not just winners),
    # mirroring the reference's additive overdraw visualization
    coverage = inside.sum(axis=0).astype(jnp.float32)
    new_gb = new_gb.at[GB_OVERDRAW].set(gb[GB_OVERDRAW] + coverage)
    return new_depth, new_vis, new_gb


def tile_pixel_centers(tile_y, tile_x, tile_h, tile_w):
    """Flattened pixel-center coords of tile (tile_y, tile_x) — traced ok."""
    rows = jnp.arange(tile_h, dtype=jnp.float32)
    cols = jnp.arange(tile_w, dtype=jnp.float32)
    ys = (tile_y * tile_h + rows)[:, None] + 0.5
    xs = (tile_x * tile_w + cols)[None, :] + 0.5
    ys = jnp.broadcast_to(ys, (tile_h, tile_w)).reshape(-1)
    xs = jnp.broadcast_to(xs, (tile_h, tile_w)).reshape(-1)
    return xs, ys
