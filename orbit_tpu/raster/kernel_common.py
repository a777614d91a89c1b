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
# channels below, lanes = triangles (transposed for the in-kernel winner
# select). The affine coefficients are stored PLANE-MAJOR — all a-rows,
# then all b-rows, then all c-rows, channels in ACH_* order within each
# plane — so the evaluation num = A*x + B*y + C runs as dense [10, NP]
# vector ops at full sublane occupancy instead of [1, NP] row ops (8x
# fewer vector instructions; this was the rasterizer's hottest loop).
# Per-TRIANGLE affine rows come first (rows < AC_SELECT_ROWS go through
# the per-pixel winner select); per-MESHLET constant rows follow in
# EXACTLY the G-buffer's GB_BASE..GB_MATID order so they copy over as one
# dense block. All selection is exact f32: the coefficients are
# pixel-scale x w magnitude and the affine evaluation cancels
# catastrophically, so bf16 selection is NOT allowed.
ACH_U = 0         # channel order within each a/b/c plane
ACH_V = 1
ACH_S = 2         # denominator: sum of edge coefficients
ACH_NRM = 3       # normal xyz
ACH_TAN = 6       # tangent xyzw
ACH_N = 10        # affine channels per plane
AC_A = 0          # a-plane rows (coefficient of px)
AC_B = 10         # b-plane rows (coefficient of py)
AC_C = 20         # c-plane rows (constant)
AC_SELECT_ROWS = 32  # rows 0..31 go through the winner select (30 used)
AC_BASE = 32      # base color RGBA constants (4) — GB order from here
AC_EMISSIVE = 36  # emissive RGB constants (3)
AC_METALLIC = 39
AC_ROUGHNESS = 40
AC_MASK_SLOT = 41   # alpha-mask slot id (float, -1 = opaque)
AC_CTEX = 42      # combined-texture layer id (float-encoded, -1 none)
AC_MATID = 43     # material id (float-encoded, for debug modes)
AC_CONST_ROWS = 12  # AC_BASE..AC_MATID, contiguous, == GB constant rows
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
GB_MASK_SLOT = 22   # alpha-mask slot id (float, -1 = opaque)
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

    sel: [AC_ROWS, NP] (per-pixel coefficients after the one-hot select,
    plane-major — see AC_* layout)
    xs, ys: [NP] or [1, NP] pixel centers.
    Returns [GB_ROWS, NP] — see GB_* layout. All attributes are rational
    interpolants attr = (a*px + b*py + c) / S with analytic screen
    derivatives for the uv channels (used for texture LOD). The affine
    evaluation runs as dense [ACH_N, NP] blocks (full sublane occupancy).
    """
    x = xs.reshape(1, -1)
    y = ys.reshape(1, -1)

    A = sel[AC_A : AC_A + ACH_N]  # [10, NP]
    B = sel[AC_B : AC_B + ACH_N]
    C = sel[AC_C : AC_C + ACH_N]
    num = A * x + B * y + C  # [10, NP] dense

    s_val = num[ACH_S : ACH_S + 1]
    inv_s = 1.0 / jnp.where(jnp.abs(s_val) < 1e-24, 1.0, s_val)
    att = num * inv_s  # [10, NP] dense
    u = att[ACH_U : ACH_U + 1]
    v = att[ACH_V : ACH_V + 1]
    # d(U/S)/dx = (Ua - u*Sa)/S etc.
    a_s = A[ACH_S : ACH_S + 1]
    b_s = B[ACH_S : ACH_S + 1]
    dudx = (A[ACH_U : ACH_U + 1] - u * a_s) * inv_s
    dvdx = (A[ACH_V : ACH_V + 1] - v * a_s) * inv_s
    dudy = (B[ACH_U : ACH_U + 1] - u * b_s) * inv_s
    dvdy = (B[ACH_V : ACH_V + 1] - v * b_s) * inv_s

    rows = [
        u, v, dudx, dvdx, dudy, dvdy,
        att[ACH_NRM : ACH_NRM + 7],  # normal xyz + tangent xyzw
        sel[AC_BASE : AC_BASE + AC_CONST_ROWS],  # constants, GB order
    ]
    pad = GB_ROWS - (6 + 7 + AC_CONST_ROWS)
    if pad > 0:
        rows.append(jnp.zeros((pad, x.shape[1]), sel.dtype))
    return jnp.concatenate(rows, axis=0)


ALPHA_MASK_RES = 64  # == assets.types.ALPHA_MASK_RES


def alpha_mask_texel_index(u, v, res: int = ALPHA_MASK_RES):
    """Wrap uv and return integer mask texel coords (shared by the XLA
    twin and the Pallas kernel so the discard is bit-identical)."""
    ui = jnp.clip(
        ((u - jnp.floor(u)) * res).astype(jnp.int32), 0, res - 1
    )
    vi = jnp.clip(
        ((v - jnp.floor(v)) * res).astype(jnp.int32), 0, res - 1
    )
    return ui, vi


def raster_meshlet_gbuffer(
    setup_m, attrs_m, vis_base, xs, ys, depth, vis, gb, pix_mask=None,
    alpha_masks=None, mask_slot=None,
):
    """G-buffer variant of raster_meshlet_on_tile. Rank-2 pure.

    setup_m: [64, 12]; attrs_m: [AC_ROWS, 64]; xs/ys/depth: [NP] flat;
    vis: [NP] i32; gb: [GB_ROWS, NP]. Returns (depth, vis, gb).
    The winning triangle's coefficient rows are selected with a one-hot
    matmul (MXU) and evaluated per pixel — zero memory gathers.
    pix_mask: see raster_meshlet_on_tile.
    alpha_masks/mask_slot: winner-level alpha test for MASKED materials
    (reference: per-fragment `discard` in forward_depth_prepass.frag /
    shadow.frag). The winning fragment's uv taps the material's baked
    64x64 alpha bitmap; a failing winner is discarded (the pixel keeps
    its previous contents). Approximation vs the reference: a discarded
    winner does not fall back to the next-nearest fragment of the SAME
    meshlet in the same step (other meshlets still composite normally).
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

    # exact select of the winner's coefficient rows (the Pallas kernel
    # uses tpu.dynamic_gather; this must match it bit-for-bit)
    sel = attrs_m[:, best_tri]  # [AC, NP]
    channels = eval_gbuffer_channels(sel, xs, ys)

    if alpha_masks is not None:
        ms = (
            mask_slot
            if mask_slot is not None
            else jnp.round(attrs_m[AC_MASK_SLOT, 0]).astype(jnp.int32)
        )
        ui, vi = alpha_mask_texel_index(channels[GB_U], channels[GB_V])
        a = alpha_masks[jnp.maximum(ms, 0) * ALPHA_MASK_RES + vi, ui]
        win = win & ((ms < 0) | (a > 0.5))

    new_depth = jnp.where(win, best_z, depth)
    new_vis = jnp.where(win, vis_base + best_tri, vis)
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
