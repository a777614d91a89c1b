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
# Corner-attribute block layout (v3 in-raster interpolation).
#
# Per-pixel HBM gathers cost ~5 ns/row on TPU, so the rasterizer
# interpolates ALL surface attributes in-kernel. v3 goes further than the
# v2 per-instance coefficient stream: the per-TRIANGLE data is baked ONCE
# at asset load into `tri_ac` [M, CA_ROWS, 64] (rows = channels below,
# lanes = triangles) and the kernel gathers it per pair BY MESHLET ID —
# no per-frame [I, rows, 64] materialization at all (at bench scale that
# stream plus its layout copies was ~45 ms/frame). Interpolation uses the
# winning triangle's raw corner values f_i with the edge functionals E_i
# the kernel already evaluates from `setup`:
#   attr(p) = (f_0 E_0(p) + f_1 E_1(p) + f_2 E_2(p)) / (E_0+E_1+E_2)(p)
# which is the same perspective-correct rational interpolant as v2
# (numerators regrouped), exact in f32.
#
# Rows 0..26 are corner-major per-corner values: row c*9 + ch with
# ch in (u, v, nx, ny, nz, tx, ty, tz, tw) — so f_c = rows [c*9, c*9+9)
# slice densely. Rows CA_BASE.. are per-meshlet material constants in
# EXACTLY the G-buffer's GB_BASE..GB_MATID order, broadcast across all 64
# lanes so the same one-hot winner select returns them unchanged.
CA_CH = 9         # per-corner channels: u v nx ny nz tx ty tz tw
CA_BASE = 32      # base color RGBA constants (4) — GB order from here
CA_EMISSIVE = 36  # emissive RGB constants (3)
CA_METALLIC = 39
CA_ROUGHNESS = 40
CA_MASK_SLOT = 41   # alpha-mask slot id (float, -1 = opaque)
CA_CTEX = 42      # combined-texture layer id (float-encoded, -1 none)
CA_MATID = 43     # material id (float-encoded, for debug modes)
CA_SAMPLER = 44   # material sampler id (wrap | filter<<2, float-encoded)
CA_CONST_ROWS = 13  # CA_BASE..CA_SAMPLER, contiguous, == GB constant rows
CA_ROWS = 48      # padded to a multiple of 8 sublanes

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
GB_SAMPLER = 25   # material sampler id (per-texture wrap/filter parity)
GB_OVERDRAW = 26  # accumulated covering-fragment count (render mode 7)
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


def eval_gbuffer_channels(sel_f, sel_s, xs, ys):
    """Evaluate interpolated surface channels from the winning triangle's
    selected rows. Rank-2 throughout (Mosaic-friendly).

    sel_f: [CA_ROWS, NP] per-pixel corner-attr rows after the winner
    select (see CA_* layout); sel_s: [12, NP] the winner's edge/depth
    setup coefficients. xs, ys: [NP] or [1, NP] pixel centers.
    Returns [GB_ROWS, NP] — see GB_* layout. All attributes are the
    perspective-correct rational interpolants
      attr = (f0*E0 + f1*E1 + f2*E2) / (E0+E1+E2)
    with analytic screen derivatives for the uv channels (texture LOD).
    The corner blend runs as dense [CA_CH, NP] vector ops.
    """
    x = xs.reshape(1, -1)
    y = ys.reshape(1, -1)

    e0 = sel_s[0:1] * x + sel_s[1:2] * y + sel_s[2:3]  # [1, NP]
    e1 = sel_s[3:4] * x + sel_s[4:5] * y + sel_s[5:6]
    e2 = sel_s[6:7] * x + sel_s[7:8] * y + sel_s[8:9]
    s_val = e0 + e1 + e2
    inv_s = 1.0 / jnp.where(jnp.abs(s_val) < 1e-24, 1.0, s_val)

    f0 = sel_f[0:CA_CH]  # [9, NP] corner 0 values
    f1 = sel_f[CA_CH : 2 * CA_CH]
    f2 = sel_f[2 * CA_CH : 3 * CA_CH]
    num = f0 * e0 + f1 * e1 + f2 * e2  # [9, NP] dense
    att = num * inv_s
    u = att[0:1]
    v = att[1:2]
    # numerator x/y gradients are constant per triangle:
    #   dN/dx = f0*e0x + f1*e1x + f2*e2x   (uv channels only)
    a_s = sel_s[0:1] + sel_s[3:4] + sel_s[6:7]  # dS/dx
    b_s = sel_s[1:2] + sel_s[4:5] + sel_s[7:8]  # dS/dy
    dn_x = f0[0:2] * sel_s[0:1] + f1[0:2] * sel_s[3:4] + f2[0:2] * sel_s[6:7]
    dn_y = f0[0:2] * sel_s[1:2] + f1[0:2] * sel_s[4:5] + f2[0:2] * sel_s[7:8]
    duv_dx = (dn_x - att[0:2] * a_s) * inv_s  # [2, NP] (du/dx, dv/dx)
    duv_dy = (dn_y - att[0:2] * b_s) * inv_s

    rows = [
        u, v,
        duv_dx[0:1], duv_dx[1:2], duv_dy[0:1], duv_dy[1:2],
        att[2:9],  # normal xyz + tangent xyzw
        sel_f[CA_BASE : CA_BASE + CA_CONST_ROWS],  # constants, GB order
    ]
    pad = GB_ROWS - (6 + 7 + CA_CONST_ROWS)
    if pad > 0:
        rows.append(jnp.zeros((pad, x.shape[1]), sel_f.dtype))
    return jnp.concatenate(rows, axis=0)


def eval_uv(sel_uv, sel_s, xs, ys):
    """Interpolated (u, v) only — the alpha-test fast path of
    eval_gbuffer_channels (same expression tree term for term, so the
    two produce bit-identical uv and therefore identical discards).

    sel_uv: [6, NP] winner corner uv rows in order
    (u0, v0, u1, v1, u2, v2); sel_s: [12, NP] winner setup coefficients.
    Returns (u [1, NP], v [1, NP])."""
    x = xs.reshape(1, -1)
    y = ys.reshape(1, -1)
    e0 = sel_s[0:1] * x + sel_s[1:2] * y + sel_s[2:3]
    e1 = sel_s[3:4] * x + sel_s[4:5] * y + sel_s[5:6]
    e2 = sel_s[6:7] * x + sel_s[7:8] * y + sel_s[8:9]
    s_val = e0 + e1 + e2
    inv_s = 1.0 / jnp.where(jnp.abs(s_val) < 1e-24, 1.0, s_val)
    num = sel_uv[0:2] * e0 + sel_uv[2:4] * e1 + sel_uv[4:6] * e2
    att = num * inv_s
    return att[0:1], att[1:2]


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


def alpha_coverage_test(s, g, duv, xi, yi, a2c_samples: int):
    """Winner keep/discard from the signed alpha field.

    s = alpha - cutoff at the winner's uv; g = baked per-texel alpha
    gradient. a2c_samples == 1: plain cutoff (keep iff s > 0, the
    shadow/no-AA behavior, shadow.frag:23-38). a2c_samples == k > 1
    (SSAA): the reference's mip-stable alpha-to-coverage sharpening
    (forward_depth_prepass.frag:35-57) —
        sharp = (alpha - cutoff) / fwidth(alpha) + 0.5
    with fwidth reconstructed as g * R * |duv/dpixel| from the baked
    gradient and the interpolator's analytic uv screen derivatives, then
    dithered against ordered per-sub-sample coverage thresholds so edges
    dissolve smoothly across the k*k shading samples (the TPU analog of
    MSAA alpha-to-coverage). xi/yi: integer pixel coords in the
    SUPERSAMPLED grid (sub-sample position = coords mod k). duv: the
    per-pixel max |duv/dpixel| magnitude (same shape as s)."""
    if a2c_samples <= 1:
        return s > 0.0
    fw = g * (ALPHA_MASK_RES * duv)
    sharp = s / jnp.maximum(fw, 1e-6) + 0.5
    k = a2c_samples
    sub = (yi % k) * k + (xi % k)
    thresh = (sub.astype(jnp.float32) + 0.5) * (1.0 / (k * k))
    return sharp > thresh


def raster_meshlet_gbuffer(
    setup_m, attrs_m, vis_base, xs, ys, depth, vis, gb, pix_mask=None,
    alpha_masks=None, mask_slot=None, overdraw=True, a2c_samples=1,
):
    """G-buffer variant of raster_meshlet_on_tile. Rank-2 pure.

    setup_m: [64, 12]; attrs_m: [CA_ROWS, 64] (the meshlet's tri_ac
    block); xs/ys/depth: [NP] flat; vis: [NP] i32; gb: [GB_ROWS, NP].
    Returns (depth, vis, gb).
    The winning triangle's corner-attr rows AND setup coefficients are
    selected per pixel and evaluated — zero memory gathers.
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

    # exact select of the winner's rows (the Pallas kernel uses a one-hot
    # MXU matmul; a one-hot select is exact in either form, so the two
    # paths stay bit-identical)
    sel_f = attrs_m[:, best_tri]  # [CA_ROWS, NP]
    sel_s = setup_m[best_tri].T  # [12, NP]
    channels = eval_gbuffer_channels(sel_f, sel_s, xs, ys)

    if alpha_masks is not None:
        ms = (
            mask_slot
            if mask_slot is not None
            else jnp.round(attrs_m[CA_MASK_SLOT, 0]).astype(jnp.int32)
        )
        ui, vi = alpha_mask_texel_index(channels[GB_U], channels[GB_V])
        row = jnp.maximum(ms, 0) * ALPHA_MASK_RES + vi
        s = alpha_masks[row, ui]
        g = alpha_masks[row, ui + ALPHA_MASK_RES]
        duv = jnp.maximum(
            jnp.maximum(
                jnp.abs(channels[GB_DUDX]), jnp.abs(channels[GB_DVDX])
            ),
            jnp.maximum(
                jnp.abs(channels[GB_DUDY]), jnp.abs(channels[GB_DVDY])
            ),
        )
        xi = (xs - 0.5).astype(jnp.int32)
        yi = (ys - 0.5).astype(jnp.int32)
        keep = alpha_coverage_test(s, g, duv, xi, yi, a2c_samples)
        win = win & ((ms < 0) | keep)

    new_depth = jnp.where(win, best_z, depth)
    new_vis = jnp.where(win, vis_base + best_tri, vis)
    new_gb = jnp.where(win[None], channels, gb)
    # overdraw accumulates over ALL covering fragments (not just winners),
    # mirroring the reference's additive overdraw visualization. Skipped
    # statically when no consumer needs it (render modes != 7): the
    # accumulation is a per-chunk read-modify-write in the hot loop.
    if overdraw:
        coverage = inside.sum(axis=0).astype(jnp.float32)
        new_gb = new_gb.at[GB_OVERDRAW].set(gb[GB_OVERDRAW] + coverage)
    return new_depth, new_vis, new_gb


def raster_meshlet_depth_alpha(
    setup_m, attrs_m, vis_base, xs, ys, depth, vis, pix_mask=None,
    alpha_masks=None, mask_slot=None,
):
    """Depth-only raster step WITH the winner-level alpha test — the
    cheap path for MASKED-material shadow cascades (reference: the
    depth-only shadow pipeline whose fragment shader does nothing but an
    alpha-cutoff discard, shadow.frag:23-38). Identical candidate /
    winner / uv math to raster_meshlet_gbuffer so cutout holes are
    bit-identical to the G-buffer path's, but no G-buffer rows are
    computed or written.

    Returns (depth, vis)."""
    c = setup_m[:, :, None]
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

    ms = (
        mask_slot
        if mask_slot is not None
        else jnp.round(attrs_m[CA_MASK_SLOT, 0]).astype(jnp.int32)
    )
    # winner uv via the same perspective-correct interpolant as the
    # G-buffer path (eval_uv == eval_gbuffer_channels' uv term for term)
    # so the discard is identical
    uv_rows = jnp.concatenate(
        [
            attrs_m[0:2],
            attrs_m[CA_CH : CA_CH + 2],
            attrs_m[2 * CA_CH : 2 * CA_CH + 2],
        ],
        axis=0,
    )
    sel_uv = uv_rows[:, best_tri]
    sel_s = setup_m[best_tri].T
    u, v = eval_uv(sel_uv, sel_s, xs, ys)
    ui, vi = alpha_mask_texel_index(u[0], v[0])
    s = alpha_masks[jnp.maximum(ms, 0) * ALPHA_MASK_RES + vi, ui]
    win = win & ((ms < 0) | (s > 0.0))

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
