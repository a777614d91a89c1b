"""Fused deferred shading: one Pallas kernel from G-buffer to sRGB u8.

The round-1 shade stage was ~700 small XLA ops over 2M pixels — every
elementwise op a full HBM round-trip. This module collapses the entire
deferred shade (combined-texture apply, normal mapping, world-position
reconstruction, SH9 irradiance + analytic env-BRDF IBL, Cook-Torrance
direct lights, sky composite, ACES tonemap, sRGB pack) into ONE Pallas
kernel over framebuffer tile blocks, consuming the rasterizer's native
tile layout (no image transposes anywhere on the fused path).

The only memory-indirect work — the combined-texture texel and the
prefiltered-environment texel — stays in XLA as two gathers feeding the
kernel (TPU random gathers cost ~5 ns/row regardless of how they are
issued; see docs/ARCHITECTURE.md).

Parity: forward.frag:268-567 (material eval + light loop) +
post_process.frag (ACES) re-expressed tile-wise. The XLA twin
(`backend="xla"`) runs the identical math for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbit_tpu.raster.kernel_common import (
    GB_BASE,
    GB_CTEX,
    GB_DUDX,
    GB_DUDY,
    GB_DVDX,
    GB_DVDY,
    GB_EMISSIVE,
    GB_METALLIC,
    GB_NRM,
    GB_ROUGHNESS,
    GB_ROWS,
    GB_SAMPLER,
    GB_TAN,
    GB_U,
    GB_V,
)
from orbit_tpu.scene import LIGHT_DIRECTIONAL, LIGHT_POINT, LIGHT_SKY
from orbit_tpu.shade.gbuffer import _ctex_addr, _mip_offset_closed_form
from orbit_tpu.shade.ibl import spec_mip_offsets
from orbit_tpu.shade.texture import size_from_atlas
from orbit_tpu.assets.types import num_mips

_GROUP = 8  # tiles per kernel block

# 32-row tiles put ~12 MB of block groups in flight; raise the scoped-
# VMEM ceiling above the 16 MB default (v5e has 128 MB VMEM)
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

# scalar-parameter layout (f32 SMEM vector)
_P_IVP = 0  # inv(view_proj) row-major [16]
_P_EYE = 16  # [3]
_P_EXPOSURE = 19
_P_PROJ00 = 20  # proj[0,0], proj[1,1] (background camera rays)
_P_PROJ11 = 21
_P_VIEWR = 22  # view[:3,:3] row-major [9]
_P_SH = 31  # SH9 irradiance [9*3] row-major
_P_LIGHT = 58  # per light: dir[3] color[3] pos[3] intensity inner outer
_P_PER_LIGHT = 12
# VSM shadow blocks follow the lights (one per shadowed dir light):
# 16*C matrix floats (world->clip, row-major, cascade-major), C world
# sizes, then normal_bias_scale, oriented_bias, vsm_bleed, vsm_min_var
_P_PER_VSM_SCALARS = 4
_LUM_CUTOFF = 0.25  # pbr.shade default luminance cutoff

_PI = float(np.pi)


def _rnorm3(x, y, z, eps=1e-20):
    inv = 1.0 / jnp.sqrt(jnp.maximum(x * x + y * y + z * z, eps))
    return x * inv, y * inv, z * inv


def _srgb2lin(c):
    return jnp.where(c < 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _lin2srgb(c):
    c = jnp.maximum(c, 0.0)
    return jnp.where(
        c < 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055
    )


def _byte(w, b):
    # int32 intermediate: Mosaic has no u32->f32 cast
    v = ((w >> (8 * b)) & jnp.uint32(0xFF)).astype(jnp.int32)
    return v.astype(jnp.float32) * (1.0 / 255.0)


def _worldpos(P, depth, x, y, W, H):
    """Reverse-Z NDC unproject via inv(view_proj) rows in SMEM params.
    ONE expression tree shared by the shade core, the spec-addr math and
    the VSM shadow math so every consumer computes bit-identical
    positions."""
    ndc_x = x / W * 2.0 - 1.0
    ndc_y = (1.0 - y / H) * 2.0 - 1.0

    def ivp_row(j):
        return (
            P(_P_IVP + 4 * j + 0) * ndc_x
            + P(_P_IVP + 4 * j + 1) * ndc_y
            + P(_P_IVP + 4 * j + 2) * depth
            + P(_P_IVP + 4 * j + 3)
        )

    ww = ivp_row(3)
    ww = jnp.where(jnp.abs(ww) < 1e-20, 1.0, ww)
    return ivp_row(0) / ww, ivp_row(1) / ww, ivp_row(2) / ww


def _vsm_math(
    P, base, C, S, Sm, ldx, ldy, ldz, wx, wy, wz, ngx, ngy, ngz
):
    """Cascade select + bias + moment-sample addressing for one
    directional light's VSM cascade set (passes/shadow.shadow_factor +
    sample_shadow_vsm re-expressed on component arrays; parity:
    forward.frag:406-445 cascade select + bias).

    base: params offset of this light's VSM block. S: cascade render
    resolution (drives the normal-offset bias texel size); Sm: moment-
    table resolution (addressing; == S // vsm_moment_scale). Returns
    (addr, fx, fy, t, inside_any): addr indexes the packed [C*Sm*Sm, 8]
    moment-quad table; the Chebyshev resolve happens where the gathered
    rows are available (_vsm_resolve)."""

    def m(c, r, k):
        return P(base + 16 * c + 4 * r + k)

    def clip_at(c, px, py, pz):
        cx = m(c, 0, 0) * px + m(c, 0, 1) * py + m(c, 0, 2) * pz + m(c, 0, 3)
        cy = m(c, 1, 0) * px + m(c, 1, 1) * py + m(c, 1, 2) * pz + m(c, 1, 3)
        cz = m(c, 2, 0) * px + m(c, 2, 1) * py + m(c, 2, 2) * pz + m(c, 2, 3)
        cw = m(c, 3, 0) * px + m(c, 3, 1) * py + m(c, 3, 2) * pz + m(c, 3, 3)
        return cx, cy, cz, cw

    # first cascade whose NDC bounds contain the (unbiased) point
    found = None
    casc = None
    for c in range(C):
        cx, cy, cz, cw = clip_at(c, wx, wy, wz)
        w_ = jnp.where(jnp.abs(cw) < 1e-12, 1e-12, cw)
        nx_, ny_, nz_ = cx / w_, cy / w_, cz / w_
        inside = (
            (nx_ >= -1.0) & (nx_ <= 1.0)
            & (ny_ >= -1.0) & (ny_ <= 1.0)
            & (nz_ >= 0.0) & (nz_ <= 1.0)
        )
        if found is None:
            found = inside
            casc = jnp.zeros_like(nx_, jnp.int32)
        else:
            casc = jnp.where(inside & ~found, c, casc)
            found = found | inside

    # normal-offset + oriented bias (shadow.shadow_factor)
    ws = P(base + 16 * C)  # world_sizes[0]
    for c in range(1, C):
        ws = jnp.where(casc == c, P(base + 16 * C + c), ws)
    sc = base + 16 * C + C
    nbs, ob = P(sc), P(sc + 1)
    n_dot_l = ngx * ldx + ngy * ldy + ngz * ldz
    noff = (ws / S) * nbs * jnp.clip(1.0 - n_dot_l, 0.0, 1.0)
    oriented = jnp.where(n_dot_l > 0.0, ob, -ob)
    px = wx + noff * ngx + oriented * ldx
    py = wy + noff * ngy + oriented * ldy
    pz = wz + noff * ngz + oriented * ldz

    # biased clip at the selected cascade (static where-chain)
    bx = by = bz = bw = None
    for c in range(C):
        cx, cy, cz, cw = clip_at(c, px, py, pz)
        if bx is None:
            bx, by, bz, bw = cx, cy, cz, cw
        else:
            sel = casc == c
            bx = jnp.where(sel, cx, bx)
            by = jnp.where(sel, cy, by)
            bz = jnp.where(sel, cz, bz)
            bw = jnp.where(sel, cw, bw)

    w_ = jnp.maximum(jnp.abs(bw), 1e-12)
    u = (bx / w_) * 0.5 + 0.5
    v = (by / w_) * -0.5 + 0.5
    t = 1.0 - bz / w_

    x = jnp.clip(u * Sm - 0.5, 0.0, Sm - 1.0)
    y = jnp.clip(v * Sm - 0.5, 0.0, Sm - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)
    addr = casc * (Sm * Sm) + y0 * Sm + x0
    return addr, fx, fy, t, found


def _vsm_resolve(P, sc, q, fx, fy, t, inside_any):
    """Chebyshev VSM resolve from gathered moment-quad rows
    (shadow.sample_shadow_vsm parity). q: 8 component arrays — the mu
    quad m00|m10|m01|m11 then the e2 quad; sc: scalar block offset."""
    mu = (q[0] * (1 - fx) + q[1] * fx) * (1 - fy) + (
        q[2] * (1 - fx) + q[3] * fx
    ) * fy
    e2 = (q[4] * (1 - fx) + q[5] * fx) * (1 - fy) + (
        q[6] * (1 - fx) + q[7] * fx
    ) * fy
    var = jnp.maximum(e2 - mu * mu, P(sc + 3))
    dd = t - mu
    p = var / (var + dd * dd)
    p = jnp.where(dd <= 0.0, 1.0, p)
    lb = P(sc + 2)
    lit = jnp.clip((p - lb) / (1.0 - lb), 0.0, 1.0)
    return jnp.where(inside_any, lit, 1.0)


def _calc_light(
    nx, ny, nz, vx, vy, vz, f0r, f0g, f0b,
    base_r, base_g, base_b, metallic, roughness,
    lx, ly, lz, cr, cg, cb, att,
):
    """Cook-Torrance direct light on component arrays (forward.frag
    calculate_light). Module-level so the in-kernel per-tile point-light
    loop and the full-array paths share one expression tree (bit-identical
    accumulation)."""
    hx, hy, hz = vx + lx, vy + ly, vz + lz
    hinv = 1.0 / jnp.maximum(
        jnp.sqrt(hx * hx + hy * hy + hz * hz), 1e-12
    )
    hx, hy, hz = hx * hinv, hy * hinv, hz * hinv
    ndv = jnp.maximum(nx * vx + ny * vy + nz * vz, 1e-5)
    ndl = jnp.maximum(nx * lx + ny * ly + nz * lz, 1e-5)
    ndh = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
    hdv = jnp.maximum(hx * vx + hy * vy + hz * vz, 0.0)
    a = roughness * roughness
    a2 = a * a
    den = ndh * ndh * (a2 - 1.0) + 1.0
    d = a2 / jnp.maximum(_PI * den * den, 1e-5)
    rr = roughness + 1.0
    k = rr * rr / 8.0
    g1 = ndv / (ndv * (1.0 - k) + k)
    g2 = ndl / (ndl * (1.0 - k) + k)
    g = g1 * g2
    fc = (1.0 - hdv) ** 5
    fr = f0r + (1.0 - f0r) * fc
    fg = f0g + (1.0 - f0g) * fc
    fb = f0b + (1.0 - f0b) * fc
    dg = d * g / (4.0 * ndv * ndl)
    scale = att * ndl
    one_m = 1.0 - metallic
    out_r = ((1.0 - fr) * one_m * base_r / _PI + dg * fr) * cr * scale
    out_g = ((1.0 - fg) * one_m * base_g / _PI + dg * fg) * cg * scale
    out_b = ((1.0 - fb) * one_m * base_b / _PI + dg * fb) * cb * scale
    return out_r, out_g, out_b


def _point_light_contrib(P, o, ctx):
    """One point light (slot params at SMEM offset o) on the component
    arrays in ctx. Shared by the static light loop, the in-kernel tile
    loop and the XLA twin's tile loop — one expression tree."""
    cr, cg, cb = P(o + 3), P(o + 4), P(o + 5)
    dx = P(o + 6) - ctx["wx"]
    dy = P(o + 7) - ctx["wy"]
    dz = P(o + 8) - ctx["wz"]
    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    dinv = 1.0 / jnp.maximum(dist, 1e-12)
    lx, ly, lz = dx * dinv, dy * dinv, dz * dinv
    dist = jnp.maximum(dist, P(o + 10))
    d2 = dist * dist
    outer = P(o + 11)
    att = jnp.maximum(
        P(o + 9) / d2 - _LUM_CUTOFF * d2 / (outer * outer), 0.0
    )
    return _calc_light(
        ctx["nx"], ctx["ny"], ctx["nz"],
        ctx["vx"], ctx["vy"], ctx["vz"],
        ctx["f0r"], ctx["f0g"], ctx["f0b"],
        ctx["base_r"], ctx["base_g"], ctx["base_b"],
        ctx["metallic"], ctx["roughness"],
        lx, ly, lz, cr, cg, cb, att,
    )


def _shade_core(
    P, light_kinds, gbrow, depth, texch, spec, x, y, W, H,
    lit_map=None, ao_in=None, skip_points=False, tile_pts=None,
    vsm_fn=None,
):
    """The whole deferred shade on component arrays of one pixel block.

    P: scalar accessor (SMEM ref or traced array indexing); gbrow(r) ->
    G-buffer channel array; texch: SHADING-SPACE combined-texel channels
    (_texch_nearest / _texch_filtered — sRGB already decoded);
    spec: 3 f32 arrays (prefiltered-env sample along reflection/camera
    rays); x/y: global pixel centers. Returns (r, g, b) HDR + background
    already composited (valid = depth > 0).

    lit_map: {light slot: per-pixel lit factor array} — CSM shadow
    planes multiplying that directional light's contribution.
    ao_in: per-pixel SSAO factor, min'd into the material AO
    (gbuffer.surface_from_gbuffer parity). skip_points: point lights are
    handled by the tile_pts loop instead of the static light loop.
    tile_pts: callable(ctx) -> (r, g, b) accumulating the per-tile
    clustered point-light lists; ctx carries the per-pixel component
    arrays (see _point_light_contrib).
    """
    valid = depth > 0.0

    # ---- material from G-buffer constants x combined texel
    layer = jnp.round(gbrow(GB_CTEX)).astype(jnp.int32)
    has = layer >= 0

    def mix(base_val, tex_val):
        return jnp.where(has, base_val * tex_val, base_val)

    base_r = mix(gbrow(GB_BASE + 0), texch["base_r"])
    base_g = mix(gbrow(GB_BASE + 1), texch["base_g"])
    base_b = mix(gbrow(GB_BASE + 2), texch["base_b"])
    metallic = mix(gbrow(GB_METALLIC), texch["metallic"])
    roughness = mix(gbrow(GB_ROUGHNESS), texch["roughness"])
    em_r = mix(gbrow(GB_EMISSIVE + 0), texch["em_r"])
    em_g = mix(gbrow(GB_EMISSIVE + 1), texch["em_g"])
    em_b = mix(gbrow(GB_EMISSIVE + 2), texch["em_b"])
    ao = jnp.where(has, texch["ao"], 1.0)
    if ao_in is not None:
        ao = jnp.minimum(ao, ao_in)

    # ---- normal mapping (gbuffer.surface_from_gbuffer parity)
    ngx, ngy, ngz = _rnorm3(
        gbrow(GB_NRM + 0), gbrow(GB_NRM + 1), gbrow(GB_NRM + 2)
    )
    ttx, tty, ttz = _rnorm3(
        gbrow(GB_TAN + 0), gbrow(GB_TAN + 1), gbrow(GB_TAN + 2)
    )
    tw = jnp.sign(gbrow(GB_TAN + 3) + 1e-20)
    bx = (ngy * ttz - ngz * tty) * tw
    by = (ngz * ttx - ngx * ttz) * tw
    bz = (ngx * tty - ngy * ttx) * tw
    nt_x = texch["ntx"] * 2.0 - 1.0
    nt_y = texch["nty"] * 2.0 - 1.0
    nt_z = jnp.sqrt(jnp.abs(1.0 - nt_x * nt_x - nt_y * nt_y))
    nmx, nmy, nmz = _rnorm3(
        ttx * nt_x + bx * nt_y + ngx * nt_z,
        tty * nt_x + by * nt_y + ngy * nt_z,
        ttz * nt_x + bz * nt_y + ngz * nt_z,
    )
    thr = 1.5 / 127.0
    is_flat = (jnp.abs(nt_x) < thr) & (jnp.abs(nt_y) < thr)
    use_map = has & ~is_flat
    nx = jnp.where(use_map, nmx, ngx)
    ny = jnp.where(use_map, nmy, ngy)
    nz = jnp.where(use_map, nmz, ngz)

    # ---- world position from depth (reverse-Z NDC unproject)
    wx, wy, wz = _worldpos(P, depth, x, y, W, H)

    vx, vy, vz = _rnorm3(P(_P_EYE) - wx, P(_P_EYE + 1) - wy, P(_P_EYE + 2) - wz)

    # ---- in-core VSM shadows: per-pixel lit factors from the gathered
    # moment quads (replaces the XLA lit-plane pipeline)
    if vsm_fn is not None:
        vsm_lits = vsm_fn(wx, wy, wz, ngx, ngy, ngz)
        lit_map = dict(lit_map) if lit_map else {}
        lit_map.update(vsm_lits)

    # ---- light accumulation (emissive start, forward.frag:368-487)
    sum_r, sum_g, sum_b = em_r, em_g, em_b
    n_dot_v = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
    f0r = 0.04 * (1.0 - metallic) + base_r * metallic
    f0g = 0.04 * (1.0 - metallic) + base_g * metallic
    f0b = 0.04 * (1.0 - metallic) + base_b * metallic

    def calculate_light(lx, ly, lz, cr, cg, cb, att):
        return _calc_light(
            nx, ny, nz, vx, vy, vz, f0r, f0g, f0b,
            base_r, base_g, base_b, metallic, roughness,
            lx, ly, lz, cr, cg, cb, att,
        )

    for li, kind in enumerate(light_kinds):
        o = _P_LIGHT + li * _P_PER_LIGHT
        cr, cg, cb = P(o + 3), P(o + 4), P(o + 5)
        if kind == LIGHT_SKY:
            # IBL: SH9 irradiance (pure math) + analytic env BRDF +
            # pre-gathered prefiltered specular (pbr.shade sky())
            fc = jnp.clip(1.0 - n_dot_v, 0.0, 1.0) ** 5
            fmax = jnp.maximum(1.0 - roughness, f0r)
            ksr = f0r + (fmax - f0r) * fc
            fmax = jnp.maximum(1.0 - roughness, f0g)
            ksg = f0g + (fmax - f0g) * fc
            fmax = jnp.maximum(1.0 - roughness, f0b)
            ksb = f0b + (fmax - f0b) * fc
            one_m = 1.0 - metallic
            kdr, kdg, kdb = (
                (1.0 - ksr) * one_m,
                (1.0 - ksg) * one_m,
                (1.0 - ksb) * one_m,
            )
            # SH basis (ibl._sh_basis)
            sb = [
                0.282095 * jnp.ones_like(nx),
                0.488603 * ny,
                0.488603 * nz,
                0.488603 * nx,
                1.092548 * nx * ny,
                1.092548 * ny * nz,
                0.315392 * (3.0 * nz * nz - 1.0),
                1.092548 * nx * nz,
                0.546274 * (nx * nx - ny * ny),
            ]
            irr = [None] * 3
            for c in range(3):
                acc = sb[0] * P(_P_SH + c)
                for kk in range(1, 9):
                    acc = acc + sb[kk] * P(_P_SH + 3 * kk + c)
                irr[c] = jnp.maximum(acc, 0.0)
            # analytic split-sum env BRDF (ibl.env_brdf_approx)
            ra = -1.0 * roughness + 1.0
            rb = -0.0275 * roughness + 0.0425
            rcx = -0.572 * roughness + 1.04
            rdw = 0.022 * roughness - 0.04
            a004 = (
                jnp.minimum(ra * ra, jnp.exp2(-9.28 * n_dot_v)) * ra + rb
            )
            eb_a = -1.04 * a004 + rcx
            eb_b = 1.04 * a004 + rdw
            c_r = (kdr * irr[0] * base_r + spec[0] * (ksr * eb_a + eb_b))
            c_g = (kdg * irr[1] * base_g + spec[1] * (ksg * eb_a + eb_b))
            c_b = (kdb * irr[2] * base_b + spec[2] * (ksb * eb_a + eb_b))
            sum_r = sum_r + c_r * cr * ao
            sum_g = sum_g + c_g * cg * ao
            sum_b = sum_b + c_b * cb * ao
        elif kind == LIGHT_DIRECTIONAL:
            lr, lg, lb = calculate_light(
                P(o), P(o + 1), P(o + 2), cr, cg, cb,
                jnp.ones_like(n_dot_v),
            )
            if lit_map is not None and li in lit_map:
                lit = lit_map[li]
                lr, lg, lb = lr * lit, lg * lit, lb * lit
            sum_r, sum_g, sum_b = sum_r + lr, sum_g + lg, sum_b + lb
        else:  # LIGHT_POINT
            if skip_points:
                continue
            ctx0 = dict(
                nx=nx, ny=ny, nz=nz, vx=vx, vy=vy, vz=vz,
                f0r=f0r, f0g=f0g, f0b=f0b,
                base_r=base_r, base_g=base_g, base_b=base_b,
                metallic=metallic, roughness=roughness,
                wx=wx, wy=wy, wz=wz,
            )
            lr, lg, lb = _point_light_contrib(P, o, ctx0)
            sum_r, sum_g, sum_b = sum_r + lr, sum_g + lg, sum_b + lb

    if tile_pts is not None:
        ctx = dict(
            nx=nx, ny=ny, nz=nz, vx=vx, vy=vy, vz=vz,
            f0r=f0r, f0g=f0g, f0b=f0b,
            base_r=base_r, base_g=base_g, base_b=base_b,
            metallic=metallic, roughness=roughness,
            wx=wx, wy=wy, wz=wz,
        )
        pr, pg, pb = tile_pts(ctx)
        sum_r, sum_g, sum_b = sum_r + pr, sum_g + pg, sum_b + pb

    # sky background composite: the spec input already carries the
    # prefiltered-env sample along the camera ray for invalid pixels
    hdr_r = jnp.where(valid, sum_r, spec[0])
    hdr_g = jnp.where(valid, sum_g, spec[1])
    hdr_b = jnp.where(valid, sum_b, spec[2])
    return hdr_r, hdr_g, hdr_b


def _tonemap_pack(r, g, b, exposure):
    """ACES(Hill) + sRGB encode + RGBA8 pack (math.color parity)."""
    r, g, b = r * exposure, g * exposure, b * exposure
    v0 = 0.59719 * r + 0.35458 * g + 0.04823 * b
    v1 = 0.07600 * r + 0.90834 * g + 0.01566 * b
    v2 = 0.02840 * r + 0.13383 * g + 0.83777 * b

    def fit(v):
        a = v * (v + 0.0245786) - 0.000090537
        d = v * (0.983729 * v + 0.4329510) + 0.238081
        return a / d

    f0_, f1, f2 = fit(v0), fit(v1), fit(v2)
    o0 = 1.60475 * f0_ - 0.53108 * f1 - 0.07367 * f2
    o1 = -0.10208 * f0_ + 1.10813 * f1 - 0.00605 * f2
    o2 = -0.00327 * f0_ - 0.07276 * f1 + 1.07602 * f2
    s0 = _lin2srgb(jnp.clip(o0, 0.0, 1.0))
    s1 = _lin2srgb(jnp.clip(o1, 0.0, 1.0))
    s2 = _lin2srgb(jnp.clip(o2, 0.0, 1.0))
    u0 = jnp.clip(s0 * 255.0 + 0.5, 0.0, 255.0).astype(jnp.int32)
    u1 = jnp.clip(s1 * 255.0 + 0.5, 0.0, 255.0).astype(jnp.int32)
    u2 = jnp.clip(s2 * 255.0 + 0.5, 0.0, 255.0).astype(jnp.int32)
    packed_i = u0 | (u1 << 8) | (u2 << 16) | jnp.int32(-16777216)
    return jax.lax.bitcast_convert_type(packed_i, jnp.uint32)


def _pack_params(
    scene, env, view, exposure, n_lights, vsm_sets=(), vsm_settings=None
):
    ivp = jnp.linalg.inv(view.view_proj)
    parts = [
        ivp.reshape(-1),
        view.eye,
        jnp.full((1,), exposure, jnp.float32),
        view.proj[0:1, 0],
        view.proj[1:2, 1],
        view.view[:3, :3].reshape(-1),
        env.sh_irradiance.reshape(-1),
    ]
    for li in range(n_lights):
        parts += [
            scene.light_dir[li],
            scene.light_color[li],
            scene.light_pos[li],
            jnp.stack(
                [
                    scene.light_intensity[li],
                    scene.light_inner_radius[li],
                    scene.light_outer_radius[li],
                ]
            ),
        ]
    for sset in vsm_sets:
        st = vsm_settings
        parts += [
            sset.matrices.reshape(-1),
            sset.world_sizes,
            jnp.asarray(
                [
                    st.normal_bias_scale,
                    st.oriented_bias,
                    st.vsm_bleed,
                    st.vsm_min_variance,
                ],
                jnp.float32,
            ),
        ]
    return jnp.concatenate([jnp.asarray(p, jnp.float32) for p in parts])


def _ctex_filter_coords(gbrow, tex_size, t4, mode):
    """Filtered combined-texture sampling coordinates, honoring the
    PER-MATERIAL sampler (GB_SAMPLER row: wrap | filter<<2 — reference
    parity for per-texture SamplerKind binding, gltf_loader.rs:559-569).

    mode: "bilinear" (one quad at the rounded mip) or "trilinear" (quads
    at floor/ceil mips + mip blend). NEAREST-filter materials collapse to
    the nearest texel of the rounded mip (fx = fy = fm = 0) inside the
    same expressions. Returns (addrs, fracs): addrs = [addr_k] base-texel
    indices into the ctex_quad tables (one per sampled mip), fracs =
    (fx_k, fy_k lists, fm). Shared by the Pallas addr kernel and the
    shade kernel (fractions recomputed bit-identically)."""
    ts = jnp.float32(tex_size)
    dx2 = (gbrow(GB_DUDX) ** 2 + gbrow(GB_DVDX) ** 2) * (ts * ts)
    dy2 = (gbrow(GB_DUDY) ** 2 + gbrow(GB_DVDY) ** 2) * (ts * ts)
    lod = 0.5 * jnp.log2(jnp.maximum(jnp.maximum(dx2, dy2), 1e-12))
    n = num_mips(tex_size)
    lod = jnp.clip(lod, 0.0, n - 1.0)
    smp = jnp.round(gbrow(GB_SAMPLER)).astype(jnp.int32)
    wrap = smp & 3
    f_near = ((smp >> 2) & 1) == 1
    layer = jnp.round(gbrow(GB_CTEX)).astype(jnp.int32)
    safe_layer = jnp.maximum(layer, 0)

    if mode == "bilinear":
        ks = [jnp.round(lod).astype(jnp.int32)]
        fm = None
    else:
        k0 = jnp.where(
            f_near, jnp.round(lod), jnp.floor(lod)
        ).astype(jnp.int32)
        ks = [k0, jnp.minimum(k0 + 1, n - 1)]
        fm = jnp.where(f_near, 0.0, lod - jnp.floor(lod))

    u, v = gbrow(GB_U), gbrow(GB_V)

    def wrap01(c):
        rep = c - jnp.floor(c)
        cl = jnp.clip(c, 0.0, 1.0)
        mir = 1.0 - jnp.abs((c - 2.0 * jnp.floor(c * 0.5)) - 1.0)
        return jnp.where(wrap == 0, rep, jnp.where(wrap == 1, cl, mir))

    uw, vw = wrap01(u), wrap01(v)
    addrs, fxs, fys = [], [], []
    for k in ks:
        off, size = _mip_offset_closed_form(tex_size, k)
        fs = size.astype(jnp.float32)
        # LINEAR: texel centers at -0.5; REPEAT's x0 = -1 wraps to
        # size-1 whose baked quad neighbors are (0, ...) — seam-exact.
        # NEAREST-filter materials take the plain nearest texel.
        xl = uw * fs - 0.5
        yl = vw * fs - 0.5
        xl = jnp.where(wrap == 0, xl, jnp.clip(xl, 0.0, fs - 1.0))
        yl = jnp.where(wrap == 0, yl, jnp.clip(yl, 0.0, fs - 1.0))
        x0 = jnp.floor(xl).astype(jnp.int32)
        y0 = jnp.floor(yl).astype(jnp.int32)
        fx = jnp.where(f_near, 0.0, xl - x0.astype(jnp.float32))
        fy = jnp.where(f_near, 0.0, yl - y0.astype(jnp.float32))
        xn = jnp.clip(
            jnp.floor(uw * fs).astype(jnp.int32), 0, size - 1
        )
        yn = jnp.clip(
            jnp.floor(vw * fs).astype(jnp.int32), 0, size - 1
        )
        x0 = jnp.where(f_near, xn, jnp.where(x0 < 0, size - 1, x0))
        y0 = jnp.where(f_near, yn, jnp.where(y0 < 0, size - 1, y0))
        addrs.append(safe_layer * t4 + off + y0 * size + x0)
        fxs.append(fx)
        fys.append(fy)
    return addrs, (fxs, fys, fm)


def _blend_quad(q4, b, fx, fy, srgb=False):
    """Bilinear blend of byte channel b over one gathered quad row
    (4 u32 arrays: texel, right, down, down-right). sRGB channels decode
    PER TEXEL before filtering (hardware sRGB-view semantics)."""
    v = [_byte(t, b) for t in q4]
    if srgb:
        v = [_srgb2lin(x) for x in v]
    top = v[0] * (1.0 - fx) + v[1] * fx
    bot = v[2] * (1.0 - fx) + v[3] * fx
    return top * (1.0 - fy) + bot * fy


# combined-texel channel plan: (word, byte, srgb) per shading channel
_TEXCH_PLAN = dict(
    base_r=(0, 0, True), base_g=(0, 1, True), base_b=(0, 2, True),
    ntx=(1, 0, False), nty=(1, 1, False),
    metallic=(1, 2, False), roughness=(1, 3, False),
    em_r=(2, 0, True), em_g=(2, 1, True), em_b=(2, 2, True),
    ao=(2, 3, False),
)


def _texch_nearest(words):
    """Shading-space texel channels from the nearest-sampled combined
    texel (words: 4 u32 arrays) — the original fused expressions, so the
    nearest path stays bit-identical."""
    out = {}
    for name, (w, b, srgb) in _TEXCH_PLAN.items():
        v = _byte(words[w], b)
        out[name] = _srgb2lin(v) if srgb else v
    return out


def _texch_filtered(qrow, fracs):
    """Shading-space texel channels from gathered quad rows.

    qrow(m, j, t) -> u32 component array: mip m, word j, quad texel t.
    fracs: (fxs, fys, fm) from _ctex_filter_coords."""
    fxs, fys, fm = fracs
    out = {}
    for name, (w, b, srgb) in _TEXCH_PLAN.items():
        mips = [
            _blend_quad(
                [qrow(m, w, t) for t in range(4)], b, fxs[m], fys[m],
                srgb=srgb,
            )
            for m in range(len(fxs))
        ]
        out[name] = (
            mips[0] if len(mips) == 1 else mips[0] * (1.0 - fm) + mips[1] * fm
        )
    return out


def _ctex_addr_math(gbrow, tex_size, t4):
    """Nearest-mip combined-texture texel address from G-buffer rows
    (gbuffer.sample_ctex mode="nearest" parity). Component arrays."""
    ts = jnp.float32(tex_size)
    fx = (gbrow(GB_DUDX) ** 2 + gbrow(GB_DVDX) ** 2) * (ts * ts)
    fy = (gbrow(GB_DUDY) ** 2 + gbrow(GB_DVDY) ** 2) * (ts * ts)
    lod = 0.5 * jnp.log2(jnp.maximum(jnp.maximum(fx, fy), 1e-12))
    n = num_mips(tex_size)
    k = jnp.round(jnp.clip(lod, 0.0, n - 1.0)).astype(jnp.int32)
    layer = jnp.round(gbrow(GB_CTEX)).astype(jnp.int32)
    safe_layer = jnp.maximum(layer, 0)
    _, size = _mip_offset_closed_form(tex_size, k)
    fsize = size.astype(jnp.float32)
    # floor (not truncate) — must match gbuffer.sample_ctex nearest
    tx_ = jnp.floor(gbrow(GB_U) * fsize).astype(jnp.int32)
    ty_ = jnp.floor(gbrow(GB_V) * fsize).astype(jnp.int32)
    return _ctex_addr(safe_layer, t4, tex_size, k, tx_, ty_)


def _spec_addr_math(
    P, gbrow, depth, tex_ntx, tex_nty, tex_rough, x, y, W, H,
    spec_size, spec_mips, t_env
):
    """Prefiltered-env texel address (ibl.sample_specular "nearest"):
    shading-normal reflection ray on covered pixels, camera ray on
    background. tex_ntx/nty/rough: the combined texel's normal-xy and
    roughness-multiplier channels in [0,1] (nearest texel bytes, or the
    filtered blends — the same channels the shade core consumes)."""
    valid = depth > 0.0
    layer = jnp.round(gbrow(GB_CTEX)).astype(jnp.int32)
    has = layer >= 0
    nt_x = tex_ntx * 2.0 - 1.0
    nt_y = tex_nty * 2.0 - 1.0
    nt_z = jnp.sqrt(jnp.abs(1.0 - nt_x * nt_x - nt_y * nt_y))
    ngx, ngy, ngz = _rnorm3(
        gbrow(GB_NRM), gbrow(GB_NRM + 1), gbrow(GB_NRM + 2)
    )
    ttx, tty, ttz = _rnorm3(
        gbrow(GB_TAN), gbrow(GB_TAN + 1), gbrow(GB_TAN + 2)
    )
    tw = jnp.sign(gbrow(GB_TAN + 3) + 1e-20)
    bx = (ngy * ttz - ngz * tty) * tw
    by = (ngz * ttx - ngx * ttz) * tw
    bz = (ngx * tty - ngy * ttx) * tw
    nmx, nmy, nmz = _rnorm3(
        ttx * nt_x + bx * nt_y + ngx * nt_z,
        tty * nt_x + by * nt_y + ngy * nt_z,
        ttz * nt_x + bz * nt_y + ngz * nt_z,
    )
    thr = 1.5 / 127.0
    use_map = has & (~((jnp.abs(nt_x) < thr) & (jnp.abs(nt_y) < thr)))
    nx = jnp.where(use_map, nmx, ngx)
    ny = jnp.where(use_map, nmy, ngy)
    nz = jnp.where(use_map, nmz, ngz)

    ndc_x = x / W * 2.0 - 1.0
    ndc_y = (1.0 - y / H) * 2.0 - 1.0
    wx, wy, wz = _worldpos(P, depth, x, y, W, H)
    vx, vy, vz = _rnorm3(
        P(_P_EYE) - wx, P(_P_EYE + 1) - wy, P(_P_EYE + 2) - wz
    )
    ndv2 = 2.0 * (nx * vx + ny * vy + nz * vz)
    rx, ry, rz = ndv2 * nx - vx, ndv2 * ny - vy, ndv2 * nz - vz

    # camera rays for the background (renderer.camera_ray_dirs parity)
    dvx = ndc_x / P(_P_PROJ00)
    dvy = ndc_y / P(_P_PROJ11)
    bgx = dvx * P(_P_VIEWR + 0) + dvy * P(_P_VIEWR + 3) - P(_P_VIEWR + 6)
    bgy = dvx * P(_P_VIEWR + 1) + dvy * P(_P_VIEWR + 4) - P(_P_VIEWR + 7)
    bgz = dvx * P(_P_VIEWR + 2) + dvy * P(_P_VIEWR + 5) - P(_P_VIEWR + 8)

    dx = jnp.where(valid, rx, bgx)
    dy = jnp.where(valid, ry, bgy)
    dz = jnp.where(valid, rz, bgz)
    rough = jnp.where(
        valid,
        jnp.where(
            has, gbrow(GB_ROUGHNESS) * tex_rough, gbrow(GB_ROUGHNESS)
        ),
        0.0,
    )

    # mip select + cube face/uv (ibl.dir_to_face_uv, component form)
    lodr = jnp.clip(rough, 0.0, 1.0) * (spec_mips - 1)
    ks = jnp.round(lodr).astype(jnp.int32)
    offs = spec_mip_offsets(spec_size, spec_mips)
    res = jnp.full_like(ks, spec_size)
    off = jnp.zeros_like(ks)
    for m in range(1, spec_mips):
        res = jnp.where(ks == m, spec_size >> m, res)
        off = jnp.where(ks == m, int(offs[m]), off)

    ax, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(dx >= 0, 0, 1),
        jnp.where(
            is_y, jnp.where(dy >= 0, 2, 3), jnp.where(dz >= 0, 4, 5)
        ),
    ).astype(jnp.int32)
    ma = jnp.maximum(jnp.where(is_x, ax, jnp.where(is_y, ay, az)), 1e-20)
    u = jnp.where(
        is_x,
        jnp.where(dx >= 0, -dz, dz),
        jnp.where(is_y, dx, jnp.where(dz >= 0, dx, -dx)),
    )
    v = jnp.where(is_y, jnp.where(dy >= 0, dz, -dz), -dy)
    u = (u / ma + 1.0) * 0.5
    v = (v / ma + 1.0) * 0.5
    fres = res.astype(jnp.float32)
    sx = jnp.clip((u * fres).astype(jnp.int32), 0, res - 1)
    sy = jnp.clip((v * fres).astype(jnp.int32), 0, res - 1)
    return face * t_env + off + sy * res + sx


def _vsm_addr_math(
    P, gbrow, depth, x, y, W, H, slots, C, S, Sm, vsm_base
):
    """Per-pixel moment-quad addresses for every shadowed dir light.
    Shared by the Pallas addr kernel and the XLA twin."""
    wx, wy, wz = _worldpos(P, depth, x, y, W, H)
    ngx, ngy, ngz = _rnorm3(
        gbrow(GB_NRM), gbrow(GB_NRM + 1), gbrow(GB_NRM + 2)
    )
    outs = []
    for d, s in enumerate(slots):
        o = _P_LIGHT + s * _P_PER_LIGHT
        base = vsm_base + d * (17 * C + _P_PER_VSM_SCALARS)
        addr, _fx, _fy, _t, _ins = _vsm_math(
            P, base, C, S, Sm, P(o), P(o + 1), P(o + 2),
            wx, wy, wz, ngx, ngy, ngz,
        )
        outs.append(addr)
    return outs


def _vsm_addr_kernel(
    params_ref, gb_ref, depth_ref, out_ref,
    *, ntx, tile_h, tile_w, W, H, slots, C, S, Sm, vsm_base,
):
    g = pl.program_id(0)
    tpx = tile_h * tile_w
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, tpx), 0)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, tpx), 1)
    t = g * _GROUP + s_idx
    x = ((t % ntx) * tile_w + p_idx % tile_w).astype(jnp.float32) + 0.5
    y = ((t // ntx) * tile_h + p_idx // tile_w).astype(jnp.float32) + 0.5
    addrs = _vsm_addr_math(
        lambda i: params_ref[i], lambda r: gb_ref[r], depth_ref[...],
        x, y, W, H, slots, C, S, Sm, vsm_base,
    )
    for d, a in enumerate(addrs):
        out_ref[d] = a


def _vsm_prepass(
    params, gb_rows, depth_t, vsm_sets, slots, C, S, Sm, vsm_base,
    ntx, tile_h, tile_w, H, W, backend="xla", interpret=False,
):
    """Moment-quad gather planes for the shade kernel: address math in
    Pallas (or the XLA twin), ONE [8-f32]-row gather per pixel per
    shadowed light (the only HBM-indirect part of VSM shadowing).
    Returns [nd*8, ntp, tpx] f32."""
    ntp, tpx = depth_t.shape
    nd = len(slots)
    if backend == "xla":
        x, y = _tile_coords(ntp, tpx, ntx, tile_h, tile_w)
        addrs = _vsm_addr_math(
            lambda i: params[i], lambda r: gb_rows[r], depth_t,
            x, y, W, H, slots, C, S, Sm, vsm_base,
        )
        addr = jnp.stack(addrs)
    else:
        addr = pl.pallas_call(
            functools.partial(
                _vsm_addr_kernel, ntx=ntx, tile_h=tile_h, tile_w=tile_w,
                W=W, H=H, slots=slots, C=C, S=S, Sm=Sm, vsm_base=vsm_base,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ntp // _GROUP,),
                in_specs=[
                    pl.BlockSpec(
                        (GB_ROWS, _GROUP, tpx), lambda g, p: (0, g, 0)
                    ),
                    pl.BlockSpec((_GROUP, tpx), lambda g, p: (g, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (nd, _GROUP, tpx), lambda g, p: (0, g, 0)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((nd, ntp, tpx), jnp.int32),
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
            name="vsm_addr",
        )(params, gb_rows, depth_t)
    quads = []
    for d, sset in enumerate(vsm_sets):
        flat = addr[d].reshape(-1)
        # two 16-byte-row gathers (the fast k<=4 regime, ~2 ns/row;
        # a single packed k=8 row scalarizes to ~10.6 ns/row)
        qm = sset.moments[flat]  # [ntp*tpx, 4] mu quad
        qe = sset.moments2[flat]  # [ntp*tpx, 4] e2 quad
        quads.append(qm.reshape(ntp, tpx, 4).transpose(2, 0, 1))
        quads.append(qe.reshape(ntp, tpx, 4).transpose(2, 0, 1))
    return jnp.concatenate(quads, axis=0)


def _make_vsm_fn(P, q_row, slots, C, S, Sm, vsm_base):
    """vsm_fn for _shade_core: recomputes the (cheap) addressing math
    and resolves Chebyshev from the pre-gathered quad rows. q_row(k) ->
    the k-th of the nd*8 gathered component arrays."""

    def vsm_fn(wx, wy, wz, ngx, ngy, ngz):
        lits = {}
        for d, s in enumerate(slots):
            o = _P_LIGHT + s * _P_PER_LIGHT
            base = vsm_base + d * (17 * C + _P_PER_VSM_SCALARS)
            _addr, fx, fy, t, ins = _vsm_math(
                P, base, C, S, Sm, P(o), P(o + 1), P(o + 2),
                wx, wy, wz, ngx, ngy, ngz,
            )
            q = [q_row(d * 8 + k) for k in range(8)]
            lits[s] = _vsm_resolve(
                P, base + 17 * C, q, fx, fy, t, ins
            )
        return lits

    return vsm_fn


def _tile_coords(ntp, tpx, ntx, tile_h, tile_w):
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (ntp, tpx), 0)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (ntp, tpx), 1)
    x = ((t_idx % ntx) * tile_w + p_idx % tile_w).astype(jnp.float32) + 0.5
    y = (
        (t_idx // ntx) * tile_h + p_idx // tile_w
    ).astype(jnp.float32) + 0.5
    return x, y


def _ctex_addr_kernel(gb_ref, out_ref, *, tex_size, t4):
    out_ref[...] = _ctex_addr_math(lambda r: gb_ref[r], tex_size, t4)


def _spec_w1_channels(gbrow, w1_source, tex_size, t4, ctex_mode):
    """(tex_ntx, tex_nty, tex_rough) channels feeding the spec-addr math:
    nearest texel bytes, or the filtered quad blends (the same channels
    the shade core uses — the reflection ray sees the filtered normal).
    w1_source: u32 w1 array (nearest) or qrow(m, t) accessor over the
    word-1 quad planes (filtered)."""
    if ctex_mode == "nearest":
        w1 = w1_source
        return _byte(w1, 0), _byte(w1, 1), _byte(w1, 3)
    addrs, fracs = _ctex_filter_coords(gbrow, tex_size, t4, ctex_mode)
    del addrs
    qrow = w1_source

    def ch(b):
        fxs, fys, fm = fracs
        mips = [
            _blend_quad(
                [qrow(m, t) for t in range(4)], b, fxs[m], fys[m]
            )
            for m in range(len(fxs))
        ]
        return (
            mips[0]
            if len(mips) == 1
            else mips[0] * (1.0 - fm) + mips[1] * fm
        )

    return ch(0), ch(1), ch(3)


def _spec_addr_kernel(
    params_ref, gb_ref, depth_ref, words1_ref, out_ref,
    *, ntx, tile_h, tile_w, W, H, spec_size, spec_mips, t_env,
    tex_size=0, t4=0, ctex_mode="nearest",
):
    g = pl.program_id(0)
    tpx = tile_h * tile_w
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, tpx), 0)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, tpx), 1)
    t = g * _GROUP + s_idx
    x = ((t % ntx) * tile_w + p_idx % tile_w).astype(jnp.float32) + 0.5
    y = ((t // ntx) * tile_h + p_idx // tile_w).astype(jnp.float32) + 0.5
    if ctex_mode == "nearest":
        src = jax.lax.bitcast_convert_type(words1_ref[...], jnp.uint32)
    else:
        # words1_ref: [n_mips*4, _GROUP, tpx] word-1 quad planes
        def src(m, tq):
            return jax.lax.bitcast_convert_type(
                words1_ref[m * 4 + tq], jnp.uint32
            )

    ntx_ch, nty_ch, rough_ch = _spec_w1_channels(
        lambda r: gb_ref[r], src, tex_size, t4, ctex_mode
    )
    out_ref[...] = _spec_addr_math(
        lambda i: params_ref[i], lambda r: gb_ref[r], depth_ref[...],
        ntx_ch, nty_ch, rough_ch, x, y, W, H, spec_size, spec_mips, t_env,
    )


def _ctex_filter_addr_kernel(gb_ref, out_ref, *, tex_size, t4, mode):
    addrs, _ = _ctex_filter_coords(
        lambda r: gb_ref[r], tex_size, t4, mode
    )
    for m, a in enumerate(addrs):
        out_ref[m] = a


def _prepass(
    assets, env, params, gb_rows, depth_t, ntx, tile_h, tile_w, H, W,
    backend="xla", interpret=False, ctex_mode="nearest",
):
    """Per-pixel texel fetches: the combined-texture sample + ONE
    prefiltered-env texel. The address math runs in Pallas kernels; only
    the HBM gathers remain in XLA (random gathers cost ~2-5 ns/row
    however issued).

    ctex_mode = "nearest": one texel gather; returns
    (words [4, ntp, tpx] f32-carried texels, spec).
    ctex_mode = "bilinear"/"trilinear": per-material samplers honored
    (wrap + filter from GB_SAMPLER); gathers quad rows from the baked
    ctex_quad tables (1 or 2 mips x 3 words); returns
    (quads [n_mips*3*4, ntp, tpx] f32-carried, spec)."""
    ntp, tpx = depth_t.shape
    tex_size = size_from_atlas(assets.ctex_data.shape[1])
    t4 = assets.ctex_data.shape[1]
    t_env = env.spec_data.shape[1]
    n_mips = {"nearest": 0, "bilinear": 1, "trilinear": 2}[ctex_mode]
    if n_mips:
        assert assets.ctex_quad is not None, (
            "filtered ctex sampling needs AssetStore.to_device("
            "filter_tables=True)"
        )

    if backend == "xla":
        def gbrow(r):
            return gb_rows[r]

        x, y = _tile_coords(ntp, tpx, ntx, tile_h, tile_w)
        if ctex_mode == "nearest":
            addr = _ctex_addr_math(gbrow, tex_size, t4)
            words = assets.ctex_data.reshape(-1, 4)[addr]  # [ntp,tpx,4]
            w1 = jax.lax.bitcast_convert_type(words[..., 1], jnp.uint32)
            ntx_ch, nty_ch, rough_ch = _spec_w1_channels(
                gbrow, w1, tex_size, t4, "nearest"
            )
            tex_planes = jnp.moveaxis(words, -1, 0)  # [4, ntp, tpx]
        else:
            addrs, _fr = _ctex_filter_coords(gbrow, tex_size, t4, ctex_mode)
            planes = []
            for a in addrs:
                flat = a.reshape(-1)
                for j in range(3):
                    q = assets.ctex_quad[j][flat]  # [ntp*tpx, 4]
                    planes.append(
                        q.reshape(ntp, tpx, 4).transpose(2, 0, 1)
                    )
            tex_planes = jnp.concatenate(planes, axis=0)

            def qrow_w1(m, tq, tex_planes=tex_planes):
                return jax.lax.bitcast_convert_type(
                    tex_planes[(m * 3 + 1) * 4 + tq], jnp.uint32
                )

            ntx_ch, nty_ch, rough_ch = _spec_w1_channels(
                gbrow, qrow_w1, tex_size, t4, ctex_mode
            )
        saddr = _spec_addr_math(
            lambda i: params[i], gbrow, depth_t,
            ntx_ch, nty_ch, rough_ch, x, y, W, H,
            env.spec_size, env.spec_mips, t_env,
        )
    else:
        if ctex_mode == "nearest":
            addr = pl.pallas_call(
                functools.partial(
                    _ctex_addr_kernel, tex_size=tex_size, t4=t4
                ),
                grid=(ntp // _GROUP,),
                in_specs=[
                    pl.BlockSpec(
                        (GB_ROWS, _GROUP, tpx), lambda g: (0, g, 0)
                    ),
                ],
                out_specs=pl.BlockSpec((_GROUP, tpx), lambda g: (g, 0)),
                out_shape=jax.ShapeDtypeStruct((ntp, tpx), jnp.int32),
                interpret=interpret,
                compiler_params=_COMPILER_PARAMS,
                name="ctex_addr",
            )(gb_rows)
            words = assets.ctex_data.reshape(-1, 4)[addr]
            tex_planes = jnp.moveaxis(words, -1, 0)
            spec_src = words[..., 1]
            spec_src_spec = pl.BlockSpec(
                (_GROUP, tpx), lambda g, p: (g, 0)
            )
        else:
            addrs = pl.pallas_call(
                functools.partial(
                    _ctex_filter_addr_kernel, tex_size=tex_size, t4=t4,
                    mode=ctex_mode,
                ),
                grid=(ntp // _GROUP,),
                in_specs=[
                    pl.BlockSpec(
                        (GB_ROWS, _GROUP, tpx), lambda g: (0, g, 0)
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (n_mips, _GROUP, tpx), lambda g: (0, g, 0)
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (n_mips, ntp, tpx), jnp.int32
                ),
                interpret=interpret,
                compiler_params=_COMPILER_PARAMS,
                name="ctex_addr",
            )(gb_rows)
            planes = []
            for m in range(n_mips):
                flat = addrs[m].reshape(-1)
                for j in range(3):
                    q = assets.ctex_quad[j][flat]
                    planes.append(
                        q.reshape(ntp, tpx, 4).transpose(2, 0, 1)
                    )
            tex_planes = jnp.concatenate(planes, axis=0)
            # word-1 quad planes feed the spec-addr kernel's filtered
            # normal/roughness (rows (m*3+1)*4 .. +4)
            spec_src = jnp.concatenate(
                [
                    tex_planes[(m * 3 + 1) * 4 : (m * 3 + 1) * 4 + 4]
                    for m in range(n_mips)
                ],
                axis=0,
            )
            spec_src_spec = pl.BlockSpec(
                (n_mips * 4, _GROUP, tpx), lambda g, p: (0, g, 0)
            )
        saddr = pl.pallas_call(
            functools.partial(
                _spec_addr_kernel, ntx=ntx, tile_h=tile_h, tile_w=tile_w,
                W=W, H=H, spec_size=env.spec_size,
                spec_mips=env.spec_mips, t_env=t_env,
                tex_size=tex_size, t4=t4, ctex_mode=ctex_mode,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ntp // _GROUP,),
                in_specs=[
                    pl.BlockSpec(
                        (GB_ROWS, _GROUP, tpx), lambda g, p: (0, g, 0)
                    ),
                    pl.BlockSpec((_GROUP, tpx), lambda g, p: (g, 0)),
                    spec_src_spec,
                ],
                out_specs=pl.BlockSpec((_GROUP, tpx), lambda g, p: (g, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((ntp, tpx), jnp.int32),
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
            name="spec_addr",
        )(params, gb_rows, depth_t, spec_src)

    spec = env.spec_data.reshape(-1, env.spec_data.shape[-1])[saddr]
    spec_r = jnp.moveaxis(spec, -1, 0)  # [4, ntp, tpx]
    return tex_planes, spec_r


def _kernel(
    params_ref, *refs,
    ntx, tile_h, tile_w, W, H, light_kinds,
    lit_slots, has_ao, tl_cap, emit_hdr, point_slots=(),
    vsm_slots=(), vsm_c=0, vsm_s=0, vsm_sm=0, vsm_base=0,
    ctex_mode="nearest", tex_size=0, t4=0,
):
    refs = list(refs)
    tli_ref = tlc_ref = gpl_ref = None
    if tl_cap:
        tli_ref, tlc_ref, gpl_ref = refs.pop(0), refs.pop(0), refs.pop(0)
    gb_ref, depth_ref, words_ref, spec_ref = refs[:4]
    refs = refs[4:]
    lit_ref = refs.pop(0) if lit_slots else None
    vsm_ref = refs.pop(0) if vsm_slots else None
    ao_ref = refs.pop(0) if has_ao else None
    out_ref = refs.pop(0)

    g = pl.program_id(0)
    tpx = tile_h * tile_w
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, tpx), 0)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, tpx), 1)
    t = g * _GROUP + s_idx
    x = ((t % ntx) * tile_w + p_idx % tile_w).astype(jnp.float32) + 0.5
    y = ((t // ntx) * tile_h + p_idx // tile_w).astype(jnp.float32) + 0.5

    def P(i):
        return params_ref[i]

    def gbrow(r):
        return gb_ref[r]

    if ctex_mode == "nearest":
        words = [
            jax.lax.bitcast_convert_type(words_ref[k], jnp.uint32)
            for k in range(4)
        ]
        texch = _texch_nearest(words)
    else:
        _a, fracs = _ctex_filter_coords(gbrow, tex_size, t4, ctex_mode)
        del _a

        def qrow(m, jw, tq):
            return jax.lax.bitcast_convert_type(
                words_ref[(m * 3 + jw) * 4 + tq], jnp.uint32
            )

        texch = _texch_filtered(qrow, fracs)
    spec = [spec_ref[k] for k in range(3)]
    lit_map = (
        {slot: lit_ref[d] for d, slot in enumerate(lit_slots)}
        if lit_slots
        else None
    )
    ao_in = ao_ref[...] if has_ao else None

    tile_pts = None
    if tl_cap:
        from orbit_tpu.passes.cluster import TILE_LIGHTS_FALLBACK

        n_pts = len(point_slots)

        # per-tile clustered point lights: dynamic-trip loop over this
        # tile's light list (SMEM), light params read from the same SMEM
        # params vector the static loop uses. A tile whose list
        # overflowed (count == sentinel) walks the FULL point list
        # instead — exact either way, and only pathological tiles pay.
        def tile_pts(ctx):
            rows = ([], [], [])
            for j in range(_GROUP):
                tj = g * _GROUP + j
                cnt_raw = tlc_ref[tj]
                is_fb = cnt_raw == TILE_LIGHTS_FALLBACK
                cnt = jnp.where(is_fb, 0, cnt_raw)
                ctx_j = {k: v[j : j + 1] for k, v in ctx.items()}

                def body(k, acc, tj=tj, ctx_j=ctx_j):
                    # ids are u16-packed two-per-word (SMEM budget: the
                    # id table is the dominant prefetch array)
                    w = tli_ref[tj * (tl_cap // 2) + k // 2]
                    lid = (w >> ((k % 2) * 16)) & 0xFFFF
                    o = _P_LIGHT + lid * _P_PER_LIGHT
                    cr, cg, cb = _point_light_contrib(P, o, ctx_j)
                    return (acc[0] + cr, acc[1] + cg, acc[2] + cb)

                def body_all(k, acc, ctx_j=ctx_j):
                    w = gpl_ref[k // 2]
                    lid = (w >> ((k % 2) * 16)) & 0xFFFF
                    o = _P_LIGHT + lid * _P_PER_LIGHT
                    cr, cg, cb = _point_light_contrib(P, o, ctx_j)
                    return (acc[0] + cr, acc[1] + cg, acc[2] + cb)

                z = jnp.zeros((1, tpx), jnp.float32)
                acc = jax.lax.fori_loop(0, cnt, body, (z, z, z))
                acc = jax.lax.fori_loop(
                    0, jnp.where(is_fb, n_pts, 0), body_all, acc
                )
                rows[0].append(acc[0])
                rows[1].append(acc[1])
                rows[2].append(acc[2])
            return tuple(jnp.concatenate(r, axis=0) for r in rows)

    vsm_fn = (
        _make_vsm_fn(
            P, lambda k: vsm_ref[k], vsm_slots, vsm_c, vsm_s,
            vsm_sm, vsm_base
        )
        if vsm_slots
        else None
    )
    r, g_, b = _shade_core(
        P, light_kinds, gbrow, depth_ref[...], texch, spec, x, y, W, H,
        lit_map=lit_map, ao_in=ao_in, skip_points=bool(tl_cap),
        tile_pts=tile_pts, vsm_fn=vsm_fn,
    )
    if emit_hdr:
        zero = jnp.zeros((1, tpx), jnp.float32)
        for j in range(_GROUP):
            out_ref[pl.ds(4 * j + 0, 1), :] = r[j : j + 1]
            out_ref[pl.ds(4 * j + 1, 1), :] = g_[j : j + 1]
            out_ref[pl.ds(4 * j + 2, 1), :] = b[j : j + 1]
            out_ref[pl.ds(4 * j + 3, 1), :] = zero
    else:
        packed = _tonemap_pack(r, g_, b, P(_P_EXPOSURE))
        out_ref[...] = jax.lax.bitcast_convert_type(packed, jnp.int32)


def shade_deferred_tiled(
    assets,
    scene,
    env,
    view,
    gb_t,  # [ntp * GB_ROWS, tpx] interleaved tile layout (raster output)
    depth_t,  # [ntp, tpx]
    *,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    light_kinds,  # static tuple of LIGHT_* ints
    exposure: float = 1.0,
    backend: str = "pallas",
    interpret: bool = False,
    lit_t=None,  # [nd, ntp, tpx] f32 CSM lit planes (one per shadowed dir)
    shadow_slots=(),  # static light-slot index per lit plane
    vsm_sets=(),  # ShadowMaps per shadowed dir light (filter="vsm"):
    #   cascade select + bias + Chebyshev run IN the kernel; the only
    #   external work is the per-pixel moment-quad gather (_vsm_prepass).
    #   Mutually exclusive with lit_t (the PCSS lit-plane path).
    vsm_slots=(),  # static light-slot index per vsm set
    vsm_settings=None,  # ShadowSettings (cascade_count/resolution/biases)
    ao_t=None,  # [ntp, tpx] f32 SSAO factor
    tile_lights=None,  # ([ntp, K] i32 ids, [ntp] i32 counts): clustered
    #   point lights — when given, POINT kinds leave the static loop and
    #   run as a per-tile dynamic loop (exact: culled lights have zero
    #   attenuation everywhere in the tile)
    emit_hdr: bool = False,  # output linear HDR tiles [ntp*4, tpx]
    #   (rows r,g,b,0 per tile) instead of tonemapped packed RGBA8 —
    #   the bloom path needs the HDR image
    ctex_mode: str = "nearest",  # combined-texture filtering: nearest |
    #   bilinear | trilinear — filtered modes honor the PER-MATERIAL
    #   sampler (wrap + filter) and need assets.ctex_quad
):
    """Fused deferred shade + post. Returns packed RGBA8 [ntp, tpx] u32,
    or HDR tiles [ntp*4, tpx] f32 when emit_hdr."""
    ntp, tpx = depth_t.shape
    ntx = -(-width // tile_w)
    light_kinds = tuple(int(k) for k in light_kinds)
    shadow_slots = tuple(int(s) for s in shadow_slots)
    point_slots = tuple(
        i for i, k in enumerate(light_kinds) if k == LIGHT_POINT
    )

    from orbit_tpu.raster.layout import gbuf_tiles_to_rows

    gb_rows = gbuf_tiles_to_rows(gb_t, GB_ROWS)  # [GB, ntp, tpx]
    vsm_slots = tuple(int(s) for s in vsm_slots)
    params = _pack_params(
        scene, env, view, exposure, len(light_kinds),
        vsm_sets=vsm_sets, vsm_settings=vsm_settings,
    )
    words_r, spec_r = _prepass(
        assets, env, params, gb_rows, depth_t, ntx, tile_h, tile_w,
        height, width, backend=backend, interpret=interpret,
        ctex_mode=ctex_mode,
    )
    tex_size = size_from_atlas(assets.ctex_data.shape[1])
    t4_tex = assets.ctex_data.shape[1]
    n_tex_rows = {"nearest": 4, "bilinear": 12, "trilinear": 24}[ctex_mode]
    vsm_t = None
    vsm_c = vsm_s = vsm_sm = 0
    vsm_base = _P_LIGHT + len(light_kinds) * _P_PER_LIGHT
    if vsm_slots:
        assert lit_t is None, "vsm_sets and lit_t are mutually exclusive"
        vsm_c = vsm_settings.cascade_count
        vsm_s = vsm_settings.resolution
        vsm_sm = vsm_s // vsm_settings.vsm_moment_scale
        vsm_t = _vsm_prepass(
            params, gb_rows, depth_t, vsm_sets, vsm_slots, vsm_c, vsm_s,
            vsm_sm, vsm_base, ntx, tile_h, tile_w, height, width,
            backend=backend, interpret=interpret,
        )
    tl_cap = tile_lights[0].shape[1] if tile_lights is not None else 0

    if backend == "xla":
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (ntp, tpx), 0)
        p_idx = jax.lax.broadcasted_iota(jnp.int32, (ntp, tpx), 1)
        x = ((t_idx % ntx) * tile_w + p_idx % tile_w).astype(
            jnp.float32
        ) + 0.5
        y = ((t_idx // ntx) * tile_h + p_idx // tile_w).astype(
            jnp.float32
        ) + 0.5
        if ctex_mode == "nearest":
            words = [
                jax.lax.bitcast_convert_type(words_r[k], jnp.uint32)
                for k in range(4)
            ]
            texch = _texch_nearest(words)
        else:
            _a, fracs = _ctex_filter_coords(
                lambda r: gb_rows[r], tex_size, t4_tex, ctex_mode
            )
            del _a

            def qrow(m, jw, tq):
                return jax.lax.bitcast_convert_type(
                    words_r[(m * 3 + jw) * 4 + tq], jnp.uint32
                )

            texch = _texch_filtered(qrow, fracs)
        spec = [spec_r[k] for k in range(3)]
        lit_map = (
            {s: lit_t[d] for d, s in enumerate(shadow_slots)}
            if shadow_slots
            else None
        )

        tile_pts = None
        if tl_cap:
            from orbit_tpu.passes.cluster import TILE_LIGHTS_FALLBACK

            tli, tlc = tile_lights
            gp = jnp.asarray(point_slots, jnp.int32)
            fallback = tlc == TILE_LIGHTS_FALLBACK

            def tile_pts(ctx):
                # same per-pixel accumulation order as the kernel's
                # dynamic-trip loops: masked adds of zero are exact no-ops
                def P_t(i):
                    return params[i][..., None]  # [ntp, 1] per-tile scalar

                z = jnp.zeros((ntp, tpx), jnp.float32)

                def body(k, acc):
                    lid = tli[:, k]  # [ntp]
                    o = _P_LIGHT + lid * _P_PER_LIGHT
                    cr, cg, cb = _point_light_contrib(P_t, o, ctx)
                    live = ((k < tlc) & ~fallback)[:, None]
                    return (
                        acc[0] + jnp.where(live, cr, 0.0),
                        acc[1] + jnp.where(live, cg, 0.0),
                        acc[2] + jnp.where(live, cb, 0.0),
                    )

                acc = jax.lax.fori_loop(0, tl_cap, body, (z, z, z))

                def body_all(k, acc):
                    # overflowed tiles: the full point list (still exact)
                    lid = gp[k]
                    o = _P_LIGHT + lid * _P_PER_LIGHT
                    cr, cg, cb = _point_light_contrib(
                        lambda i: params[i], o, ctx
                    )
                    live = fallback[:, None]
                    return (
                        acc[0] + jnp.where(live, cr, 0.0),
                        acc[1] + jnp.where(live, cg, 0.0),
                        acc[2] + jnp.where(live, cb, 0.0),
                    )

                if len(point_slots):
                    acc = jax.lax.fori_loop(
                        0, len(point_slots), body_all, acc
                    )
                return acc

        vsm_fn = (
            _make_vsm_fn(
                lambda i: params[i], lambda k: vsm_t[k],
                vsm_slots, vsm_c, vsm_s, vsm_sm, vsm_base,
            )
            if vsm_slots
            else None
        )
        r, g, b = _shade_core(
            lambda i: params[i], light_kinds,
            lambda rr: gb_rows[rr], depth_t, texch, spec, x, y,
            width, height,
            lit_map=lit_map, ao_in=ao_t, skip_points=bool(tl_cap),
            tile_pts=tile_pts, vsm_fn=vsm_fn,
        )
        if emit_hdr:
            zero = jnp.zeros_like(r)
            return (
                jnp.stack([r, g, b, zero], axis=1).reshape(ntp * 4, tpx)
            )
        return _tonemap_pack(r, g, b, params[_P_EXPOSURE])

    prefetch = [params]
    in_specs = [
        pl.BlockSpec((GB_ROWS, _GROUP, tpx), lambda g, *p: (0, g, 0)),
        pl.BlockSpec((_GROUP, tpx), lambda g, *p: (g, 0)),
        pl.BlockSpec((n_tex_rows, _GROUP, tpx), lambda g, *p: (0, g, 0)),
        pl.BlockSpec((4, _GROUP, tpx), lambda g, *p: (0, g, 0)),
    ]
    operands = [gb_rows, depth_t, words_r, spec_r]
    if tl_cap:
        assert tl_cap % 2 == 0, "tile_light_cap must be even (u16 packing)"
        tli, tlc = tile_lights
        flat = tli.reshape(-1)
        packed = (flat[0::2] & 0xFFFF) | (flat[1::2] << 16)
        # global point-slot list for fallback tiles (u16-packed)
        gp = np.asarray(point_slots, np.int32)
        if gp.size % 2:
            gp = np.concatenate([gp, gp[-1:]])
        gp_packed = jnp.asarray(
            (gp[0::2] & 0xFFFF) | (gp[1::2] << 16), jnp.int32
        )
        if gp_packed.size == 0:
            gp_packed = jnp.zeros((1,), jnp.int32)
        prefetch += [packed, tlc, gp_packed]
    if lit_t is not None and shadow_slots:
        nd = len(shadow_slots)
        in_specs.append(
            pl.BlockSpec((nd, _GROUP, tpx), lambda g, *p: (0, g, 0))
        )
        operands.append(lit_t)
    if vsm_slots:
        nd8 = len(vsm_slots) * 8
        in_specs.append(
            pl.BlockSpec((nd8, _GROUP, tpx), lambda g, *p: (0, g, 0))
        )
        operands.append(vsm_t)
    if ao_t is not None:
        in_specs.append(pl.BlockSpec((_GROUP, tpx), lambda g, *p: (g, 0)))
        operands.append(ao_t)
    if emit_hdr:
        out_spec = pl.BlockSpec((4 * _GROUP, tpx), lambda g, *p: (g, 0))
        out_shape = jax.ShapeDtypeStruct((ntp * 4, tpx), jnp.float32)
    else:
        out_spec = pl.BlockSpec((_GROUP, tpx), lambda g, *p: (g, 0))
        out_shape = jax.ShapeDtypeStruct((ntp, tpx), jnp.int32)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            ntx=ntx,
            tile_h=tile_h,
            tile_w=tile_w,
            W=width,
            H=height,
            light_kinds=light_kinds,
            lit_slots=shadow_slots if lit_t is not None else (),
            has_ao=ao_t is not None,
            tl_cap=tl_cap,
            emit_hdr=emit_hdr,
            point_slots=point_slots,
            vsm_slots=vsm_slots,
            vsm_c=vsm_c,
            vsm_s=vsm_s,
            vsm_sm=vsm_sm,
            vsm_base=vsm_base,
            ctex_mode=ctex_mode,
            tex_size=tex_size,
            t4=t4_tex,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=(ntp // _GROUP,),
            in_specs=in_specs,
            out_specs=out_spec,
        ),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
            name="shade_deferred",
    )(*prefetch, *operands)
    if emit_hdr:
        return out
    return jax.lax.bitcast_convert_type(out, jnp.uint32)


def unpack_color(color_u32, height, width, tile_h, tile_w):
    """Packed RGBA8 tiles -> [H, W, 3] u8 image."""
    from orbit_tpu.raster.layout import tiles_to_image

    img = tiles_to_image(color_u32, height, width, tile_h, tile_w)
    return jnp.stack(
        [
            (img & 0xFF).astype(jnp.uint8),
            ((img >> 8) & 0xFF).astype(jnp.uint8),
            ((img >> 16) & 0xFF).astype(jnp.uint8),
        ],
        axis=-1,
    )
