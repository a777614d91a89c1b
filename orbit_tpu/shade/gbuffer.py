"""Surface reconstruction from the in-raster G-buffer.

v2 shading front-end: the rasterizer already interpolated uv/derivatives/
normal/tangent and baked material constants per pixel (raster kernel_common
GB_* rows), so the only remaining memory-indirect work is ONE combined-
texture tap per filter sample (the round-1 gather-based resolve path
was superseded by this + shade/fused.py and removed).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbit_tpu.assets.types import mip_offsets, num_mips
from orbit_tpu.math.color import srgb_to_linear
from orbit_tpu.math.transforms import normalize
from orbit_tpu.raster.kernel_common import (
    GB_BASE,
    GB_CTEX,
    GB_DUDX,
    GB_DUDY,
    GB_DVDX,
    GB_DVDY,
    GB_EMISSIVE,
    GB_MATID,
    GB_METALLIC,
    GB_NRM,
    GB_ROUGHNESS,
    GB_TAN,
    GB_U,
    GB_V,
    VIS_TRI_BITS,
)
from orbit_tpu.shade.pbr import Surface
from orbit_tpu.shade.texture import lod_from_derivatives, size_from_atlas


@jax.tree_util.register_dataclass
@dataclass
class GBuffer:
    """Flattened per-pixel surface attributes (N = H*W)."""

    valid: jax.Array  # [N] bool
    world_pos: jax.Array  # [N,3]
    normal: jax.Array  # [N,3] geometric/interpolated (pre normal-map)
    tangent: jax.Array  # [N,4]
    uv: jax.Array  # [N,2]
    duv_dx: jax.Array  # [N,2]
    duv_dy: jax.Array  # [N,2]
    material: jax.Array  # [N] i32
    entity: jax.Array  # [N] i32
    meshlet: jax.Array  # [N] i32
    tri: jax.Array  # [N] i32
    depth: jax.Array  # [N] f32 (reverse-Z)


def _mip_offset_closed_form(size: int, k):
    """Offset of mip k in the flat atlas: sum of (S>>j)^2 = (4S^2-4*sk^2)/3."""
    sk = jnp.right_shift(jnp.int32(size), k)
    return (4 * size * size - 4 * sk * sk) // 3, sk


def _unpack_ctex_words(words):
    """bitcast-f32 [N,4] -> 16 u8 channels as f32 in [0,1] ([N,16])."""
    w = jax.lax.bitcast_convert_type(words, jnp.uint32)  # [N,4]
    chans = []
    for k in range(4):
        wk = w[..., k]
        for b in range(4):
            chans.append(((wk >> (8 * b)) & jnp.uint32(0xFF)).astype(jnp.float32))
    return jnp.stack(chans, axis=-1) * (1.0 / 255.0)


def _ctex_addr(layer, t4, tex_size, k, uvx, uvy, wrap: str = "repeat"):
    from orbit_tpu.shade.texture import apply_wrap

    off, size = _mip_offset_closed_form(tex_size, k)
    x = apply_wrap(uvx, size, wrap)
    y = apply_wrap(uvy, size, wrap)
    return layer * t4 + off + y * size + x


def sample_ctex_bilinear_mip(
    ctex_flat, layer, uv, k, tex_size, t4, wrap: str = "repeat"
):
    """One bilinear tap of the combined texture at mip k (4 gathers).

    ctex_flat: [Lc*T4, 4] bitcast-f32 texels. Returns [N,16] f32 in [0,1]
    (sRGB channels still encoded).
    """
    _, size = _mip_offset_closed_form(tex_size, k)
    fsize = size.astype(jnp.float32)
    t = uv * fsize[..., None] - 0.5
    i0 = jnp.floor(t).astype(jnp.int32)
    f = t - i0

    def fetch(dx, dy):
        addr = _ctex_addr(
            layer, t4, tex_size, k, i0[..., 0] + dx, i0[..., 1] + dy, wrap
        )
        return _unpack_ctex_words(ctex_flat[addr])

    fx = f[..., 0:1]
    fy = f[..., 1:2]
    top = fetch(0, 0) * (1 - fx) + fetch(1, 0) * fx
    bot = fetch(0, 1) * (1 - fx) + fetch(1, 1) * fx
    return top * (1 - fy) + bot * fy


def sample_ctex(
    assets, layer, uv, lod, mode: str = "bilinear", wrap: str = "repeat"
):
    """Combined-texture sample. mode: nearest | bilinear | trilinear."""
    tex_size = size_from_atlas(assets.ctex_data.shape[1])
    t4 = assets.ctex_data.shape[1]
    ctex_flat = assets.ctex_data.reshape(-1, 4)
    n = num_mips(tex_size)
    lod = jnp.clip(lod, 0.0, n - 1.0)
    safe_layer = jnp.maximum(layer, 0)

    if mode == "nearest":
        k = jnp.round(lod).astype(jnp.int32)
        _, size = _mip_offset_closed_form(tex_size, k)
        # floor, not truncate-toward-zero: for uv in (-1/size, 0) the
        # texel is -1, which repeat-wraps to size-1 (trunc gave texel 0)
        t = jnp.floor(uv * size[..., None].astype(jnp.float32)).astype(
            jnp.int32
        )
        addr = _ctex_addr(
            safe_layer, t4, tex_size, k, t[..., 0], t[..., 1], wrap
        )
        return _unpack_ctex_words(ctex_flat[addr])
    if mode == "bilinear":
        k = jnp.round(lod).astype(jnp.int32)
        return sample_ctex_bilinear_mip(
            ctex_flat, safe_layer, uv, k, tex_size, t4, wrap
        )
    # trilinear
    k0 = jnp.floor(lod).astype(jnp.int32)
    k1 = jnp.minimum(k0 + 1, n - 1)
    f = (lod - k0.astype(jnp.float32))[..., None]
    c0 = sample_ctex_bilinear_mip(
        ctex_flat, safe_layer, uv, k0, tex_size, t4, wrap
    )
    c1 = sample_ctex_bilinear_mip(
        ctex_flat, safe_layer, uv, k1, tex_size, t4, wrap
    )
    return c0 * (1 - f) + c1 * f


def sample_ctex_aniso(
    assets,
    layer,
    uv,
    duv_dx,
    duv_dy,
    max_aniso: int = 4,
    wrap: str = "repeat",
):
    """Anisotropic combined-texture sample. In the reference, anisotropic
    filtering (max anisotropy 16) is a property enabled on the Linear/
    Nearest filter samplers (device.rs:1291-1312), not a separate
    SamplerKind; this is the TPU analog of sampling through one of those.

    Hardware-style footprint filtering: the screen-space uv footprint's
    major axis is walked with `max_aniso` bilinear probes whose shared
    mip level comes from the MINOR axis, so grazing surfaces keep detail
    that isotropic LOD (max-axis) would blur away. Static probe count
    (XLA static shapes); the probe span is scaled by the covered ratio
    (1 - minor/major), so isotropic footprints collapse the probes onto
    one point and the filter degrades gracefully to trilinear.
    """
    tex_size = size_from_atlas(assets.ctex_data.shape[1])
    t4 = assets.ctex_data.shape[1]
    ctex_flat = assets.ctex_data.reshape(-1, 4)
    n = num_mips(tex_size)
    safe_layer = jnp.maximum(layer, 0)

    fx2 = jnp.sum((duv_dx * tex_size) ** 2, axis=-1)
    fy2 = jnp.sum((duv_dy * tex_size) ** 2, axis=-1)
    major_is_x = fx2 >= fy2
    rho_maj2 = jnp.maximum(fx2, fy2)
    rho_min2 = jnp.minimum(fx2, fy2)
    # clamp anisotropy ratio to the probe budget: effective minor
    # footprint >= major/max_aniso (standard hardware clamp)
    rho_min2 = jnp.maximum(rho_min2, rho_maj2 / (max_aniso * max_aniso))
    lod = 0.5 * jnp.log2(jnp.maximum(rho_min2, 1e-12))
    lod = jnp.clip(lod, 0.0, n - 1.0)

    axis = jnp.where(major_is_x[..., None], duv_dx, duv_dy)  # [N,2] uv units
    # scale the probe span by the UNCOVERED fraction of the major axis:
    # each probe's bilinear+mip tap already covers a minor-sized disc, so
    # only (1 - minor/major) of the axis needs walking — isotropic
    # footprints collapse the probes onto one point (plain trilinear)
    covered = jnp.sqrt(rho_min2 / jnp.maximum(rho_maj2, 1e-12))
    axis = axis * jnp.clip(1.0 - covered, 0.0, 1.0)[..., None]
    k0 = jnp.floor(lod).astype(jnp.int32)
    k1 = jnp.minimum(k0 + 1, n - 1)
    f = (lod - k0.astype(jnp.float32))[..., None]

    acc = 0.0
    for i in range(max_aniso):
        t = (i + 0.5) / max_aniso - 0.5  # [-0.5, 0.5) along the major axis
        uv_i = uv + axis * t
        c0 = sample_ctex_bilinear_mip(
            ctex_flat, safe_layer, uv_i, k0, tex_size, t4, wrap
        )
        c1 = sample_ctex_bilinear_mip(
            ctex_flat, safe_layer, uv_i, k1, tex_size, t4, wrap
        )
        acc = acc + (c0 * (1 - f) + c1 * f)
    return acc / max_aniso


def surface_from_gbuffer(
    assets,
    gb,  # [GB_ROWS, H, W]
    depth,  # [H, W]
    vis,  # [H, W]
    inv_view_proj,
    texture_filter: str = "bilinear",
    ssao: Optional[jax.Array] = None,
    row_offset_px=0,
    full_size=None,  # (full_H, full_W) when the inputs are a band
    texture_wrap: str = "repeat",
    max_aniso: int = 4,
):
    """Returns (Surface, GBuffer) — GBuffer fields populated for the
    downstream consumers (shadows, clusters, debug modes).

    row_offset_px/full_size: when the G-buffer is a framebuffer band
    (multi-chip 'fb' sharding), pixel/NDC coordinates are computed in
    full-image space so the reconstruction is bit-identical to the
    full-screen path."""
    H, W = depth.shape
    n = H * W
    g = gb.reshape(gb.shape[0], -1)
    visf = vis.reshape(-1)
    depthf = depth.reshape(-1)
    valid = visf != 0

    uv = jnp.stack([g[GB_U], g[GB_V]], axis=-1)
    duv_dx = jnp.stack([g[GB_DUDX], g[GB_DVDX]], axis=-1)
    duv_dy = jnp.stack([g[GB_DUDY], g[GB_DVDY]], axis=-1)
    normal = normalize(g[GB_NRM : GB_NRM + 3].T)
    tangent = g[GB_TAN : GB_TAN + 4].T
    tangent = jnp.concatenate(
        [normalize(tangent[:, :3]), jnp.sign(tangent[:, 3:4] + 1e-20)], -1
    )
    base = g[GB_BASE : GB_BASE + 4].T
    emissive = g[GB_EMISSIVE : GB_EMISSIVE + 3].T
    metallic = g[GB_METALLIC]
    roughness = g[GB_ROUGHNESS]
    layer = jnp.round(g[GB_CTEX]).astype(jnp.int32)
    matid = jnp.round(g[GB_MATID]).astype(jnp.int32)
    ao = jnp.ones_like(metallic)

    # the single memory-indirect step: one combined-texture tap
    tex_size = size_from_atlas(assets.ctex_data.shape[1])
    if texture_filter == "aniso":
        tex = sample_ctex_aniso(
            assets, layer, uv, duv_dx, duv_dy,
            max_aniso=max_aniso, wrap=texture_wrap,
        )
    else:
        lod = lod_from_derivatives(duv_dx, duv_dy, tex_size)
        tex = sample_ctex(
            assets, layer, uv, lod, texture_filter, wrap=texture_wrap
        )
    has = (layer >= 0)[:, None]
    t_base = jnp.concatenate(
        [srgb_to_linear(tex[:, 0:3]), tex[:, 3:4]], axis=-1
    )
    base = jnp.where(has, base * t_base, base)
    metallic = jnp.where(has[:, 0], metallic * tex[:, 6], metallic)
    roughness = jnp.where(has[:, 0], roughness * tex[:, 7], roughness)
    emissive = jnp.where(
        has, emissive * srgb_to_linear(tex[:, 8:11]), emissive
    )
    ao = jnp.where(has[:, 0], tex[:, 11], ao)

    # normal mapping from the combined texture's xy channels
    nt_xy = tex[:, 4:6] * 2.0 - 1.0
    ntz = jnp.sqrt(
        jnp.abs(1.0 - nt_xy[:, 0] ** 2 - nt_xy[:, 1] ** 2)
    )
    t3 = tangent[:, :3]
    b3 = jnp.cross(normal, t3) * tangent[:, 3:4]
    n_mapped = normalize(
        t3 * nt_xy[:, 0:1] + b3 * nt_xy[:, 1:2] + normal * ntz[:, None]
    )
    # flat-normal texels (128,128) keep the geometric normal exactly
    is_flat = jnp.all(jnp.abs(nt_xy) < (1.5 / 127.0), axis=-1)
    shading_normal = jnp.where(
        (has[:, 0] & ~is_flat)[:, None], n_mapped, normal
    )

    if ssao is not None:
        ao = jnp.minimum(ao, ssao)

    # world position from depth
    full_h, full_w = full_size if full_size is not None else (H, W)
    px = (jnp.arange(n, dtype=jnp.int32) % W).astype(jnp.float32) + 0.5
    py = (
        jnp.arange(n, dtype=jnp.int32) // W + row_offset_px
    ).astype(jnp.float32) + 0.5
    ndc_x = px / full_w * 2.0 - 1.0
    ndc_y = (1.0 - py / full_h) * 2.0 - 1.0
    ndc = jnp.stack([ndc_x, ndc_y, depthf, jnp.ones_like(depthf)], axis=-1)
    wp = (ndc[:, :, None] * inv_view_proj.T[None]).sum(1)
    world_pos = wp[:, :3] / jnp.where(
        jnp.abs(wp[:, 3:4]) < 1e-20, 1.0, wp[:, 3:4]
    )

    packed = jnp.maximum(visf - 1, 0)
    surface = Surface(
        albedo=base[:, :3],
        alpha=base[:, 3],
        normal=shading_normal,
        metallic=metallic,
        roughness=roughness,
        emissive=emissive,
        ao=ao,
    )
    gbuf = GBuffer(
        valid=valid,
        world_pos=world_pos,
        normal=normal,
        tangent=tangent,
        uv=uv,
        duv_dx=duv_dx,
        duv_dy=duv_dy,
        material=matid,
        entity=packed >> VIS_TRI_BITS,  # instance slot (entity via table)
        meshlet=packed >> VIS_TRI_BITS,  # slot; callers map via inst table
        tri=packed & ((1 << VIS_TRI_BITS) - 1),
        depth=depthf,
    )
    return surface, gbuf
