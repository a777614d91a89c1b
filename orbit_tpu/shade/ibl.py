"""Image-based lighting: cubemaps, irradiance, GGX prefilter, BRDF LUT.

TPU-first re-creation of the reference's IBL preprocessing
(passes/env_map_loader.rs:44-384 + env_map/*.frag + utils/brdf_integration.frag):
instead of rasterizing cube faces, everything is a batched jnp computation —
the irradiance convolution is literally one MXU matmul over source texels.
Runs once at load time on device.

Cubemap face convention (matches the standard Vulkan layout):
  0:+X 1:-X 2:+Y 3:-Y 4:+Z 5:-Z with uv in [-1,1].
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from orbit_tpu.math.color import hammersley_2d
from orbit_tpu.math.transforms import normalize


@jax.tree_util.register_dataclass
@dataclass
class EnvironmentMap:
    irradiance: jax.Array  # [6, IR, IR, 3] f32 (kept for parity/debug)
    sh_irradiance: jax.Array  # [9, 3] f32 — SH9-projected irradiance
    spec_data: jax.Array  # [6, T, 4] f32 flat mip atlas (GGX prefiltered; ch 3 pad)
    brdf_lut: jax.Array  # [R, R, 2] f32
    spec_size: int = field(metadata=dict(static=True), default=128)
    spec_mips: int = field(metadata=dict(static=True), default=5)


# ----------------------------------------------------------------- cube math


def face_dirs(res: int):
    """Directions of all texel centers: [6, res, res, 3] (unnormalized)."""
    t = (np.arange(res) + 0.5) / res * 2.0 - 1.0
    v, u = np.meshgrid(t, t, indexing="ij")  # v = rows (down), u = cols
    o = np.ones_like(u)
    faces = [
        np.stack([o, -v, -u], -1),
        np.stack([-o, -v, u], -1),
        np.stack([u, o, v], -1),
        np.stack([u, -o, -v], -1),
        np.stack([u, -v, o], -1),
        np.stack([-u, -v, -o], -1),
    ]
    return jnp.asarray(np.stack(faces), jnp.float32)


def texel_solid_angles(res: int):
    """[res, res] approximate solid angle per texel (same for all faces)."""
    t = (np.arange(res) + 0.5) / res * 2.0 - 1.0
    v, u = np.meshgrid(t, t, indexing="ij")
    sa = (2.0 / res) ** 2 / (u * u + v * v + 1.0) ** 1.5
    return jnp.asarray(sa, jnp.float32)


def dir_to_face_uv(dirs):
    """dirs [...,3] -> (face [...], u [...], v [...]) with u,v in [0,1]."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    # pick major axis
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)

    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)
    # (u, v) per face, inverting face_dirs
    u = jnp.where(
        is_x,
        jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    v = jnp.where(is_y, jnp.where(y >= 0, z, -z), -y)
    u = (u / ma + 1.0) * 0.5
    v = (v / ma + 1.0) * 0.5
    return face, u, v


def sample_cube(cube, dirs):
    """Bilinear cubemap sample. cube: [6, R, R, 3]; dirs [...,3] (any norm).

    Clamp-to-edge per face (no seam blending — matches typical GPU behavior
    closely enough at the resolutions used).
    """
    res = cube.shape[1]
    face, u, v = dir_to_face_uv(dirs)
    x = u * res - 0.5
    y = v * res - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, res - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, res - 1)
    x1 = jnp.minimum(x0 + 1, res - 1)
    y1 = jnp.minimum(y0 + 1, res - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    from orbit_tpu.utils import gather3

    c00 = gather3(cube, face, y0, x0)
    c10 = gather3(cube, face, y0, x1)
    c01 = gather3(cube, face, y1, x0)
    c11 = gather3(cube, face, y1, x1)
    return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (
        c01 * (1 - fx) + c11 * fx
    ) * fy


def sample_equirect(img, dirs):
    """Bilinear equirect sample; +Y up, phi from +Z towards +X."""
    h, w = img.shape[:2]
    d = normalize(dirs)
    phi = jnp.arctan2(d[..., 0], d[..., 2])  # [-pi, pi]
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))  # 0 = up
    u = (phi / (2 * np.pi) + 0.5) * w - 0.5
    v = theta / np.pi * h - 0.5
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 1)
    fx = (u - x0)[..., None]
    fy = jnp.clip(v - y0, 0.0, 1.0)[..., None]
    x0w = jnp.mod(x0, w)
    x1w = jnp.mod(x0 + 1, w)
    y1 = jnp.minimum(y0 + 1, h - 1)
    from orbit_tpu.utils import gather2

    c00 = gather2(img, y0, x0w)
    c10 = gather2(img, y0, x1w)
    c01 = gather2(img, y1, x0w)
    c11 = gather2(img, y1, x1w)
    return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (
        c01 * (1 - fx) + c11 * fx
    ) * fy


# --------------------------------------------------------------- preprocess


def equirect_to_cube(equirect, res: int):
    """env_map/equirectangular_cube_map.frag (with its 10k radiance clamp)."""
    dirs = face_dirs(res)
    cube = sample_equirect(jnp.asarray(equirect, jnp.float32), dirs)
    return jnp.minimum(cube, 10_000.0)


def _sh_basis(d):
    """Real SH basis up to l=2 (9 terms). d: [...,3] unit dirs -> [...,9]."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack(
        [
            0.282095 * jnp.ones_like(x),
            0.488603 * y,
            0.488603 * z,
            0.488603 * x,
            1.092548 * x * y,
            1.092548 * y * z,
            0.315392 * (3.0 * z * z - 1.0),
            1.092548 * x * z,
            0.546274 * (x * x - y * y),
        ],
        axis=-1,
    )


# cosine-lobe convolution factors per SH band (Ramamoorthi-Hanrahan)
_SH_A = np.array(
    [np.pi]
    + [2.0 * np.pi / 3.0] * 3
    + [np.pi / 4.0] * 5,
    np.float32,
)


def sh_project_irradiance(cube):
    """Project an environment cube to SH9 irradiance coefficients.

    TPU-first replacement for sampling an irradiance cubemap per pixel:
    per-pixel evaluation becomes 9 fused FMAs — zero memory gathers
    (gathers cost ~5ns/row; see MEMORY axon-tpu-quirks)."""
    res = cube.shape[1]
    dirs = normalize(face_dirs(res)).reshape(-1, 3)
    sa = jnp.tile(texel_solid_angles(res).reshape(-1), 6)
    basis = _sh_basis(dirs)  # [S,9]
    L = (basis * sa[:, None]).T @ cube.reshape(-1, 3)  # [9,3]
    return L * (jnp.asarray(_SH_A)[:, None] / np.pi)


def sh_irradiance_eval(sh, n):
    """Evaluate SH9 irradiance at normals n [...,3] -> [...,3]."""
    basis = _sh_basis(n)  # [...,9]
    return jnp.einsum("...k,kc->...c", basis, sh)


def env_brdf_approx(n_dot_v, roughness):
    """Analytic split-sum BRDF approximation (Karis, 'mobile' env BRDF).

    Replaces the LUT lookup (4 gathers/pixel) with pure math; max error
    vs the integrated LUT is ~0.02 — below tonemap visibility."""
    r = roughness
    a = -1.0 * r + 1.0
    b = -0.0275 * r + 0.0425
    cx = -0.572 * r + 1.04
    dw = 0.022 * r - 0.04
    a004 = jnp.minimum(a * a, jnp.exp2(-9.28 * n_dot_v)) * a + b
    return jnp.stack([-1.04 * a004 + cx, 1.04 * a004 + dw], axis=-1)


def irradiance_convolve(cube, out_res: int = 32, src_res: int = 32):
    """Cosine-weighted convolution as one matmul over source texels
    (env_map/cubemap_convolution.frag re-expressed for the MXU)."""
    src = jax.image.resize(cube, (6, src_res, src_res, 3), "linear")
    sdirs = normalize(face_dirs(src_res)).reshape(-1, 3)
    sa = jnp.tile(texel_solid_angles(src_res).reshape(-1), 6)
    odirs = normalize(face_dirs(out_res)).reshape(-1, 3)
    cosw = jnp.maximum(odirs @ sdirs.T, 0.0) * sa[None, :]  # [O, S]
    irr = (cosw @ src.reshape(-1, 3)) / np.pi
    return irr.reshape(6, out_res, out_res, 3)


def _importance_sample_ggx(xi, roughness, n):
    """functions.glsl:64-80 (without the phi jitter).

    xi: [2] (one sequence point); roughness: scalar or [...] matching n's
    leading dims; n: [...,3]. Returns [...,3] half vectors.
    """
    alpha = jnp.asarray(roughness) ** 2
    phi = 2.0 * np.pi * xi[0]
    cos_t = jnp.sqrt((1.0 - xi[1]) / (1.0 + (alpha * alpha - 1.0) * xi[1]))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    zeros = jnp.zeros_like(cos_t + n[..., 0])
    h_tang = jnp.stack(
        [
            sin_t * jnp.cos(phi) + zeros,
            sin_t * jnp.sin(phi) + zeros,
            cos_t + zeros,
        ],
        axis=-1,
    )
    up = jnp.where(
        (jnp.abs(n[..., 2:3]) < 0.999),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
    )
    tx = normalize(jnp.cross(up, n))
    ty = normalize(jnp.cross(n, tx))
    return normalize(
        tx * h_tang[..., 0:1] + ty * h_tang[..., 1:2] + n * h_tang[..., 2:3]
    )


def ggx_prefilter_mip(cube, res: int, roughness: float, samples: int):
    """One prefiltered mip (env_map/environmental_map_prefilter.frag)."""
    n = normalize(face_dirs(res)).reshape(-1, 3)  # N = V = R

    def body(acc, i):
        color_acc, weight_acc = acc
        xi = hammersley_2d(jnp.full((1,), i), samples)[0]
        h = _importance_sample_ggx(xi, roughness, n)
        l = normalize(2.0 * jnp.sum(n * h, axis=-1, keepdims=True) * h - n)
        n_dot_l = jnp.clip(jnp.sum(n * l, axis=-1, keepdims=True), 0.0, 1.0)
        c = sample_cube(cube, l)
        return (color_acc + c * n_dot_l, weight_acc + n_dot_l), None

    init = (jnp.zeros((n.shape[0], 3)), jnp.zeros((n.shape[0], 1)))
    (color, weight), _ = jax.lax.scan(
        body, init, jnp.arange(samples, dtype=jnp.int32)
    )
    out = color / jnp.maximum(weight, 1e-6)
    return out.reshape(6, res, res, 3)


def spec_mip_offsets(size: int, mips: int) -> np.ndarray:
    offs, acc, s = [], 0, size
    for _ in range(mips):
        offs.append(acc)
        acc += s * s
        s //= 2
    return np.array(offs + [acc], np.int32)  # last entry = total


def _coerce_equirect(equirect):
    """Accept a float image array, a filesystem path, or raw file bytes
    (.hdr RGBE or .dds) and return an [H, W, 3] float equirect image."""
    import os

    if isinstance(equirect, (str, os.PathLike)):
        from pathlib import Path

        equirect = Path(equirect).read_bytes()
    if isinstance(equirect, (bytes, bytearray)):
        blob = bytes(equirect)
        from orbit_tpu.assets import dds as dds_mod
        from orbit_tpu.assets import hdr as hdr_mod

        if hdr_mod.is_hdr(blob):
            return hdr_mod.decode_hdr(blob)
        if dds_mod.is_dds(blob):
            img, srgb = dds_mod.decode_dds(blob)
            if img.dtype == np.uint8:  # LDR fallback (BC1-7)
                from orbit_tpu.math.color import srgb_to_linear

                img = np.asarray(
                    srgb_to_linear(jnp.asarray(img[..., :3]) / 255.0)
                )
            return img[..., :3]
        raise ValueError("envmap bytes are neither .hdr nor .dds")
    return equirect


def build_environment(
    equirect,
    cube_res: int = 128,
    irr_res: int = 32,
    spec_mips: int = 5,
    spec_samples: int = 256,
    brdf_res: int = 128,
    brdf_samples: int = 512,
) -> EnvironmentMap:
    """equirect: [H, W, 3] float array, OR a path / raw bytes of an
    envmap file — Radiance .hdr (RGBE; gltf_loader.rs:372-385 +
    --envmap-path, main.rs:26-34) or a BC6H/BCn .dds."""
    equirect = _coerce_equirect(equirect)
    cube = equirect_to_cube(equirect, cube_res)
    irr = irradiance_convolve(cube, irr_res)

    offs = spec_mip_offsets(cube_res, spec_mips)
    # 4-channel rows: 16-byte-aligned gathers are ~3x faster than 12-byte
    spec = jnp.zeros((6, int(offs[-1]), 4), jnp.float32)
    res = cube_res
    for m in range(spec_mips):
        rough = m / max(spec_mips - 1, 1)
        mip = (
            cube
            if m == 0
            else ggx_prefilter_mip(cube, res, rough, spec_samples)
        )
        mip4 = jnp.concatenate(
            [mip.reshape(6, res * res, 3), jnp.zeros((6, res * res, 1))], -1
        )
        spec = jax.lax.dynamic_update_slice(spec, mip4, (0, int(offs[m]), 0))
        res //= 2
    lut = brdf_integration_lut(brdf_res, brdf_samples)
    return EnvironmentMap(
        irradiance=irr,
        sh_irradiance=sh_project_irradiance(cube),
        spec_data=spec,
        brdf_lut=lut,
        spec_size=cube_res,
        spec_mips=spec_mips,
    )


def brdf_integration_lut(res: int, samples: int):
    """Split-sum BRDF LUT (utils/brdf_integration.frag:63-106).

    Axis 0 (rows) = roughness, axis 1 (cols) = n_dot_v; returns [res,res,2].
    """
    nv = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    rough = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    NV, R = jnp.meshgrid(nv, rough, indexing="xy")
    NV = NV.reshape(-1)
    R = R.reshape(-1)
    v = jnp.stack([jnp.sqrt(1.0 - NV * NV), jnp.zeros_like(NV), NV], -1)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), v.shape)

    def body(acc, i):
        a_acc, b_acc = acc
        xi = hammersley_2d(jnp.full((1,), i), samples)[0]
        h = _importance_sample_ggx(xi, R, n)
        l = normalize(2.0 * jnp.sum(v * h, axis=-1, keepdims=True) * h - v)
        n_dot_l = jnp.clip(l[..., 2], 0.0, 1.0)
        n_dot_h = jnp.clip(h[..., 2], 0.0, 1.0)
        v_dot_h = jnp.clip(jnp.sum(v * h, axis=-1), 0.0, 1.0)
        # geometry term for IBL uses k = a^2/2 (Karis)
        a = R * R
        k = a * a / 2.0
        g1 = NV / (NV * (1 - k) + k)
        g2 = n_dot_l / (n_dot_l * (1 - k) + k)
        g = g1 * g2
        g_vis = jnp.where(
            n_dot_l > 0, g * v_dot_h / jnp.maximum(n_dot_h * NV, 1e-6), 0.0
        )
        fc = (1.0 - v_dot_h) ** 5
        return (a_acc + (1.0 - fc) * g_vis, b_acc + fc * g_vis), None

    (a, b), _ = jax.lax.scan(
        body,
        (jnp.zeros_like(NV), jnp.zeros_like(NV)),
        jnp.arange(samples, dtype=jnp.int32),
    )
    lut = jnp.stack([a, b], axis=-1) / samples
    return lut.reshape(res, res, 2)


# ----------------------------------------------------------------- sampling


def sample_irradiance(env: EnvironmentMap, dirs):
    return sample_cube(env.irradiance, dirs)


def sample_specular(env: EnvironmentMap, dirs, roughness, mode="trilinear"):
    """Prefiltered specular lookup; roughness [...] in [0,1].

    mode 'trilinear': 8 gathers; 'nearest_mip': bilinear at the rounded
    mip, 4 gathers (the fast path — gathers are the scarce resource)."""
    offs = spec_mip_offsets(env.spec_size, env.spec_mips)
    lod = jnp.clip(roughness, 0.0, 1.0) * (env.spec_mips - 1)
    if mode == "nearest":
        # single-texel tap: 1 gather (the fast path; gathers cost ~5ns/row)
        k = jnp.round(lod).astype(jnp.int32)
        sizes = jnp.asarray(
            [env.spec_size >> m for m in range(env.spec_mips)], jnp.int32
        )
        res = sizes[k]
        off = jnp.asarray(offs[:-1])[k]
        face, u, v = dir_to_face_uv(dirs)
        fres = res.astype(jnp.float32)
        x = jnp.clip((u * fres).astype(jnp.int32), 0, res - 1)
        y = jnp.clip((v * fres).astype(jnp.int32), 0, res - 1)
        t = env.spec_data.shape[1]
        flat = env.spec_data.reshape(-1, env.spec_data.shape[-1])
        addr = face * t + off + y * res + x
        return flat[addr][..., :3]
    if mode == "nearest_mip":
        k = jnp.round(lod).astype(jnp.int32)
        k0 = k1 = k
        f = jnp.zeros(lod.shape + (1,))
    else:
        k0 = jnp.floor(lod).astype(jnp.int32)
        k1 = jnp.minimum(k0 + 1, env.spec_mips - 1)
        f = (lod - k0)[..., None]

    def tap(k):
        sizes = jnp.asarray(
            [env.spec_size >> m for m in range(env.spec_mips)], jnp.int32
        )
        res = sizes[k]
        off = jnp.asarray(offs[:-1])[k]
        face, u, v = dir_to_face_uv(dirs)
        x = u * res - 0.5
        y = v * res - 0.5
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, res - 1)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, res - 1)
        x1 = jnp.minimum(x0 + 1, res - 1)
        y1 = jnp.minimum(y0 + 1, res - 1)
        fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
        fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]

        def at(xx, yy):
            from orbit_tpu.utils import gather2

            return gather2(env.spec_data, face, off + yy * res + xx)

        c = (at(x0, y0) * (1 - fx) + at(x1, y0) * fx) * (1 - fy) + (
            at(x0, y1) * (1 - fx) + at(x1, y1) * fx
        ) * fy
        return c[..., :3]

    if mode == "nearest_mip":
        return tap(k0)
    return tap(k0) * (1 - f) + tap(k1) * f


def sample_background(env: EnvironmentMap, dirs, mode="trilinear"):
    """Skybox = prefiltered mip 0 (the unfiltered cube)."""
    return sample_specular(env, dirs, jnp.zeros(dirs.shape[:-1]), mode=mode)


def sample_brdf_lut(env: EnvironmentMap, n_dot_v, roughness):
    res = env.brdf_lut.shape[0]
    x = jnp.clip(n_dot_v, 0.0, 1.0) * (res - 1)
    y = jnp.clip(roughness, 0.0, 1.0) * (res - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, res - 1)
    y1 = jnp.minimum(y0 + 1, res - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    from orbit_tpu.utils import gather2

    l = env.brdf_lut
    return (
        gather2(l, y0, x0) * (1 - fx) + gather2(l, y0, x1) * fx
    ) * (1 - fy) + (
        gather2(l, y1, x0) * (1 - fx) + gather2(l, y1, x1) * fx
    ) * fy
