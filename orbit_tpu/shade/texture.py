"""Texture sampling from the flat mip atlas — gather-based, fully traced.

TPU-first replacement for bindless sampled images + hardware samplers
(reference device.rs:1291-1423 SamplerKind): per-pixel mip selection is a
plain address computation into one [L, T4, 4] array, so trilinear filtering
is 8 gathers regardless of how many textures or mips exist. sRGB layers are
decoded per-texel *before* filtering (matching GPU sRGB view semantics).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orbit_tpu.assets.types import mip_offsets, num_mips
from orbit_tpu.math.color import srgb_to_linear


def size_from_atlas(t4: int) -> int:
    """Invert atlas_texels: find S with sum of mip areas == t4."""
    s = 1
    while True:
        total = 0
        m = s
        while m >= 1:
            total += m * m
            m //= 2
        if total == t4:
            return s
        if total > t4:
            raise ValueError(f"no texture size matches atlas length {t4}")
        s *= 2


def apply_wrap(i, size, mode: str = "repeat"):
    """Integer texel-coordinate wrap. size is a (per-pixel) power of two.

    The reference's samplers expose REPEAT and CLAMP_TO_EDGE address
    modes (device.rs:1291-1312; glTF MirroredRepeat is coerced to Repeat
    at load, gltf_loader.rs:564). "mirror" here is an extension beyond
    the reference — true MIRRORED_REPEAT integer math — provided because
    glTF itself allows it. The TPU analog of all of them is pure integer
    math on the gather address.
    """
    if mode == "repeat":
        return jnp.bitwise_and(i, size - 1)
    if mode == "clamp":
        return jnp.clip(i, 0, size - 1)
    if mode == "mirror":
        # triangle wave with period 2*size (power-of-two fast path)
        m = jnp.bitwise_and(i, 2 * size - 1)
        return jnp.where(m >= size, 2 * size - 1 - m, m)
    raise ValueError(f"unknown wrap mode {mode!r}")


def _wrap(i, size):
    # repeat wrap; size is a per-pixel power-of-two array
    return jnp.bitwise_and(i, size - 1)


def sample_bilinear_mip(tex_data, tex_srgb, layer, uv, k, tex_size):
    """One bilinear tap at integer mip k (per-pixel). Returns [N,4] linear."""
    offs = jnp.asarray(mip_offsets(tex_size))
    sizes = jnp.asarray(
        np.array([tex_size >> m for m in range(num_mips(tex_size))], np.int32)
    )
    from orbit_tpu.utils import gather1

    size = gather1(sizes, k)  # [N]
    off = gather1(offs, k)
    t = uv * size[..., None].astype(jnp.float32) - 0.5
    i0 = jnp.floor(t).astype(jnp.int32)
    f = t - i0
    x0 = _wrap(i0[..., 0], size)
    y0 = _wrap(i0[..., 1], size)
    x1 = _wrap(i0[..., 0] + 1, size)
    y1 = _wrap(i0[..., 1] + 1, size)

    def fetch(x, y):
        from orbit_tpu.utils import gather2

        addr = off + y * size + x
        texel = gather2(tex_data, layer, addr).astype(jnp.float32) * (
            1.0 / 255.0
        )
        from orbit_tpu.utils import gather1 as _g1

        srgb = _g1(tex_srgb, layer)
        rgb = jnp.where(
            srgb[..., None], srgb_to_linear(texel[..., :3]), texel[..., :3]
        )
        return jnp.concatenate([rgb, texel[..., 3:4]], axis=-1)

    fx = f[..., 0:1]
    fy = f[..., 1:2]
    top = fetch(x0, y0) * (1 - fx) + fetch(x1, y0) * fx
    bot = fetch(x0, y1) * (1 - fx) + fetch(x1, y1) * fx
    return top * (1 - fy) + bot * fy


def sample_texture(
    tex_data, tex_srgb, layer, uv, lod, tex_size: int
):
    """Trilinear sample. layer [N] i32, uv [N,2], lod [N] f32 (continuous).

    Returns [N,4] linear-space rgba. Callers mask invalid layers themselves.
    """
    n = num_mips(tex_size)
    lod = jnp.clip(lod, 0.0, n - 1.0)
    k0 = jnp.floor(lod).astype(jnp.int32)
    k1 = jnp.minimum(k0 + 1, n - 1)
    f = (lod - k0.astype(jnp.float32))[..., None]
    safe_layer = jnp.maximum(layer, 0)
    c0 = sample_bilinear_mip(tex_data, tex_srgb, safe_layer, uv, k0, tex_size)
    c1 = sample_bilinear_mip(tex_data, tex_srgb, safe_layer, uv, k1, tex_size)
    return c0 * (1 - f) + c1 * f


def lod_from_derivatives(duv_dx, duv_dy, tex_size: int):
    """Standard isotropic LOD: log2 of the max screen-space texel footprint."""
    fx = jnp.sum((duv_dx * tex_size) ** 2, axis=-1)
    fy = jnp.sum((duv_dy * tex_size) ** 2, axis=-1)
    rho2 = jnp.maximum(fx, fy)
    return 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))
