"""Color math: sRGB, tonemapping, noise, low-discrepancy sequences.

Parity with shaders/include/functions.glsl and shaders/post_process.frag.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def srgb_to_linear(srgb):
    """functions.glsl:33-38."""
    lower = srgb / 12.92
    higher = ((srgb + 0.055) / 1.055) ** 2.4
    return jnp.where(srgb < 0.04045, lower, higher)


def linear_to_srgb(linear):
    """functions.glsl:40-45."""
    linear = jnp.maximum(linear, 0.0)
    higher = 1.055 * linear ** (1.0 / 2.4) - 0.055
    lower = linear * 12.92
    return jnp.where(linear < 0.0031308, lower, higher)


def luminance(rgb):
    """functions.glsl:47-49."""
    return (
        rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722
    )


# Stephen Hill's ACES fit (the "ACES (Hill)" tonemap used by
# shaders/post_process.frag). sRGB -> RRT/ODT -> sRGB matrices.
_ACES_IN = np.array(
    [
        [0.59719, 0.35458, 0.04823],
        [0.07600, 0.90834, 0.01566],
        [0.02840, 0.13383, 0.83777],
    ],
    np.float32,
)
_ACES_OUT = np.array(
    [
        [1.60475, -0.53108, -0.07367],
        [-0.10208, 1.10813, -0.00605],
        [-0.00327, -0.07276, 1.07602],
    ],
    np.float32,
)


def _rrt_odt_fit(v):
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return a / b


def aces_hill_tonemap(rgb):
    """HDR linear -> LDR linear [0,1]."""
    v = rgb @ jnp.asarray(_ACES_IN).T
    v = _rrt_odt_fit(v)
    v = v @ jnp.asarray(_ACES_OUT).T
    return jnp.clip(v, 0.0, 1.0)


def heat_colormap(x):
    """MATLAB jet colormap (functions.glsl:141-171). x [...] -> rgb [...,3]."""
    r = jnp.where(x < 0.7, 4.0 * x - 1.5, -4.0 * x + 4.5)
    g = jnp.where(x < 0.5, 4.0 * x - 0.5, -4.0 * x + 3.5)
    b = jnp.where(x < 0.3, 4.0 * x + 0.5, -4.0 * x + 2.5)
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def interleaved_gradient_noise(xy):
    """IGN low-discrepancy noise (functions.glsl:108-112). xy [...,2] -> [...]."""
    magic = jnp.array([0.06711056, 0.00583715], jnp.float32)
    return jnp.mod(
        52.9829189 * jnp.mod(jnp.sum(xy * magic, axis=-1), 1.0), 1.0
    )


def _radical_inverse_vdc(bits):
    u = lambda x: jnp.uint32(x)
    bits = bits.astype(jnp.uint32)
    bits = (bits << 16) | (bits >> 16)
    bits = ((bits & u(0x55555555)) << 1) | ((bits & u(0xAAAAAAAA)) >> 1)
    bits = ((bits & u(0x33333333)) << 2) | ((bits & u(0xCCCCCCCC)) >> 2)
    bits = ((bits & u(0x0F0F0F0F)) << 4) | ((bits & u(0xF0F0F0F0)) >> 4)
    bits = ((bits & u(0x00FF00FF)) << 8) | ((bits & u(0xFF00FF00)) >> 8)
    return bits.astype(jnp.float32) * 2.3283064365386963e-10


def hammersley_2d(i, n):
    """functions.glsl:51-61. i: int array, n: scalar count."""
    i = jnp.asarray(i)
    return jnp.stack(
        [i.astype(jnp.float32) / n, _radical_inverse_vdc(i)], axis=-1
    )


def uint_hash(a):
    """Thomas Wang style integer hash (functions.glsl:22-31)."""
    a = jnp.asarray(a, jnp.uint32)
    a = (a + jnp.uint32(0x7ED55D16)) + (a << 12)
    a = (a ^ jnp.uint32(0xC761C23C)) ^ (a >> 19)
    a = (a + jnp.uint32(0x165667B1)) + (a << 5)
    a = (a + jnp.uint32(0xD3A2646C)) ^ (a << 9)
    a = (a + jnp.uint32(0xFD7046C5)) + (a << 3)
    a = (a ^ jnp.uint32(0xB55A4F09)) ^ (a >> 16)
    return a
