"""Post-process: bloom composite, ACES tonemap, debug overlays
(reference: passes/post_process.rs + shaders/post_process.frag)."""

from __future__ import annotations

import jax.numpy as jnp

from orbit_tpu.math.color import aces_hill_tonemap, linear_to_srgb


def tonemap(hdr, exposure: float = 1.0, bloom=None, bloom_intensity: float = 0.03):
    """HDR linear [H,W,3] -> sRGB-encoded [H,W,3] in [0,1]."""
    color = hdr
    if bloom is not None:
        color = color + bloom * bloom_intensity
    ldr = aces_hill_tonemap(color * exposure)
    return linear_to_srgb(ldr)


def to_u8(srgb):
    return jnp.clip(srgb * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
