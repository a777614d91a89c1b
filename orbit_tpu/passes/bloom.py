"""Bloom (reference: passes/bloom.rs + bloom_downsample/upsample.comp).

CoD-style: 13-tap Karis-averaged downsample chain with a soft-knee
threshold prefilter at mip 0, 9-tap tent additive upsample. Pure jnp —
each tap is a padded shift-add that XLA fuses into a couple of kernels.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class BloomSettings:
    """reference: BloomSettings (bloom.rs:11-28)."""

    intensity: float = 0.03
    threshold: float = 1.2
    soft_knee: float = 0.6
    mip_count: int = 5


def _sample(img, dy, dx):
    """Shifted copy with edge clamp (texel-offset tap)."""
    h, w = img.shape[:2]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    p = jnp.pad(img, ((py1, py0), (px1, px0), (0, 0)), mode="edge")
    return p[py0 : py0 + h, px0 : px0 + w]


def _downsample_13tap(img):
    """bloom_downsample.comp:37-90 (at half resolution)."""
    h, w = img.shape[:2]
    half = img.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))

    def tap(dy, dx):
        return _sample(half, dy, dx)

    center = half
    inner = (tap(-1, -1) + tap(-1, 1) + tap(1, -1) + tap(1, 1)) * 0.25
    outer_c = (tap(-2, -2) + tap(-2, 2) + tap(2, -2) + tap(2, 2)) * 0.25
    edges = (tap(-2, 0) + tap(0, -2) + tap(0, 2) + tap(2, 0)) * 0.25
    return inner * 0.5 + (center + outer_c) * 0.125 + edges * 0.25 * 0.5


def _karis_average(img):
    lum = (
        img[..., 0] * 0.2126 + img[..., 1] * 0.7152 + img[..., 2] * 0.0722
    )
    return img / (1.0 + lum)[..., None]


def _prefilter(img, threshold, knee):
    lum = (
        img[..., 0] * 0.2126 + img[..., 1] * 0.7152 + img[..., 2] * 0.0722
    )
    soft = jnp.clip(lum - threshold + knee, 0.0, 2.0 * knee)
    soft = soft * soft / (4.0 * knee + 1e-5)
    contrib = jnp.maximum(soft, lum - threshold) / jnp.maximum(lum, 1e-5)
    return img * contrib[..., None]


def _upsample_tent(img):
    """bloom_upsample.comp 9-tap tent at 2x resolution."""
    h, w = img.shape[:2]
    up = jnp.repeat(jnp.repeat(img, 2, 0), 2, 1)

    def tap(dy, dx, wgt):
        return _sample(up, dy, dx) * wgt

    return (
        tap(0, 0, 4.0)
        + tap(0, 1, 2.0) + tap(0, -1, 2.0) + tap(1, 0, 2.0) + tap(-1, 0, 2.0)
        + tap(1, 1, 1.0) + tap(1, -1, 1.0) + tap(-1, 1, 1.0) + tap(-1, -1, 1.0)
    ) / 16.0


def compute_bloom(hdr, settings: BloomSettings):
    """hdr: [H,W,3] (H,W divisible by 2^mips after internal padding).

    Returns the bloom contribution at full resolution (caller scales by
    intensity in the tonemap composite, post_process.frag:58-66).
    """
    H, W = hdr.shape[:2]
    mips = settings.mip_count
    align = 1 << mips
    ph = (-H) % align
    pw = (-W) % align
    img = jnp.pad(hdr, ((0, ph), (0, pw), (0, 0)))

    # mip 0: threshold + Karis average to kill fireflies
    chain = []
    cur = _downsample_13tap(_karis_average(_prefilter(img, settings.threshold, settings.soft_knee)))
    chain.append(cur)
    for _ in range(1, mips):
        cur = _downsample_13tap(cur)
        chain.append(cur)

    acc = chain[-1]
    for m in range(mips - 2, -1, -1):
        acc = chain[m] + _upsample_tent(acc)
    bloom = _upsample_tent(acc)
    return bloom[:H, :W]
