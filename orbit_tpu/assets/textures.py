"""Texture baking: resample to the store's layer size, build mip chains.

TPU-first: instead of bindless per-texture descriptors (reference
device.rs:894-991), every texture becomes one layer of a stacked
[L, S, S, 4] array per mip level, so sampling is a plain gather and the
whole texture heap is a static-shape pytree.

sRGB policy: layers store their authored encoding (u8); mips are built in
linear space (matching GPU blit-chain generation on sRGB views,
gltf_loader.rs:254-356) and re-encoded. Samplers decode per-texel before
filtering.
"""

from __future__ import annotations

import numpy as np


def _srgb_to_linear(x: np.ndarray) -> np.ndarray:
    return np.where(x < 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(x: np.ndarray) -> np.ndarray:
    x = np.maximum(x, 0.0)
    return np.where(x < 0.0031308, x * 12.92, 1.055 * x ** (1 / 2.4) - 0.055)


def to_rgba_u8(img: np.ndarray) -> np.ndarray:
    """Accept [H,W], [H,W,3], [H,W,4] in u8 or float; return [H,W,4] u8."""
    if img.dtype != np.uint8:
        img = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
        img = (img * 255.0 + 0.5).astype(np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    if img.shape[2] == 3:
        a = np.full(img.shape[:2] + (1,), 255, np.uint8)
        img = np.concatenate([img, a], axis=2)
    return img


def resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """float [H,W,C] bilinear resize (numpy, half-pixel centers)."""
    H, W = img.shape[:2]
    if (H, W) == (h, w):
        return img
    ys = (np.arange(h) + 0.5) * H / h - 0.5
    xs = (np.arange(w) + 0.5) * W / w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    b = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return a * (1 - fy) + b * fy


def bake_layer(img: np.ndarray, size: int, srgb: bool):
    """-> list of [s,s,4] u8 mips, full chain down to 1x1."""
    rgba = to_rgba_u8(img).astype(np.float32) / 255.0
    lin = rgba.copy()
    if srgb:
        lin[..., :3] = _srgb_to_linear(lin[..., :3])
    lin = resize_bilinear(lin, size, size)

    mips = []
    cur = lin
    s = size
    while True:
        out = cur
        if srgb:
            out = out.copy()
            out[..., :3] = _linear_to_srgb(out[..., :3])
        mips.append((np.clip(out, 0, 1) * 255.0 + 0.5).astype(np.uint8))
        if s == 1:
            break
        s //= 2
        cur = cur.reshape(s, 2, s, 2, 4).mean(axis=(1, 3))
    return mips
