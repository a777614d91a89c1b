"""SSAO (reference: passes/ssao.rs + ssao/ssao.comp + ssao_blur.comp).

Hemisphere AO over the depth buffer. Where the compute shader caches a
tile of reconstructed positions in shared memory, the traced version just
reconstructs positions for the whole screen once (XLA fuses it); sample
offsets use the same hammersley-hemisphere construction, rotated per
pixel by interleaved gradient noise instead of a 4x4 noise texture.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from orbit_tpu.math.color import interleaved_gradient_noise


@dataclass(frozen=True)
class SsaoSettings:
    """reference: SsaoSettings (ssao.rs:8-25)."""

    samples: int = 16
    min_radius: float = 0.1
    max_radius: float = 0.5
    strength: float = 1.0
    bias: float = 0.02
    full_resolution: bool = True
    # method = "hemisphere": the reference's view-space hemisphere
    # sampling (ssao.comp) — per-pixel IGN-rotated kernel, projected
    # sample positions, ONE DEPTH GATHER PER SAMPLE (16 x 2M gathers at
    # 1080p: tens of ms on TPU; correct but only for small frames).
    # method = "dense": TPU-native restructure — a fixed spiral of
    # SCREEN-space tap offsets shared by all pixels, so every tap is a
    # dense shifted read of the position image (zero gathers, pure VPU).
    # Occlusion per tap uses the same 3D range-checked comparison on
    # actual reconstructed positions; the per-pixel rotation is traded
    # for more taps + the 4x4 blur. The world radius becomes
    # depth-proportional (screen-constant), the classic SSAO variant.
    method: str = "hemisphere"
    # dense method: tap radius in pixels at the screen center
    pixel_radius: float = 24.0


def _hemisphere_kernel(n: int, seed: int = 7) -> np.ndarray:
    """Cosine-ish distributed sample kernel inside the unit hemisphere
    (ssao.rs:174-237 sample texture)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v[:, 2] = np.abs(v[:, 2])
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    scale = (np.arange(n) + 1) / n
    v *= (0.1 + 0.9 * scale * scale)[:, None]
    return v.astype(np.float32)


def view_pos_from_depth(depth, view_params, width, height):
    """Reverse-Z infinite perspective: z_view = -znear/depth."""
    H, W = depth.shape
    zv = -view_params.znear / jnp.maximum(depth, 1e-12)
    px = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2.0 - 1.0
    py = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2.0
    xx, yy = jnp.meshgrid(px, py, indexing="xy")
    x = xx / view_params.p00 * -zv
    y = yy / view_params.p11 * -zv
    return jnp.stack([x, y, zv], axis=-1)  # [H,W,3]


def compute_ssao(
    depth,  # [H,W]
    normal_view,  # [H,W,3] view-space normals
    view_params,
    settings: SsaoSettings,
):
    """Returns [H,W] AO factor (1 = unoccluded)."""
    if settings.method == "dense":
        return compute_ssao_dense(depth, normal_view, view_params, settings)
    H, W = depth.shape
    pos = view_pos_from_depth(depth, view_params, W, H)
    valid = depth > 0.0

    kernel = jnp.asarray(_hemisphere_kernel(settings.samples))
    # per-pixel random rotation about the normal via IGN
    py, px = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    theta = interleaved_gradient_noise(jnp.stack([px, py], -1)) * 2 * np.pi
    c, s = jnp.cos(theta), jnp.sin(theta)

    n = normal_view
    up = jnp.where(
        jnp.abs(n[..., 2:3]) < 0.99,
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
    )
    t = jnp.cross(up, n)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    b = jnp.cross(n, t)
    # rotate tangent frame
    tr = t * c[..., None] + b * s[..., None]
    br = -t * s[..., None] + b * c[..., None]

    radius = jnp.clip(
        -pos[..., 2] * 0.1, settings.min_radius, settings.max_radius
    )

    occl = jnp.zeros((H, W))
    for k in range(settings.samples):
        kv = kernel[k]
        offset = (
            tr * kv[0] + br * kv[1] + n * kv[2]
        ) * radius[..., None]
        sample_pos = pos + offset
        # project to screen
        sx = sample_pos[..., 0] / -sample_pos[..., 2] * view_params.p00
        sy = sample_pos[..., 1] / -sample_pos[..., 2] * view_params.p11
        ix = jnp.clip(((sx * 0.5 + 0.5) * W).astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(((0.5 - sy * 0.5) * H).astype(jnp.int32), 0, H - 1)
        scene_z = pos[iy, ix, 2]  # view-space z at that screen pos
        range_check = jnp.clip(
            radius / jnp.maximum(jnp.abs(pos[..., 2] - scene_z), 1e-6), 0.0, 1.0
        )
        occluded = scene_z >= sample_pos[..., 2] + settings.bias
        occl = occl + occluded * range_check

    ao = 1.0 - settings.strength * occl / settings.samples
    ao = jnp.clip(ao, 0.0, 1.0)
    ao = jnp.where(valid, ao, 1.0)
    return blur4x4(ao)


def _spiral_offsets(n: int, radius_px: float) -> np.ndarray:
    """Deterministic golden-angle spiral of integer pixel offsets."""
    i = np.arange(n, dtype=np.float32)
    r = np.sqrt((i + 0.5) / n) * radius_px
    theta = i * 2.39996323  # golden angle
    off = np.stack([r * np.cos(theta), r * np.sin(theta)], -1)
    off = np.round(off).astype(np.int32)
    # never the null offset (it would self-occlude)
    off[(off[:, 0] == 0) & (off[:, 1] == 0)] = (1, 0)
    return off


def _shift2d(img, dy: int, dx: int):
    """img[y+dy, x+dx] with edge clamp — a dense slice, not a gather."""
    H, W = img.shape[:2]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    pad = ((py1, py0), (px1, px0)) + ((0, 0),) * (img.ndim - 2)
    p = jnp.pad(img, pad, mode="edge")
    return p[py0 : py0 + H, px0 : px0 + W]


def compute_ssao_dense(
    depth,  # [H,W]
    normal_view,  # [H,W,3]
    view_params,
    settings: SsaoSettings,
):
    """TPU-native SSAO: fixed screen-space spiral taps = dense shifted
    reads of the reconstructed position image (no gathers; the
    reference's per-sample depth fetch is the one part of ssao.comp that
    does not map to the VPU). Occlusion per tap: the 3D vector to the
    neighbor's surface point must rise above the tangent plane (cosine
    weight) within a range check — the same test as the hemisphere
    method applied at deterministic taps. Returns [H,W] AO (1 = open).
    """
    H, W = depth.shape
    pos = view_pos_from_depth(depth, view_params, W, H)
    valid = depth > 0.0
    n = normal_view

    offs = _spiral_offsets(settings.samples, settings.pixel_radius)
    # world-space range check radius: screen-constant taps sweep a
    # depth-proportional world radius; clamp like the reference
    radius = jnp.clip(
        -pos[..., 2] * 0.1, settings.min_radius, settings.max_radius
    )

    occl = jnp.zeros((H, W))
    wsum = 0.0
    for k in range(settings.samples):
        dy, dx = int(offs[k, 1]), int(offs[k, 0])
        npos = _shift2d(pos, dy, dx)
        v = npos - pos
        d = jnp.linalg.norm(v, axis=-1)
        d = jnp.maximum(d, 1e-6)
        cosang = jnp.sum(v * n, axis=-1) / d
        # range check: distant disocclusions contribute nothing
        w = jnp.clip(radius / d, 0.0, 1.0)
        occluded = (cosang > settings.bias + 0.1).astype(jnp.float32)
        occl = occl + occluded * w
        wsum += 1.0
    ao = 1.0 - settings.strength * occl / wsum
    ao = jnp.clip(ao, 0.0, 1.0)
    ao = jnp.where(valid, ao, 1.0)
    return blur4x4(ao)


def blur4x4(img):
    """4x4 box blur (ssao_blur.comp:15-35)."""
    p = jnp.pad(img, ((1, 2), (1, 2)), mode="edge")
    acc = jnp.zeros_like(img)
    for dy in range(4):
        for dx in range(4):
            acc = acc + p[dy : dy + img.shape[0], dx : dx + img.shape[1]]
    return acc / 16.0
