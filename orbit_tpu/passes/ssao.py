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


def blur4x4(img):
    """4x4 box blur (ssao_blur.comp:15-35)."""
    p = jnp.pad(img, ((1, 2), (1, 2)), mode="edge")
    acc = jnp.zeros_like(img)
    for dy in range(4):
        for dx in range(4):
            acc = acc + p[dy : dy + img.shape[0], dx : dx + img.shape[1]]
    return acc / 16.0
