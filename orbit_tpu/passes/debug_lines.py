"""Immediate-mode debug line rendering (reference: passes/debug_renderer.rs).

TPU-native: line segments are sampled at fixed parametric steps and
scatter-composited into the frame — no rasterizer pass needed for debug
overlays. Provides the reference's primitive vocabulary: lines, cubes/AABBs,
spheres, frusta, crosses (debug_renderer.rs:107-403), with optional depth
testing against the frame's reverse-Z depth buffer and the always-on-top
faded variant (debug_renderer.rs:549-565).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from orbit_tpu.math.frustum import frustum_corners_from_matrix

SAMPLES_PER_SEGMENT = 128


def draw_lines(
    image,  # [H, W, 3] f32 (hdr or ldr)
    view_proj,  # [4,4]
    segments,  # [N, 2, 3] world-space endpoints
    colors,  # [N, 3]
    depth=None,  # optional [H, W] reverse-Z buffer for occlusion
    occluded_fade: float = 0.25,
):
    """Returns image with the segments composited in."""
    H, W = image.shape[:2]
    n = segments.shape[0]
    t = jnp.linspace(0.0, 1.0, SAMPLES_PER_SEGMENT)
    pts = (
        segments[:, 0, None, :] * (1.0 - t)[None, :, None]
        + segments[:, 1, None, :] * t[None, :, None]
    ).reshape(-1, 3)  # [N*S, 3]
    ph = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=-1)
    clip = ph @ view_proj.T
    w = clip[:, 3]
    ok = w > 1e-4
    ndc = clip[:, :3] / jnp.where(ok, w, 1.0)[:, None]
    x = ((ndc[:, 0] * 0.5 + 0.5) * W).astype(jnp.int32)
    y = ((0.5 - ndc[:, 1] * 0.5) * H).astype(jnp.int32)
    inside = ok & (x >= 0) & (x < W) & (y >= 0) & (y < H)

    col = jnp.repeat(colors, SAMPLES_PER_SEGMENT, axis=0)
    if depth is not None:
        d = depth[jnp.clip(y, 0, H - 1), jnp.clip(x, 0, W - 1)]
        vis_f = jnp.where(ndc[:, 2] >= d - 1e-4, 1.0, occluded_fade)
        col = col * vis_f[:, None]

    flat = jnp.where(inside, y * W + x, H * W)
    img_flat = image.reshape(-1, 3)
    img_flat = img_flat.at[flat].set(col, mode="drop")
    return img_flat.reshape(H, W, 3)


# ----------------------------------------------------------- primitives


def aabb_segments(aabb_min, aabb_max):
    """12 edges of a box: [12, 2, 3] (debug_renderer.rs draw_cube)."""
    mn, mx = np.asarray(aabb_min), np.asarray(aabb_max)
    c = lambda m: [mn[i] if not (m >> i) & 1 else mx[i] for i in range(3)]
    corners = np.array([c(m) for m in range(8)], np.float32)
    edges = [
        (0, 1), (2, 3), (4, 5), (6, 7),
        (0, 2), (1, 3), (4, 6), (5, 7),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ]
    return np.stack([corners[list(e)] for e in edges])


def sphere_segments(center, radius, segments: int = 24):
    """3 orthogonal great circles (debug_renderer.rs draw_sphere).

    Traceable: center/radius may be jax arrays (in-frame overlays)."""
    c = jnp.asarray(center, jnp.float32)
    t = np.linspace(0, 2 * np.pi, segments + 1, dtype=np.float32)
    eye = np.eye(3, dtype=np.float32)
    out = []
    for a0, a1 in [(0, 1), (0, 2), (1, 2)]:
        ring = c[None, :] + radius * (
            np.cos(t)[:, None] * eye[a0] + np.sin(t)[:, None] * eye[a1]
        )
        out.append(jnp.stack([ring[:-1], ring[1:]], axis=1))
    return jnp.concatenate(out)


def frustum_segments(view_proj):
    """12 edges of a camera frustum (debug_renderer.rs draw_frustum).

    Traceable: view_proj may be a jax array."""
    corners = frustum_corners_from_matrix(jnp.asarray(view_proj))
    edges = np.array(
        [
            (0, 1), (1, 2), (2, 3), (3, 0),
            (4, 5), (5, 6), (6, 7), (7, 4),
            (0, 4), (1, 5), (2, 6), (3, 7),
        ]
    )
    return jnp.asarray(corners)[edges]


def cross_segments(center, size: float = 0.5):
    c = np.asarray(center, np.float32)
    segs = []
    for a in range(3):
        lo, hi = c.copy(), c.copy()
        lo[a] -= size
        hi[a] += size
        segs.append(np.stack([lo, hi]))
    return np.stack(segs)
