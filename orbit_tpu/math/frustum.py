"""Frustum planes / corners, sphere projection and culling math.

Behavioral parity with the reference renderer's src/math.rs:
  frustum_planes_from_matrix  math.rs:72-84  (Gribb-Hartmann)
  frustum_split               math.rs:64-69
  project_sphere_clip_space   math.rs:170-199 (Mara-McGuire 2013)
  transform_sphere            math.rs:140-146 / entity_cull.comp:37-43
All are fully vectorized: batched over leading dims, jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from orbit_tpu.math.transforms import normalize

# 8 corners of reverse-Z NDC (z in [0,1]); reference math.rs:7-16.
# numpy (not jnp): module-level device arrays captured in jits poison
# dispatch on this TPU stack; numpy constants are safe.
import numpy as _np

NDC_BOUNDS = _np.array(
    [
        [-1.0, -1.0, 0.0, 1.0],
        [1.0, -1.0, 0.0, 1.0],
        [1.0, 1.0, 0.0, 1.0],
        [-1.0, 1.0, 0.0, 1.0],
        [-1.0, -1.0, 1.0, 1.0],
        [1.0, -1.0, 1.0, 1.0],
        [1.0, 1.0, 1.0, 1.0],
        [-1.0, 1.0, 1.0, 1.0],
    ],
    _np.float32,
)


def frustum_planes_from_matrix(m):
    """Gribb-Hartmann plane extraction. Returns [6,4] planes (nx,ny,nz,d).

    Point p is inside plane i when dot(plane.xyz, p) + plane.w > 0.
    Order: left, right, bottom, top, near(z>=0), far(w-z>=0).
    Note: with reverse-Z infinite projection plane 4 is the *far* (z_clip>=0,
    trivially true) and plane 5 is the *near* — the reference culls with the
    first 5 planes only (entity_cull.comp uses cull_plane_count).
    """
    r0, r1, r2, r3 = m[0], m[1], m[2], m[3]
    return jnp.stack([r3 + r0, r3 - r0, r3 + r1, r3 - r1, r3 + r2, r3 - r2])


def normalize_plane(plane):
    n = plane[..., :3]
    length = jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-20))
    return plane / length


def frustum_split(near, far, lam, ratio):
    """Log/uniform blended cascade split (math.rs:64-69)."""
    uniform = near + (far - near) * ratio
    log = near * (far / near) ** ratio
    return log * lam + (1.0 - lam) * uniform


def frustum_corners_from_matrix(m):
    """Unproject the 8 NDC corners through inverse(m). Returns [8,3]."""
    inv = jnp.linalg.inv(m)
    corners = NDC_BOUNDS @ inv.T
    return corners[:, :3] / corners[:, 3:4]


def perspective_corners(fovy, aspect, near, far):
    """8 view-space frustum corners (math.rs:149-168). Returns [8,3]."""
    t_v = jnp.tan(jnp.asarray(fovy, jnp.float32) * 0.5)
    t_h = t_v * aspect
    xn, yn = near * t_h, near * t_v
    xf, yf = far * t_h, far * t_v
    return jnp.stack(
        [
            jnp.stack([-xn, -yn, -near]),
            jnp.stack([xn, -yn, -near]),
            jnp.stack([xn, yn, -near]),
            jnp.stack([-xn, yn, -near]),
            jnp.stack([-xf, -yf, -far]),
            jnp.stack([xf, -yf, -far]),
            jnp.stack([xf, yf, -far]),
            jnp.stack([-xf, yf, -far]),
        ]
    ).astype(jnp.float32)


def transform_plane(m, plane):
    """Transform plane (n, w) with point-on-plane = n*w (math.rs:91-98)."""
    n = plane[..., :3]
    o = n * plane[..., 3:4]
    o_h = jnp.concatenate([o, jnp.ones_like(o[..., :1])], axis=-1)
    o_t = (o_h @ m.T)[..., :3]
    n_t = n @ jnp.linalg.inv(m)[:3, :3]  # inverse-transpose applied as v @ inv
    return jnp.concatenate(
        [n_t, jnp.sum(o_t * n_t, axis=-1, keepdims=True)], axis=-1
    )


def largest_scale_from_matrix(m):
    """Largest column scale of the 3x3 block (entity_cull.comp:28-35).

    Batched: m is [...,4,4] or [...,3,3]; columns are m[..., :3, i].
    """
    b = m[..., :3, :3]
    col_sq = jnp.sum(b * b, axis=-2)  # length^2 of each column
    return jnp.sqrt(jnp.max(col_sq, axis=-1))


def transform_sphere(m, sphere):
    """Transform bounding sphere [...,4] by [...,4,4] (entity_cull.comp:37-43)."""
    c = sphere[..., :3]
    c_h = jnp.concatenate([c, jnp.ones_like(c[..., :1])], axis=-1)
    c_t = jnp.einsum("...ij,...j->...i", m, c_h)
    c_t = c_t[..., :3] / c_t[..., 3:4]
    r = sphere[..., 3] * largest_scale_from_matrix(m)
    return jnp.concatenate([c_t, r[..., None]], axis=-1)


def sphere_inside_planes(sphere, planes, plane_mask=None):
    """Vectorized sphere-vs-planes test (entity_cull.comp:137-144).

    sphere: [...,4] view-space (center, radius); planes: [P,4].
    Visible when for all planes: dot(n, c) + d > -r.
    plane_mask: optional [P] bool of active planes.
    Returns [...] bool.
    """
    c = sphere[..., :3]
    r = sphere[..., 3]
    dist = jnp.einsum("...i,pi->...p", c, planes[:, :3]) + planes[:, 3]
    inside = dist > -r[..., None]
    if plane_mask is not None:
        inside = jnp.logical_or(inside, ~plane_mask)
    return jnp.all(inside, axis=-1)


def project_sphere_clip_space(sphere, znear, p00, p11):
    """Mara-McGuire 2013 screen-space AABB of a view-space sphere.

    sphere: [...,4] with z-axis *flipped to positive depth* (z > 0 in front),
    matching entity_cull.comp:83-102 which negates z before the call.
    Returns (valid [...] bool, aabb_uv [...,4] as (minx, miny, maxx, maxy) in
    uv space, y down — the reference's clip->uv conversion).
    Invalid when the sphere crosses the near plane (z < r + znear).
    """
    c = sphere[..., :3]
    r = sphere[..., 3]
    valid = c[..., 2] >= r + znear

    def axis_minmax(cx, cz):
        # cx, cz: the reference negates both components (cx = -C.xz)
        ax = -cx
        az = -cz
        t2 = jnp.maximum(ax * ax + az * az - r * r, 1e-12)
        vx = jnp.sqrt(t2)
        # column-major mat2: min = [[vx, -r], [r, vx]] @ (ax, az)
        minx = jnp.stack([vx * ax - r * az, r * ax + vx * az], axis=-1)
        maxx = jnp.stack([vx * ax + r * az, -r * ax + vx * az], axis=-1)
        return minx, maxx

    minx, maxx = axis_minmax(c[..., 0], c[..., 2])
    miny, maxy = axis_minmax(c[..., 1], c[..., 2])
    aabb_clip = jnp.stack(
        [
            minx[..., 0] / minx[..., 1] * p00,
            miny[..., 0] / miny[..., 1] * p11,
            maxx[..., 0] / maxx[..., 1] * p00,
            maxy[..., 0] / maxy[..., 1] * p11,
        ],
        axis=-1,
    )
    # clip -> uv space: (x, W, z, y) * (0.5, -0.5, 0.5, -0.5) + 0.5
    aabb_uv = jnp.stack(
        [
            aabb_clip[..., 0] * 0.5 + 0.5,
            aabb_clip[..., 3] * -0.5 + 0.5,
            aabb_clip[..., 2] * 0.5 + 0.5,
            aabb_clip[..., 1] * -0.5 + 0.5,
        ],
        axis=-1,
    )
    return valid, aabb_uv


__all__ = [
    "NDC_BOUNDS",
    "frustum_planes_from_matrix",
    "normalize_plane",
    "frustum_split",
    "frustum_corners_from_matrix",
    "perspective_corners",
    "transform_plane",
    "transform_sphere",
    "largest_scale_from_matrix",
    "sphere_inside_planes",
    "project_sphere_clip_space",
    "normalize",
]
