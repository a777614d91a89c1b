"""Shared sphere-occlusion test against the HiZ pyramid.

Twin of the occlusion blocks in entity_cull.comp:147-191 and
meshlet_cull.comp:161-205 (perspective + orthographic paths).
"""

from __future__ import annotations

import jax.numpy as jnp

from orbit_tpu.cull.hiz import DepthPyramid, occlusion_level, sample_pyramid_min
from orbit_tpu.math.frustum import project_sphere_clip_space


def sphere_occluded(
    sphere_view,  # [...,4] view-space sphere (z negative in front)
    pyr: DepthPyramid,
    znear,
    zfar,
    p00,
    p11,
    is_ortho: bool,
):
    """True where the sphere is definitely occluded (safe to cull).

    Not-cullable spheres (crossing the near plane) return False.
    """
    c = sphere_view[..., :3]
    r = sphere_view[..., 3]

    if not is_ortho:
        # flip z to positive-depth convention (entity_cull.comp:155)
        flipped = jnp.concatenate(
            [c[..., :2], -c[..., 2:3], r[..., None]], axis=-1
        )
        cullable, aabb = project_sphere_clip_space(flipped, znear, p00, p11)
        closest = znear / jnp.maximum(-c[..., 2] - r, 1e-12)
    else:
        # entity_cull.comp:165-175
        center = c[..., :2] * jnp.stack([p00, p11])
        box = r[..., None] * jnp.stack([p00, p11])
        lo = jnp.clip(center - box, -1.0, 1.0)
        hi = jnp.clip(center + box, -1.0, 1.0)
        aabb = jnp.stack(
            [
                lo[..., 0] * 0.5 + 0.5,
                hi[..., 1] * -0.5 + 0.5,
                hi[..., 0] * 0.5 + 0.5,
                lo[..., 1] * -0.5 + 0.5,
            ],
            axis=-1,
        )
        inv_range = 1.0 / jnp.maximum(zfar - znear, 1e-12)
        closest_z = c[..., 2] + r
        closest = closest_z * inv_range + zfar * inv_range
        cullable = jnp.ones_like(closest, dtype=bool)

    level = occlusion_level(pyr, aabb)
    center_uv = jnp.stack(
        [
            (aabb[..., 0] + aabb[..., 2]) * 0.5,
            (aabb[..., 1] + aabb[..., 3]) * 0.5,
        ],
        axis=-1,
    )
    sampled = sample_pyramid_min(pyr, center_uv, level)
    occluded = closest < sampled  # visible when closest >= sampled
    return cullable & occluded
