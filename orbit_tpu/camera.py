"""Camera and projection (reference: src/camera.rs).

Perspective is infinite reverse-Z (camera.rs:87); orthographic is reverse-Z
via swapped planes (camera.rs:88-97). `ViewParams` carries everything a view
needs downstream: matrices plus the scalar projection params used by culling
(draw_gen.rs:105-237 GpuCullInfo).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbit_tpu.math import (
    frustum_planes_from_matrix,
    look_at,
    normalize_plane,
    orthographic_reverse_z,
    perspective_infinite_reverse,
)


@jax.tree_util.register_dataclass
@dataclass
class ViewParams:
    """One render view (main camera, frozen cull camera, or shadow cascade)."""

    view: jax.Array  # [4,4]
    proj: jax.Array  # [4,4]
    view_proj: jax.Array  # [4,4]
    # culling data (view-space planes; see cull/ for usage)
    cull_planes: jax.Array  # [12,4] padded
    num_cull_planes: jax.Array  # scalar i32
    znear: jax.Array  # scalar
    zfar: jax.Array  # scalar (ortho only; 0 for perspective)
    p00: jax.Array  # proj[0,0] (persp) or 1/half_width (ortho)
    p11: jax.Array  # proj[1,1] (persp) or 1/half_height (ortho)
    eye: jax.Array  # [3] world-space camera position
    is_ortho: bool = field(metadata=dict(static=True), default=False)


def make_perspective_view(
    eye,
    target,
    up=(0.0, 1.0, 0.0),
    fovy: float = np.radians(60.0),
    aspect: float = 16 / 9,
    znear: float = 0.01,
    cull_view: Optional[jax.Array] = None,
    cull_proj: Optional[jax.Array] = None,
) -> ViewParams:
    """cull_view/cull_proj support frozen-camera culling debug
    (forward.rs:262-284: culling may use a different camera than shading)."""
    view = look_at(jnp.asarray(eye), jnp.asarray(target), jnp.asarray(up))
    proj = perspective_infinite_reverse(fovy, aspect, znear)
    cv = view if cull_view is None else cull_view
    cp = proj if cull_proj is None else cull_proj
    # view-space frustum planes: extract from proj alone (culling happens in
    # the *cull camera's* view space, entity_cull.comp:131-144), then the
    # caller composes with the cull view matrix. Use first 5 (skip far).
    planes = normalize_plane(frustum_planes_from_matrix(cp))
    # to cull in *render* view space when the cull camera differs, culling
    # code transforms spheres by (cull_view @ model); planes stay these.
    pad = jnp.zeros((12 - 5, 4), jnp.float32)
    return ViewParams(
        view=view,
        proj=proj,
        view_proj=proj @ view,
        cull_planes=jnp.concatenate([planes[:5], pad]),
        num_cull_planes=jnp.int32(5),
        znear=jnp.float32(znear),
        zfar=jnp.float32(0.0),
        p00=proj[0, 0],
        p11=proj[1, 1],
        is_ortho=False,
        eye=jnp.asarray(eye, jnp.float32),
    )


def make_ortho_view(
    eye, target, up, half_width, half_height, znear, zfar
) -> ViewParams:
    """Directional-light cascade view (shadow_renderer.rs:466-554)."""
    view = look_at(jnp.asarray(eye), jnp.asarray(target), jnp.asarray(up))
    proj = orthographic_reverse_z(
        -half_width, half_width, -half_height, half_height, znear, zfar
    )
    planes = normalize_plane(frustum_planes_from_matrix(proj))
    pad = jnp.zeros((12 - 5, 4), jnp.float32)
    return ViewParams(
        view=view,
        proj=proj,
        view_proj=proj @ view,
        cull_planes=jnp.concatenate([planes[:5], pad]),
        num_cull_planes=jnp.int32(5),
        znear=jnp.asarray(znear, jnp.float32),
        zfar=jnp.asarray(zfar, jnp.float32),
        # ortho occlusion uses size_recip = 1/half_extent (entity_cull.comp:166)
        p00=jnp.float32(1.0) / jnp.asarray(half_width, jnp.float32),
        p11=jnp.float32(1.0) / jnp.asarray(half_height, jnp.float32),
        is_ortho=True,
        eye=jnp.asarray(eye, jnp.float32),
    )
