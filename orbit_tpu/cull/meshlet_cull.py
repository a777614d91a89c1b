"""Meshlet-level culling over the compacted instance list.

Vectorized twin of meshlet_cull.comp: frustum planes (:140-146),
normal-cone backface (:104-106, 148-158), two-pass HiZ occlusion
(:161-205) and the visibility-bitset protocol (:129-137, 233-254).
Output is a validity mask — the binner drops invalid instances, so no
second compaction is needed.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from orbit_tpu.cull.entity_cull import PASS_EARLY, PASS_LATE, PASS_SINGLE
from orbit_tpu.cull.occlusion import sphere_occluded
from orbit_tpu.math.frustum import sphere_inside_planes, transform_sphere


def cull_meshlet_instances(
    assets,
    scene,
    inst_entity,  # [I] i32
    inst_meshlet,  # [I] i32
    inst_valid,  # [I] bool
    cull_view,  # [4,4]
    cull_planes,  # [P,4]
    num_planes,
    occlusion_pass: int = PASS_SINGLE,
    pyramid=None,
    znear=0.01,
    zfar=0.0,
    p00=1.0,
    p11=1.0,
    is_ortho: bool = False,
    prev_visible: Optional[jnp.ndarray] = None,  # [I] bool (gathered bitset)
    use_meshlet_occlusion: bool = True,
    use_cone: bool = True,
    alpha_mode_mask: int = 0,
):
    """Returns (draw_mask [I] bool, new_visible [I] bool).

    alpha_mode_mask: bitmask over ALPHA_MODE_* values — a nonzero mask
    restricts the draw to meshlets whose material alpha mode has its bit
    set (reference: the cull-stage alpha-mode filter,
    meshlet_cull.comp:207-213 + AlphaModeFlags draw_gen.rs:630-641).
    The opaque pass uses OPAQUE|MASKED so Transparent meshlets never
    enter the depth-tested G-buffer raster."""
    mv = jnp.einsum(
        "ab,ibc->iac", cull_view, scene.entity_model[inst_entity]
    )
    sphere_view = transform_sphere(mv, assets.mlet_sphere[inst_meshlet])

    visible = inst_valid
    visible_in_buffer = (
        prev_visible if prev_visible is not None else jnp.ones_like(visible)
    )
    if occlusion_pass == PASS_EARLY and use_meshlet_occlusion:
        visible = visible & visible_in_buffer

    plane_mask = jnp.arange(cull_planes.shape[0]) < num_planes
    visible = visible & sphere_inside_planes(
        sphere_view, cull_planes, plane_mask
    )

    # normal-cone backface cull (meshlet_cull.comp:104-106,148-158):
    # perspective tests from the origin; ortho along the -Z view direction
    cone = assets.mlet_cone[inst_meshlet]  # model-space axis + cutoff
    axis_view = jnp.einsum("iab,ib->ia", mv[:, :3, :3], cone[:, :3])
    cutoff = cone[:, 3]
    center = sphere_view[:, :3]
    radius = sphere_view[:, 3]
    if is_ortho:
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), center.shape)
        dist = jnp.ones_like(radius)
    else:
        d = center
        dist = jnp.linalg.norm(center, axis=-1)
    cone_culled = (
        jnp.sum(d * axis_view, axis=-1) >= cutoff * dist + radius
    )
    if use_cone:
        visible = visible & ~cone_culled

    if (
        occlusion_pass == PASS_LATE
        and use_meshlet_occlusion
        and pyramid is not None
    ):
        occluded = sphere_occluded(
            sphere_view, pyramid, znear, zfar, p00, p11, is_ortho
        )
        visible = visible & ~occluded

    draw = visible
    if occlusion_pass == PASS_LATE and use_meshlet_occlusion:
        # late pass draws only newly-visible meshlets (meshlet_cull.comp:209-213)
        draw = visible & ~visible_in_buffer
    if alpha_mode_mask:
        mode = assets.mat_alpha_mode[
            jnp.maximum(assets.mlet_material[inst_meshlet], 0)
        ]
        draw = draw & (((alpha_mode_mask >> mode) & 1) == 1)
    return draw, visible
