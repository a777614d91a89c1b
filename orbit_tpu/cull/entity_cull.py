"""Entity-level culling + LOD selection + instance expansion.

Vectorized twin of entity_cull.comp:
  * sphere-vs-planes frustum test in cull-view space (:137-144)
  * two-pass HiZ occlusion with persistent visibility flags (:117-123, 147-243)
  * distance LOD pick (:204-207)
  * expansion of surviving entities into a compacted (entity, meshlet)
    instance list via cumsum + searchsorted (replacing the atomicAdd
    MeshletDispatch emission, :209-223)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from orbit_tpu.cull.occlusion import sphere_occluded
from orbit_tpu.math.frustum import sphere_inside_planes, transform_sphere

PASS_SINGLE = 0  # no occlusion (shadow views etc.)
PASS_EARLY = 1  # draw what was visible last frame
PASS_LATE = 2  # occlusion-test everything, draw newly visible


def cull_entities(
    assets,
    scene,
    num_entities: int,
    cull_view,  # [4,4] cull-camera view matrix
    cull_planes,  # [P,4] view-space planes
    num_planes,  # static or traced count; planes beyond are inactive
    lod_target_pos_view=None,  # [3] LOD reference point in view space
    lod_base: float = 4.0,
    lod_step: float = 1.5,
    min_lod: int = 0,
    max_lod: int = 7,
    occlusion_pass: int = PASS_SINGLE,
    pyramid=None,
    znear=0.01,
    zfar=0.0,
    p00=1.0,
    p11=1.0,
    is_ortho: bool = False,
    prev_visible: Optional[jnp.ndarray] = None,  # [E] bool
):
    """Returns (should_draw [E] bool, lod_index [E] i32, new_visible [E] bool).

    `new_visible` is meaningful only for PASS_LATE (write-back pass).
    """
    mesh = jnp.maximum(scene.entity_mesh, 0)
    in_range = (
        jnp.arange(scene.entity_mesh.shape[0]) < num_entities
    ) & (scene.entity_mesh >= 0)

    sphere_model = assets.mesh_sphere[mesh]  # [E,4]
    mv = jnp.einsum("ab,ebc->eac", cull_view, scene.entity_model)
    sphere_view = transform_sphere(mv, sphere_model)

    visible = in_range
    visible_in_buffer = (
        prev_visible
        if prev_visible is not None
        else jnp.ones_like(visible)
    )
    if occlusion_pass == PASS_EARLY:
        visible = visible & visible_in_buffer

    plane_mask = (
        jnp.arange(cull_planes.shape[0]) < num_planes
    )
    visible = visible & sphere_inside_planes(
        sphere_view, cull_planes, plane_mask
    )

    if occlusion_pass == PASS_LATE and pyramid is not None:
        occluded = sphere_occluded(
            sphere_view, pyramid, znear, zfar, p00, p11, is_ortho
        )
        visible = visible & ~occluded

    # LOD select (entity_cull.comp:204-207)
    if lod_target_pos_view is None:
        lod_target_pos_view = jnp.zeros(3)
    lod_distance = (
        jnp.linalg.norm(
            sphere_view[:, :3] - lod_target_pos_view[None, :], axis=-1
        )
        - sphere_view[:, 3]
    )
    lod_f = jnp.log2(jnp.maximum(lod_distance, 1e-6) / lod_base) / jnp.log2(
        jnp.float32(lod_step)
    )
    lod_index = jnp.clip(
        jnp.maximum(lod_f + 1.0, 0.0).astype(jnp.int32), min_lod, max_lod
    )
    lod_index = jnp.minimum(lod_index, assets.mesh_lod_levels[mesh] - 1)

    should_draw = visible
    if occlusion_pass == PASS_LATE:
        # draw only what the early pass missed; when meshlet-level occlusion
        # runs, keep previously-visible entities so their newly visible
        # meshlets can emerge (entity_cull.comp:193-200)
        should_draw = visible  # meshlet occlusion enabled downstream
    return should_draw, lod_index, visible


def expand_instances(
    assets,
    should_draw,  # [E] bool
    lod_index,  # [E] i32
    entity_mesh,  # [E] i32
    capacity: int,
):
    """Expand surviving entities into (entity, meshlet) instance arrays.

    Exact, atomic-free: counts -> cumsum -> inverse lookup per output slot.
    Returns (inst_entity [C], inst_meshlet [C], inst_valid [C], overflow).
    """
    from orbit_tpu.utils import gather2

    mesh = jnp.maximum(entity_mesh, 0)
    lod_off = gather2(assets.mesh_lod_offset, mesh, lod_index)
    lod_cnt = gather2(assets.mesh_lod_count, mesh, lod_index)
    counts = jnp.where(should_draw, lod_cnt, 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]

    # inverse expansion via scatter + cummax (O(P), no binary search):
    # mark each entity's start slot with its index, then forward-fill
    p = jnp.arange(capacity, dtype=jnp.int32)
    starts = jnp.where(counts > 0, offsets, capacity)
    mark = jnp.full((capacity,), -1, jnp.int32).at[starts].max(
        jnp.arange(counts.shape[0], dtype=jnp.int32), mode="drop"
    )
    ent = jnp.maximum(jax.lax.cummax(mark), 0)
    local = p - offsets[ent]
    inst_meshlet = lod_off[ent] + local
    inst_valid = p < total
    inst_entity = jnp.where(inst_valid, ent, 0)
    inst_meshlet = jnp.where(inst_valid, inst_meshlet, 0)
    # local meshlet index within the entity's selected LOD (for the
    # per-entity meshlet visibility bitset addressing)
    inst_local = jnp.where(inst_valid, local, 0)
    return inst_entity, inst_meshlet, inst_local, inst_valid, total > capacity


def compact_drawn(inst_entity, inst_meshlet, draw, capacity: int):
    """Compact the drawn instances into a smaller slot space.

    The meshlet-level cull leaves a sparse draw mask over the expanded
    instance list; downstream geometry/raster cost scales with SLOT
    CAPACITY, not the real draw count, so compacting first makes that
    static cost track what actually draws (the TPU analog of the
    reference's compacted indirect draw-command buffer,
    meshlet_cull.comp:216-230). One scatter of source indices + two
    cheap row gathers. Returns (ie, im, iv, overflow)."""
    d = draw.astype(jnp.int32)
    pos = jnp.cumsum(d) - d  # exclusive
    total = pos[-1] + d[-1]
    tgt = jnp.where(draw, pos, capacity)
    src = jnp.zeros((capacity,), jnp.int32).at[tgt].set(
        jnp.arange(draw.shape[0], dtype=jnp.int32), mode="drop"
    )
    cv = jnp.arange(capacity, dtype=jnp.int32) < total
    ce = jnp.where(cv, inst_entity[src], 0)
    cm = jnp.where(cv, inst_meshlet[src], 0)
    return ce, cm, cv, total > capacity
