"""Persistent visibility state for two-pass occlusion culling.

Reference: the per-entity visibility bitset buffer (scene.rs:352-354,
420-431: 1 bit/meshlet, sub-allocated per entity, persistent across
frames) and the entity-visibility buffer (forward.rs:150-157). Here both
are bool device arrays carried through the jitted frame function; the
per-entity meshlet ranges are computed host-side at scene build.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class VisibilityState:
    entity_visible: jax.Array  # [E] bool
    meshlet_visible: jax.Array  # [T] bool (flat, entity-ranged)


def build_visibility_layout(assets_host_lod_count, entity_mesh, num_entities):
    """Host-side: offsets of each entity's meshlet-visibility range.

    Range size = the entity's mesh LOD0 meshlet count (an upper bound for
    any LOD's count since LODs shrink). Returns (offsets [E] i32, total).
    """
    offsets = np.zeros(len(entity_mesh), np.int32)
    acc = 0
    for e in range(num_entities):
        m = entity_mesh[e]
        offsets[e] = acc
        if m >= 0:
            acc += int(assets_host_lod_count[m, 0])
    return offsets, acc


def initial_state(num_entities_cap: int, meshlet_bits_total: int) -> VisibilityState:
    """Everything starts visible — first frame draws all, converges after."""
    return VisibilityState(
        entity_visible=jnp.ones((num_entities_cap,), bool),
        meshlet_visible=jnp.ones((max(meshlet_bits_total, 1),), bool),
    )


def gather_meshlet_bits(state, vis_offsets, inst_entity, inst_local, inst_valid):
    # vis_offsets arrives as host numpy; jnp.asarray at trace time bakes a
    # (safe) program constant rather than a (poisonous) device constant
    idx = jnp.asarray(vis_offsets)[inst_entity] + inst_local
    idx = jnp.clip(idx, 0, state.meshlet_visible.shape[0] - 1)
    return jnp.where(inst_valid, state.meshlet_visible[idx], False)


def scatter_meshlet_bits(
    state, vis_offsets, inst_entity, inst_local, inst_valid, new_bits
):
    idx = jnp.asarray(vis_offsets)[inst_entity] + inst_local
    idx = jnp.where(inst_valid, idx, state.meshlet_visible.shape[0])  # drop
    mv = state.meshlet_visible.at[idx].set(new_bits, mode="drop")
    return VisibilityState(
        entity_visible=state.entity_visible, meshlet_visible=mv
    )
