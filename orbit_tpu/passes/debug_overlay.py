"""In-frame debug overlays (reference: passes/debug_renderer.rs wired
into App::render + the bounding-volume / frustum / cascade / cluster
visualizations of shadow_renderer.rs:556-662 and cluster.rs:133-320).

All overlay geometry is generated ON DEVICE inside the jitted frame from
the same scene arrays the passes consume, then line-composited onto the
final image by passes.debug_lines — one frame, no host round-trips.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from orbit_tpu.passes.debug_lines import (
    draw_lines,
    frustum_segments,
    sphere_segments,
)


@dataclass(frozen=True)
class DebugSettings:
    """Mirrors the reference's debug toggles (CameraDebugSettings
    app.rs:445 + ShadowDebugSettings + ClusterDebugSettings)."""

    entity_spheres: bool = False  # bounding spheres of drawn entities
    meshlet_spheres: bool = False  # bounding spheres of drawn meshlets
    frustum: bool = False  # cull-camera frustum (frozen-camera debug)
    cascades: bool = False  # CSM cascade volumes
    clusters: bool = False  # active light-cluster AABBs (cluster.rs:133-320)
    wireframe_entity: int = -1  # draw one entity's LOD0 triangle edges
    max_entity_spheres: int = 128
    max_meshlet_spheres: int = 512
    max_cluster_volumes: int = 256
    max_wireframe_tris: int = 2048
    sphere_segments: int = 16
    depth_fade: float = 0.25  # occluded-line fade (debug_renderer.rs:560)
    # depth-pyramid inspection: composite HiZ mip >= 0 into the frame's
    # top-left corner (reference post_process.frag:58-88 pyramid overlay)
    depth_pyramid_mip: int = -1


def _cat(segs, cols, s, color):
    segs.append(s)
    cols.append(
        jnp.broadcast_to(jnp.asarray(color, jnp.float32), (s.shape[0], 3))
    )


def build_overlay(
    assets,
    scene,
    num_entities: int,
    settings: DebugSettings,
    cull_view_proj=None,
    shadows=None,
    inst_entity=None,
    inst_meshlet=None,
    inst_valid=None,
    clusters_data=None,
    inv_view=None,
):
    """Returns (segments [N,2,3], colors [N,3]) — fixed-capacity, with
    degenerate (zero-length) padding for disabled/absent items."""
    segs, cols = [], []

    if settings.entity_spheres:
        E = settings.max_entity_spheres
        eid = jnp.arange(E, dtype=jnp.int32)
        ok = eid < num_entities
        mesh = jnp.maximum(scene.entity_mesh[eid], 0)
        sph = assets.mesh_sphere[mesh]  # [E,4] model space
        m = scene.entity_model[eid]  # [E,4,4]
        c_h = jnp.concatenate(
            [sph[:, :3], jnp.ones((E, 1))], axis=-1
        )[:, :, None]
        center = (m @ c_h)[:, :3, 0]
        scale = jnp.linalg.norm(m[:, :3, :3], axis=(1, 2)) / np.sqrt(3.0)
        radius = jnp.where(ok, sph[:, 3] * scale, 0.0)
        s = jax.vmap(
            lambda c, r: sphere_segments(
                c, r, segments=settings.sphere_segments
            )
        )(center, radius).reshape(-1, 2, 3)
        _cat(segs, cols, s, (0.2, 1.0, 0.2))

    if settings.meshlet_spheres and inst_meshlet is not None:
        K = settings.max_meshlet_spheres
        mid = jnp.maximum(inst_meshlet[:K], 0)
        ent = jnp.maximum(inst_entity[:K], 0)
        ok = inst_valid[:K]
        sph = assets.mlet_sphere[mid]
        m = scene.entity_model[ent]
        c_h = jnp.concatenate(
            [sph[:, :3], jnp.ones((K, 1))], axis=-1
        )[:, :, None]
        center = (m @ c_h)[:, :3, 0]
        scale = jnp.linalg.norm(m[:, :3, :3], axis=(1, 2)) / np.sqrt(3.0)
        radius = jnp.where(ok, sph[:, 3] * scale, 0.0)
        s = jax.vmap(
            lambda c, r: sphere_segments(c, r, segments=8)
        )(center, radius).reshape(-1, 2, 3)
        _cat(segs, cols, s, (1.0, 0.8, 0.2))

    if settings.frustum and cull_view_proj is not None:
        s = frustum_segments(cull_view_proj)
        _cat(segs, cols, s, (1.0, 0.2, 0.2))

    if settings.cascades and shadows is not None:
        # one frustum box per cascade matrix (ortho: NDC cube corners)
        for i in range(shadows.matrices.shape[0]):
            s = frustum_segments(shadows.matrices[i])
            _cat(
                segs, cols, s,
                [(1, 0.3, 0.3), (0.3, 1, 0.3), (0.3, 0.3, 1), (1, 1, 0.3)][
                    i % 4
                ],
            )

    if (
        settings.clusters
        and clusters_data is not None
        and clusters_data.aabb_min is not None
        and inv_view is not None
    ):
        # active cluster volumes (cluster.rs:133-320): rank-compact the
        # first max_cluster_volumes active cells, lift their view-space
        # AABB corners to world space, draw the 12 box edges each
        _bits = jnp.asarray(
            [[(m >> i) & 1 for i in range(3)] for m in range(8)],
            jnp.float32,
        )
        _edges = jnp.asarray(
            [
                (0, 1), (2, 3), (4, 5), (6, 7),
                (0, 2), (1, 3), (4, 6), (5, 7),
                (0, 4), (1, 5), (2, 6), (3, 7),
            ],
            jnp.int32,
        )

        def aabb_segments(mn, mx):
            corners = mn[None, :] * (1.0 - _bits) + mx[None, :] * _bits
            return corners[_edges]  # [12, 2, 3]

        V = settings.max_cluster_volumes
        act = clusters_data.active
        rank = jnp.cumsum(act) - 1
        C = act.shape[0]
        dst = jnp.where(act & (rank < V), rank, V)
        sel = jnp.zeros((V,), jnp.int32).at[dst].set(
            jnp.arange(C, dtype=jnp.int32), mode="drop"
        )
        n_act = jnp.minimum(jnp.sum(act.astype(jnp.int32)), V)
        ok = jnp.arange(V) < n_act
        mn_v = clusters_data.aabb_min[sel]  # [V,3] view space
        mx_v = clusters_data.aabb_max[sel]

        def box_world(mn, mx, okk):
            s = aabb_segments(mn, mx)  # [12,2,3] view space
            sh = jnp.concatenate([s, jnp.ones_like(s[..., :1])], axis=-1)
            sw = jnp.einsum("ab,ecb->eca", inv_view, sh)[..., :3]
            return jnp.where(okk, sw, 0.0)

        s = jax.vmap(box_world)(mn_v, mx_v, ok).reshape(-1, 2, 3)
        _cat(segs, cols, s, (0.3, 0.9, 1.0))

    if settings.wireframe_entity >= 0:
        # LOD0 triangle edges of one entity's mesh
        # (debug_renderer.rs:405-463 draws wireframes via submesh lines)
        T = settings.max_wireframe_tris
        ent = settings.wireframe_entity
        mesh = jnp.maximum(scene.entity_mesh[ent], 0)
        base = assets.mesh_lod_offset[mesh, 0]
        count = assets.mesh_lod_count[mesh, 0]
        n_mlet = -(-T // 64)
        mids = base + jnp.arange(n_mlet, dtype=jnp.int32)
        okm = jnp.arange(n_mlet) < count
        tp = assets.tri_pos[mids].reshape(-1, 64, 3, 3)  # model space
        tcnt = assets.mlet_tcount[mids]
        tri_ok = (
            okm[:, None]
            & (jnp.arange(64)[None, :] < tcnt[:, None])
        ).reshape(-1)
        tp = tp.reshape(-1, 3, 3)[:T]
        tri_ok = tri_ok[:T]
        m = scene.entity_model[ent]
        ph = jnp.concatenate([tp, jnp.ones_like(tp[..., :1])], axis=-1)
        wp = jnp.einsum("ab,tcb->tca", m, ph)[..., :3]
        wp = jnp.where(tri_ok[:, None, None], wp, 0.0)
        e01 = jnp.stack([wp[:, 0], wp[:, 1]], axis=1)
        e12 = jnp.stack([wp[:, 1], wp[:, 2]], axis=1)
        e20 = jnp.stack([wp[:, 2], wp[:, 0]], axis=1)
        s = jnp.concatenate([e01, e12, e20], axis=0)
        _cat(segs, cols, s, (0.9, 0.9, 0.9))

    if not segs:
        return jnp.zeros((1, 2, 3)), jnp.zeros((1, 3))
    return jnp.concatenate(segs), jnp.concatenate(cols)


def depth_pyramid_inset(color_u8, pyramid, mip: int):
    """Composite HiZ pyramid mip `mip` (grayscale, gamma-lifted) into
    the frame's top-left corner — the reference's depth-pyramid debug
    view (post_process.frag:58-88 + DisplaySettings pyramid level)."""
    mip = min(mip, len(pyramid.sizes) - 1)
    h, w = pyramid.sizes[mip]
    off = pyramid.offsets[mip]
    img = pyramid.data[off : off + h * w].reshape(h, w)
    H, W = color_u8.shape[:2]
    h, w = min(h, H), min(w, W)
    vis = jnp.clip(img[:h, :w], 0.0, 1.0) ** (1.0 / 2.2)
    inset = jnp.broadcast_to(
        jnp.clip(vis * 255.0 + 0.5, 0, 255).astype(jnp.uint8)[..., None],
        (h, w, 3),
    )
    return color_u8.at[:h, :w].set(inset)


def apply_overlay(
    color_u8,  # [H,W,3] u8 final frame
    depth,  # [H,W] reverse-Z
    view_proj,
    segments,
    colors,
    settings: DebugSettings,
):
    """Composite the overlay lines onto the final image (depth-faded)."""
    img = color_u8.astype(jnp.float32) / 255.0
    img = draw_lines(
        img, view_proj, segments, colors, depth=depth,
        occluded_fade=settings.depth_fade,
    )
    return jnp.clip(img * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
