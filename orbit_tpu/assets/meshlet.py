"""Greedy meshletization (<=64 vertices / <=64 triangles per meshlet).

Parity target: the reference's `compute_meshlets` (mesh.rs:292-338, built on
meshopt's scan-based meshlet builder) and the meshlet bounds consumed by
meshlet_cull.comp:104-106 (bounding sphere + normal cone with the
  dot(center - eye, axis) >= cutoff * |center - eye| + radius
backface test, cutoff = sin of the cone half-angle).

Expects triangles pre-sorted for spatial locality (mesh.spatial_sort_triangles).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from orbit_tpu.assets.types import MAX_MESHLET_TRIANGLES, MAX_MESHLET_VERTICES
from orbit_tpu.assets.mesh import compute_bounding_sphere


@dataclass
class Meshlet:
    vertices: np.ndarray  # [<=64] global vertex indices
    triangles: np.ndarray  # [<=64, 3] local u8 indices
    sphere: np.ndarray  # [4] model space
    cone: np.ndarray  # [4] axis + cutoff (cutoff=1 -> never cull)
    material: int = 0


def build_meshlets(
    positions: np.ndarray,
    indices: np.ndarray,
    tri_material: Optional[np.ndarray] = None,
    max_vertices: int = MAX_MESHLET_VERTICES,
    max_triangles: int = MAX_MESHLET_TRIANGLES,
    use_native: bool = True,
) -> List[Meshlet]:
    """Scan triangles greedily; flush when a budget would overflow or the
    triangle's material differs (meshlets are single-material, matching the
    reference where submeshes split by material before meshletization).

    Uses the C++ meshletizer (orbit_tpu/native/meshproc.cpp) when the
    toolchain is available; falls back to this Python implementation
    (differential-tested to produce identical meshlets)."""
    if use_native:
        from orbit_tpu.native import build_meshlets_native

        r = build_meshlets_native(
            positions, indices, tri_material, max_vertices, max_triangles
        )
        if r is not None:
            return [
                Meshlet(
                    vertices=r["vertices"][i, : r["vcount"][i]].copy(),
                    triangles=r["triangles"][i, : r["tcount"][i]].copy(),
                    sphere=r["sphere"][i].copy(),
                    cone=r["cone"][i].copy(),
                    material=int(r["material"][i]),
                )
                for i in range(r["count"])
            ]
    tris = indices.reshape(-1, 3).astype(np.int64)
    n_tris = len(tris)
    if tri_material is None:
        tri_material = np.zeros(n_tris, np.int32)

    meshlets: List[Meshlet] = []
    vert_map = {}  # global -> local
    local_verts: List[int] = []
    local_tris: List[tuple] = []
    cur_material = 0

    def flush():
        nonlocal vert_map, local_verts, local_tris
        if not local_tris:
            return
        verts = np.array(local_verts, np.int64)
        ltris = np.array(local_tris, np.int64)
        meshlets.append(
            _finish_meshlet(positions, verts, ltris, cur_material)
        )
        vert_map = {}
        local_verts = []
        local_tris = []

    for t in range(n_tris):
        tri = tris[t]
        mat = int(tri_material[t])
        new_verts = sum(1 for v in tri if int(v) not in vert_map)
        if (
            local_tris
            and (
                len(local_tris) >= max_triangles
                or len(local_verts) + new_verts > max_vertices
                or mat != cur_material
            )
        ):
            flush()
        if not local_tris:
            cur_material = mat
        loc = []
        for v in tri:
            v = int(v)
            if v not in vert_map:
                vert_map[v] = len(local_verts)
                local_verts.append(v)
            loc.append(vert_map[v])
        local_tris.append(tuple(loc))
    flush()
    return meshlets


def _finish_meshlet(
    positions: np.ndarray, verts: np.ndarray, ltris: np.ndarray, material: int
) -> Meshlet:
    pts = positions[verts]
    sphere = compute_bounding_sphere(pts)

    # normal cone: axis = mean face normal, cutoff = sin(max deviation)
    p = pts[ltris]  # [T,3,3]
    face_n = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    lens = np.linalg.norm(face_n, axis=-1, keepdims=True)
    ok = lens[:, 0] > 1e-12
    face_n = face_n / np.maximum(lens, 1e-20)
    if ok.any():
        axis = face_n[ok].sum(0)
        alen = np.linalg.norm(axis)
        if alen > 1e-12:
            axis = axis / alen
            mindot = float(np.min(np.sum(face_n[ok] * axis, axis=-1)))
        else:
            axis = np.array([0.0, 0.0, 1.0])
            mindot = -1.0
    else:
        axis = np.array([0.0, 0.0, 1.0])
        mindot = -1.0
    # meshopt-style: degenerate/wide cones never cull
    cutoff = 1.0 if mindot <= 0.1 else float(np.sqrt(1.0 - mindot * mindot))
    cone = np.concatenate([axis, [cutoff]]).astype(np.float32)
    return Meshlet(
        vertices=verts.astype(np.int32),
        triangles=ltris.astype(np.int8),
        sphere=sphere,
        cone=cone,
        material=material,
    )


def cone_cull(
    center: np.ndarray, radius: np.ndarray, axis: np.ndarray, cutoff: np.ndarray,
    eye: np.ndarray,
) -> np.ndarray:
    """CPU twin of meshlet_cull.comp:104-106 (for tests). True = culled."""
    d = center - eye
    dist = np.linalg.norm(d, axis=-1)
    return np.sum(d * axis, axis=-1) >= cutoff * dist + radius
