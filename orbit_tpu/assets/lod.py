"""LOD chain simplification.

The reference builds <=8 LODs, each targeting 0.8x the previous index count,
via meshopt_simplify (assets/mod.rs:336-402, mesh.rs:252-290). Here we use
deterministic uniform-grid vertex clustering: snap vertices to a grid whose
resolution is chosen so the collapsed mesh lands near the target triangle
count, merge clustered vertices (position = cluster mean), drop degenerate
triangles. Quality is below QEM but monotone and extremely fast in numpy;
a QEM-based C++ simplifier can replace this behind the same signature.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def simplify(
    positions: np.ndarray,
    indices: np.ndarray,
    target_tri_count: int,
    tri_material: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Returns (remap [V] -> representative vertex id, new_indices,
    new_tri_material). Vertices are NOT rewritten — collapsed triangles
    simply reference representative vertices, so all LODs share one vertex
    buffer (exactly how the reference shares its global vertex buffer)."""
    tris = indices.reshape(-1, 3)
    n_tris = len(tris)
    if n_tris <= target_tri_count:
        ident = np.arange(len(positions), dtype=np.int64)
        return ident, tris.reshape(-1).astype(np.uint32), tri_material

    lo = positions.min(0)
    extent = float(np.max(positions.max(0) - lo)) or 1.0

    # binary search grid resolution for the target triangle count
    best = None
    lo_res, hi_res = 1, 1024
    for _ in range(11):
        res = (lo_res + hi_res) // 2
        remap, new_tris, keep = _cluster_once(positions, tris, lo, extent, res)
        if len(new_tris) > target_tri_count:
            hi_res = res - 1
            # keep the closest-from-below result if we never get under
            if best is None or len(best[1]) > len(new_tris):
                pass
        else:
            best = (remap, new_tris, keep)
            lo_res = res + 1
        if lo_res > hi_res:
            break
    if best is None:
        res = max(1, lo_res)
        best = _cluster_once(positions, tris, lo, extent, res)
    remap, new_tris, keep = best
    new_mat = tri_material[keep] if tri_material is not None else None
    return remap, new_tris.reshape(-1).astype(np.uint32), new_mat


def _cluster_once(positions, tris, lo, extent, res):
    cell = np.minimum(
        ((positions - lo) / extent * res).astype(np.int64), res - 1
    )
    cell_id = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
    # representative = first vertex (in index order) of each cell
    order = np.argsort(cell_id, kind="stable")
    sorted_ids = cell_id[order]
    is_first = np.concatenate([[True], sorted_ids[1:] != sorted_ids[:-1]])
    rep_of_cell = order[is_first]  # representative vertex per unique cell
    cell_rank = np.cumsum(is_first) - 1
    rank_of_vertex = np.empty(len(positions), np.int64)
    rank_of_vertex[order] = cell_rank
    remap = rep_of_cell[rank_of_vertex]  # vertex -> representative vertex

    t = remap[tris]
    nondegenerate = (
        (t[:, 0] != t[:, 1]) & (t[:, 1] != t[:, 2]) & (t[:, 0] != t[:, 2])
    )
    t = t[nondegenerate]
    # drop duplicate triangles (same representative set, keep first)
    key = np.sort(t, axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    first.sort()
    keep_idx = np.flatnonzero(nondegenerate)[first]
    return remap, t[first], keep_idx


def simplify_qem(
    positions: np.ndarray,
    indices: np.ndarray,
    target_tri_count: int,
    tri_material: Optional[np.ndarray] = None,
):
    """QEM half-edge collapse with border locking (C++; reference role:
    meshopt_simplify with LockBorder, mesh.rs:252-290). Locks open
    boundaries, material-seam edges and attribute-seam (split) vertices
    so LOD transitions never crack. Falls back to grid clustering when
    the native library is unavailable."""
    from orbit_tpu.native import qem_simplify_native

    out = qem_simplify_native(positions, indices, target_tri_count,
                              tri_material)
    if out is None:
        return simplify(positions, indices, target_tri_count, tri_material)
    return out


def build_lod_chain(
    positions: np.ndarray,
    indices: np.ndarray,
    tri_material: Optional[np.ndarray] = None,
    max_lods: int = 8,
    step: float = 0.8,
    min_tris: int = 8,
):
    """LOD 0 = input; each next level targets `step` x the previous triangle
    count (reference: assets/mod.rs:336-402 uses 0.8x index count). Returns a
    list of (indices, tri_material) per LOD."""
    lods = [(indices.astype(np.uint32), tri_material)]
    cur_idx, cur_mat = indices, tri_material
    for _ in range(1, max_lods):
        n_tris = len(cur_idx) // 3
        target = int(n_tris * step)
        if target < min_tris:
            break
        _, new_idx, new_mat = simplify_qem(
            positions, cur_idx, target, cur_mat
        )
        if len(new_idx) >= len(cur_idx):
            break
        # QEM collapses can leave (near-)zero-area triangles; in MODEL
        # space they are harmless-looking, but the rasterizer's clipless
        # degeneracy test runs in pixel-scale homogeneous units where
        # their determinant is pure FP noise — a surviving degenerate
        # rasterizes as a screen-spanning phantom sliver. Drop them here
        # (the reference's meshopt path discards them the same way).
        new_idx, new_mat = _drop_degenerate(positions, new_idx, new_mat)
        if len(new_idx) >= len(cur_idx) or len(new_idx) == 0:
            break
        lods.append((new_idx, new_mat))
        cur_idx, cur_mat = new_idx, new_mat
    return lods


def _drop_degenerate(positions, idx, mat, rel_eps: float = 1e-6):
    """Remove triangles whose area is negligible relative to the mesh
    bounds (exact duplicates of a collapsed edge included)."""
    tris = idx.reshape(-1, 3)
    tri = positions[tris]
    lo, hi = positions.min(0), positions.max(0)
    diam2 = float(((hi - lo) ** 2).sum()) or 1.0
    a2 = (
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]) ** 2
    ).sum(-1)
    keep = a2 > (rel_eps * diam2) ** 2
    return (
        tris[keep].reshape(-1).astype(idx.dtype),
        mat[keep] if mat is not None else None,
    )
