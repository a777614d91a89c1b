"""Host-side mesh processing (numpy): normals, tangents, bounds, ordering.

TPU-first equivalent of the reference's src/assets/mesh.rs. Where the
reference optimizes for GPU vertex-cache locality (meshopt), we optimize
for *spatial* locality (Morton-ordered triangles) so meshlets get tight
bounding spheres and narrow normal cones — those drive culling efficiency,
which is what matters for the software rasterizer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class MeshData:
    """CPU mesh (reference: mesh.rs MeshData): indexed triangle list."""

    positions: np.ndarray  # [V,3] f32
    indices: np.ndarray  # [I] u32, triangle list
    normals: Optional[np.ndarray] = None  # [V,3]
    tangents: Optional[np.ndarray] = None  # [V,4] xyz + bitangent sign
    uvs: Optional[np.ndarray] = None  # [V,2]
    material: int = 0
    # per-triangle material for multi-submesh meshes; overrides `material`
    tri_material: Optional[np.ndarray] = None  # [T] i32

    def finalize(self) -> "MeshData":
        if self.uvs is None:
            self.uvs = np.zeros((len(self.positions), 2), np.float32)
        if self.normals is None:
            self.normals = compute_normals(self.positions, self.indices)
        if self.tangents is None:
            self.tangents = compute_tangents(
                self.positions, self.normals, self.uvs, self.indices
            )
        return self


def compute_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Area-weighted smooth normals (reference: mesh.rs:420-441)."""
    tris = indices.reshape(-1, 3)
    p = positions
    e1 = p[tris[:, 1]] - p[tris[:, 0]]
    e2 = p[tris[:, 2]] - p[tris[:, 0]]
    face_n = np.cross(e1, e2)  # area-weighted (unnormalized)
    n = np.zeros_like(positions)
    for k in range(3):
        np.add.at(n, tris[:, k], face_n)
    length = np.linalg.norm(n, axis=-1, keepdims=True)
    return (n / np.maximum(length, 1e-20)).astype(np.float32)


def compute_tangents(
    positions: np.ndarray,
    normals: np.ndarray,
    uvs: np.ndarray,
    indices: np.ndarray,
) -> np.ndarray:
    """Lengyel-style per-vertex tangents with bitangent sign in w.

    (The reference uses mikktspace, mesh.rs:443-485; this is the standard
    accumulate-and-orthonormalize variant — same space, slightly different
    splitting rules.)
    """
    tris = indices.reshape(-1, 3)
    p, t = positions, uvs
    e1 = p[tris[:, 1]] - p[tris[:, 0]]
    e2 = p[tris[:, 2]] - p[tris[:, 0]]
    du1 = t[tris[:, 1]] - t[tris[:, 0]]
    du2 = t[tris[:, 2]] - t[tris[:, 0]]
    det = du1[:, 0] * du2[:, 1] - du2[:, 0] * du1[:, 1]
    r = np.where(np.abs(det) < 1e-12, 0.0, 1.0 / np.where(det == 0, 1, det))
    tan = (e1 * du2[:, 1:2] - e2 * du1[:, 1:2]) * r[:, None]
    bit = (e2 * du1[:, 0:1] - e1 * du2[:, 0:1]) * r[:, None]

    tan_acc = np.zeros_like(positions)
    bit_acc = np.zeros_like(positions)
    for k in range(3):
        np.add.at(tan_acc, tris[:, k], tan)
        np.add.at(bit_acc, tris[:, k], bit)

    # Gram-Schmidt against the normal
    n = normals
    tan_p = tan_acc - n * np.sum(n * tan_acc, axis=-1, keepdims=True)
    length = np.linalg.norm(tan_p, axis=-1, keepdims=True)
    degenerate = (length < 1e-12)[:, 0]
    # fall back to any orthonormal vector for degenerate UVs
    fallback = _any_orthonormal(n)
    tan_p = np.where(degenerate[:, None], fallback, tan_p / np.maximum(length, 1e-20))
    sign = np.where(np.sum(np.cross(n, tan_p) * bit_acc, axis=-1) < 0.0, -1.0, 1.0)
    return np.concatenate([tan_p, sign[:, None]], axis=-1).astype(np.float32)


def _any_orthonormal(n: np.ndarray) -> np.ndarray:
    """Pixar ONB (matches orbit_tpu.math.packing.reference_orthonormal_vector)."""
    sign = np.where(n[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    return np.stack([b, sign + n[:, 1] ** 2 * a, -n[:, 1]], axis=-1)


def pack_normal_tangent_np(normal: np.ndarray, tangent4: np.ndarray) -> np.ndarray:
    """Host numpy twin of math.packing.pack_normal_tangent (asset baking
    must stay off-device: device->host readbacks poison dispatch latency
    in tunneled TPU environments, and load-time work belongs on the CPU).
    """

    def norm(v):
        return v / np.maximum(
            np.linalg.norm(v, axis=-1, keepdims=True), 1e-20
        )

    n = norm(normal)
    # octahedral encode
    m = n / np.sum(np.abs(n), axis=-1, keepdims=True)
    xy = m[:, :2]
    wrap = (1.0 - np.abs(xy[:, ::-1])) * np.where(xy >= 0.0, 1.0, -1.0)
    oct_xy = np.where(m[:, 2:3] >= 0.0, xy, wrap)
    # rotational tangent angle
    t = norm(tangent4[:, :3])
    ref = norm(_any_orthonormal(n))
    alpha = np.arctan2(
        np.sum(np.cross(t, ref) * n, axis=-1), np.sum(t * ref, axis=-1)
    ) / np.pi
    packed = np.concatenate(
        [oct_xy, alpha[:, None], tangent4[:, 3:4]], axis=-1
    )
    return np.round(np.clip(packed, -1.0, 1.0) * 127.0).astype(np.int8)


def compute_aabb(positions: np.ndarray) -> np.ndarray:
    return np.stack([positions.min(0), positions.max(0)]).astype(np.float32)


def compute_bounding_sphere(positions: np.ndarray) -> np.ndarray:
    """Ritter's bounding sphere (reference: mesh.rs:192-215 uses a similar
    two-pass center+max-radius approach)."""
    if len(positions) == 0:
        return np.zeros(4, np.float32)
    x = positions[0]
    y = positions[np.argmax(np.sum((positions - x) ** 2, axis=-1))]
    z = positions[np.argmax(np.sum((positions - y) ** 2, axis=-1))]
    center = (y + z) * 0.5
    radius = np.linalg.norm(z - y) * 0.5
    d = np.linalg.norm(positions - center, axis=-1)
    worst = d.max()
    if worst > radius:
        # grow towards the farthest point until all inside
        far = positions[np.argmax(d)]
        new_radius = (radius + worst) * 0.5
        center = center + (far - center) * ((worst - radius) / (2 * worst))
        radius = new_radius
        radius = max(radius, np.linalg.norm(positions - center, axis=-1).max())
    return np.concatenate([center, [radius * 1.0001]]).astype(np.float32)


def dedupe_vertices(mesh: MeshData) -> MeshData:
    """Weld exactly-equal vertices (reference: optimize_mesh remap pass)."""
    mesh.finalize()
    key = np.concatenate(
        [mesh.positions, mesh.normals, mesh.uvs], axis=-1
    ).astype(np.float32)
    _, first_idx, inverse = np.unique(
        key, axis=0, return_index=True, return_inverse=True
    )
    order = np.argsort(first_idx)  # keep original vertex order (determinism)
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    sel = first_idx[order]
    return MeshData(
        positions=mesh.positions[sel],
        normals=mesh.normals[sel],
        tangents=mesh.tangents[sel],
        uvs=mesh.uvs[sel],
        indices=rank[inverse][mesh.indices].astype(np.uint32),
        material=mesh.material,
        tri_material=mesh.tri_material,
    )


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit coords -> 30-bit Morton code. x: [N,3] ints in [0,1024)."""

    def part(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return part(x[:, 0]) | (part(x[:, 1]) << np.uint64(1)) | (
        part(x[:, 2]) << np.uint64(2)
    )


def spatial_sort_triangles(
    positions: np.ndarray, indices: np.ndarray
) -> np.ndarray:
    """Morton-curve order of triangles by centroid; returns [T] permutation.

    TPU-native replacement for meshopt's vertex-cache optimization
    (mesh.rs:340-393): what we need is *spatially compact* consecutive
    triangle runs so the greedy meshletizer produces tight bounds.
    """
    tris = indices.reshape(-1, 3)
    centroids = positions[tris].mean(axis=1)
    lo = centroids.min(0)
    extent = np.maximum(centroids.max(0) - lo, 1e-12)
    q = np.minimum((centroids - lo) / extent * 1023.0, 1023.0).astype(np.int64)
    return np.argsort(_morton3(q), kind="stable")
