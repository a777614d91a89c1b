"""Asset pipeline tests: meshlets respect budgets, bounds contain geometry,
cones are conservative, LODs shrink, store round-trips."""

import numpy as np

from orbit_tpu.assets import AssetStore, AssetCaps, MeshData
from orbit_tpu.assets.mesh import (
    compute_bounding_sphere,
    compute_normals,
    spatial_sort_triangles,
)
from orbit_tpu.assets.meshlet import build_meshlets, cone_cull
from orbit_tpu.assets.lod import build_lod_chain
from orbit_tpu.assets import procedural as proc


def test_meshlet_budgets_and_coverage():
    m = proc.uv_sphere(rings=24, sectors=48).finalize()
    order = spatial_sort_triangles(m.positions, m.indices)
    idx = m.indices.reshape(-1, 3)[order].reshape(-1)
    mlets = build_meshlets(m.positions, idx)
    assert len(mlets) >= 2
    total_tris = sum(len(ml.triangles) for ml in mlets)
    assert total_tris == len(idx) // 3
    for ml in mlets:
        assert len(ml.vertices) <= 64 and len(ml.triangles) <= 64
        # bounds contain every meshlet vertex
        pts = m.positions[ml.vertices]
        d = np.linalg.norm(pts - ml.sphere[:3], axis=-1)
        assert (d <= ml.sphere[3] + 1e-4).all()


def test_meshlet_cone_is_conservative():
    """If the cone test culls a meshlet, every triangle must be backfacing."""
    m = proc.uv_sphere(rings=16, sectors=32).finalize()
    order = spatial_sort_triangles(m.positions, m.indices)
    idx = m.indices.reshape(-1, 3)[order].reshape(-1)
    mlets = build_meshlets(m.positions, idx)
    rng = np.random.default_rng(0)
    eyes = rng.normal(size=(8, 3)) * 4.0
    culled_any = 0
    for eye in eyes:
        for ml in mlets:
            culled = cone_cull(
                ml.sphere[:3], ml.sphere[3], ml.cone[:3], ml.cone[3], eye
            )
            if not culled:
                continue
            culled_any += 1
            tris = m.positions[ml.vertices][ml.triangles.astype(int)]
            n = np.cross(
                tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]
            )
            # backfacing: dot(any point - eye, normal) >= 0
            v = tris[:, 0] - eye
            assert (np.sum(v * n, axis=-1) >= -1e-4).all()
    assert culled_any > 0, "cone culling never fired on a sphere"


def test_lod_chain_shrinks():
    m = proc.uv_sphere(rings=24, sectors=48).finalize()
    lods = build_lod_chain(m.positions, m.indices, max_lods=8)
    counts = [len(i) // 3 for i, _ in lods]
    assert len(lods) >= 3
    assert all(b < a for a, b in zip(counts, counts[1:]))
    # all LOD indices reference valid vertices
    for i, _ in lods:
        assert i.max() < len(m.positions)


def test_bounding_sphere_contains_all():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(500, 3)).astype(np.float32) * [3, 1, 0.2]
    s = compute_bounding_sphere(pts)
    d = np.linalg.norm(pts - s[:3], axis=-1)
    assert (d <= s[3] + 1e-5).all()


def test_normals_point_outward_on_sphere():
    m = proc.uv_sphere()
    n = compute_normals(m.positions, m.indices)
    inner = np.sum(n * m.positions, axis=-1)
    # ignore poles (duplicate verts); most normals should be radial
    assert (inner > 0.9).mean() > 0.95


def test_store_roundtrip():
    store = AssetStore(AssetCaps(vertices=1 << 14, meshlets=1 << 10))
    tex = store.add_texture(proc.checker_texture(64), srgb=True)
    mat = store.add_material(base_color=(1, 0.5, 0.25, 1), base_color_tex=tex)
    m = proc.torus()
    m.material = mat
    mesh_id = store.add_mesh(m)
    arrays, meta = store.to_device()
    assert meta.num_meshes == 1 and meta.num_materials == 1
    assert meta.num_meshlets == int(np.sum(np.asarray(arrays.mesh_lod_count)[0]))
    lod0_cnt = int(np.asarray(arrays.mesh_lod_count)[mesh_id, 0])
    assert lod0_cnt > 0
    # meshlet triangles of LOD0 reconstruct the full triangle count
    t = np.asarray(arrays.mlet_tcount)[:lod0_cnt].sum()
    assert t == len(m.indices) // 3
    # all 8 LOD slots are populated (padding repeats the last real LOD)
    offs = np.asarray(arrays.mesh_lod_offset)[mesh_id]
    cnts = np.asarray(arrays.mesh_lod_count)[mesh_id]
    assert (cnts > 0).all()
    # flat texture atlas sized to the full mip chain
    from orbit_tpu.assets.types import atlas_texels

    assert arrays.tex_data.shape[1] == atlas_texels(store.caps.texture_size)
    # the checkerboard landed in mip 0 of layer 0 (non-zero content)
    assert np.asarray(arrays.tex_data)[0, : 64 * 64].any()


def test_multi_material_meshlets_split():
    m = proc.cube()
    m.finalize()
    tm = np.arange(12) % 3  # 3 materials across 12 tris
    mlets = build_meshlets(m.positions, m.indices, tm.astype(np.int32))
    for ml in mlets:
        assert ml.material in (0, 1, 2)
    mats = sorted(set(ml.material for ml in mlets))
    assert mats == [0, 1, 2]
