"""Rasterizer tests: geometry setup, exact binning, and three-way
differential testing (numpy reference vs XLA vs Pallas-interpret)."""

import numpy as np
import jax.numpy as jnp

from orbit_tpu.assets import AssetStore, AssetCaps
from orbit_tpu.assets import procedural as proc
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.raster import (
    RasterConfig,
    bin_meshlets,
    process_geometry,
    rasterize,
)
from orbit_tpu.raster.raster_ref import rasterize_ref
from orbit_tpu.raster.raster_xla import rasterize_xla
from orbit_tpu.raster.raster_pallas import rasterize_pallas

H, W = 96, 128


def _sphere_setup():
    store = AssetStore(AssetCaps())
    store.add_material()
    mesh_id = store.add_mesh(proc.uv_sphere(rings=12, sectors=24), build_lods=False)
    assets, meta = store.to_device()
    n = int(np.asarray(assets.mesh_lod_count)[mesh_id, 0])
    off = int(np.asarray(assets.mesh_lod_offset)[mesh_id, 0])
    meshlet_ids = jnp.arange(off, off + n, dtype=jnp.int32)
    mats = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n, 4, 4))
    view = make_perspective_view(
        eye=(0.0, 0.0, 3.0), target=(0.0, 0.0, 0.0), aspect=W / H
    )
    geom = process_geometry(assets, meshlet_ids, mats, view.view_proj, W, H)
    return geom, n, assets


def test_geometry_produces_valid_tris():
    geom, n, assets = _sphere_setup()
    valid = np.asarray(geom.tri_valid)
    assert valid.any()
    # roughly half the sphere's triangles are backfacing
    assert 0.2 < valid.mean() < 0.8
    # meshlets with at least one valid tri have non-empty bboxes
    bbox = np.asarray(geom.bbox)
    has_tri = valid.any(axis=1)
    assert (bbox[has_tri, 2] > bbox[has_tri, 0]).all()
    assert (bbox[has_tri, 3] > bbox[has_tri, 1]).all()


def test_raster_xla_matches_numpy_ref():
    geom, n, assets = _sphere_setup()
    bins = bin_meshlets(geom.bbox, geom.inst_valid, W, H, 16, 128, 1 << 10)
    assert not bool(bins.overflow)
    depth_x, vis_x = rasterize_xla(geom.setup, bins, H, W, 16, 128)
    depth_r, vis_r = rasterize_ref(
        np.asarray(geom.setup), np.asarray(geom.tri_valid), H, W
    )
    depth_x = np.asarray(depth_x)
    vis_x = np.asarray(vis_x)
    np.testing.assert_allclose(depth_x, depth_r, atol=1e-6)
    # vis may differ only on exact depth ties; require near-total agreement
    agree = (vis_x == vis_r).mean()
    assert agree > 0.999, f"vis agreement {agree}"
    # sphere covers the center, background at corners
    assert vis_x[H // 2, W // 2] != 0
    assert vis_x[0, 0] == 0 and depth_x[0, 0] == 0.0
    # depth increases towards the center of the sphere (reverse-Z: closer)
    assert depth_x[H // 2, W // 2] > depth_x[H // 2, W // 2 + 20] > 0


def test_raster_pallas_interpret_matches_xla():
    geom, n, assets = _sphere_setup()
    bins = bin_meshlets(geom.bbox, geom.inst_valid, W, H, 16, 128, 1 << 10)
    depth_x, vis_x = rasterize_xla(geom.setup, bins, H, W, 16, 128)
    depth_p, vis_p = rasterize_pallas(
        geom.setup, bins, H, W, 16, 128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(depth_p), np.asarray(depth_x), atol=0)
    np.testing.assert_array_equal(np.asarray(vis_p), np.asarray(vis_x))


def test_rasterize_api_end_to_end():
    geom, n, assets = _sphere_setup()
    cfg = RasterConfig(backend="xla", pair_capacity=1 << 10)
    depth, vis, bins = rasterize(geom, H, W, cfg)
    assert depth.shape == (H, W) and vis.shape == (H, W)


def test_binning_exact_ranges():
    # one fake instance covering pixels [10..70) x [20..200) -> tiles known
    bbox = jnp.array([[20.0, 10.0, 200.0, 70.0]])
    valid = jnp.array([True])
    bins = bin_meshlets(bbox, valid, 256, 128, 16, 128, 64)
    # tile grid: ntx=2, nty=8; x tiles 0..1, y tiles 0..4 (70/16=4.375)
    counts = np.asarray(bins.tile_count).reshape(8, 2)
    expect = np.zeros((8, 2), np.int32)
    expect[0:5, 0] = 1  # x in [20,200) covers tile x0 (0..128) and x1 (128..256)
    expect[0:5, 1] = 1
    np.testing.assert_array_equal(counts, expect)
    slots = np.asarray(bins.pair_slot)
    assert (slots[:10] == 0).all() and (slots[10:] == -1).all()


def test_binning_overflow_flag():
    bbox = jnp.tile(jnp.array([[0.0, 0.0, 256.0, 128.0]]), (100, 1))
    valid = jnp.ones(100, bool)
    bins = bin_meshlets(bbox, valid, 256, 128, 16, 128, 64)
    assert bool(bins.overflow)

def test_near_crossing_bbox_is_conservative():
    """Meshlets crossing the near plane get a tight wedge bbox (no
    full-screen fallback). Conservativeness check: binning with the
    computed bboxes must produce the same image as binning every meshlet
    to every tile."""
    store = AssetStore(AssetCaps())
    store.add_material()
    mesh_id = store.add_mesh(proc.plane(size=50.0), build_lods=False)
    sp = store.add_mesh(proc.uv_sphere(rings=8, sectors=16), build_lods=False)
    assets, meta = store.to_device()
    ids, mats = [], []
    for mid, mat in (
        (mesh_id, np.eye(4, dtype=np.float32)),  # huge ground plane
        (sp, np.diag([1, 1, 1, 1]).astype(np.float32)),
    ):
        n = int(np.asarray(assets.mesh_lod_count)[mid, 0])
        off = int(np.asarray(assets.mesh_lod_offset)[mid, 0])
        ids += list(range(off, off + n))
        mats += [mat] * n
    meshlet_ids = jnp.asarray(ids, jnp.int32)
    mats = jnp.asarray(np.stack(mats))
    # camera close to the plane, looking along it -> plane crosses w=0
    view = make_perspective_view(
        eye=(0.0, 0.3, 4.0), target=(0.0, 0.0, 0.0), aspect=W / H
    )
    geom = process_geometry(assets, meshlet_ids, mats, view.view_proj, W, H)
    bbox = np.asarray(geom.bbox)
    valid = np.asarray(geom.tri_valid)
    assert valid.any()
    # the scene must actually exercise the near-crossing path: some valid
    # triangle has a corner behind the near plane
    tri_pos = np.asarray(assets.tri_pos)[np.asarray(meshlet_ids)].reshape(
        -1, 64, 3, 3
    )
    ph = np.concatenate([tri_pos, np.ones_like(tri_pos[..., :1])], axis=-1)
    mvp = np.einsum("ab,ibc->iac", np.asarray(view.view_proj), np.asarray(mats))
    w = np.einsum("iab,itcb->itca", mvp, ph)[..., 3]
    assert ((w < 1e-4).any(axis=-1) & valid).any()
    bins = bin_meshlets(geom.bbox, geom.inst_valid, W, H, 16, 128, 1 << 11)
    assert not bool(bins.overflow)
    full = jnp.tile(
        jnp.array([[0.0, 0.0, float(W), float(H)]]), (len(ids), 1)
    )
    bins_full = bin_meshlets(full, geom.inst_valid, W, H, 16, 128, 1 << 11)
    assert not bool(bins_full.overflow)
    d1, v1 = rasterize_xla(geom.setup, bins, H, W, 16, 128)
    d2, v2 = rasterize_xla(geom.setup, bins_full, H, W, 16, 128)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # and the bboxes are actually tighter than full screen for some meshlet
    area = (bbox[:, 2] - bbox[:, 0]).clip(0) * (bbox[:, 3] - bbox[:, 1]).clip(0)
    assert (area < W * H).any()

def test_gbuffer_pallas_matches_xla_with_earlyz():
    """G-buffer differential: pallas-interpret vs XLA twin, with
    front-to-back pair ordering + per-pair early-z skip enabled. Also
    checks skip invariance: depth/vis identical to a no-skip render."""
    from orbit_tpu.raster.raster_pallas import rasterize_pallas_gbuffer
    from orbit_tpu.raster.raster_xla import rasterize_xla_gbuffer

    geom, n, assets = _sphere_setup()
    bins = bin_meshlets(
        geom.bbox, geom.inst_valid, W, H, 16, 128, 1 << 10,
        max_z=geom.max_z,
    )
    assert not bool(bins.overflow)
    d_x, v_x, g_x = rasterize_xla_gbuffer(
        geom.setup, assets.tri_ac, bins, H, W, 16, 128,
        inst_mid=geom.inst_mid,
    )
    d_p, v_p, g_p = rasterize_pallas_gbuffer(
        geom.setup, assets.tri_ac, bins, H, W, 16, 128, interpret=True,
        inst_mid=geom.inst_mid,
    )
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_x))
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_x))
    np.testing.assert_array_equal(np.asarray(g_p), np.asarray(g_x))

    # skip must be invisible on depth/vis (overdraw legitimately differs:
    # early-z discards occluded fragments like hardware early-Z would)
    bins_ns = bin_meshlets(geom.bbox, geom.inst_valid, W, H, 16, 128, 1 << 10)
    d_n, v_n, _ = rasterize_xla_gbuffer(
        geom.setup, assets.tri_ac, bins_ns, H, W, 16, 128,
        inst_mid=geom.inst_mid,
    )
    np.testing.assert_array_equal(np.asarray(d_x), np.asarray(d_n))
    # vis can differ only on exact-z ties reordered by the depth sort
    agree = (np.asarray(v_x) == np.asarray(v_n)).mean()
    assert agree > 0.999, f"vis agreement {agree}"


def test_gbuffer_32row_8chunk_matches_defaults():
    """n_chunks=8 at 32-row tiles (the shape that unlocks pair-count
    savings for the G-buffer kernel): pallas-interpret == XLA twin at
    (32, 8), and depth equals the default (16, 4) shape's image
    exactly (rasterization is tile-shape invariant; vis may differ
    only on exact-z ties reordered by the per-tile pair order)."""
    from orbit_tpu.raster.raster_pallas import rasterize_pallas_gbuffer
    from orbit_tpu.raster.raster_xla import rasterize_xla_gbuffer

    geom, n, assets = _sphere_setup()
    bins8 = bin_meshlets(
        geom.bbox, geom.inst_valid, W, H, 32, 128, 1 << 10,
        max_z=geom.max_z, n_chunks=8,
    )
    assert not bool(bins8.overflow)
    d_x, v_x, g_x = rasterize_xla_gbuffer(
        geom.setup, assets.tri_ac, bins8, H, W, 32, 128,
        inst_mid=geom.inst_mid, n_chunks=8,
    )
    d_p, v_p, g_p = rasterize_pallas_gbuffer(
        geom.setup, assets.tri_ac, bins8, H, W, 32, 128, interpret=True,
        inst_mid=geom.inst_mid, n_chunks=8,
    )
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_x))
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_x))
    np.testing.assert_array_equal(np.asarray(g_p), np.asarray(g_x))

    bins4 = bin_meshlets(
        geom.bbox, geom.inst_valid, W, H, 16, 128, 1 << 10,
        max_z=geom.max_z,
    )
    d_4, v_4, _ = rasterize_xla_gbuffer(
        geom.setup, assets.tri_ac, bins4, H, W, 16, 128,
        inst_mid=geom.inst_mid,
    )
    np.testing.assert_array_equal(np.asarray(d_x), np.asarray(d_4))
    agree = (np.asarray(v_x) == np.asarray(v_4)).mean()
    assert agree > 0.999, f"vis agreement {agree}"
