"""Culling tests: frustum/cone/occlusion correctness, expansion exactness,
HiZ conservatism, and the golden invariant — a culled render must be
pixel-identical to the unculled render (culling may only remove what
cannot be seen)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbit_tpu.assets import AssetStore, AssetCaps
from orbit_tpu.assets import procedural as proc
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.cull import build_depth_pyramid, expand_instances
from orbit_tpu.cull.hiz import sample_pyramid_min
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.raster import RasterConfig
from orbit_tpu.scene import SceneBuilder, LIGHT_DIRECTIONAL

W, H = 128, 96


@pytest.fixture(scope="module")
def world():
    store = AssetStore(AssetCaps())
    store.add_material(base_color=(0.8, 0.8, 0.8, 1))
    sphere_id = store.add_mesh(proc.uv_sphere(rings=12, sectors=24))
    cube_id = store.add_mesh(proc.cube(2.0))
    assets, ameta = store.to_device()

    sb = SceneBuilder()
    # a row of spheres: some in front of the camera, some behind
    for x in (-12, -4, 0, 4, 12):
        sb.add_entity(sphere_id, translation=(x, 0, 0))
    # a big cube behind the camera (culled) and one hidden behind the wall
    sb.add_entity(cube_id, translation=(0, 0, 30))
    # wall in front of a hidden sphere
    sb.add_entity(cube_id, translation=(0, 0, -3), scale=(3, 3, 0.2))
    sb.add_entity(sphere_id, translation=(0, 0, -8))  # hidden behind wall
    sb.add_light(LIGHT_DIRECTIONAL, direction=(0.3, 1, 0.2), intensity=2)
    scene, smeta = sb.to_device()
    return store, assets, ameta, scene, smeta


def _pipeline(store, smeta, **cull_kw):
    cfg = PipelineConfig(
        width=W,
        height=H,
        raster=RasterConfig(backend="xla", pair_capacity=1 << 12),
        cull=CullSettings(**cull_kw),
        instance_capacity=1 << 11,
    )
    return cfg


def _render_n(world, cull_kw, frames=1):
    store, assets, ameta, scene, smeta = world
    cfg = _pipeline(store, smeta, **cull_kw)
    pipe = Pipeline(
        cfg, ameta, smeta,
        store.h["mesh_lod_count"], smeta.entity_mesh_host,
    )
    state = pipe.initial_state()
    view = make_perspective_view(
        eye=(0.0, 1.5, 6.0), target=(0.0, 0.0, -2.0), aspect=W / H
    )
    out = None
    for _ in range(frames):
        out, state = pipe.frame(
            assets, scene, view, None, state, smeta.num_lights
        )
    return out, state


@pytest.mark.slow
def test_culled_image_matches_unculled(world):
    out_off, _ = _render_n(
        world, dict(frustum=False, cone=False, occlusion=False)
    )
    out_on, _ = _render_n(
        world, dict(frustum=True, cone=True, occlusion=True), frames=3
    )
    assert not bool(out_on["overflow"]) and not bool(out_off["overflow"])
    img_off = np.asarray(out_off["color"])
    img_on = np.asarray(out_on["color"])
    mismatched = (img_off != img_on).any(axis=-1).mean()
    assert mismatched == 0.0, f"culling changed {mismatched:.4%} of pixels"


def test_culling_reduces_work(world):
    store, assets, ameta, scene, smeta = world
    # after convergence the hidden sphere + behind-camera cube meshlets
    # must be marked invisible
    _, state = _render_n(
        world, dict(frustum=True, cone=True, occlusion=True), frames=3
    )
    ev = np.asarray(state.entity_visible)[: smeta.num_entities]
    assert not ev[5], "cube behind camera still marked visible"
    assert not ev[7], "sphere behind wall still marked visible"
    assert ev[2], "front sphere should stay visible"


def test_expand_instances_exact(world):
    store, assets, ameta, scene, smeta = world
    E = smeta.entity_capacity
    should = np.zeros(E, bool)
    should[[1, 3, 6]] = True
    lod = np.zeros(E, np.int32)
    ie, im, il, iv, ovf = expand_instances(
        assets,
        jnp.asarray(should),
        jnp.asarray(lod),
        scene.entity_mesh,
        512,
    )
    assert not bool(ovf)
    ie, im, il, iv = map(np.asarray, (ie, im, il, iv))
    lod_cnt = np.asarray(assets.mesh_lod_count)
    lod_off = np.asarray(assets.mesh_lod_offset)
    emesh = smeta.entity_mesh_host
    expect_n = sum(lod_cnt[emesh[e], 0] for e in (1, 3, 6))
    assert iv.sum() == expect_n
    # each drawn entity contributes exactly its LOD0 meshlet range
    for e in (1, 3, 6):
        sel = ie[iv] == e
        got = np.sort(im[iv][sel])
        m = emesh[e]
        expect = np.arange(lod_off[m, 0], lod_off[m, 0] + lod_cnt[m, 0])
        np.testing.assert_array_equal(got, expect)


def test_depth_pyramid_min_property():
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(0.1, 1.0, (40, 56)).astype(np.float32))
    pyr = build_depth_pyramid(depth)
    # level 0: each texel <= min of its 2x2 source block
    l0 = np.asarray(pyr.data[: pyr.sizes[0][0] * pyr.sizes[0][1]]).reshape(
        pyr.sizes[0]
    )
    d = np.asarray(depth)
    for y in range(pyr.sizes[0][0]):
        for x in range(pyr.sizes[0][1]):
            block = d[2 * y : 2 * y + 2, 2 * x : 2 * x + 2]
            assert l0[y, x] <= block.min() + 1e-7
    # top level = global min (with 0-padding -> 0 if padded)
    top = np.asarray(pyr.data[-1])
    assert top <= d.min() + 1e-7
    # sampling returns conservative (<=) values
    uv = jnp.asarray(rng.uniform(0, 1, (64, 2)).astype(np.float32))
    lv = jnp.asarray(rng.integers(0, len(pyr.sizes), 64, dtype=np.int32))
    s = np.asarray(sample_pyramid_min(pyr, uv, lv))
    assert (s <= d.max()).all() and (s >= 0).all()


def test_frozen_camera_culling(world):
    """Reference F-key debug: cull with camera B while shading camera A's
    view — geometry outside B's frustum must disappear from A's image."""
    store, assets, ameta, scene, smeta = world
    cfg = _pipeline(store, smeta, frustum=True, cone=False, occlusion=False)
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"], smeta.entity_mesh_host
    )
    view = make_perspective_view(
        eye=(0.0, 1.5, 6.0), target=(0.0, 0.0, -2.0), aspect=W / H
    )
    # frozen cull camera looks the opposite way: everything gets culled
    frozen = make_perspective_view(
        eye=(0.0, 1.5, 6.0), target=(0.0, 0.0, 100.0), aspect=W / H
    )
    out_norm, _ = pipe.frame(
        assets, scene, view, None, pipe.initial_state(), smeta.num_lights
    )
    out_frozen, _ = pipe.frame(
        assets, scene, view, None, pipe.initial_state(), smeta.num_lights,
        cull_view=frozen.view,
    )
    cov_n = (np.asarray(out_norm["vis"]) != 0).mean()
    cov_f = (np.asarray(out_frozen["vis"]) != 0).mean()
    assert cov_n > 0.1
    assert cov_f < cov_n * 0.2, f"frozen cull did not cull: {cov_f} vs {cov_n}"
