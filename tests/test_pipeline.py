"""End-to-end pipeline tests: render small frames through the full
geometry -> raster -> resolve -> shade -> post path and sanity-check the
images (benchmark config 1 shape: PBR + IBL + skybox)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbit_tpu.assets import AssetStore, AssetCaps
from orbit_tpu.assets import procedural as proc
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.raster import RasterConfig
from orbit_tpu.renderer import RenderSettings, render_frame, static_instance_list
from orbit_tpu.scene import SceneBuilder, LIGHT_SKY, LIGHT_POINT, LIGHT_DIRECTIONAL
from orbit_tpu.shade import ibl as ibl_mod

W, H = 128, 96


@pytest.fixture(scope="module")
def world():
    store = AssetStore(AssetCaps())
    tex = store.add_texture(proc.checker_texture(64, tiles=8), srgb=True)
    mat_tex = store.add_material(
        base_color=(1, 1, 1, 1), roughness=0.4, metallic=0.1, base_color_tex=tex
    )
    mat_gold = store.add_material(
        base_color=(1.0, 0.77, 0.34, 1), roughness=0.3, metallic=1.0,
        emissive=(0.2, 0.1, 0.05),
    )
    sphere = proc.uv_sphere(rings=16, sectors=32)
    sphere.material = mat_gold
    sphere_id = store.add_mesh(sphere, build_lods=False)
    torus = proc.torus()
    torus.material = mat_tex
    torus_id = store.add_mesh(torus, build_lods=False)
    assets, ameta = store.to_device()

    sb = SceneBuilder()
    sb.add_entity(sphere_id, translation=(0, 0, 0))
    sb.add_entity(torus_id, translation=(0, -1.6, 0))
    sb.add_light(LIGHT_SKY, intensity=1.0)
    sb.add_light(
        LIGHT_DIRECTIONAL, direction=(0.5, 0.8, 0.3), color=(1, 0.95, 0.8),
        intensity=2.0,
    )
    sb.add_light(
        LIGHT_POINT, position=(2.0, 1.0, 2.0), color=(1, 0.2, 0.1),
        intensity=5.0, outer_radius=10.0,
    )
    scene, smeta = sb.to_device()

    env = ibl_mod.build_environment(
        proc.gradient_envmap(64, 32),
        cube_res=32,
        irr_res=8,
        spec_mips=3,
        spec_samples=16,
        brdf_res=32,
        brdf_samples=32,
    )
    return store, assets, ameta, scene, smeta, env


def _render(world, mode=0):
    store, assets, ameta, scene, smeta, env = world
    settings = RenderSettings(
        width=W,
        height=H,
        raster=RasterConfig(backend="xla", pair_capacity=1 << 11),
        render_mode=mode,
    )
    im, ie, iv = static_instance_list(store, smeta, 1 << 10)
    view = make_perspective_view(
        eye=(0.0, 0.8, 4.0), target=(0.0, -0.4, 0.0), aspect=W / H
    )
    return render_frame(
        assets, scene, view, env, im, ie, iv, smeta.num_lights, settings
    )


def test_full_frame_pbr_ibl(world):
    out = _render(world, mode=0)
    img = np.asarray(out["color"])
    assert img.shape == (H, W, 3) and img.dtype == np.uint8
    assert not bool(out["overflow"])
    vis = np.asarray(out["vis"])
    # both objects visible, plus sky background
    coverage = (vis != 0).mean()
    assert 0.1 < coverage < 0.9
    # sky background is bluish (gradient env): top corner pixel
    top = img[2, 2].astype(int)
    assert top[2] > top[0], f"sky not blue-ish: {top}"
    # the gold sphere center should be warm (r > b)
    center = img[H // 3, W // 2].astype(int)
    assert center[0] > center[2], f"gold not warm: {center}"
    # image has real dynamic range
    assert img.std() > 20


def test_debug_render_modes(world):
    for mode in (2, 3, 4, 5, 6, 9):
        img = np.asarray(_render(world, mode=mode)["color"])
        assert img.shape == (H, W, 3)
        assert img.max() > 0


def test_normals_mode_unit_vectors(world):
    out = _render(world, mode=2)
    # normals encoded 0.5n+0.5 then srgb'd — just check both hemispheres occur
    img = np.asarray(out["color"]).astype(np.float32) / 255.0
    vis = np.asarray(out["vis"]) != 0
    assert img[vis].std() > 0.1
