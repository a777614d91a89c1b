"""Cascaded shadow map tests: a sphere over a ground plane with one
directional light must darken the ground beneath the sphere."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbit_tpu.assets import AssetStore, AssetCaps
from orbit_tpu.assets import procedural as proc
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.passes.shadow import ShadowSettings
from orbit_tpu.raster import RasterConfig
from orbit_tpu.scene import SceneBuilder, LIGHT_DIRECTIONAL

W, H = 96, 72


def _render(with_shadows: bool):
    store = AssetStore(AssetCaps())
    store.add_material(base_color=(0.8, 0.8, 0.8, 1), roughness=0.9)
    sphere_id = store.add_mesh(proc.uv_sphere(rings=8, sectors=16), build_lods=False)
    ground_id = store.add_mesh(proc.plane(20.0), build_lods=False)
    assets, ameta = store.to_device()

    sb = SceneBuilder()
    sb.add_entity(sphere_id, translation=(0.0, 1.2, 0.0))
    sb.add_entity(ground_id, translation=(0.0, 0.0, 0.0))
    # light straight overhead -> shadow directly under the sphere
    sb.add_light(
        LIGHT_DIRECTIONAL, direction=(0.05, 1.0, 0.05), intensity=3.0,
        inner_radius=0.3,
    )
    scene, smeta = sb.to_device()

    cfg = PipelineConfig(
        width=W, height=H,
        raster=RasterConfig(backend="xla", pair_capacity=1 << 12),
        cull=CullSettings(occlusion=False),
        instance_capacity=1 << 11,
        shadows=ShadowSettings(
            resolution=128, max_distance=20.0, blocker_samples=4,
            pcf_samples=4, cascade_count=2,
        )
        if with_shadows
        else None,
    )
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"],
        smeta.entity_mesh_host,
    )
    view = make_perspective_view(
        eye=(0.0, 3.5, 6.0), target=(0.0, 0.5, 0.0), aspect=W / H
    )
    out, _ = pipe.frame(
        assets, scene, view, None, pipe.initial_state(), smeta.num_lights
    )
    return np.asarray(out["color"]), np.asarray(out["vis"])


@pytest.mark.slow
def test_shadow_darkens_under_sphere():
    img_s, vis = _render(True)
    img_n, _ = _render(False)
    # find the ground pixel straight below the sphere center vs far corner
    # (image center-bottom area is under the sphere)
    cy, cx = int(H * 0.62), W // 2
    under = img_s[cy, cx].astype(int).sum()
    under_nos = img_n[cy, cx].astype(int).sum()
    assert under < under_nos * 0.7, (
        f"shadowed ground not darker: {under} vs {under_nos}"
    )
    # a far ground pixel stays lit (within noise)
    fy, fx = int(H * 0.62), int(W * 0.15)
    far_s = img_s[fy, fx].astype(int).sum()
    far_n = img_n[fy, fx].astype(int).sum()
    assert far_s > far_n * 0.7, f"lit ground got dark: {far_s} vs {far_n}"
