"""Multi-light CSM + shadow cull-plane parity (reference:
scene.rs:450-464 per-directional-light ShadowCommands and
shadow_renderer.rs:622-651 camera-frustum cull planes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orbit_tpu.assets import AssetCaps, AssetStore
from orbit_tpu.assets import procedural as proc
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.cull import cull_entities
from orbit_tpu.passes.shadow import ShadowSettings, cascade_views
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.raster import RasterConfig
from orbit_tpu.scene import LIGHT_DIRECTIONAL, LIGHT_SKY, SceneBuilder

pytestmark = pytest.mark.slow  # full-pipeline/multichip lane


def test_two_directional_lights_cast_disjoint_shadows():
    store = AssetStore(
        AssetCaps(vertices=1 << 14, meshlets=1 << 8, texture_layers=2)
    )
    m_floor = store.add_material(base_color=(0.9, 0.9, 0.9, 1))
    m_box = store.add_material(base_color=(0.4, 0.4, 0.9, 1))
    floor = proc.plane(30.0, segments=2)
    floor.material = m_floor
    box = proc.cube(1.0)
    box.material = m_box
    f = store.add_mesh(floor, build_lods=False)
    b = store.add_mesh(box, build_lods=False)
    sb = SceneBuilder(entity_capacity=8, light_capacity=8)
    sb.add_entity(f)
    sb.add_entity(b, translation=(0.0, 1.5, 0.0))
    sb.add_light(LIGHT_SKY, intensity=0.3)
    # light A from +X above, light B from -X above: shadows land on
    # opposite sides of the box
    sb.add_light(
        LIGHT_DIRECTIONAL, direction=(0.8, 1.0, 0.0), intensity=2.5
    )
    sb.add_light(
        LIGHT_DIRECTIONAL, direction=(-0.8, 1.0, 0.0), intensity=2.5
    )
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    cfg = PipelineConfig(
        width=128, height=96,
        raster=RasterConfig(
            backend="xla", tile_h=16, tile_w=128, pair_capacity=512
        ),
        cull=CullSettings(occlusion=False),
        instance_capacity=128,
        shadows=ShadowSettings(
            resolution=128, cascade_count=1, max_distance=20.0
        ),
    )
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"], smeta.entity_mesh_host
    )
    view = make_perspective_view(
        eye=(0.0, 6.0, 8.0), target=(0.0, 0.0, 0.0), aspect=128 / 96
    )
    out, _ = jax.jit(
        lambda s: pipe.frame(assets, scene, view, None, s, smeta.num_lights)
    )(pipe.initial_state())
    lum = np.asarray(out["color"]).astype(np.float32).mean(-1)
    # shadow of light A (from +X) lands at -X of the box; light B's at +X.
    # Each shadowed strip is lit by the OTHER light, so both are dimmer
    # than open floor but brighter than full darkness.
    open_floor = np.median(lum[60:90, 4:40])
    left = lum[44:54, 40:60].min()
    right = lum[44:54, 68:88].min()
    assert left < open_floor * 0.85, (left, open_floor)
    assert right < open_floor * 0.85, (right, open_floor)


def test_camera_plane_culling_in_cascades():
    """A caster DOWN-light of the camera frustum is culled from the
    cascade (its shadow can't re-enter the frustum); a caster UP-light
    of the frustum is kept."""
    store = AssetStore(
        AssetCaps(vertices=1 << 12, meshlets=1 << 6, texture_layers=2)
    )
    store.add_material()
    ball = proc.uv_sphere(1.0, rings=8, sectors=16)
    m = store.add_mesh(ball, build_lods=False)
    sb = SceneBuilder(entity_capacity=8, light_capacity=2)
    # light straight overhead (+Y). Camera at origin looking -Z.
    # A: far BELOW the frustum -> its shadow falls further down, never
    #    into the frustum -> cullable (bottom plane faces the light)
    # B: far ABOVE the frustum -> its shadow falls INTO the frustum ->
    #    must be kept (top plane faces away from the light)
    sb.add_entity(m, translation=(0.0, -15.0, -20.0))  # A
    sb.add_entity(m, translation=(0.0, 15.0, -20.0))  # B
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()

    cam = make_perspective_view(
        eye=(0.0, 0.0, 0.0), target=(0.0, 0.0, -10.0), aspect=16 / 9
    )
    settings = ShadowSettings(cascade_count=1, max_distance=40.0)
    (cv, radius), = cascade_views(
        cam, np.radians(60.0), 16 / 9, (0.0, 1.0, 0.0), settings
    )
    assert int(cv.num_cull_planes) == 10  # 5 ortho + 5 camera planes
    draw, _, _ = cull_entities(
        assets, scene, smeta.num_entities,
        cull_view=cv.view, cull_planes=cv.cull_planes,
        num_planes=cv.num_cull_planes, is_ortho=True,
    )
    draw = np.asarray(draw)
    assert not draw[0], "down-light caster should be culled"
    assert draw[1], "up-light caster must be kept"
