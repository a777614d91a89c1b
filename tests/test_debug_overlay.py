"""In-frame debug overlays: bounding spheres, frustum, cascades,
wireframe composited inside one jitted frame (reference:
debug_renderer.rs wired into App::render)."""

import numpy as np
import jax
import pytest

from orbit_tpu.camera import make_perspective_view
from orbit_tpu.passes.debug_overlay import DebugSettings
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.raster import RasterConfig
from orbit_tpu.scenes import helmet_scene


@pytest.fixture(scope="module")
def setup():
    store, sb = helmet_scene(detail=12)
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    return store, assets, ameta, scene, smeta


def _run(setup, debug, **kw):
    store, assets, ameta, scene, smeta = setup
    cfg = PipelineConfig(
        width=128, height=96,
        raster=RasterConfig(
            backend="xla", tile_h=16, tile_w=128, pair_capacity=1 << 10
        ),
        cull=CullSettings(occlusion=False),
        instance_capacity=1 << 10,
        debug=debug,
        **kw,
    )
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"], smeta.entity_mesh_host
    )
    view = make_perspective_view(
        eye=(0.0, 0.3, 3.0), target=(0.0, 0.0, 0.0), aspect=128 / 96
    )
    out, _ = jax.jit(
        lambda s: pipe.frame(assets, scene, view, None, s, smeta.num_lights)
    )(pipe.initial_state())
    return out


@pytest.mark.slow
def test_overlays_change_the_image(setup):
    base = _run(setup, None)
    dbg = _run(
        setup,
        DebugSettings(
            entity_spheres=True, meshlet_spheres=True, frustum=True,
            wireframe_entity=0,
        ),
    )
    a = np.asarray(base["color"]).astype(np.int32)
    b = np.asarray(dbg["color"]).astype(np.int32)
    diff = (np.abs(a - b).max(-1) > 4).mean()
    assert 0.001 < diff < 0.6, f"overlay coverage {diff:.4f}"
    # depth/vis untouched by overlays
    np.testing.assert_array_equal(
        np.asarray(base["depth"]), np.asarray(dbg["depth"])
    )


@pytest.mark.slow
def test_overlay_off_is_identity(setup):
    base = _run(setup, None)
    off = _run(setup, DebugSettings())  # all flags false -> 1 degenerate seg
    np.testing.assert_array_equal(
        np.asarray(base["color"]), np.asarray(off["color"])
    )
