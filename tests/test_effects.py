"""Effects-stack test (benchmark config 3 shape): clustered point lights +
bloom + SSAO + 2x supersampling, end to end."""

import numpy as np
import pytest

from orbit_tpu.camera import make_perspective_view
from orbit_tpu.passes.bloom import BloomSettings
from orbit_tpu.passes.cluster import ClusterSettings
from orbit_tpu.passes.ssao import SsaoSettings
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.raster import RasterConfig
from orbit_tpu.scenes import sponza_scene
from orbit_tpu.shade import ibl as ibl_mod
from orbit_tpu.assets import procedural as proc

W, H = 96, 64


@pytest.fixture(scope="module")
def world():
    store, sb = sponza_scene(point_lights=40)
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    env = ibl_mod.build_environment(
        proc.gradient_envmap(64, 32), cube_res=32, irr_res=8,
        spec_mips=3, spec_samples=8, brdf_res=16, brdf_samples=16,
    )
    return store, assets, ameta, scene, smeta, env


def _run(world, **cfg_kw):
    store, assets, ameta, scene, smeta, env = world
    cfg = PipelineConfig(
        width=W, height=H,
        raster=RasterConfig(backend="xla", pair_capacity=1 << 13),
        cull=CullSettings(occlusion=False),
        instance_capacity=1 << 13,
        **cfg_kw,
    )
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"], smeta.entity_mesh_host
    )
    view = make_perspective_view(
        eye=(-14.0, 2.2, 0.0), target=(10.0, 2.0, 0.5), aspect=W / H
    )
    out, _ = pipe.frame(
        assets, scene, view, env, pipe.initial_state(), smeta.num_lights
    )
    return out


@pytest.mark.slow
def test_clustered_lights_match_brute_force(world):
    """Clustered point-light shading must equal evaluating every light."""
    out_c = _run(world, clusters=ClusterSettings(tile_px=16, z_slices=8))
    out_b = _run(world)  # brute force: all lights in the shade loop
    a = np.asarray(out_c["color"]).astype(int)
    b = np.asarray(out_b["color"]).astype(int)
    # tolerance: cluster culling drops lights below the luminance cutoff
    # attenuation radius, which the brute-force path keeps
    diff = np.abs(a - b)
    assert (diff <= 12).mean() > 0.995, f"clustered != brute: {diff.mean()}"


@pytest.mark.slow
def test_full_effects_stack(world):
    out = _run(
        world,
        clusters=ClusterSettings(tile_px=16, z_slices=8),
        bloom=BloomSettings(mip_count=3),
        ssao=SsaoSettings(samples=4),
        supersample=2,
    )
    img = np.asarray(out["color"])
    assert img.shape == (H, W, 3)
    assert img.std() > 10 and img.max() > 60
    assert not bool(out["overflow"])


@pytest.mark.slow
def test_cluster_heatmap_mode(world):
    out = _run(
        world, clusters=ClusterSettings(tile_px=16, z_slices=8), render_mode=8
    )
    img = np.asarray(out["color"])
    assert img.max() > 0  # heatmap rendered


def test_ssao_darkens_corners(world):
    out_ao = _run(world, ssao=SsaoSettings(samples=8, strength=1.5))
    out_no = _run(world)
    a = np.asarray(out_ao["color"]).astype(int).sum()
    b = np.asarray(out_no["color"]).astype(int).sum()
    assert a < b  # AO can only darken
