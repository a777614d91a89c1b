"""Fused-shade effects coverage: CSM lit planes, VSM filtering,
per-tile clustered point lights, bloom HDR-tile output, the cull-stage
alpha-mode filter, and a2c sharpening.

Parity strategy (mirrors test_fused_shade.py): the Pallas kernel in
interpret mode must be bit-identical to the XLA twin; the fused path vs
the legacy op-by-op path is compared with a small u8 tolerance (FP
compilation-context noise only).
"""

from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orbit_tpu.assets import AssetCaps, AssetStore
from orbit_tpu.assets import procedural as proc
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.passes.bloom import BloomSettings
from orbit_tpu.passes.cluster import ClusterSettings
from orbit_tpu.passes.shadow import ShadowSettings
from orbit_tpu.passes.ssao import SsaoSettings
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.raster import RasterConfig
from orbit_tpu.scene import (
    LIGHT_DIRECTIONAL,
    LIGHT_POINT,
    LIGHT_SKY,
    SceneBuilder,
)
from orbit_tpu.shade import ibl as ibl_mod

pytestmark = pytest.mark.slow  # full-pipeline/multichip lane


def _untextured_scene(point_lights=12):
    """Floor + occluders + props, NO textures (shading normal ==
    geometric normal, so the fused path's lit-plane bias math matches
    the legacy path exactly)."""
    rng = np.random.default_rng(7)
    store = AssetStore(
        AssetCaps(vertices=1 << 16, meshlets=1 << 10, texture_layers=4)
    )
    m_floor = store.add_material(base_color=(0.7, 0.68, 0.6, 1), roughness=0.85)
    m_box = store.add_material(base_color=(0.6, 0.3, 0.2, 1), roughness=0.5)
    m_ball = store.add_material(
        base_color=(0.8, 0.8, 0.85, 1), metallic=1.0, roughness=0.3
    )
    floor = proc.plane(30.0, segments=4); floor.material = m_floor
    box = proc.cube(1.0); box.material = m_box
    ball = proc.uv_sphere(0.6, rings=16, sectors=32); ball.material = m_ball
    f = store.add_mesh(floor, build_lods=False)
    b = store.add_mesh(box, build_lods=False)
    s = store.add_mesh(ball, build_lods=False)

    sb = SceneBuilder(entity_capacity=64, light_capacity=64)
    sb.add_entity(f)
    for i in range(8):
        sb.add_entity(
            b,
            translation=(-6 + i * 1.8, 1.0, (i % 3 - 1) * 2.5),
            scale=(1.0, float(rng.uniform(1.0, 2.5)), 1.0),
        )
    for i in range(6):
        sb.add_entity(s, translation=(-5 + i * 2.0, 0.6, 3.5))
    sb.add_light(LIGHT_SKY, intensity=0.5)
    sb.add_light(
        LIGHT_DIRECTIONAL, direction=(0.3, 0.9, 0.2),
        color=(1.0, 0.95, 0.9), intensity=3.0, inner_radius=0.4,
    )
    for i in range(point_lights):
        sb.add_light(
            LIGHT_POINT,
            position=(
                float(rng.uniform(-7, 7)), float(rng.uniform(0.5, 3.0)),
                float(rng.uniform(-3, 4)),
            ),
            color=(1.0, 0.7, 0.4),
            intensity=float(rng.uniform(1.0, 3.0)),
            outer_radius=4.0,
        )
    return store, sb


@pytest.fixture(scope="module")
def setup():
    store, sb = _untextured_scene()
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    env = ibl_mod.build_environment(
        proc.gradient_envmap(64, 32), cube_res=32, irr_res=8,
        spec_mips=3, spec_samples=16, brdf_res=32, brdf_samples=32,
    )
    W, H = 256, 192
    base = PipelineConfig(
        width=W, height=H,
        raster=RasterConfig(
            backend="xla", tile_h=16, tile_w=128, pair_capacity=1 << 11
        ),
        cull=CullSettings(occlusion=False),
        instance_capacity=1 << 9,
        shadows=ShadowSettings(
            resolution=256, cascade_count=2, max_distance=25.0,
            filter="vsm",
        ),
        clusters=ClusterSettings(tile_light_cap=8),
        bloom=BloomSettings(),
        ssao=SsaoSettings(),
    )
    view = make_perspective_view(
        eye=(0.0, 4.0, 9.0), target=(0.0, 0.5, 0.0), aspect=W / H
    )

    def run(cfg):
        pipe = Pipeline(
            cfg, ameta, smeta, store.h["mesh_lod_count"],
            smeta.entity_mesh_host,
        )
        out, _ = jax.jit(
            lambda s: pipe.frame(
                assets, scene, view, env, s, smeta.num_lights
            )
        )(pipe.initial_state())
        return out

    return base, run


def test_fused_effects_match_legacy(setup):
    """Full stack (CSM-VSM + clusters + SSAO + bloom) through the fused
    path vs the legacy op-by-op path on an untextured scene."""
    base, run = setup
    out_f = run(base)
    out_l = run(replace(base, fused_shade=False))
    assert not bool(np.asarray(out_f["overflow"]))
    np.testing.assert_array_equal(
        np.asarray(out_f["depth"]), np.asarray(out_l["depth"])
    )
    vis = np.asarray(out_f["vis"])
    d = np.abs(
        np.asarray(out_f["color"]).astype(np.int32)
        - np.asarray(out_l["color"]).astype(np.int32)
    ).max(-1)
    valid = vis != 0
    # remaining sources of drift: the per-tile vs z-sliced point-light
    # accumulation order and bloom's downsample chain — pure FP noise
    assert d[valid].max() <= 2, f"valid-pixel diff {d[valid].max()}"
    assert (d != 0).mean() < 0.25


def test_fused_effects_interpret_matches_xla(setup):
    """The extended Pallas kernel (lit planes, AO plane, in-kernel tile
    light loop, HDR output) against its XLA twin. The shared-core math
    is identical; the per-tile point loop runs on row slices in the
    kernel vs full arrays in the twin, so FMA contraction may differ by
    1 ulp -> at most one u8 step."""
    base, run = setup
    out_x = run(base)
    out_i = run(
        replace(base, raster=replace(base.raster, backend="pallas_interpret"))
    )
    np.testing.assert_array_equal(
        np.asarray(out_i["vis"]), np.asarray(out_x["vis"])
    )
    d = np.abs(
        np.asarray(out_i["color"]).astype(np.int32)
        - np.asarray(out_x["color"]).astype(np.int32)
    )
    assert d.max() <= 1 and (d != 0).mean() < 0.01, (
        f"max {d.max()} frac {(d != 0).mean()}"
    )


def test_tile_light_lists_are_exact(setup):
    """Per-tile conservative culling with the attenuation curve's true
    zero radius drops NO radiance: every excluded light contributes
    exactly 0.0, so list shading equals brute force up to FP
    accumulation order (1 ulp)."""
    base, run = setup
    cfg = replace(base, bloom=None, ssao=None, shadows=None)
    out_lists = run(cfg)
    # brute force: no clusters -> every point light in the static loop
    out_brute = run(replace(cfg, clusters=None))
    vis = np.asarray(out_lists["vis"])
    d = np.abs(
        np.asarray(out_lists["color"]).astype(np.int32)
        - np.asarray(out_brute["color"]).astype(np.int32)
    ).max(-1)
    # accumulation ORDER differs (tile loop after the static loop vs
    # interleaved), so allow 1 u8 step of FP noise but nothing more —
    # a DROPPED light would show up as a much larger difference
    assert d[vis != 0].max() <= 1, f"tile-list shading diverged: {d.max()}"


def test_vsm_vs_pcss_shadow_agree(setup):
    """VSM and PCSS are different filters of the same shadow test: the
    hard-shadow interiors (umbra) and fully-lit areas must agree; only
    penumbra widths differ."""
    base, run = setup
    cfg = replace(base, bloom=None, ssao=None, clusters=None)
    out_vsm = run(cfg)
    out_pcss = run(
        replace(cfg, shadows=replace(cfg.shadows, filter="pcss"))
    )
    lv = np.asarray(out_vsm["color"]).astype(np.float32).mean(-1)
    lp = np.asarray(out_pcss["color"]).astype(np.float32).mean(-1)
    vis = np.asarray(out_vsm["vis"]) != 0
    # agreement on the vast majority of covered pixels
    close = np.abs(lv - lp) < 24
    assert close[vis].mean() > 0.9, f"agree {close[vis].mean():.3f}"


def test_transparent_meshlets_excluded():
    """TRANSPARENT materials: meshlets are filtered out of the opaque
    and shadow passes at the cull stage (the reference only ever draws
    OPAQUE|MASKED, forward.rs:276/383/528, shadow_renderer.rs:698)."""
    from orbit_tpu.assets.types import ALPHA_MODE_TRANSPARENT

    def build(transparent):
        store = AssetStore(
            AssetCaps(vertices=1 << 14, meshlets=1 << 8, texture_layers=4)
        )
        m_glass = store.add_material(
            base_color=(0.4, 0.6, 0.9, 0.4),
            alpha_mode=ALPHA_MODE_TRANSPARENT if transparent else 0,
        )
        m_floor = store.add_material(base_color=(0.8, 0.3, 0.2, 1))
        pane = proc.plane(3.0, segments=2); pane.material = m_glass
        floor = proc.plane(20.0, segments=2); floor.material = m_floor
        p = store.add_mesh(pane, build_lods=False)
        f = store.add_mesh(floor, build_lods=False)
        sb = SceneBuilder(entity_capacity=8, light_capacity=4)
        sb.add_entity(f)
        q = np.array([np.sin(np.pi / 4), 0, 0, np.cos(np.pi / 4)])
        sb.add_entity(p, translation=(0.0, 1.5, 0.0), rotation=q)
        sb.add_light(LIGHT_SKY, intensity=0.6)
        sb.add_light(
            LIGHT_DIRECTIONAL, direction=(0.0, 1.0, 0.2), intensity=3.0
        )
        return store, sb

    outs = {}
    for transparent in (False, True):
        store, sb = build(transparent)
        assets, ameta = store.to_device()
        scene, smeta = sb.to_device()
        assert ameta.has_transparent == transparent
        cfg = PipelineConfig(
            width=128, height=96,
            raster=RasterConfig(
                backend="xla", tile_h=16, tile_w=128, pair_capacity=256
            ),
            cull=CullSettings(occlusion=False),
            instance_capacity=64,
            shadows=ShadowSettings(
                resolution=128, cascade_count=1, max_distance=12.0
            ),
        )
        pipe = Pipeline(
            cfg, ameta, smeta, store.h["mesh_lod_count"],
            smeta.entity_mesh_host,
        )
        view = make_perspective_view(
            eye=(0.0, 3.0, 6.0), target=(0.0, 0.8, 0.0), aspect=128 / 96
        )
        out, _ = jax.jit(
            lambda s, pipe=pipe, assets=assets, scene=scene, view=view,
            n=smeta.num_lights: pipe.frame(assets, scene, view, None, s, n)
        )(pipe.initial_state())
        outs[transparent] = out

    vis_op = np.asarray(outs[False]["vis"])
    vis_tr = np.asarray(outs[True]["vis"])
    # opaque pane covers pixels; transparent pane must not
    pane_px_op = (vis_op != 0).sum()
    pane_px_tr = (vis_tr != 0).sum()
    assert pane_px_tr < pane_px_op, "transparent pane still rasterized"
    # and the transparent pane casts no shadow: on pixels showing the
    # same surface in both variants (the floor), the transparent frame
    # must be at least as bright
    lum_op = np.asarray(outs[False]["color"]).astype(np.float32).mean(-1)
    lum_tr = np.asarray(outs[True]["color"]).astype(np.float32).mean(-1)
    same = (vis_op != 0) & (vis_op == vis_tr)
    assert same.sum() > 500
    assert (lum_tr + 2 >= lum_op)[same].mean() > 0.99
    # the opaque pane's shadow must exist for the comparison to mean
    # anything: somewhere on the shared floor the transparent frame is
    # strictly brighter
    assert ((lum_tr > lum_op + 10) & same).sum() > 20


def test_a2c_coverage_test_unit():
    """alpha_coverage_test: k=1 reduces to the plain cutoff; k=2
    dissolves a soft edge across the 4 ordered sub-sample thresholds
    (forward_depth_prepass.frag:35-57 behavior)."""
    from orbit_tpu.raster.kernel_common import alpha_coverage_test

    s = jnp.full((4,), 0.01)  # slightly above cutoff
    g = jnp.full((4,), 0.04)  # soft gradient
    duv = jnp.full((4,), 1.0 / 64.0)  # one texel per pixel
    xi = jnp.array([0, 1, 0, 1])
    yi = jnp.array([0, 0, 1, 1])
    # k=1: all kept (s > 0)
    k1 = alpha_coverage_test(s, g, duv, xi, yi, 1)
    assert bool(jnp.all(k1))
    # k=2: sharp = 0.01/0.04 + 0.5 = 0.75 -> kept for thresholds
    # 0.125, 0.375, 0.625 but dropped at 0.875 (partial coverage)
    k2 = np.asarray(alpha_coverage_test(s, g, duv, xi, yi, 2))
    assert k2.sum() == 3, k2
    # deep inside the shape (large s): all sub-samples kept
    k2_in = np.asarray(
        alpha_coverage_test(jnp.full((4,), 0.5), g, duv, xi, yi, 2)
    )
    assert k2_in.sum() == 4
