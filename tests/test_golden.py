"""Golden-image regression harness.

BASELINE.json's correctness bar is "pixel-matching the reference within
tonemap tolerance"; the reference itself cannot run here (no Vulkan ICD,
no redistributable scenes), so the goldens are OUR renders of the three
procedural scenes at fixed cameras, stored in-repo. Any raster/shading
regression that changes the image beyond tonemap-level tolerance fails.

Regenerate after an INTENTIONAL image change with:
    ORBIT_REGEN_GOLDENS=1 python -m pytest tests/test_golden.py
and review the diffs by eye before committing.
"""

import os

import numpy as np
import jax
import pytest

from orbit_tpu.assets import procedural as proc
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.raster import RasterConfig
from orbit_tpu.scenes import (
    BENCH_CAMERAS,
    bistro_scene,
    helmet_scene,
    sponza_scene,
)
from orbit_tpu.shade import ibl as ibl_mod

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("ORBIT_REGEN_GOLDENS", "") == "1"
W, H = 256, 160


def _env():
    return ibl_mod.build_environment(
        proc.gradient_envmap(64, 32), cube_res=32, irr_res=8,
        spec_mips=3, spec_samples=16, brdf_res=32, brdf_samples=32,
    )


def _render(store, sb, cam, **cfg_kw):
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    env = _env()
    cfg = PipelineConfig(
        width=W, height=H,
        raster=RasterConfig(
            backend="xla", tile_h=16, tile_w=128, pair_capacity=1 << 13
        ),
        cull=CullSettings(),
        instance_capacity=1 << 12,
        **cfg_kw,
    )
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"], smeta.entity_mesh_host
    )
    view = make_perspective_view(
        eye=cam["eye"], target=cam["target"], aspect=W / H,
        fovy=np.radians(60.0),
    )
    frame = jax.jit(
        lambda st: pipe.frame(assets, scene, view, env, st, smeta.num_lights)
    )
    state = pipe.initial_state()
    for _ in range(3):  # converge two-pass visibility
        out, state = frame(state)
    assert not bool(np.asarray(out["overflow"]))
    return np.asarray(out["color"])


def _check(name, img):
    from PIL import Image

    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        Image.fromarray(img).save(path)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
        return
    ref = np.asarray(Image.open(path)).astype(np.int32)
    got = img.astype(np.int32)
    assert ref.shape == got.shape
    d = np.abs(ref - got)
    # tonemap tolerance: tiny FP drift may move a u8 by 1-2 steps at
    # quantization boundaries; a real regression moves many pixels a lot
    frac_big = (d > 2).mean()
    assert frac_big < 0.002, (
        f"golden {name}: {frac_big:.4%} of values differ by >2 steps "
        f"(max {d.max()})"
    )
    assert d.mean() < 0.5, f"golden {name}: mean diff {d.mean():.3f}"


def test_golden_helmet():
    store, sb = helmet_scene(detail=24)
    _check("helmet", _render(store, sb, BENCH_CAMERAS["helmet"]))


def test_golden_sponza():
    from orbit_tpu.passes.shadow import ShadowSettings

    store, sb = sponza_scene()
    _check(
        "sponza",
        _render(
            store, sb, BENCH_CAMERAS["sponza"],
            shadows=ShadowSettings(resolution=256, cascade_count=2),
        ),
    )


@pytest.mark.slow
def test_golden_bistro():
    store, sb = bistro_scene(buildings=16, props=60)
    _check("bistro", _render(store, sb, BENCH_CAMERAS["bistro"]))
