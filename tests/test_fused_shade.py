"""Fused deferred-shade kernel (shade/fused.py) vs the op-by-op XLA
shade path (the reference implementation).

The two paths compute identical formulas; residual differences are
XLA compilation-context FP noise (FMA contraction) amplified only where
a 1-ulp direction change flips a nearest-filter texel — bounded to a few
u8 steps on a small fraction of (mostly background) pixels.
"""

from dataclasses import replace

import numpy as np
import jax
import pytest

from orbit_tpu.assets import procedural as proc
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.raster import RasterConfig
from orbit_tpu.scenes import helmet_scene
from orbit_tpu.shade import ibl as ibl_mod


@pytest.fixture(scope="module")
def setup():
    store, sb = helmet_scene(detail=12)
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    env = ibl_mod.build_environment(
        proc.gradient_envmap(64, 32), cube_res=32, irr_res=8,
        spec_mips=3, spec_samples=16, brdf_res=32, brdf_samples=32,
    )
    W, H = 256, 192
    cfg = PipelineConfig(
        width=W, height=H,
        raster=RasterConfig(
            backend="xla", tile_h=16, tile_w=128, pair_capacity=1 << 11
        ),
        cull=CullSettings(),
        instance_capacity=1 << 10,
    )
    view = make_perspective_view(
        eye=(0.0, 0.25, 2.6), target=(0.0, 0.0, 0.0), aspect=W / H
    )

    def run(cfg):
        pipe = Pipeline(
            cfg, ameta, smeta, store.h["mesh_lod_count"],
            smeta.entity_mesh_host,
        )
        out, _ = jax.jit(
            lambda s: pipe.frame(assets, scene, view, env, s,
                                 smeta.num_lights)
        )(pipe.initial_state())
        return out

    return cfg, run


@pytest.mark.slow
def test_fused_matches_legacy_shade(setup):
    cfg, run = setup
    out_f = run(cfg)  # fused_shade=True by default
    out_l = run(replace(cfg, fused_shade=False))
    assert out_f["hdr"] is None  # fused path skips the HDR buffer
    np.testing.assert_array_equal(
        np.asarray(out_f["depth"]), np.asarray(out_l["depth"])
    )
    vis = np.asarray(out_f["vis"])
    np.testing.assert_array_equal(vis, np.asarray(out_l["vis"]))
    assert (vis != 0).mean() > 0.05

    c_f = np.asarray(out_f["color"]).astype(np.int32)
    c_l = np.asarray(out_l["color"]).astype(np.int32)
    d = np.abs(c_f - c_l).max(-1)
    valid = vis != 0
    # covered pixels: pure-math parity (no texel-flip amplification)
    assert d[valid].max() <= 1, f"valid-pixel diff {d[valid].max()}"
    # background: nearest env-texel flips allowed on a small fraction
    assert d.max() <= 4, f"max color diff {d.max()}"
    assert (d != 0).mean() < 0.25


@pytest.mark.slow
def test_fused_kernel_interpret_matches_xla_twin(setup):
    """The Pallas kernel logic (interpret mode) is bit-identical to the
    XLA twin — both run _shade_core on the same pre-gathered inputs."""
    cfg, run = setup
    out_x = run(cfg)
    out_i = run(
        replace(cfg, raster=replace(cfg.raster, backend="pallas_interpret"))
    )
    np.testing.assert_array_equal(
        np.asarray(out_i["color"]), np.asarray(out_x["color"])
    )
