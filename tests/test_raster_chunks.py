"""Chained raster calls: pair capacities above one call's SMEM budget
run as multiple kernel invocations composited in place — results must be
identical to the single-call XLA reference."""

import numpy as np
import jax
import pytest

import orbit_tpu.raster.raster_pallas as rp
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.raster import RasterConfig, process_geometry, rasterize_gbuffer
from orbit_tpu.renderer import static_instance_list
from orbit_tpu.scenes import helmet_scene


def test_chained_calls_match_xla(monkeypatch):
    # force chaining at a tiny chunk size so the CPU test exercises the
    # multi-call path the XL bench uses at 147k-pair capacity
    monkeypatch.setattr(rp, "_MAX_PAIRS_PER_CALL", 512)

    store, sb = helmet_scene(detail=12)
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    im, ie, iv = static_instance_list(store, smeta, 1024)
    W, H = 256, 128
    view = make_perspective_view(
        eye=(0.0, 0.25, 2.6), target=(0.0, 0.0, 0.0), aspect=W / H
    )
    geom = process_geometry(
        assets, im, scene.entity_model[ie], view.view_proj, W, H,
        inst_valid=iv,
    )
    cfg_i = RasterConfig(
        backend="pallas_interpret", tile_h=16, tile_w=128,
        pair_capacity=2048,  # 4 chained calls of 512
    )
    cfg_x = RasterConfig(
        backend="xla", tile_h=16, tile_w=128, pair_capacity=2048
    )
    d_i, v_i, g_i, bins_i = jax.jit(
        lambda: rasterize_gbuffer(geom, H, W, cfg_i, tri_ac=assets.tri_ac)
    )()
    d_x, v_x, g_x, _ = jax.jit(
        lambda: rasterize_gbuffer(geom, H, W, cfg_x, tri_ac=assets.tri_ac)
    )()
    assert not bool(bins_i.overflow)
    assert (np.asarray(v_x) != 0).mean() > 0.05
    np.testing.assert_array_equal(np.asarray(d_i), np.asarray(d_x))
    np.testing.assert_array_equal(np.asarray(v_i), np.asarray(v_x))
    np.testing.assert_array_equal(np.asarray(g_i), np.asarray(g_x))
