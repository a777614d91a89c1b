"""Full-pipeline multi-chip sharding tests (8 virtual CPU devices).

The 'fb' axis shards the framebuffer into horizontal bands; 'view' is
data-parallel over cameras. Band binning + raster must be bit-identical
to the same rows of the full-screen raster (the per-tile pair stream and
pixel centers are identical by construction — see raster/binning.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orbit_tpu.camera import make_perspective_view
from orbit_tpu.parallel import frame_sharded, make_render_mesh, stack_pytrees
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.raster import RasterConfig, process_geometry, rasterize_gbuffer
from orbit_tpu.renderer import static_instance_list
from orbit_tpu.scenes import helmet_scene

pytestmark = pytest.mark.slow  # full-pipeline/multichip lane


@pytest.fixture(scope="module")
def helmet():
    store, sb = helmet_scene(detail=12)
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    return store, assets, ameta, scene, smeta


def test_band_raster_bit_identical(helmet):
    """rasterize_gbuffer(row_window) == the same rows of the full raster."""
    store, assets, ameta, scene, smeta = helmet
    W, H, tile_h = 256, 128, 16
    im, ie, iv = static_instance_list(store, smeta, 1024)
    view = make_perspective_view(
        eye=(0.0, 0.25, 2.6), target=(0.0, 0.0, 0.0), aspect=W / H
    )
    cfg = RasterConfig(
        backend="xla", tile_h=tile_h, tile_w=128, pair_capacity=1 << 11
    )
    geom = process_geometry(
        assets, im, scene.entity_model[ie], view.view_proj, W, H,
        inst_valid=iv,
    )
    d_full, v_full, g_full, _ = rasterize_gbuffer(
        geom, H, W, cfg, tri_ac=assets.tri_ac
    )
    band_fn = jax.jit(
        lambda r0: rasterize_gbuffer(
            geom, H, W, cfg, row_window=(r0, 2), tri_ac=assets.tri_ac
        )[:3]
    )
    for b in range(4):
        d, v, g = band_fn(jnp.int32(b * 2))
        rows = slice(b * 32, (b + 1) * 32)
        np.testing.assert_array_equal(np.asarray(d), np.asarray(d_full[rows]))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_full[rows]))
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(g_full[:, rows])
        )
    assert (np.asarray(v_full) != 0).mean() > 0.05


def test_frame_sharded_matches_single_device(helmet):
    """The FULL sharded frame (cull+raster+shade+post on a view x fb mesh)
    equals V single-device frames: depth/vis/visibility state bit-exact,
    color within 1 u8 step (FP contraction differs between compilation
    contexts; see __graft_entry__.dryrun_multichip)."""
    store, assets, ameta, scene, smeta = helmet
    from orbit_tpu.assets import procedural as proc
    from orbit_tpu.shade import ibl as ibl_mod

    env = ibl_mod.build_environment(
        proc.gradient_envmap(64, 32), cube_res=32, irr_res=8,
        spec_mips=3, spec_samples=16, brdf_res=32, brdf_samples=32,
    )
    mesh = make_render_mesh(jax.devices()[:8], 2)
    n_view, n_fb = mesh.shape["view"], mesh.shape["fb"]
    tile_h, W = 16, 256
    H = tile_h * n_fb * 2
    cfg = PipelineConfig(
        width=W, height=H,
        raster=RasterConfig(
            backend="xla", tile_h=tile_h, tile_w=128, pair_capacity=1 << 11
        ),
        cull=CullSettings(),
        instance_capacity=1 << 10,
    )
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"], smeta.entity_mesh_host
    )
    views = [
        make_perspective_view(
            eye=(0.4 * v, 0.25 + 0.15 * v, 2.6), target=(0.0, 0.0, 0.0),
            aspect=W / H,
        )
        for v in range(n_view)
    ]
    states = [pipe.initial_state() for _ in range(n_view)]
    color, hdr, depth, vis, overflow, new_state = frame_sharded(
        pipe, assets, scene, stack_pytrees(views), env,
        stack_pytrees(states), smeta.num_lights, mesh,
    )
    assert color.shape == (n_view, H, W, 3)
    assert not bool(np.asarray(overflow).any())
    frame1 = jax.jit(
        lambda v, s: pipe.frame(assets, scene, v, env, s, smeta.num_lights)
    )
    for v in range(n_view):
        out_ref, ns_ref = frame1(views[v], states[v])
        # depth: XLA recompiles the geometry math inside shard_map with
        # different FMA contraction, so setup coefficients (and therefore
        # depth) carry ulp-level noise; the visibility buffer (winner
        # ids) and the carried state must still match exactly
        np.testing.assert_allclose(
            np.asarray(depth[v]), np.asarray(out_ref["depth"]), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(vis[v]), np.asarray(out_ref["vis"])
        )
        np.testing.assert_array_equal(
            np.asarray(new_state.entity_visible[v]),
            np.asarray(ns_ref.entity_visible),
        )
        np.testing.assert_array_equal(
            np.asarray(new_state.meshlet_visible[v]),
            np.asarray(ns_ref.meshlet_visible),
        )
        c1 = np.asarray(color[v]).astype(np.int32)
        c2 = np.asarray(out_ref["color"]).astype(np.int32)
        assert np.abs(c1 - c2).max() <= 1
        assert (c1 != c2).mean() < 0.01
    assert (np.asarray(vis[0]) != 0).mean() > 0.05
