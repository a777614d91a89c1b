"""Cumulative stage profiling of the FUSED frame path at bench settings.

Each step extends one jit by the next pipeline stage; deltas are true
in-context stage costs (honest sync-mode timing, see devtime.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from devtime import force_sync_mode
from orbit_tpu.assets import procedural as proc
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.cull import (
    build_depth_pyramid,
    cull_entities,
    cull_meshlet_instances,
    expand_instances,
)
from orbit_tpu.cull.entity_cull import PASS_EARLY, PASS_LATE
from orbit_tpu.cull.visibility import gather_meshlet_bits
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.raster import RasterConfig, process_geometry, rasterize_gbuffer
from orbit_tpu.raster.layout import tiles_to_image
from orbit_tpu.scenes import BENCH_CAMERAS, bistro_scene
from orbit_tpu.shade import ibl as ibl_mod


def main():
    W, H = 1920, 1080
    print("backend:", jax.default_backend())
    store, sb = bistro_scene()
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    env = ibl_mod.build_environment(
        proc.gradient_envmap(256, 128), cube_res=64, irr_res=16,
        spec_mips=4, spec_samples=64, brdf_res=64, brdf_samples=128,
    )
    cam = BENCH_CAMERAS["bistro"]
    view = make_perspective_view(
        eye=cam["eye"], target=cam["target"], aspect=W / H,
        fovy=np.radians(60.0),
    )
    cfg = PipelineConfig(
        width=W, height=H,
        raster=RasterConfig(
            backend="pallas", tile_h=16, tile_w=128, pair_capacity=12288
        ),
        cull=CullSettings(),
        instance_capacity=1 << 12,
        late_pair_capacity=1 << 13,
    )
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"], smeta.entity_mesh_host
    )
    th, tw = 16, 128
    lat = force_sync_mode()
    print(f"dispatch latency {lat*1e3:.2f} ms")

    common = dict(
        cull_planes=view.cull_planes, num_planes=view.num_cull_planes,
        znear=view.znear, zfar=view.zfar, p00=view.p00, p11=view.p11,
        is_ortho=False,
    )
    lod = dict(lod_base=4.0, lod_step=1.5, min_lod=0, max_lod=7)
    C = cfg.instance_capacity

    def upto(stage):
        def fn(assets, scene, view, state):
            from dataclasses import replace as _rp

            def one_pass(pass_id, pyramid, prev_e, init, base, cap_pair):
                draw_e, lod_idx, vis_e = cull_entities(
                    assets, scene, smeta.num_entities, cull_view=view.view,
                    occlusion_pass=pass_id, pyramid=pyramid,
                    prev_visible=prev_e, **common, **lod,
                )
                ie, im, il, iv, ovf = expand_instances(
                    assets, draw_e, lod_idx, scene.entity_mesh, C
                )
                prev_bits = gather_meshlet_bits(
                    state, pipe.vis_offsets, ie, il, iv
                )
                draw_m, vis_m = cull_meshlet_instances(
                    assets, scene, ie, im, iv, cull_view=view.view,
                    occlusion_pass=pass_id, pyramid=pyramid,
                    prev_visible=prev_bits, **common,
                )
                if stage == "cull" and pass_id == PASS_EARLY:
                    return ("STOP", (draw_m, vis_m, ie, im))
                geom = process_geometry(
                    assets, im, scene.entity_model[ie], view.view_proj,
                    W, H, inst_valid=draw_m,
                )
                if stage == "geom" and pass_id == PASS_EARLY:
                    return ("STOP", geom.setup)
                rcfg = cfg.raster
                if cap_pair:
                    rcfg = _rp(cfg.raster, pair_capacity=cap_pair)
                d, v, g, bins = rasterize_gbuffer(
                    geom, H, W, rcfg, init=init, vis_base_offset=base,
                    tiled_io=True, tri_ac=assets.tri_ac,
                )
                return (d, v, g, ie, il, iv, vis_m, vis_e)

        # staged body
            r1 = one_pass(PASS_EARLY, None, state.entity_visible, None,
                          0, 0)
            if isinstance(r1, tuple) and r1 and r1[0] == "STOP":
                return r1[1]
            d, v, g = r1[0], r1[1], r1[2]
            if stage == "raster_early":
                return d, v, g
            dimg = tiles_to_image(d, H, W, th, tw)
            pyr = build_depth_pyramid(dimg)
            if stage == "pyramid":
                return jax.tree.leaves(pyr)
            r2 = one_pass(PASS_LATE, pyr, None, (d, v, g), C,
                          cfg.late_pair_capacity)
            d2, v2, g2 = r2[0], r2[1], r2[2]
            if stage == "late":
                return d2, v2, g2
            from orbit_tpu.shade.fused import (
                shade_deferred_tiled, unpack_color,
            )

            color = shade_deferred_tiled(
                assets, scene, env, view, g2, d2, height=H, width=W,
                tile_h=th, tile_w=tw,
                light_kinds=tuple(smeta.light_types[:smeta.num_lights]),
                backend="pallas",
            )
            if stage == "shade":
                return color
            return unpack_color(color, H, W, th, tw)

        return jax.jit(fn)

    state = pipe.initial_state()
    # converge visibility with the real frame first
    frame = jax.jit(
        lambda a, s, v, e, st: pipe.frame(a, s, v, e, st, smeta.num_lights)
    )
    for _ in range(4):
        out, state = frame(assets, scene, view, env, state)
    jax.block_until_ready(out["color"])

    prev = 0.0
    for stage in (
        "cull", "geom", "raster_early", "pyramid", "late", "shade", "full"
    ):
        f = upto(stage)
        out = f(assets, scene, view, state)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = f(assets, scene, view, state)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n * 1e3 - lat * 1e3
        print(f"upto {stage:<14} {dt:9.2f} ms   (+{dt - prev:8.2f})")
        prev = dt


if __name__ == "__main__":
    main()
