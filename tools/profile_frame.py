"""Per-stage profiling of the bistro frame on the current backend.

Times each pipeline stage as its own jitted computation (the per-batch-ms
table the reference shows in its graph debugger)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from orbit_tpu.assets import procedural as proc
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.cull import (
    build_depth_pyramid, cull_entities, cull_meshlet_instances,
    expand_instances,
)
from orbit_tpu.cull.entity_cull import PASS_SINGLE
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.raster import RasterConfig, process_geometry
from orbit_tpu.raster.binning import bin_meshlets
from orbit_tpu.raster.raster_pallas import rasterize_pallas
from orbit_tpu.raster.raster_xla import rasterize_xla
from orbit_tpu.scenes import BENCH_CAMERAS, bistro_scene
from orbit_tpu.shade import ibl as ibl_mod
from orbit_tpu.shade import pbr as pbr_mod
from orbit_tpu.shade.resolve import resolve_gbuffer


def timed(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:<28} {dt:9.3f} ms")
    return out


def main():
    W, H = 1920, 1080
    backend = jax.default_backend()
    print("backend:", backend)

    store, sb = bistro_scene()
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    env = ibl_mod.build_environment(
        proc.gradient_envmap(128, 64), cube_res=64, irr_res=16,
        spec_mips=4, spec_samples=32, brdf_res=64, brdf_samples=64,
    )
    cam = BENCH_CAMERAS["bistro"]
    view = make_perspective_view(
        eye=cam["eye"], target=cam["target"], aspect=W / H,
        fovy=np.radians(60.0),
    )
    C = 1 << 14
    rc = RasterConfig(
        backend="pallas" if backend == "tpu" else "xla",
        pair_capacity=1 << 15,
    )

    def cull(scene_arr, vm):
        draw_e, lod_idx, _ = cull_entities(
            assets, scene_arr, smeta.num_entities,
            cull_view=vm, cull_planes=view.cull_planes,
            num_planes=view.num_cull_planes,
        )
        return expand_instances(
            assets, draw_e, lod_idx, scene_arr.entity_mesh, C
        )

    ie, im, il, iv, ovf = timed("entity_cull+expand", cull, scene, view.view)
    print("  instances:", int(np.asarray(iv).sum()), "overflow:", bool(ovf))

    def mcull(ie, im, iv):
        return cull_meshlet_instances(
            assets, scene, ie, im, iv, cull_view=view.view,
            cull_planes=view.cull_planes, num_planes=view.num_cull_planes,
        )

    draw_m, vis_m = timed("meshlet_cull", mcull, ie, im, iv)
    print("  drawn meshlets:", int(np.asarray(draw_m).sum()))

    def geom_fn(im, ie, dm):
        return process_geometry(
            assets, im, scene.entity_model[ie], view.view_proj, W, H,
            inst_valid=dm,
        )

    geom = timed("geometry", geom_fn, im, ie, draw_m)
    print("  valid tris:", int(np.asarray(geom.tri_valid).sum()))

    def bin_fn(bbox, valid):
        return bin_meshlets(bbox, valid, W, H, rc.tile_h, rc.tile_w, rc.pair_capacity)

    bins = timed("binning", bin_fn, geom.bbox, geom.inst_valid)
    print(
        "  pairs:", int(np.asarray(bins.pair_tile >= 0).sum()),
        "overflow:", bool(bins.overflow),
    )

    raster = rasterize_pallas if backend == "tpu" else rasterize_xla
    depth, vis = timed(
        "raster", lambda s, b: raster(s, b, H, W, rc.tile_h, rc.tile_w),
        geom.setup, bins,
    )
    print("  coverage:", float((np.asarray(vis) != 0).mean()))

    pyr = timed("hiz_pyramid", build_depth_pyramid, depth)

    inv_vp = jnp.linalg.inv(view.view_proj)
    gbuf = timed(
        "resolve",
        lambda vis, depth, setup: resolve_gbuffer(
            assets, vis, depth, setup, im, ie, scene.entity_normal_mat,
            inv_vp, W, H,
        ),
        vis, depth, geom.setup,
    )

    surface = timed(
        "material", lambda g: pbr_mod.evaluate_material(assets, g), gbuf
    )

    shaded = timed(
        "shade",
        lambda s, g: pbr_mod.shade(
            s, g, scene, smeta.num_lights, view.eye, env
        ),
        surface, gbuf,
    )

    from orbit_tpu.passes import post as post_mod
    from orbit_tpu.renderer import camera_ray_dirs

    def post_fn(shaded, valid):
        hdr = shaded.reshape(H, W, 3)
        dirs = camera_ray_dirs(view, W, H)
        sky = ibl_mod.sample_background(env, dirs)
        hdr = jnp.where(valid.reshape(H, W, 1), hdr, sky)
        return post_mod.to_u8(post_mod.tonemap(hdr))

    timed("sky+post", post_fn, shaded, gbuf.valid)


if __name__ == "__main__":
    main()
