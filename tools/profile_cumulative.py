"""Cumulative stage profiling: each step adds one pipeline stage to a
single jitted function with proper argument passing (matching bench.py's
conditions exactly). The delta between steps is the true in-context cost."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from orbit_tpu.assets import procedural as proc
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.raster import RasterConfig
from orbit_tpu.scenes import BENCH_CAMERAS, bistro_scene
from orbit_tpu.shade import ibl as ibl_mod
from orbit_tpu.shade import pbr as pbr_mod
from orbit_tpu.shade.resolve import resolve_gbuffer


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
    cfg = PipelineConfig(
        width=W, height=H,
        raster=RasterConfig(
            backend="pallas" if backend == "tpu" else "xla",
            pair_capacity=1 << 15,
        ),
        cull=CullSettings(occlusion=False),
        instance_capacity=1 << 14,
    )
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"],
        smeta.entity_mesh_host,
    )
    state = pipe.initial_state()

    def upto(stage):
        def fn(assets, scene, view, state):
            (depth, vis, ie, im, setup, _, ovf) = pipe.cull_and_raster(
                assets, scene, view, state
            )
            if stage == "raster":
                return depth, vis
            inv_vp = jnp.linalg.inv(view.view_proj)
            gbuf = resolve_gbuffer(
                assets, vis, depth, setup, im, ie,
                scene.entity_normal_mat, inv_vp, W, H,
            )
            if stage == "resolve":
                return jax.tree.leaves(gbuf)
            surface = pbr_mod.evaluate_material(assets, gbuf)
            if stage == "material":
                return jax.tree.leaves(surface)
            shaded = pbr_mod.shade(
                surface, gbuf, scene, smeta.num_lights, view.eye, env
            )
            if stage == "shade":
                return shaded
            from orbit_tpu.passes import post as post_mod
            from orbit_tpu.renderer import camera_ray_dirs

            hdr = shaded.reshape(H, W, 3)
            dirs = camera_ray_dirs(view, W, H)
            sky = ibl_mod.sample_background(env, dirs)
            hdr = jnp.where(gbuf.valid.reshape(H, W, 1), hdr, sky)
            return post_mod.to_u8(post_mod.tonemap(hdr))

        return jax.jit(fn)

    prev = 0.0
    for stage in ("raster", "resolve", "material", "shade", "post"):
        f = upto(stage)
        out = f(assets, scene, view, state)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = f(assets, scene, view, state)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"upto {stage:<10} {dt:9.2f} ms   (+{dt - prev:8.2f})")
        prev = dt


if __name__ == "__main__":
    main()
