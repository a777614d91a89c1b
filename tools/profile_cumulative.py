"""Cumulative stage profiling of the v2 pipeline (honest sync-mode timing).

Each step adds one pipeline stage inside a single jit; deltas are true
in-context stage costs."""

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
from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
from orbit_tpu.raster import RasterConfig
from orbit_tpu.scenes import BENCH_CAMERAS, bistro_scene
from orbit_tpu.shade import gbuffer as gbuffer_mod
from orbit_tpu.shade import ibl as ibl_mod
from orbit_tpu.shade import pbr as pbr_mod


def main():
    W, H = 1920, 1080
    print("backend:", jax.default_backend())

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
        raster=RasterConfig(backend="pallas", pair_capacity=1 << 15),
        cull=CullSettings(),
        instance_capacity=1 << 14,
    )
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"], smeta.entity_mesh_host
    )
    state = pipe.initial_state()
    lat = force_sync_mode()
    print(f"dispatch latency {lat*1e3:.2f} ms")

    def upto(stage):
        def fn(assets, scene, view, state):
            depth, vis, gb, _, _, _, _ = pipe.cull_and_raster(
                assets, scene, view, state
            )
            if stage == "raster":
                return depth, vis, gb
            inv_vp = jnp.linalg.inv(view.view_proj)
            surface, gbuf = gbuffer_mod.surface_from_gbuffer(
                assets, gb, depth, vis, inv_vp, texture_filter="nearest"
            )
            if stage == "surface":
                return jax.tree.leaves(surface)
            from orbit_tpu.renderer import camera_ray_dirs
            from orbit_tpu.math.transforms import normalize as _nrm

            vdir = _nrm(view.eye[None, :] - gbuf.world_pos)
            rdir = (
                2.0 * jnp.sum(surface.normal * vdir, -1, keepdims=True)
                * surface.normal - vdir
            )
            bg = camera_ray_dirs(view, W, H).reshape(-1, 3)
            dir_all = jnp.where(gbuf.valid[:, None], rdir, bg)
            rough_all = jnp.where(gbuf.valid, surface.roughness, 0.0)
            spec = ibl_mod.sample_specular(env, dir_all, rough_all, mode="nearest")
            if stage == "spec":
                return spec
            shaded = pbr_mod.shade(
                surface, gbuf, scene, smeta.num_lights, view.eye, env,
                spec_sample=spec,
            )
            if stage == "shade":
                return shaded
            from orbit_tpu.passes import post as post_mod

            hdr = shaded.reshape(H, W, 3)
            hdr = jnp.where(
                gbuf.valid.reshape(H, W, 1), hdr, spec.reshape(H, W, 3)
            )
            return post_mod.to_u8(post_mod.tonemap(hdr))

        return jax.jit(fn)

    prev = 0.0
    for stage in ("raster", "surface", "spec", "shade", "post"):
        f = upto(stage)
        out = f(assets, scene, view, state)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = f(assets, scene, view, state)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n * 1e3 - lat * 1e3
        print(f"upto {stage:<10} {dt:9.2f} ms   (+{dt - prev:8.2f})")
        prev = dt


if __name__ == "__main__":
    main()
