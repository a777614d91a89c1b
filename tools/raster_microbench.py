"""Micro-benchmark the raster stages on the real TPU.

Builds the bench scene's early-pass inputs once, then times in isolation:
geometry, binning, depth-only kernel, G-buffer
kernel (normal + phase-2-suppressed via far-init depth), and the shade
kernel inputs. This is the drill-down for deciding where kernel work
goes (phase 1 vs phase 2 vs DMA).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, n=8, **kw):
    import jax

    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from orbit_tpu.camera import make_perspective_view
    from orbit_tpu.cull import cull_entities, expand_instances, cull_meshlet_instances
    from orbit_tpu.cull.entity_cull import PASS_SINGLE
    from orbit_tpu.raster import process_geometry
    from orbit_tpu.raster.binning import bin_meshlets
    from orbit_tpu.raster.raster_pallas import (
        rasterize_pallas,
        rasterize_pallas_gbuffer,
    )
    from orbit_tpu.scenes import bistro_flythrough, bistro_xl_scene

    W, H = 1920, 1080
    PAIR_CAP = 147456
    INST_CAP = 49152
    store, sb = bistro_xl_scene()
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    eye, look = bistro_flythrough(20, 40)
    view = make_perspective_view(
        eye=eye, target=look, aspect=W / H, fovy=np.radians(60.0)
    )

    common = dict(
        cull_view=view.view, cull_planes=view.cull_planes,
        num_planes=view.num_cull_planes, znear=view.znear, zfar=view.zfar,
        p00=view.p00, p11=view.p11, is_ortho=view.is_ortho,
    )

    @jax.jit
    def build_inputs(assets, scene):
        draw_e, lod_idx, _ = cull_entities(
            assets, scene, smeta.num_entities, occlusion_pass=PASS_SINGLE,
            pyramid=None, prev_visible=None, lod_base=3.0, lod_step=1.45,
            min_lod=0, max_lod=7, **common,
        )
        ie, im, il, iv, _ = expand_instances(
            assets, draw_e, lod_idx, scene.entity_mesh, INST_CAP
        )
        draw_m, _ = cull_meshlet_instances(
            assets, scene, ie, im, iv, occlusion_pass=PASS_SINGLE,
            pyramid=None, prev_visible=None, use_meshlet_occlusion=False,
            use_cone=True, **common,
        )
        return ie, im, iv, draw_m

    ie, im, iv, draw_m = jax.block_until_ready(build_inputs(assets, scene))
    print("valid instances:", int(jnp.sum(iv.astype(jnp.int32))),
          " drawn:", int(jnp.sum(draw_m.astype(jnp.int32))))

    geom_full = jax.jit(
        lambda a, s, im, ie, dm: process_geometry(
            a, im, s.entity_model[ie], view.view_proj, W, H,
            inst_valid=dm,
        )
    )
    t_geom = timeit(geom_full, assets, scene, im, ie, draw_m)
    print(f"geometry:         {t_geom:8.2f} ms")

    geom = jax.block_until_ready(geom_full(assets, scene, im, ie, draw_m))

    bins_f = jax.jit(
        lambda g: bin_meshlets(
            g.bbox, g.inst_valid, W, H, 16, 128, PAIR_CAP,
            max_z=g.max_z, group_align=8,
        )
    )
    t_bin = timeit(bins_f, geom)
    print(f"binning:          {t_bin:8.2f} ms")
    bins = jax.block_until_ready(bins_f(geom))
    print("real pairs:", int(jnp.sum((bins.pair_slot >= 0).astype(jnp.int32))))

    depth_only = jax.jit(
        lambda s, b: rasterize_pallas(
            s, b, H, W, 16, 128, pairs_per_step=8
        )
    )
    t_d = timeit(depth_only, geom.setup, bins)
    print(f"depth-only raster:{t_d:8.2f} ms")

    gbuf = jax.jit(
        lambda s, a, b: rasterize_pallas_gbuffer(
            s, a, b, H, W, 16, 128, pairs_per_step=8, tiled_io=True,
            inst_mid=geom.inst_mid,
        )
    )
    t_g = timeit(gbuf, geom.setup, assets.tri_ac, bins)
    print(f"gbuffer raster:   {t_g:8.2f} ms")

    # suppress phase 2: init depth = 1.0 everywhere -> nothing ever wins
    ntx, nty = -(-W // 128), -(-H // 16)
    ntp = -(-ntx * nty // 8) * 8
    init = (
        jnp.ones((ntp, 2048), jnp.float32),
        jnp.zeros((ntp, 2048), jnp.int32),
        jnp.zeros((ntp * 32, 2048), jnp.float32),
    )
    gbuf_p1 = jax.jit(
        lambda s, a, b, init: rasterize_pallas_gbuffer(
            s, a, b, H, W, 16, 128, pairs_per_step=8, tiled_io=True,
            init=init, inst_mid=geom.inst_mid,
        )
    )
    t_g1 = timeit(gbuf_p1, geom.setup, assets.tri_ac, bins, init)
    print(f"gbuffer phase1:   {t_g1:8.2f} ms   (phase2 ~ {t_g - t_g1:.2f})")


if __name__ == "__main__":
    main()
