"""Experiment matrix for per-step raster kernel overhead on the TPU.

Times the depth-only and G-buffer kernels across pairs_per_step and
all-skip (init depth=1) variants, plus pair-count stats for alternative
tile shapes — the data behind the pair-record layout decision.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, n=8):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from orbit_tpu.camera import make_perspective_view
    from orbit_tpu.cull import (
        cull_entities,
        cull_meshlet_instances,
        expand_instances,
    )
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
        g = process_geometry(
            assets, im, scene.entity_model[ie], view.view_proj, W, H,
            inst_valid=draw_m,
        )
        return g

    geom = jax.block_until_ready(build_inputs(assets, scene))

    # pair counts per tile shape
    for th, tw in ((16, 128), (32, 64), (8, 256), (64, 32)):
        b = jax.jit(
            lambda bb, iv2, mz, th=th, tw=tw: bin_meshlets(
                bb, iv2, W, H, th, tw, PAIR_CAP, max_z=mz, group_align=8
            )
        )(geom.bbox, geom.inst_valid, geom.max_z)
        n = int(jnp.sum((b.pair_slot >= 0).astype(jnp.int32)))
        print(f"tile {th}x{tw}: real pairs {n}")

    bins_f = jax.jit(
        lambda bb, iv2, mz, ga: bin_meshlets(
            bb, iv2, W, H, 16, 128, PAIR_CAP, max_z=mz, group_align=ga
        ),
        static_argnums=(3,),
    )
    ntx, nty = -(-W // 128), -(-H // 16)
    ntp = -(-ntx * nty // 8) * 8
    far_init = (
        jnp.ones((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.int32),
    )
    far_init_g = (
        jnp.ones((ntp, 2048), jnp.float32),
        jnp.zeros((ntp, 2048), jnp.int32),
        jnp.zeros((ntp * 32, 2048), jnp.float32),
    )

    for pack in (8, 16):
        bins = jax.block_until_ready(
            bins_f(geom.bbox, geom.inst_valid, geom.max_z, pack)
        )
        d_full = jax.jit(
            lambda s, b, pack=pack: rasterize_pallas(
                s, b, H, W, 16, 128, pairs_per_step=pack
            )
        )
        d_skip = jax.jit(
            lambda s, b, init, pack=pack: rasterize_pallas(
                s, b, H, W, 16, 128, pairs_per_step=pack, init=init
            )
        )
        g_full = jax.jit(
            lambda s, a, b, pack=pack: rasterize_pallas_gbuffer(
                s, a, b, H, W, 16, 128, pairs_per_step=pack, tiled_io=True,
                inst_mid=geom.inst_mid,
            )
        )
        g_skip = jax.jit(
            lambda s, a, b, init, pack=pack: rasterize_pallas_gbuffer(
                s, a, b, H, W, 16, 128, pairs_per_step=pack, tiled_io=True,
                init=init, inst_mid=geom.inst_mid,
            )
        )
        t1 = timeit(d_full, geom.setup, bins)
        t2 = timeit(d_skip, geom.setup, bins, far_init)
        t3 = timeit(g_full, geom.setup, assets.tri_ac, bins)
        t4 = timeit(g_skip, geom.setup, assets.tri_ac, bins, far_init_g)
        print(
            f"pack {pack:2d}: depth {t1:7.2f}  depth-skip {t2:7.2f}  "
            f"gbuf {t3:7.2f}  gbuf-skip {t4:7.2f}"
        )


if __name__ == "__main__":
    main()
