"""Scan raster tile shapes on the real TPU (round-5 lever).

Phase-1 edge evaluation is the raster kernel's dominant cost and scales
with SUM over pairs of tile pixels touched — i.e. the meshlet bbox
dilated to (tile_w, tile_h/4) granularity. Narrower tiles cut the
dilation at the price of more pairs (binning, SMEM, per-pair DMA).
This tool measures the real trade on the bench scene's early pass and
on the shadow-cascade atlas.

Usage: python tools/tile_experiment.py [main|shadow|both]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, n=6):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main(which="both"):
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
    from orbit_tpu.raster.raster_pallas import rasterize_pallas_gbuffer
    from orbit_tpu.scenes import bistro_flythrough, bistro_xl_scene

    W, H = 1920, 1080
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
    geom = jax.block_until_ready(
        jax.jit(
            lambda a, s, im, ie, dm: process_geometry(
                a, im, s.entity_model[ie], view.view_proj, W, H,
                inst_valid=dm,
            )
        )(assets, scene, im, ie, draw_m)
    )
    print("drawn:", int(jnp.sum(draw_m.astype(jnp.int32))))

    if which in ("main", "both"):
        # (tile_h, tile_w, pair_capacity). Round-5 finding: the kernel is
        # ~370 ns/pair fixed-overhead-bound, so LARGER tiles (fewer
        # pairs) win; pixel work is ~0.04 ns/px.
        shapes = [
            (32, 64, 147456),
            (16, 128, 147456),
        ]
        for th, tw, cap in shapes:
            bins_f = jax.jit(
                lambda g, th=th, tw=tw, cap=cap: bin_meshlets(
                    g.bbox, g.inst_valid, W, H, th, tw, cap,
                    max_z=g.max_z, group_align=8,
                )
            )
            bins = jax.block_until_ready(bins_f(geom))
            real = int(jnp.sum((bins.pair_slot >= 0).astype(jnp.int32)))
            ovf = bool(np.asarray(bins.overflow))
            t_bin = timeit(bins_f, geom)
            for label, kw in (
                ("alpha", dict(
                    alpha_masks=assets.alpha_masks,
                    inst_mask_slot=geom.mask_slot,
                )),
            ):
                gbuf = jax.jit(
                    lambda s, a, b, th=th, tw=tw, kw=kw:
                    rasterize_pallas_gbuffer(
                        s, a, b, H, W, th, tw, pairs_per_step=8,
                        tiled_io=True, inst_mid=geom.inst_mid,
                        overdraw=False, **kw,
                    )
                )
                try:
                    t_g = timeit(gbuf, geom.setup, assets.tri_ac, bins)
                except Exception as e:  # noqa: BLE001
                    print(f"[{th:3d}x{tw:3d}] {label} FAILED: "
                          f"{type(e).__name__}: {e}")
                    continue
                print(
                    f"[{th:3d}x{tw:3d}] {label:5s} cap={cap:7d} "
                    f"pairs={real:7d} ovf={int(ovf)} bin={t_bin:7.2f} ms "
                    f"raster={t_g:7.2f} ms"
                )

    if which in ("shadow", "both"):
        from orbit_tpu.passes.shadow import ShadowSettings, cascade_views
        from orbit_tpu.raster.api import rasterize_depth_views
        from orbit_tpu.raster import RasterConfig

        st = ShadowSettings(
            resolution=1024, cascade_count=4, max_distance=60.0,
            filter="vsm", lod_texel_scale=2.0,
            pair_capacities=(16384, 12288, 20480, 38912),
            masked_pair_capacities=(26624, 8192, 9216, 16384),
        )
        fovy = float(np.radians(60.0))
        aspect = W / H

        def build_geoms():
            geoms = []
            for ci, (v, radius) in enumerate(
                cascade_views(view, fovy, aspect,
                              scene.light_dir[0], st)
            ):
                texel_w = 2.0 * radius / st.resolution
                px_per_m = 2.0 * jnp.tan(fovy * 0.5) / H
                d_eq = st.lod_texel_scale * texel_w / px_per_m
                lf = jnp.log2(jnp.maximum(d_eq, 1e-6) / 3.0) / jnp.log2(
                    jnp.float32(1.45)
                )
                min_lod = jnp.clip(
                    jnp.maximum(lf + 1.0, 0.0).astype(jnp.int32), 0, 7
                )
                draw_e, lod_idx, _ = cull_entities(
                    assets, scene, smeta.num_entities,
                    cull_view=v.view, cull_planes=v.cull_planes,
                    num_planes=v.num_cull_planes,
                    occlusion_pass=PASS_SINGLE, is_ortho=True,
                    lod_base=3.0, lod_step=1.45, min_lod=min_lod,
                )
                ie, im, il, iv, _ = expand_instances(
                    assets, draw_e, lod_idx, scene.entity_mesh, 49152
                )
                draw_m, _ = cull_meshlet_instances(
                    assets, scene, ie, im, iv,
                    cull_view=v.view, cull_planes=v.cull_planes,
                    num_planes=v.num_cull_planes,
                    occlusion_pass=PASS_SINGLE, is_ortho=True,
                    use_meshlet_occlusion=False,
                    alpha_mode_mask=0b011,
                )
                g = process_geometry(
                    assets, im, scene.entity_model[ie], v.view_proj,
                    1024, 1024, inst_valid=draw_m,
                )
                geoms.append(g)
            return geoms

        geoms = jax.block_until_ready(jax.jit(build_geoms)())

        for th, tw, scale in [(16, 128, 1.0), (32, 64, 0.9)]:
            caps = tuple(
                int(-(-int(c * scale) // 1024) * 1024)
                for c in st.pair_capacities
            )
            mcaps = tuple(
                int(-(-int(c * scale) // 1024) * 1024)
                for c in st.masked_pair_capacities
            )
            cfg = RasterConfig(
                backend="pallas", tile_h=th, tile_w=tw,
                pair_capacity=49152,
            )
            f = jax.jit(
                lambda geoms, am, tac, cfg=cfg, caps=caps, mcaps=mcaps:
                rasterize_depth_views(
                    geoms, 1024, cfg,
                    alpha_masks=am,
                    tri_ac=tac,
                    pair_capacities=caps,
                    masked_pair_capacities=mcaps,
                )
            )
            try:
                out = jax.block_until_ready(
                    f(geoms, assets.alpha_masks, assets.tri_ac)
                )
                ovf = bool(np.asarray(out[1])) or bool(np.asarray(out[2]))
                t = timeit(f, geoms, assets.alpha_masks, assets.tri_ac)
            except Exception as e:  # noqa: BLE001
                print(f"shadow [{th:3d}x{tw:3d}] FAILED: "
                      f"{type(e).__name__}: {e}")
                continue
            print(
                f"shadow [{th:3d}x{tw:3d}] caps*{scale} ovf={int(ovf)} "
                f"atlas raster={t:7.2f} ms"
            )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "both")
