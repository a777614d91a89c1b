"""Micro-benchmark the shadow cascade raster on the real TPU.

Builds each cascade's real bench geometry, then times the
depth+alpha kernel against variants that isolate where the time goes:
plain depth kernel (no alpha machinery), all-skip (init depth = 1 so
every pair fails the early-z test -> pure step machinery), and
alternative tile shapes / pack widths.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def timeit(fn, n=6):
    import jax

    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from bench import build
    from orbit_tpu.cull import (
        cull_entities, cull_meshlet_instances, expand_instances,
    )
    from orbit_tpu.cull.entity_cull import PASS_SINGLE, compact_drawn
    from orbit_tpu.passes import shadow as sm
    from orbit_tpu.raster import process_geometry
    from orbit_tpu.raster.binning import bin_meshlets
    from orbit_tpu.raster.raster_pallas import (
        rasterize_pallas,
        rasterize_pallas_depth_alpha,
    )
    from orbit_tpu.scene import LIGHT_DIRECTIONAL

    b = build()
    cfg, pipe, smeta = b["cfg"], b["pipe"], b["smeta"]
    assets, scene, view = b["assets"], b["scene"], b["view"]
    st = cfg.shadows
    S = st.resolution
    fovy = 2.0 * np.arctan(1.0 / float(view.proj[1, 1]))
    aspect = float(view.proj[1, 1] / view.proj[0, 0])
    li = [
        i for i, t in enumerate(smeta.light_types[: smeta.num_lights])
        if t == LIGHT_DIRECTIONAL
    ][0]

    views = sm.cascade_views(view, fovy, aspect, scene.light_dir[li], st)

    @jax.jit
    def make_geom(vv, planes, nplanes, vp, min_lod):
        de, lodi, _ = cull_entities(
            assets, scene, smeta.num_entities, cull_view=vv,
            cull_planes=planes, num_planes=nplanes,
            occlusion_pass=PASS_SINGLE, is_ortho=True,
            lod_base=cfg.cull.lod_base, lod_step=cfg.cull.lod_step,
            min_lod=min_lod,
        )
        ie, im, il, iv, _ = expand_instances(
            assets, de, lodi, scene.entity_mesh,
            cfg.shadow_instance_capacity or cfg.instance_capacity,
        )
        dm, _ = cull_meshlet_instances(
            assets, scene, ie, im, iv, cull_view=vv, cull_planes=planes,
            num_planes=nplanes, occlusion_pass=PASS_SINGLE, is_ortho=True,
            use_meshlet_occlusion=False,
            alpha_mode_mask=pipe.opaque_alpha_mask,
        )
        ie, im, dm, _ = compact_drawn(ie, im, dm, cfg.shadow_draw_capacity)
        return process_geometry(
            assets, im, scene.entity_model[ie], vp, S, S, inst_valid=dm
        )

    rcfg = cfg.shadow_raster
    for ci, (v, r) in enumerate(views):
        texel = 2.0 * r / S
        ppm = 2.0 * np.tan(fovy * 0.5) / cfg.height
        deq = st.lod_texel_scale * texel / ppm
        lf = np.log2(max(float(deq), 1e-6) / cfg.cull.lod_base) / np.log2(
            cfg.cull.lod_step
        )
        ml = int(np.clip(int(max(lf + 1.0, 0.0)), 0, 7))
        geom = make_geom(
            v.view, v.cull_planes, v.num_cull_planes, v.view_proj, ml
        )
        geom = jax.block_until_ready(geom)
        cap = (
            st.pair_capacities[ci]
            if st.pair_capacities
            else rcfg.pair_capacity
        )

        def run(tile_h=rcfg.tile_h, tile_w=rcfg.tile_w, pack=8,
                pair_cap=cap, depth_only=False, all_skip=False):
            bins = bin_meshlets(
                geom.bbox, geom.inst_valid, S, S, tile_h, tile_w,
                pair_cap, max_z=geom.max_z, group_align=pack,
            )
            npairs = int(jnp.sum(bins.pair_slot >= 0))
            init = None
            if all_skip:
                init = (
                    jnp.ones((S, S), jnp.float32),
                    jnp.zeros((S, S), jnp.int32),
                )
            if depth_only:
                g = jax.jit(
                    lambda setup, bb, ii: rasterize_pallas(
                        setup, bb, S, S, tile_h, tile_w,
                        init=ii, pairs_per_step=pack,
                    ),
                    static_argnums=(),
                )
                f = lambda: g(geom.setup, bins, init)
            else:
                g = jax.jit(
                    lambda setup, ta, bb, am, ms, mid, ii:
                    rasterize_pallas_depth_alpha(
                        setup, ta, bb, S, S, tile_h,
                        tile_w, am, ms, mid, init=ii,
                        pairs_per_step=pack,
                    ),
                )
                f = lambda: g(
                    geom.setup, assets.tri_ac, bins, assets.alpha_masks,
                    geom.mask_slot, geom.inst_mid, init,
                )
            return timeit(f), npairs

        ms, np_ = run()
        ms_d, _ = run(depth_only=True)
        ms_skip, _ = run(all_skip=True)
        ms_p16, _ = run(pack=16)
        # chained raster calls need pair_cap % 49152 == 0 above one chunk
        h8cap = 2 * cap if 2 * cap <= 49152 else -(-2 * cap // 49152) * 49152
        ms_h8, np8 = run(tile_h=8, pair_cap=h8cap)
        nmask = int(
            jnp.sum((geom.mask_slot >= 0) & geom.inst_valid)
        )
        ndraw = int(jnp.sum(geom.inst_valid))
        print(
            f"cascade {ci}: draw={ndraw} masked={nmask} pairs={np_} "
            f"cap={cap}\n"
            f"  depth_alpha {ms:7.2f} ms | depth_only {ms_d:7.2f} | "
            f"all_skip {ms_skip:7.2f} | pack16 {ms_p16:7.2f} | "
            f"th8 {ms_h8:7.2f} (pairs {np8})"
        )


if __name__ == "__main__":
    main()
