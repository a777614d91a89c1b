"""Measure worst-case per-cascade shadow workloads over the bench
fly-through: expanded instances, drawn instances, opaque pairs, masked
pairs. Sets the per-cascade capacity knobs in bench.py (every unused
capacity slot costs real prep/raster time).

Runs on CPU (pure cull math; no kernels).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(n_views=14, tile_h=16, tile_w=128):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from orbit_tpu.camera import make_perspective_view
    from orbit_tpu.cull import (
        cull_entities,
        cull_meshlet_instances,
        expand_instances,
    )
    from orbit_tpu.cull.entity_cull import PASS_SINGLE
    from orbit_tpu.passes.shadow import ShadowSettings, cascade_views
    from orbit_tpu.raster import process_geometry
    from orbit_tpu.raster.binning import bin_meshlets
    from orbit_tpu.scenes import bistro_flythrough, bistro_xl_scene

    W, H = 1920, 1080
    store, sb = bistro_xl_scene(point_lights=256)
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    st = ShadowSettings(
        resolution=1024, cascade_count=4, max_distance=60.0,
        filter="vsm", lod_texel_scale=2.0,
    )
    fovy = float(np.radians(60.0))
    S = 1024
    INST_CAP = 49152

    # the bench scene's directional sun (light 0 is the IBL sky)
    from orbit_tpu.scene import LIGHT_DIRECTIONAL

    li_sun = next(
        i for i, k in enumerate(smeta.light_types) if k == LIGHT_DIRECTIONAL
    )

    def one_view(view):
        rows = []
        for ci, (v, radius) in enumerate(
            cascade_views(view, fovy, W / H, scene.light_dir[li_sun], st)
        ):
            texel_w = 2.0 * radius / S
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
                assets, draw_e, lod_idx, scene.entity_mesh, INST_CAP
            )
            draw_m, _ = cull_meshlet_instances(
                assets, scene, ie, im, iv,
                cull_view=v.view, cull_planes=v.cull_planes,
                num_planes=v.num_cull_planes,
                occlusion_pass=PASS_SINGLE, is_ortho=True,
                use_meshlet_occlusion=False, alpha_mode_mask=0b011,
            )
            g = process_geometry(
                assets, im, scene.entity_model[ie], v.view_proj, S, S,
                inst_valid=draw_m,
            )
            n_exp = jnp.sum(iv.astype(jnp.int32))
            n_drawn = jnp.sum(draw_m.astype(jnp.int32))
            for label, valid in (
                ("opaque", g.inst_valid & (g.mask_slot < 0)),
                ("masked", g.inst_valid & (g.mask_slot >= 0)),
            ):
                bins = bin_meshlets(
                    g.bbox, valid, S, S, tile_h, tile_w, 65536,
                    max_z=g.max_z, group_align=8,
                )
                n_pairs = jnp.sum((bins.pair_slot >= 0).astype(jnp.int32))
                rows.append((ci, label, n_exp, n_drawn, n_pairs))
        return rows

    worst = {}
    start = int(os.environ.get("ORBIT_CAPS_START", "0"))
    step = int(os.environ.get("ORBIT_CAPS_STEP", "0")) or max(
        (40 - start) // n_views, 1
    )
    for i in range(start, min(start + n_views * step, 40), step):
        eye, look = bistro_flythrough(i, 40)
        view = make_perspective_view(
            eye=eye, target=look, aspect=W / H, fovy=np.radians(60.0)
        )
        for ci, label, n_exp, n_drawn, n_pairs in one_view(view):
            k = (ci, label)
            e, d, p = worst.get(k, (0, 0, 0))
            worst[k] = (
                max(e, int(n_exp)), max(d, int(n_drawn)), max(p, int(n_pairs))
            )
        print(f"view {i}: done", flush=True)
    for (ci, label), (e, d, p) in sorted(worst.items()):
        print(
            f"cascade {ci} {label:6s}: expanded<= {e:6d} drawn<= {d:6d} "
            f"pairs<= {p:6d}"
        )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 14,
        int(sys.argv[2]) if len(sys.argv) > 2 else 16,
        int(sys.argv[3]) if len(sys.argv) > 3 else 128,
    )
