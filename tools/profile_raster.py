"""Raster kernel cost model on the real TPU: pair-capacity sweep, tile
shapes, depth-only vs G-buffer, padding-step overhead."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from devtime import devtime, force_sync_mode
from orbit_tpu.camera import make_perspective_view
from orbit_tpu.raster import RasterConfig, process_geometry
from orbit_tpu.raster.binning import bin_meshlets
from orbit_tpu.raster.raster_pallas import (
    rasterize_pallas,
    rasterize_pallas_gbuffer,
)
from orbit_tpu.scenes import BENCH_CAMERAS, bistro_scene


def main():
    W, H = 1920, 1080
    print("backend:", jax.default_backend())
    store, sb = bistro_scene()
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    cam = BENCH_CAMERAS["bistro"]
    view = make_perspective_view(
        eye=cam["eye"], target=cam["target"], aspect=W / H,
        fovy=np.radians(60.0),
    )
    from orbit_tpu.renderer import static_instance_list

    im, ie, iv = static_instance_list(store, smeta, 1 << 14)
    lat = force_sync_mode()
    print(f"latency {lat*1e3:.2f} ms")

    im = jnp.asarray(im)
    ie = jnp.asarray(ie)
    iv = jnp.asarray(iv)

    def geom_fn(assets, scene, im, ie, iv, vp):
        return process_geometry(
            assets, im, scene.entity_model[ie], vp, W, H, inst_valid=iv
        )

    geom = jax.jit(geom_fn)(assets, scene, im, ie, iv, view.view_proj)
    jax.block_until_ready(geom.setup)
    devtime(
        geom_fn, assets, scene, im, ie, iv, view.view_proj,
        name=f"geometry I={im.shape[0]}",
    )

    for (th, tw) in ((16, 128), (8, 128), (8, 256), (32, 128)):
        def bin_fn(bbox, valid, maxz, P=1 << 15, th=th, tw=tw):
            return bin_meshlets(bbox, valid, W, H, th, tw, P, max_z=maxz)

        bins = jax.jit(bin_fn)(geom.bbox, geom.inst_valid, geom.max_z)
        jax.block_until_ready(bins.pair_slot)
        n_pairs = int(np.asarray(bins.pair_tile >= 0).sum())
        devtime(
            bin_fn, geom.bbox, geom.inst_valid, geom.max_z,
            name=f"binning {th}x{tw} (pairs={n_pairs})",
        )
        for P in (8192, 16384, 32768):
            if P < n_pairs:
                continue
            b2 = jax.jit(
                lambda bbox, valid, maxz, th=th, tw=tw, P=P: bin_meshlets(
                    bbox, valid, W, H, th, tw, P, max_z=maxz
                )
            )(geom.bbox, geom.inst_valid, geom.max_z)
            jax.block_until_ready(b2.pair_slot)
            devtime(
                lambda s, b, th=th, tw=tw: rasterize_pallas(
                    s, b, H, W, th, tw
                ),
                geom.setup, b2,
                name=f"  raster depth-only {th}x{tw} P={P}",
            )
            devtime(
                lambda s, a, b, th=th, tw=tw: rasterize_pallas_gbuffer(
                    s, a, b, H, W, th, tw, inst_mid=geom.inst_mid
                ),
                geom.setup, assets.tri_ac, b2,
                name=f"  raster gbuffer    {th}x{tw} P={P}",
            )


if __name__ == "__main__":
    main()
