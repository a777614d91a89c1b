"""Multi-chip rendering: framebuffer-band + view sharding over a device mesh.

The reference is strictly single-GPU (SURVEY.md section 2.3); the natural
TPU scaling axes for a renderer are:
  * 'fb'   — screen tiles (sequence-parallel analog): each chip culls and
             rasters only the tiles of its horizontal band, then shades its
             own pixels; the final image is all-gathered over ICI
  * 'view' — independent views (data-parallel analog): shadow cascades,
             cubemap faces, or multi-camera rendering

Scene/asset arrays are replicated (they are the "weights"); per-band
buffers are the activations. Geometry + binning run replicated (cheap,
and the bin lists differ per band only in which tiles they keep), the
rasterizer + shading run fully sharded.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from orbit_tpu.raster import RasterConfig, process_geometry
from orbit_tpu.raster.binning import bin_meshlets
from orbit_tpu.raster.raster_xla import rasterize_xla


def make_render_mesh(devices=None, view_parallel: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % view_parallel == 0
    arr = np.array(devices).reshape(view_parallel, n // view_parallel)
    return Mesh(arr, ("view", "fb"))


def render_frame_sharded(
    assets,
    scene,
    inst_meshlet,
    inst_entity,
    inst_valid,
    view_proj_stack,  # [V, 4, 4] one view-projection per 'view' shard
    mesh: Mesh,
    height: int,
    width: int,
    cfg: Optional[RasterConfig] = None,
):
    """Cull-free sharded raster: returns (depth [V,H,W], vis [V,H,W]).

    Each (view, band) device processes its own view's geometry and the
    tiles of its band; bands are all-gathered along 'fb' at the end.
    Demonstrates the full sharded compile path the driver dry-runs.
    """
    cfg = cfg or RasterConfig(backend="xla")
    n_fb = mesh.shape["fb"]
    n_view = mesh.shape["view"]
    assert height % (cfg.tile_h * n_fb) == 0, (
        f"height {height} must tile into {n_fb} bands of {cfg.tile_h}-px rows"
    )
    band_h = height // n_fb

    def band_fn(vp, im, ie, iv):
        # vp: [1,4,4] this view's matrix; band index from axis position
        vp = vp[0]
        band = jax.lax.axis_index("fb")
        geom = process_geometry(
            assets, im, scene.entity_model[ie], vp, width, height,
            inst_valid=iv,
        )
        # shift bboxes into band-local coordinates; tiles outside clip away
        y0 = (band * band_h).astype(jnp.float32)
        bbox = geom.bbox.at[:, 1].add(-y0).at[:, 3].add(-y0)
        bins = bin_meshlets(
            bbox, geom.inst_valid, width, band_h, cfg.tile_h, cfg.tile_w,
            cfg.pair_capacity, max_z=geom.max_z,
        )
        # rasterize the band with pixel rows offset to global coordinates
        depth, vis = _raster_band(
            geom.setup, bins, band_h, width, cfg, y0
        )
        return depth[None], vis[None]

    spec_in = (
        P("view", None, None),  # view_proj per view-shard
        P(None),
        P(None),
        P(None),
    )
    spec_out = (P("view", "fb", None), P("view", "fb", None))

    fn = jax.shard_map(
        band_fn,
        mesh=mesh,
        in_specs=spec_in,
        out_specs=spec_out,
        check_vma=False,
    )
    depth, vis = fn(view_proj_stack, inst_meshlet, inst_entity, inst_valid)
    return depth.reshape(n_view, height, width), vis.reshape(
        n_view, height, width
    )


def _raster_band(setup, bins, band_h, width, cfg, y_offset):
    """Rasterize one horizontal band; pixel centers offset by y_offset."""
    # reuse the XLA tile rasterizer on the band, then shift depth plane
    # evaluation: the setup coefficients are in full-screen pixel space, so
    # offset the tile pixel-center y inside the functional evaluation by
    # rewriting c' = c + b * y_offset for every functional.
    s = setup.reshape(setup.shape[0], -1, 12)
    shift = jnp.zeros_like(s)
    shift = shift.at[..., 2].set(s[..., 1] * y_offset)
    shift = shift.at[..., 5].set(s[..., 4] * y_offset)
    shift = shift.at[..., 8].set(s[..., 7] * y_offset)
    shift = shift.at[..., 11].set(s[..., 10] * y_offset)
    s = s + shift
    return rasterize_xla(s, bins, band_h, width, cfg.tile_h, cfg.tile_w)
