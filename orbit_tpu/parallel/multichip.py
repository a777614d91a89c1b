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
            group_align=cfg.pairs_per_step,
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


def stack_pytrees(trees):
    """Stack a list of identical-structure pytrees along a new axis 0."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def frame_sharded(
    pipe,
    assets,
    scene,
    view_stack,  # ViewParams pytree stacked [V, ...] along axis 0
    env,
    state_stack,  # VisibilityState pytree stacked [V, ...]
    num_lights: int,
    mesh: Mesh,
):
    """The FULL pipeline frame sharded over a ('view' x 'fb') device mesh.

    Each device runs two-phase occlusion culling (replicated within its
    view), rasterizes + shades only its framebuffer band, and full-frame
    consumers (HiZ pyramid, SSAO, clusters, bloom/post) all-gather over
    the 'fb' axis. Assets/scene are replicated (the "weights"); views and
    visibility state are data-parallel over 'view'.

    Returns (color [V,H,W,3] u8 — genuinely band-sharded over 'fb',
    hdr [V,H,W,3], depth [V,H,W], vis [V,H,W], overflow [V] bool,
    new_state stacked [V, ...]). Every output is bit-identical to V
    independent single-device `pipe.frame` calls (asserted by the driver
    dry run): band binning preserves per-tile pair order and band raster
    evaluates pixel centers in global coordinates.
    """
    from orbit_tpu.pipeline import BandInfo

    cfg = pipe.config
    n_fb = mesh.shape["fb"]
    tile_h = cfg.raster.tile_h
    H = cfg.height * cfg.supersample
    W = cfg.width * cfg.supersample
    assert H % (tile_h * n_fb) == 0, (
        f"height {H} must split into {n_fb} bands of whole {tile_h}-px "
        "tile rows"
    )
    rows_per_band = H // tile_h // n_fb
    band_px = rows_per_band * tile_h

    def device_fn(view_s, state_s, assets, scene, env):
        view = jax.tree.map(lambda x: x[0], view_s)
        state = jax.tree.map(lambda x: x[0], state_s)
        band = BandInfo(
            axis="fb",
            n_bands=n_fb,
            rows_per_band=rows_per_band,
            row0=jax.lax.axis_index("fb") * rows_per_band,
        )
        out, new_state = pipe.frame(
            assets, scene, view, env, state, num_lights, band=band
        )
        # post ran on the gathered frame (replicated across 'fb'); emit
        # only this device's band so the color output is genuinely sharded
        color_band = jax.lax.dynamic_slice(
            out["color"],
            (band.row0 * tile_h, 0, 0),
            (band_px, out["color"].shape[1], 3),
        )
        rep = lambda x: x[None]  # noqa: E731
        return (
            color_band[None],
            rep(out["hdr"]),
            rep(out["depth"]),
            rep(out["vis"]),
            rep(out["overflow"]),
            jax.tree.map(rep, new_state),
        )

    fn = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P("view"), P("view"), P(), P(), P()),
        out_specs=(
            P("view", "fb"),
            P("view"),
            P("view"),
            P("view"),
            P("view"),
            P("view"),
        ),
        check_vma=False,
    )
    return fn(view_stack, state_stack, assets, scene, env)


def _raster_band(setup, bins, band_h, width, cfg, y_offset):
    """Rasterize one horizontal band; pixel centers offset by y_offset.

    Dispatches on cfg.backend, so the PRODUCTION Pallas kernels run
    inside shard_map (interpret mode on CPU meshes; native on real
    multi-chip hardware)."""
    # shift depth-plane evaluation: the setup coefficients are in
    # full-screen pixel space, so offset the tile pixel-center y inside
    # the functional evaluation by rewriting c' = c + b * y_offset.
    s = setup  # [I, 12, 64] coefficient-major
    shift = jnp.zeros_like(s)
    shift = shift.at[:, 2].set(s[:, 1] * y_offset)
    shift = shift.at[:, 5].set(s[:, 4] * y_offset)
    shift = shift.at[:, 8].set(s[:, 7] * y_offset)
    shift = shift.at[:, 11].set(s[:, 10] * y_offset)
    s = s + shift
    backend = cfg.resolve_backend()
    if backend == "xla":
        return rasterize_xla(
            s, bins, band_h, width, cfg.tile_h, cfg.tile_w
        )
    from orbit_tpu.raster.raster_pallas import rasterize_pallas

    return rasterize_pallas(
        s, bins, band_h, width, cfg.tile_h, cfg.tile_w,
        interpret=(backend == "pallas_interpret"),
        pairs_per_step=cfg.pairs_per_step,
    )
