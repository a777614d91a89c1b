"""Frame renderer: the full cull -> raster -> shade -> post pipeline as one
traced function (the TPU equivalent of App::render, app.rs:1050-1387).

v1 scope (benchmark config 1): every meshlet of every entity is drawn
(culling modules plug in here as they land); PBR + IBL shading; skybox;
ACES post. Everything stays in HBM end to end.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbit_tpu.camera import ViewParams
from orbit_tpu.math.color import srgb_to_linear
from orbit_tpu.math.color import uint_hash
from orbit_tpu.passes import post as post_mod
from orbit_tpu.raster import (
    RasterConfig,
    process_geometry,
    rasterize,
    rasterize_gbuffer,
)
from orbit_tpu.shade import gbuffer as gbuffer_mod
from orbit_tpu.shade import ibl as ibl_mod
from orbit_tpu.shade import pbr as pbr_mod


@dataclass(frozen=True)
class RenderSettings:
    width: int = 800
    height: int = 600
    raster: RasterConfig = field(default_factory=RasterConfig)
    render_mode: int = 0  # reference forward.rs RenderMode 0..9
    exposure: float = 1.0
    instance_capacity: int = 1 << 13
    texture_filter: str = "bilinear"


def static_instance_list(store, scene_meta, capacity):
    """Host-side: expand all entities' LOD-0 meshlets into fixed-size
    (entity, meshlet) instance arrays. This is the no-culling fallback; the
    cull module replaces it with on-device selection. Takes the host-side
    AssetStore (not device arrays) — zero device readbacks."""
    entity_mesh = np.asarray(
        scene_meta.entity_mesh_host[: scene_meta.num_entities]
    )
    lod_off = store.h["mesh_lod_offset"]
    lod_cnt = store.h["mesh_lod_count"]
    ents, mlets = [], []
    for e, m in enumerate(entity_mesh):
        if m < 0:
            continue
        off, cnt = lod_off[m, 0], lod_cnt[m, 0]
        mlets.append(np.arange(off, off + cnt, dtype=np.int32))
        ents.append(np.full(cnt, e, np.int32))
    if mlets:
        mlets = np.concatenate(mlets)
        ents = np.concatenate(ents)
    else:
        mlets = np.zeros(0, np.int32)
        ents = np.zeros(0, np.int32)
    n = len(mlets)
    assert n <= capacity, f"instance capacity {capacity} < {n}"
    inst_meshlet = np.zeros(capacity, np.int32)
    inst_entity = np.zeros(capacity, np.int32)
    inst_valid = np.zeros(capacity, bool)
    inst_meshlet[:n] = mlets
    inst_entity[:n] = ents
    inst_valid[:n] = True
    return (
        jnp.asarray(inst_meshlet),
        jnp.asarray(inst_entity),
        jnp.asarray(inst_valid),
    )


def camera_ray_dirs(
    view: ViewParams, width: int, height: int, row0=0, full_height=None
):
    """World-space ray direction per pixel (for the skybox; skybox.vert's
    far-plane cube re-expressed as a direct unprojection).

    row0/full_height: generate rays for a band of `height` rows starting
    at global pixel row row0 of a full_height-tall image."""
    fh = height if full_height is None else full_height
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    py = 1.0 - (
        (jnp.arange(height, dtype=jnp.int32) + row0).astype(jnp.float32)
        + 0.5
    ) / fh * 2.0
    xx, yy = jnp.meshgrid(px, py, indexing="xy")
    # view-space direction through each pixel
    dir_view = jnp.stack(
        [xx / view.proj[0, 0], yy / view.proj[1, 1], -jnp.ones_like(xx)], -1
    )
    r = view.view[:3, :3]  # world->view rotation
    return dir_view @ r  # = R^T @ dir per pixel


def render_frame(
    assets,
    scene,
    view: ViewParams,
    env: Optional[ibl_mod.EnvironmentMap],
    inst_meshlet,
    inst_entity,
    inst_valid,
    num_lights: int,
    settings: RenderSettings,
):
    """Returns dict with 'color' [H,W,3] u8 plus intermediate buffers."""
    W, H = settings.width, settings.height

    entity_mats = scene.entity_model[inst_entity]
    geom = process_geometry(
        assets, inst_meshlet, entity_mats, view.view_proj, W, H, inst_valid
    )
    depth, vis, gb, bins = rasterize_gbuffer(
        geom, H, W, settings.raster, tri_ac=assets.tri_ac
    )

    inv_vp = jnp.linalg.inv(view.view_proj)
    surface, gbuf = gbuffer_mod.surface_from_gbuffer(
        assets, gb, depth, vis, inv_vp,
        texture_filter=settings.texture_filter,
    )
    mode = settings.render_mode
    if mode == 0:
        shaded = pbr_mod.shade(
            surface, gbuf, scene, num_lights, view.eye, env
        )
    elif mode == 2:
        shaded = surface.normal * 0.5 + 0.5
        shaded = srgb_to_linear(shaded)
    elif mode == 3:
        shaded = srgb_to_linear(surface.metallic[:, None].repeat(3, -1))
    elif mode == 4:
        shaded = srgb_to_linear(surface.roughness[:, None].repeat(3, -1))
    elif mode == 5:
        shaded = srgb_to_linear(surface.emissive)
    elif mode == 6:
        shaded = srgb_to_linear(surface.ao[:, None].repeat(3, -1))
    elif mode == 9:
        h = uint_hash(gbuf.meshlet.astype(jnp.uint32))
        shaded = srgb_to_linear(
            jnp.stack(
                [
                    (h & 255).astype(jnp.float32),
                    ((h >> 8) & 255).astype(jnp.float32),
                    ((h >> 16) & 255).astype(jnp.float32),
                ],
                -1,
            )
            / 255.0
        )
    else:
        shaded = pbr_mod.shade(
            surface, gbuf, scene, num_lights, view.eye, env
        )

    hdr = shaded.reshape(H, W, 3)
    if env is not None and mode in (0,):
        dirs = camera_ray_dirs(view, W, H)
        sky = ibl_mod.sample_background(env, dirs)
        hdr = jnp.where(gbuf.valid.reshape(H, W, 1), hdr, sky)
    else:
        hdr = jnp.where(gbuf.valid.reshape(H, W, 1), hdr, 0.0)

    srgb = post_mod.tonemap(hdr, settings.exposure)
    return {
        "color": post_mod.to_u8(srgb),
        "hdr": hdr,
        "depth": depth,
        "vis": vis,
        "overflow": bins.overflow,
    }
