"""Clustered forward lighting (reference: passes/cluster.rs + the three
light_cluster/*.comp stages).

TPU-native reshape: the three GPU stages (mark_active -> compact ->
light_culling) become
  1. scatter-min/max of per-pixel linear depth into (tile, slice) clusters
  2. a dense [clusters, lights] sphere-vs-AABB test (no compaction needed —
     XLA has no indirect dispatch to feed)
  3. rank-based compaction into fixed-capacity per-cluster light lists
Shading walks each pixel's cluster list with a bounded fori loop.
Only point lights are clustered; sky/directional are evaluated for every
pixel (the reference adds them to every cluster's list — same radiance).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from orbit_tpu.scene import LIGHT_POINT


@dataclass(frozen=True)
class ClusterSettings:
    """reference: ClusterSettings (cluster.rs:15-33)."""

    tile_px: int = 64
    z_slices: int = 24
    far_plane: float = 200.0
    luminance_cutoff: float = 0.25
    max_lights_per_cluster: int = 64
    # fused-path per-raster-tile list capacity (build_tile_lights); the
    # lists live in the shade kernel's SMEM, so keep this snug
    tile_light_cap: int = 16


@jax.tree_util.register_dataclass
@dataclass
class ClusterData:
    light_index: jax.Array  # [C, CAP] i32
    light_count: jax.Array  # [C] i32
    max_count: jax.Array  # scalar i32 (bound for the shading loop)
    overflow: jax.Array = None  # [] bool — some cluster exceeded CAP
    #   (lights beyond capacity are dropped; surfaced in frame overflow)
    grid: tuple = field(metadata=dict(static=True), default=(0, 0, 0))  # (ty, tx, slices)
    # view-space bounds of each cluster cell (the debug-volume overlay,
    # reference cluster.rs:133-320); None until built
    aabb_min: jax.Array = None  # [C, 3]
    aabb_max: jax.Array = None  # [C, 3]
    active: jax.Array = None  # [C] bool


def _z_scale_bias(znear, far, slices):
    denom = np.log2(far) - jnp.log2(znear)
    scale = slices / denom
    bias = -scale * jnp.log2(znear)
    return scale, bias


def linear_z_to_slice(linear_z, znear, far, slices):
    """cluster_common.glsl:18-20."""
    scale, bias = _z_scale_bias(znear, far, slices)
    s = jnp.floor(jnp.log2(jnp.maximum(linear_z, 1e-6)) * scale + bias)
    return jnp.clip(s, 0, slices - 1).astype(jnp.int32)


def build_clusters(
    depth,  # [H,W] reverse-Z
    scene,
    num_lights: int,
    view,  # ViewParams
    settings: ClusterSettings,
) -> ClusterData:
    H, W = depth.shape
    t = settings.tile_px
    ntx, nty = -(-W // t), -(-H // t)
    S = settings.z_slices
    C = nty * ntx * S
    znear = view.znear

    # --- stage 1: per-pixel depth bounds per cluster (mark_active.comp)
    valid = depth > 0.0
    linear_z = znear / jnp.maximum(depth, 1e-12)
    sl = linear_z_to_slice(linear_z, znear, settings.far_plane, S)
    py, px = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    cid = ((py // t) * ntx + (px // t)) * S + sl
    cid = jnp.where(valid, cid, C)  # dropped

    zmin = jnp.full((C,), jnp.inf).at[cid.reshape(-1)].min(
        linear_z.reshape(-1), mode="drop"
    )
    zmax = jnp.full((C,), -jnp.inf).at[cid.reshape(-1)].max(
        linear_z.reshape(-1), mode="drop"
    )
    active = zmax >= zmin

    # --- stage 3: cluster AABB in view space x light spheres
    # (light_culling.comp:62-151). View space: x right, y up, z negative
    # forward; tile corners unprojected at the cluster depth bounds.
    ci = jnp.arange(C, dtype=jnp.int32)
    tile = ci // S
    ty = (tile // ntx).astype(jnp.float32)
    tx = (tile % ntx).astype(jnp.float32)
    # NDC extents of the tile
    x0 = tx * t / W * 2.0 - 1.0
    x1 = jnp.minimum((tx + 1) * t / W, 1.0) * 2.0 - 1.0
    # y: pixel rows grow downward, NDC y up
    y1 = 1.0 - ty * t / H * 2.0
    y0 = 1.0 - jnp.minimum((ty + 1) * t / H, 1.0) * 2.0
    # view-space xy at z=-1: x_v = ndc_x / p00 * z ... for infinite
    # reverse-Z perspective: x_v = ndc_x * (-z_v) / p00
    zmn = jnp.where(active, zmin, 1.0)
    zmx = jnp.where(active, zmax, 1.0)

    def corner(nx, ny, z):
        return jnp.stack([nx / view.p00 * z, ny / view.p11 * z], -1)

    # conservative xy bounds: evaluate all corner/depth combinations
    cs = [corner(a, b, zc) for a in (x0, x1) for b in (y0, y1) for zc in (zmn, zmx)]
    xy_min = cs[0]
    xy_max = cs[0]
    for cxy in cs[1:]:
        xy_min = jnp.minimum(xy_min, cxy)
        xy_max = jnp.maximum(xy_max, cxy)
    aabb_min = jnp.concatenate([xy_min, -zmx[:, None]], axis=-1)  # [C,3]
    aabb_max = jnp.concatenate([xy_max, -zmn[:, None]], axis=-1)

    # lights to view space
    L = scene.light_pos.shape[0]
    lp_h = jnp.concatenate(
        [scene.light_pos, jnp.ones((L, 1))], axis=-1
    )
    lp_view = (lp_h @ view.view.T)[:, :3]
    is_point = scene.light_type == LIGHT_POINT
    in_range = jnp.arange(L) < num_lights
    radius = scene.light_outer_radius

    # sphere vs AABB (closest-point distance)
    closest = jnp.clip(
        lp_view[None, :, :], aabb_min[:, None, :], aabb_max[:, None, :]
    )
    d2 = jnp.sum((closest - lp_view[None, :, :]) ** 2, axis=-1)  # [C,L]
    hit = (
        (d2 <= (radius[None, :] ** 2))
        & is_point[None, :]
        & in_range[None, :]
        & active[:, None]
    )

    # --- compaction into fixed lists
    CAP = settings.max_lights_per_cluster
    rank = jnp.cumsum(hit, axis=1) - 1  # [C,L]
    overflow = jnp.any(rank[:, -1] + 1 > CAP)
    count = jnp.clip(rank[:, -1] + 1, 0, CAP).astype(jnp.int32)
    dst = jnp.where(hit & (rank < CAP), ci[:, None] * CAP + rank, C * CAP)
    light_ids = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (C, L))
    flat = jnp.zeros((C * CAP,), jnp.int32).at[dst.reshape(-1)].set(
        light_ids.reshape(-1), mode="drop"
    )
    return ClusterData(
        light_index=flat.reshape(C, CAP),
        light_count=count,
        overflow=overflow,
        max_count=jnp.max(count),
        grid=(nty, ntx, S),
        aabb_min=aabb_min,
        aabb_max=aabb_max,
        active=active,
    )


# count sentinel: this tile's conservative list overflowed its capacity;
# the shade kernel walks the full point-light list instead (still exact)
TILE_LIGHTS_FALLBACK = 0x7FFF


def light_cull_radius(scene, luminance_cutoff: float):
    """Exact cutoff distance of the point attenuation curve: att(d) =
    max(I/d^2 - cutoff*d^2/outer^2, 0) is zero iff d >= (I*outer^2 /
    cutoff)^(1/4). Culling with THIS radius (not outer_radius) makes
    every excluded
    light contribute exactly 0.0 to every pixel it was culled from —
    list-based shading never drops radiance (only FP accumulation order
    differs from the brute-force sum)."""
    r4 = (
        scene.light_intensity
        * scene.light_outer_radius ** 2
        / max(luminance_cutoff, 1e-12)
    )
    return jnp.maximum(r4, 0.0) ** 0.25


def build_tile_lights(
    depth_t,  # [ntp, tpx] tiled reverse-Z depth (raster native layout)
    scene,
    num_lights: int,
    view,  # ViewParams
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    cap: int,
    luminance_cutoff: float = 0.25,
):
    """Per-RASTER-TILE point-light lists for the fused shade kernel —
    the TPU-native reshape of clustered forward shading: instead of the
    reference's (screen tile x z-slice) cluster grid fed by three
    compute passes (cluster.rs:368-397), each 16x128 framebuffer tile
    gets one conservative light list built from its actual depth bounds.
    The z-slicing's job (tight depth bounds) is done by the per-tile
    min/max; the fused kernel walks the list with a dynamic-trip loop.

    Exact, not approximate: culling uses the attenuation curve's true
    zero radius (light_cull_radius), so no light that contributes to any
    pixel is ever missing from its tile's list — list shading differs
    from the brute-force all-lights sum only by FP accumulation order
    (the tile loop runs after the static light loop; <= 1 ulp). A tile whose conservative
    list would exceed `cap` (e.g. a street-corridor tile near the
    vanishing point whose frustum slab spans half the scene) gets
    count = TILE_LIGHTS_FALLBACK instead: the shade kernel walks the
    FULL point-light list for that tile — still exact, no dropped
    lights, and only the few pathological tiles pay for it. (The
    reference's z-sliced clusters silently cap at 64,
    light_culling.comp:62-151; this never drops a light.)

    Returns (ids [ntp, cap] i32, count [ntp] i32 — TILE_LIGHTS_FALLBACK
    marks full-list tiles, fallback_tiles [] i32 diagnostic count)."""
    ntp, tpx = depth_t.shape
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty
    znear = view.znear

    valid = depth_t > 0.0
    any_valid = jnp.any(valid, axis=1)
    in_grid = jnp.arange(ntp) < n_tiles
    active = any_valid & in_grid
    # reverse-Z: nearest = max depth; farthest valid = min over valid
    zmax = jnp.max(jnp.where(valid, depth_t, 0.0), axis=1)
    zmin = jnp.min(jnp.where(valid, depth_t, 1.0), axis=1)
    lz0 = znear / jnp.maximum(zmax, 1e-12)  # near linear depth
    lz1 = znear / jnp.maximum(zmin, 1e-12)  # far linear depth

    ti = jnp.arange(ntp, dtype=jnp.int32)
    ty = (ti // ntx).astype(jnp.float32)
    tx = (ti % ntx).astype(jnp.float32)
    x0 = tx * tile_w / width * 2.0 - 1.0
    x1 = jnp.minimum((tx + 1) * tile_w / width, 1.0) * 2.0 - 1.0
    y1 = 1.0 - ty * tile_h / height * 2.0
    y0 = 1.0 - jnp.minimum((ty + 1) * tile_h / height, 1.0) * 2.0
    lz0s = jnp.where(active, lz0, 1.0)
    lz1s = jnp.where(active, lz1, 1.0)

    def corner(nx, ny, z):
        return jnp.stack([nx / view.p00 * z, ny / view.p11 * z], -1)

    cs = [
        corner(a, b, zc)
        for a in (x0, x1)
        for b in (y0, y1)
        for zc in (lz0s, lz1s)
    ]
    xy_min = cs[0]
    xy_max = cs[0]
    for cxy in cs[1:]:
        xy_min = jnp.minimum(xy_min, cxy)
        xy_max = jnp.maximum(xy_max, cxy)
    aabb_min = jnp.concatenate([xy_min, -lz1s[:, None]], axis=-1)
    aabb_max = jnp.concatenate([xy_max, -lz0s[:, None]], axis=-1)

    L = scene.light_pos.shape[0]
    lp_h = jnp.concatenate([scene.light_pos, jnp.ones((L, 1))], axis=-1)
    lp_view = (lp_h @ view.view.T)[:, :3]
    is_point = scene.light_type == LIGHT_POINT
    in_range = jnp.arange(L) < num_lights
    radius = light_cull_radius(scene, luminance_cutoff)

    closest = jnp.clip(
        lp_view[None, :, :], aabb_min[:, None, :], aabb_max[:, None, :]
    )
    d2 = jnp.sum((closest - lp_view[None, :, :]) ** 2, axis=-1)  # [ntp,L]
    hit = (
        (d2 <= radius[None, :] ** 2)
        & is_point[None, :]
        & in_range[None, :]
        & active[:, None]
    )

    rank = jnp.cumsum(hit, axis=1) - 1
    raw = (rank[:, -1] + 1).astype(jnp.int32)
    over = raw > cap
    count = jnp.where(over, TILE_LIGHTS_FALLBACK, raw)
    dst = jnp.where(hit & (rank < cap), ti[:, None] * cap + rank, ntp * cap)
    light_ids = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (ntp, L))
    flat = jnp.zeros((ntp * cap,), jnp.int32).at[dst.reshape(-1)].set(
        light_ids.reshape(-1), mode="drop"
    )
    return flat.reshape(ntp, cap), count, jnp.sum(over.astype(jnp.int32))


def pixel_cluster_ids(depth, view, settings: ClusterSettings):
    """[H,W] -> flat cluster id per pixel (shading-side lookup)."""
    H, W = depth.shape
    t = settings.tile_px
    ntx = -(-W // t)
    S = settings.z_slices
    linear_z = view.znear / jnp.maximum(depth, 1e-12)
    sl = linear_z_to_slice(linear_z, view.znear, settings.far_plane, S)
    py, px = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    return (((py // t) * ntx + (px // t)) * S + sl).reshape(-1)


def shade_clustered_points(
    clusters: ClusterData,
    cluster_ids,  # [N] per pixel
    scene,
    surface,
    gbuf,
    eye,
    luminance_cutoff: float,
):
    """Accumulate all clustered point lights per pixel with a bounded
    dynamic fori loop (forward.frag:352-363 + point branch)."""
    from orbit_tpu.math.transforms import normalize
    from orbit_tpu.shade import brdf

    from orbit_tpu.utils import gather1

    n_px = cluster_ids.shape[0]
    v = normalize(eye[None, :] - gbuf.world_pos)
    counts = gather1(clusters.light_count, cluster_ids)  # [N]

    cap = clusters.light_index.shape[1]
    light_index_flat = clusters.light_index.reshape(-1)

    def body(k, acc):
        li = gather1(light_index_flat, cluster_ids * cap + k)  # [N]
        live = k < counts
        delta = gather1(scene.light_pos, li) - gbuf.world_pos
        dist = jnp.linalg.norm(delta, axis=-1)
        ldir = delta / jnp.maximum(dist, 1e-12)[:, None]
        dist = jnp.maximum(dist, gather1(scene.light_inner_radius, li))
        att = brdf.point_attenuation(
            dist,
            gather1(scene.light_intensity, li),
            luminance_cutoff,
            gather1(scene.light_outer_radius, li),
        )
        contrib = brdf.calculate_light(
            v, ldir, gather1(scene.light_color, li), att,
            surface.albedo, surface.normal, surface.metallic,
            surface.roughness,
        )
        return acc + jnp.where(live[:, None], contrib, 0.0)

    acc0 = jnp.zeros((n_px, 3))
    return jax.lax.fori_loop(0, clusters.max_count, body, acc0)


def cluster_heatmap(clusters: ClusterData, cluster_ids, shape):
    """Debug render mode 8 (forward.frag:563-566)."""
    from orbit_tpu.math.color import heat_colormap

    from orbit_tpu.utils import gather1

    counts = gather1(clusters.light_count, cluster_ids).astype(jnp.float32)
    return heat_colormap(jnp.clip(counts / 32.0, 0.0, 1.0)).reshape(
        shape + (3,)
    )
