"""Cascaded shadow maps + PCSS filtering.

TPU-native re-creation of passes/shadow_renderer.rs (cascade fitting,
texel snapping, reverse-Z ortho) and the PCSS sampler of forward.frag
(12-tap blocker search + penumbra-scaled 32-tap disk PCF with IGN
rotation). Shadow maps are depth-only renders through the same
cull+raster machinery as the main view.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbit_tpu.camera import ViewParams, make_ortho_view
from orbit_tpu.cull import cull_entities, cull_meshlet_instances, expand_instances
from orbit_tpu.cull.entity_cull import PASS_SINGLE
from orbit_tpu.math.color import interleaved_gradient_noise
from orbit_tpu.math.frustum import perspective_corners
from orbit_tpu.math.transforms import normalize
from orbit_tpu.raster import RasterConfig, process_geometry, rasterize


@dataclass(frozen=True)
class ShadowSettings:
    """reference: ShadowSettings (shadow_renderer.rs:44-133)."""

    cascade_count: int = 4
    resolution: int = 1024
    max_distance: float = 40.0
    split_lambda: float = 0.8
    blocker_search_radius: float = 0.3
    normal_bias_scale: float = 2.0
    # world-space push towards the light; must cover the world-position
    # reconstruction error of the deferred resolve (depth-buffer f32
    # round-trip), which is larger than a forward renderer's needs
    oriented_bias: float = 0.08
    blocker_samples: int = 12
    pcf_samples: int = 32
    light_size: float = 0.4
    # filter = "pcss": the reference's 12-tap blocker search + 32-tap
    # penumbra-scaled PCF (forward.frag:81-171) — ~170 HBM gathers/px,
    # the quality/parity path. filter = "vsm": TPU-native variance
    # shadow maps — the filtering moves into a DENSE separable prefilter
    # of (d, d^2) moments (VPU-friendly, done once per cascade) and each
    # pixel pays ONE bilinear moment sample (4 gathers) resolved with
    # Chebyshev's inequality. ~40x fewer gathers; soft shadows whose
    # radius is the blur kernel instead of the PCSS penumbra estimate.
    filter: str = "pcss"
    vsm_blur_taps: int = 7  # prefilter width in texels (odd)
    vsm_bleed: float = 0.35  # light-bleed reduction clamp
    vsm_min_variance: float = 1e-6
    # moment-table resolution divisor (1 = full cascade res, 2 = half).
    # The VSM prefilter already low-passes the moments over
    # ~vsm_blur_taps texels, so storing them at half resolution (with
    # the blur width halved to keep the same world-space kernel) loses
    # almost nothing — and the per-pixel moment gather, the single
    # largest HBM-gather cost of the frame (2 x 9 ms at 1080p from the
    # 67 MB full-res tables), drops ~4x with the table size.
    vsm_moment_scale: int = 1
    # LOD floor from the cascade's own texel size: a cascade of world
    # radius r has texels 2r/resolution wide, so geometry below the LOD
    # the MAIN camera would use at the distance where ITS pixels are
    # that big is invisible to the shadow map — select at least that
    # LOD for casters (reference cascades inherit the mesh LOD the
    # draw-gen pass picked, draw_gen.rs; here the floor makes the
    # depth-only render pay only for detail the map can resolve).
    # texel_scale > 1 coarsens further (e.g. ~2-3 with the VSM blur,
    # whose 7-texel kernel swallows sub-kernel detail); 0 disables.
    lod_texel_scale: float = 1.0
    # optional per-cascade pair-capacity overrides (None entries inherit
    # the raster config): near cascades see a fraction of the far
    # cascades' meshlets, and every unused pair slot still costs kernel
    # grid steps, so snug per-cascade capacities cut dead raster time
    pair_capacities: Optional[tuple] = None
    # per-cascade pair caps for the MASKED (alpha-tested) stream: the
    # cascade atlas raster runs opaque pairs through the cheap
    # immediate-commit depth kernel and only masked pairs through the
    # deferred-commit alpha kernel (raster.rasterize_depth_views).
    # None = pair_capacities // 4 (masked geometry is typically foliage,
    # a fraction of the caster set)
    masked_pair_capacities: Optional[tuple] = None


@jax.tree_util.register_dataclass
@dataclass
class ShadowMaps:
    depth: jax.Array  # [C, S, S] f32 reverse-Z light depth
    matrices: jax.Array  # [C, 4, 4] world -> light clip
    world_sizes: jax.Array  # [C] ortho world diameter per cascade
    resolution: int = field(metadata=dict(static=True), default=1024)
    overflow: jax.Array = None  # [] bool — any cascade's instance/pair
    #   capacity overflowed (geometry silently dropped otherwise)
    # named sub-flags (which ceiling): expand / compact / pairs_opaque /
    # pairs_masked — populated by render_shadow_cascades
    overflow_detail: dict = None
    # VSM moments (filter="vsm"): TWO [C*Sm*Sm, 4] prefiltered quad
    # tables (Sm = resolution // vsm_moment_scale) — the edge-clamped
    # bilinear footprint m00|m10|m01|m11 of each texel packed per row,
    # mu (E[d]) and e2 (E[d^2]) separately.
    # Two 16-byte-row gathers per pixel: measured ~2 ns/row on v5e,
    # while one 32-byte (k=8) row gather scalarizes to ~10.6 ns/row
    # (tools/gather_microbench.py — k<=4 rows are the fast regime)
    moments: jax.Array = None  # mu quads [C*Sm*Sm, 4]
    moments2: jax.Array = None  # e2 quads [C*Sm*Sm, 4]
    # moment-table resolution (S // vsm_moment_scale)
    moment_res: int = field(metadata=dict(static=True), default=1024)


def cascade_views(
    camera_view: ViewParams,
    fovy: float,
    aspect: float,
    light_dir,  # [3] direction TOWARDS the light
    settings: ShadowSettings,
    znear: float = 0.05,
):
    """Fit one ortho view per cascade (shadow_renderer.rs:466-554):
    log/uniform blended splits, bounding sphere of each subfrustum,
    texel snapping in light space."""
    from orbit_tpu.math.frustum import frustum_split

    views = []
    inv_view = jnp.linalg.inv(camera_view.view)
    ld = normalize(jnp.asarray(light_dir, jnp.float32))
    up = jnp.where(
        jnp.abs(ld[1]) < 0.99,
        jnp.array([0.0, 1.0, 0.0]),
        jnp.array([1.0, 0.0, 0.0]),
    )
    n = settings.cascade_count
    splits = [znear] + [
        frustum_split(znear, settings.max_distance, settings.split_lambda, (i + 1) / n)
        for i in range(n)
    ]
    for i in range(n):
        near_i, far_i = splits[i], splits[i + 1]
        corners_v = perspective_corners(fovy, aspect, near_i, far_i)  # [8,3]
        ch = jnp.concatenate([corners_v, jnp.ones((8, 1))], axis=-1)
        corners_w = (ch @ inv_view.T)[:, :3]
        center = corners_w.mean(axis=0)
        radius = jnp.max(jnp.linalg.norm(corners_w - center, axis=-1)) * 1.001

        # texel snap: quantize the light-space center (shadow_renderer.rs:520-531)
        texel = 2.0 * radius / settings.resolution
        s = normalize(jnp.cross(ld, up))
        u = jnp.cross(s, ld)
        cx = jnp.dot(center, s)
        cy = jnp.dot(center, u)
        snap_x = jnp.floor(cx / texel) * texel - cx
        snap_y = jnp.floor(cy / texel) * texel - cy
        center = center + s * snap_x + u * snap_y

        zextra = radius * 1.5  # capture occluders behind the subfrustum
        eye = center + ld * (radius + zextra)
        view = make_ortho_view(
            eye, center, up,
            half_width=radius, half_height=radius,
            znear=0.0, zfar=2.0 * radius + zextra,
        )
        view = _add_camera_cull_planes(view, camera_view, ld)
        views.append((view, radius))
    return views


def _add_camera_cull_planes(cascade_view, camera_view, ld):
    """Extend a cascade's cull planes with the CAMERA frustum planes that
    face the light (shadow_renderer.rs:622-651): a caster beyond such a
    plane cannot cast a shadow back across it (shadows travel along -L),
    so it is safely culled from the cascade render. Planes facing away
    from the light stay inactive (their casters can still shadow the
    frustum). This typically halves the shadow pass's draw set."""
    from orbit_tpu.math.frustum import (
        frustum_planes_from_matrix,
        normalize_plane,
    )

    # camera frustum planes in WORLD space (first 5; far is trivial
    # under the reverse-Z infinite projection)
    pw = normalize_plane(
        frustum_planes_from_matrix(camera_view.view_proj)
    )[:5]
    facing = jnp.sum(pw[:, :3] * ld[None, :], axis=-1) >= 0.0
    # world plane -> cascade view space: n_v = R n_w, d_v = d_w - n_v.t
    V = cascade_view.view
    n_v = pw[:, :3] @ V[:3, :3].T
    d_v = pw[:, 3] - n_v @ V[:3, 3]
    p_v = jnp.concatenate([n_v, d_v[:, None]], axis=-1)
    inactive = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1e30], jnp.float32), p_v.shape
    )
    extra = jnp.where(facing[:, None], p_v, inactive)

    from dataclasses import replace as _replace

    planes = jnp.concatenate(
        [cascade_view.cull_planes[:5], extra, jnp.zeros((2, 4))]
    )
    return _replace(
        cascade_view, cull_planes=planes, num_cull_planes=jnp.int32(10)
    )


def render_shadow_cascades(
    assets,
    scene,
    num_entities: int,
    camera_view: ViewParams,
    fovy: float,
    aspect: float,
    light_dir,
    settings: ShadowSettings,
    raster_cfg: Optional[RasterConfig] = None,
    instance_capacity: int = 1 << 13,
    use_alpha: bool = False,
    draw_capacity: int = 0,
    alpha_mode_mask: int = 0,
    lod_base: float = 4.0,
    lod_step: float = 1.5,
    view_height: int = 0,
) -> ShadowMaps:
    """Depth-only render of ALL cascades as ONE stacked atlas raster
    through the standard cull machinery (the reference renders its
    cascades through one shared cull+draw path into per-cascade targets,
    shadow_renderer.rs:341-430; here the targets stack into one atlas so
    the raster's fixed costs are paid once — raster.rasterize_depth_views).

    use_alpha: scenes with MASKED materials route masked casters through
    the alpha-test depth kernel so cutouts punch holes in the shadow
    maps (reference: shadow.frag:23-38 alpha-cutoff discard); opaque
    casters take the cheap immediate-commit kernel.

    instance_capacity / draw_capacity accept an int or a PER-CASCADE
    tuple: every capacity slot costs expansion/geometry work whether
    used or not, and near cascades see a fraction of the far cascades'
    casters, so snug per-cascade ceilings cut dead prep time (the
    overflow flags still guard every one)."""
    from orbit_tpu.raster.api import rasterize_depth_views

    S = settings.resolution
    cfg = raster_cfg or RasterConfig()
    geoms, mats, sizes = [], [], []
    ovf_expand = jnp.zeros((), bool)
    ovf_compact = jnp.zeros((), bool)

    def per_cascade(v, ci):
        return v[ci] if isinstance(v, (tuple, list)) else v

    for ci, (view, radius) in enumerate(
        cascade_views(camera_view, fovy, aspect, light_dir, settings)
    ):
        inst_cap = per_cascade(instance_capacity, ci)
        draw_cap = per_cascade(draw_capacity, ci)
        # LOD floor from this cascade's texel size (see ShadowSettings)
        min_lod = 0
        if settings.lod_texel_scale > 0 and view_height > 0:
            texel_w = 2.0 * radius / S
            px_per_m = 2.0 * jnp.tan(fovy * 0.5) / view_height
            d_eq = settings.lod_texel_scale * texel_w / px_per_m
            lf = jnp.log2(
                jnp.maximum(d_eq, 1e-6) / lod_base
            ) / jnp.log2(jnp.float32(lod_step))
            min_lod = jnp.clip(
                jnp.maximum(lf + 1.0, 0.0).astype(jnp.int32), 0, 7
            )
        draw_e, lod_idx, _ = cull_entities(
            assets, scene, num_entities,
            cull_view=view.view,
            cull_planes=view.cull_planes,
            num_planes=view.num_cull_planes,
            occlusion_pass=PASS_SINGLE,
            is_ortho=True,
            lod_base=lod_base,
            lod_step=lod_step,
            min_lod=min_lod,
        )
        ie, im, il, iv, ovf_e = expand_instances(
            assets, draw_e, lod_idx, scene.entity_mesh, inst_cap
        )
        ovf_expand = ovf_expand | ovf_e
        draw_m, _ = cull_meshlet_instances(
            assets, scene, ie, im, iv,
            cull_view=view.view,
            cull_planes=view.cull_planes,
            num_planes=view.num_cull_planes,
            occlusion_pass=PASS_SINGLE,
            is_ortho=True,
            use_meshlet_occlusion=False,
            alpha_mode_mask=alpha_mode_mask,
        )
        # drawn-instance compaction (see pipeline): geometry/raster cost
        # tracks the cascade's real draw count, not the expansion cap
        if draw_cap and draw_cap < inst_cap:
            from orbit_tpu.cull.entity_cull import compact_drawn

            ie, im, draw_m, ovf_c = compact_drawn(
                ie, im, draw_m, draw_cap
            )
            ovf_compact = ovf_compact | ovf_c
        geom = process_geometry(
            assets, im, scene.entity_model[ie], view.view_proj, S, S,
            inst_valid=draw_m,
        )
        geoms.append(geom)
        mats.append(view.view_proj)
        sizes.append(radius * 2.0)

    depth_all, ovf_o, ovf_m = rasterize_depth_views(
        geoms, S, cfg,
        alpha_masks=assets.alpha_masks if use_alpha else None,
        tri_ac=assets.tri_ac if use_alpha else None,
        pair_capacities=settings.pair_capacities,
        masked_pair_capacities=settings.masked_pair_capacities,
    )
    detail = {
        "expand": ovf_expand,
        "compact": ovf_compact,
        "pairs_opaque": ovf_o,
        "pairs_masked": ovf_m,
    }
    overflow = ovf_expand | ovf_compact | ovf_o | ovf_m
    moments = moments2 = None
    if settings.filter == "vsm":
        moments, moments2 = compute_vsm_moments(
            depth_all, settings.vsm_blur_taps,
            scale=settings.vsm_moment_scale,
        )
    return ShadowMaps(
        depth=depth_all,
        matrices=jnp.stack(mats),
        world_sizes=jnp.stack(sizes),
        resolution=S,
        overflow=overflow,
        overflow_detail=detail,
        moments=moments,
        moments2=moments2,
        moment_res=S // settings.vsm_moment_scale,
    )


def compute_vsm_moments(depth, taps: int, scale: int = 1):
    """Dense separable box prefilter of the VSM moments (E[d], E[d^2]),
    d = 1 - reverse-Z light depth (background z=0 -> d=1 = far).

    This is the TPU-native half of shadow filtering: the blur is a
    regular stencil over the whole cascade (VPU-friendly, no gathers);
    the per-pixel resolve then needs ONE moment sample instead of the
    PCSS tap cloud. Returns TWO [C*Sm*Sm, 4] quad tables (mu, e2), each
    row packing the edge-clamped bilinear footprint m00|m10|m01|m11 of
    one texel: the full bilinear blend costs two 16-byte row gathers.
    (4 separate 2-wide tap gathers cost ~46 ms/frame at 1080p; one
    packed 8-wide row scalarizes to ~30 ms; two 4-wide rows ride the
    fast k<=4 gather regime at ~8 ms — tools/gather_microbench.py.)

    scale = 2: moments are stored at HALF the cascade resolution
    (Sm = S // 2). The 2x2 box downsample of (d, d^2) composed with a
    half-width blur approximates the full-res blur's world-space
    kernel, and the moment gather tables shrink 4x (the per-pixel
    gather is the cost driver at 1080p).
    """
    C, S, _ = depth.shape
    d = 1.0 - depth
    x = jnp.stack([d, d * d], axis=-1)  # [C, S, S, 2]
    if scale > 1:
        x = x.reshape(C, S // scale, scale, S // scale, scale, 2).mean(
            axis=(2, 4)
        )
        S = S // scale
        taps = max((taps // scale) | 1, 3)
    r = taps // 2

    def blur_axis(v, axis):
        vp = jnp.pad(
            v,
            [(0, 0)] * axis + [(r, r)] + [(0, 0)] * (v.ndim - axis - 1),
            mode="edge",
        )
        win = [1] * v.ndim
        win[axis] = taps
        s = jax.lax.reduce_window(
            vp, 0.0, jax.lax.add, tuple(win), (1,) * v.ndim, "valid"
        )
        return s * (1.0 / taps)

    x = blur_axis(blur_axis(x, 1), 2)

    def shift_x(v):  # v[..., x+1, :] with edge clamp
        return jnp.concatenate([v[:, :, 1:], v[:, :, -1:]], axis=2)

    def shift_y(v):
        return jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)

    m10 = shift_x(x)
    m01 = shift_y(x)
    m11 = shift_y(m10)
    mu = jnp.stack(
        [x[..., 0], m10[..., 0], m01[..., 0], m11[..., 0]], axis=-1
    )  # [C, S, S, 4]
    e2 = jnp.stack(
        [x[..., 1], m10[..., 1], m01[..., 1], m11[..., 1]], axis=-1
    )
    return mu.reshape(C * S * S, 4), e2.reshape(C * S * S, 4)


def sample_shadow_vsm(
    shadows: ShadowMaps,
    cascade,  # [N] i32
    clip_pos,  # [N, 4] light-clip position (biased)
    settings: ShadowSettings,
):
    """Chebyshev VSM resolve: one bilinear moment sample per pixel.
    lit upper bound p = sigma^2 / (sigma^2 + (t - mu)^2) for receivers
    beyond the mean occluder depth, 1 otherwise; light bleeding clamped
    (standard VSM tail rescale). Returns [N] lit factor."""
    res = shadows.moment_res
    w = jnp.maximum(jnp.abs(clip_pos[:, 3]), 1e-12)
    ndc = clip_pos[:, :3] / w[:, None]
    u = ndc[:, 0] * 0.5 + 0.5
    v = ndc[:, 1] * -0.5 + 0.5
    t = 1.0 - ndc[:, 2]

    x = jnp.clip(u * res - 0.5, 0.0, res - 1.0)
    y = jnp.clip(v * res - 0.5, 0.0, res - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    base = cascade * (res * res)
    # TWO fast 16-byte row gathers: each quad table carries the full
    # edge-clamped bilinear footprint per texel (compute_vsm_moments)
    addr = base + y0 * res + x0
    qm = shadows.moments[addr]  # [N, 4] mu quad
    qe = shadows.moments2[addr]  # [N, 4] e2 quad

    def blend(q):
        return (q[:, 0] * (1 - fx[:, 0]) + q[:, 1] * fx[:, 0]) * (
            1 - fy[:, 0]
        ) + (q[:, 2] * (1 - fx[:, 0]) + q[:, 3] * fx[:, 0]) * fy[:, 0]

    mu = blend(qm)
    var = jnp.maximum(blend(qe) - mu * mu, settings.vsm_min_variance)
    dd = t - mu
    p = var / (var + dd * dd)
    p = jnp.where(dd <= 0.0, 1.0, p)
    lb = settings.vsm_bleed
    return jnp.clip((p - lb) / (1.0 - lb), 0.0, 1.0)


# ------------------------------------------------------------- sampling


def _vogel_disk(n: int):
    """Deterministic disk sample pattern (forward.frag vogel_disk_sample)."""
    i = np.arange(n, dtype=np.float32)
    r = np.sqrt((i + 0.5) / n)
    theta = i * 2.4
    return np.stack([r * np.cos(theta), r * np.sin(theta)], -1).astype(
        np.float32
    )


def _shadow_bilinear(shadow_depth, cascade, u, v, res):
    from orbit_tpu.utils import gather3

    x = u * res - 0.5
    y = v * res - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, res - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, res - 1)
    x1 = jnp.minimum(x0 + 1, res - 1)
    y1 = jnp.minimum(y0 + 1, res - 1)
    fx = jnp.clip(x - x0, 0, 1)
    fy = jnp.clip(y - y0, 0, 1)
    d00 = gather3(shadow_depth, cascade, y0, x0)
    d10 = gather3(shadow_depth, cascade, y0, x1)
    d01 = gather3(shadow_depth, cascade, y1, x0)
    d11 = gather3(shadow_depth, cascade, y1, x1)
    return (d00 * (1 - fx) + d10 * fx) * (1 - fy) + (
        d01 * (1 - fx) + d11 * fx
    ) * fy


def _gather_cmp(shadow_depth, cascade, u, v, z, res):
    """textureGather + GREATER_OR_EQUAL compare, averaged (one PCF tap)."""
    from orbit_tpu.utils import gather3

    x = jnp.clip(u * res - 0.5, 0.0, res - 1.0)
    y = jnp.clip(v * res - 0.5, 0.0, res - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, res - 1)
    y1 = jnp.minimum(y0 + 1, res - 1)
    hits = (
        (z >= gather3(shadow_depth, cascade, y0, x0)).astype(jnp.float32)
        + (z >= gather3(shadow_depth, cascade, y0, x1))
        + (z >= gather3(shadow_depth, cascade, y1, x0))
        + (z >= gather3(shadow_depth, cascade, y1, x1))
    )
    return hits * 0.25


def sample_shadow_pcss(
    shadows: ShadowMaps,
    cascade,  # [N] i32
    clip_pos,  # [N, 4] light-clip position (biased)
    pixel_xy,  # [N, 2] screen coords for IGN rotation
    light_inner_radius,  # scalar: light angular size driver
    settings: ShadowSettings,
):
    """PCSS (forward.frag pcf_poisson:134-168). Returns [N] lit factor."""
    res = shadows.resolution
    w = jnp.maximum(jnp.abs(clip_pos[:, 3]), 1e-12)
    ndc = clip_pos[:, :3] / w[:, None]
    u = ndc[:, 0] * 0.5 + 0.5
    v = ndc[:, 1] * -0.5 + 0.5
    z = ndc[:, 2]

    from orbit_tpu.utils import gather1 as _g1

    inv_world = 1.0 / jnp.maximum(
        _g1(shadows.world_sizes, cascade), 1e-6
    )  # [N]
    theta = interleaved_gradient_noise(pixel_xy) * 2.0 * np.pi
    c, s = jnp.cos(theta), jnp.sin(theta)

    disk = jnp.asarray(_vogel_disk(max(settings.pcf_samples, settings.blocker_samples)))

    def rotate(off):
        return jnp.stack(
            [off[0] * c - off[1] * s, off[0] * s + off[1] * c], axis=-1
        )

    # blocker search (penumbra_poisson)
    search_r = settings.blocker_search_radius * inv_world
    blockers = jnp.zeros_like(z)
    blocker_depth = jnp.zeros_like(z)
    for i in range(settings.blocker_samples):
        off = rotate(disk[i]) * search_r[:, None]
        d = _shadow_bilinear(
            shadows.depth, cascade, u + off[:, 0], v + off[:, 1], res
        )
        hit = d > z
        blockers = blockers + hit
        blocker_depth = blocker_depth + jnp.where(hit, 1.0 - d, 0.0)

    avg_blocker = blocker_depth / jnp.maximum(blockers, 1.0)
    all_or_none = (blockers == 0) | (blockers == settings.blocker_samples)
    early = 1.0 - blockers / settings.blocker_samples

    uv_light_size = light_inner_radius * inv_world
    penumbra = (
        ((1.0 - z) - avg_blocker) / jnp.maximum(avg_blocker, 1e-6)
    ) * uv_light_size
    filter_r = jnp.maximum(penumbra * inv_world, 1.0 / res)

    lit = jnp.zeros_like(z)
    for i in range(settings.pcf_samples):
        off = rotate(disk[i]) * filter_r[:, None]
        lit = lit + _gather_cmp(
            shadows.depth, cascade, u + off[:, 0], v + off[:, 1], z, res
        )
    lit = lit / settings.pcf_samples

    return jnp.where(all_or_none, early, lit)


def select_cascade(shadows: ShadowMaps, world_pos):
    """First cascade whose NDC bounds contain the point
    (forward.frag:406-421 check_ndc_bounds loop). Returns ([N] idx, [N,4]
    clip pos at that cascade, [N] in-any-cascade)."""
    ph = jnp.concatenate([world_pos, jnp.ones_like(world_pos[:, :1])], -1)
    clips = jnp.einsum("cab,nb->nca", shadows.matrices, ph)  # [N,C,4]
    w = jnp.where(jnp.abs(clips[..., 3]) < 1e-12, 1e-12, clips[..., 3])
    ndc = clips[..., :3] / w[..., None]
    inside = (
        (ndc[..., 0] >= -1.0) & (ndc[..., 0] <= 1.0)
        & (ndc[..., 1] >= -1.0) & (ndc[..., 1] <= 1.0)
        & (ndc[..., 2] >= 0.0) & (ndc[..., 2] <= 1.0)
    )  # [N,C]
    any_inside = inside.any(axis=1)
    first = jnp.argmax(inside, axis=1).astype(jnp.int32)
    return first, any_inside


def shadow_factor(
    shadows: ShadowMaps,
    gbuf_world_pos,  # [N,3]
    normal,  # [N,3]
    light_dir,  # [3]
    light_inner_radius,
    pixel_xy,  # [N,2]
    settings: ShadowSettings,
):
    """Full directional-shadow evaluation with normal-offset + oriented
    bias (forward.frag:424-445). Returns [N] lit factor in [0,1]."""
    cascade, any_inside = select_cascade(shadows, gbuf_world_pos)

    C = shadows.matrices.shape[0]
    onehot = (
        cascade[:, None] == jnp.arange(C, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    n_dot_l = jnp.sum(normal * light_dir[None, :], axis=-1)
    texel_world = (onehot @ shadows.world_sizes) / shadows.resolution
    normal_off = (
        texel_world
        * settings.normal_bias_scale
        * jnp.clip(1.0 - n_dot_l, 0.0, 1.0)
    )[:, None] * normal
    # push lit surfaces TOWARD the light: the deferred world-position
    # reconstruction (depth round-trip) puts points slightly inside the
    # surface, so unlike the reference's forward path (which biases away
    # from the light to prevent leaks, forward.frag get_oriented_bias)
    # the net bias here must raise the receiver's light-space depth
    oriented = jnp.where(
        n_dot_l > 0.0, settings.oriented_bias, -settings.oriented_bias
    )
    pos = gbuf_world_pos + normal_off + oriented[:, None] * light_dir[None, :]

    # transform the biased position by ALL cascade matrices at once (one
    # [N,4]x[4,C*4] MXU matmul) and one-hot select the chosen cascade's
    # clip — materializing a per-pixel [N,4,4] matrix gather + batched
    # matvec here cost ~30 ms/frame at 1080p (two of the frame's top-10
    # ops); this form is ~1 ms
    ph = jnp.concatenate([pos, jnp.ones_like(pos[:, :1])], -1)
    clips_all = jnp.einsum("cab,nb->nca", shadows.matrices, ph)  # [N,C,4]
    clip = jnp.einsum("nc,nca->na", onehot, clips_all)
    if settings.filter == "vsm":
        lit = sample_shadow_vsm(shadows, cascade, clip, settings)
    else:
        lit = sample_shadow_pcss(
            shadows, cascade, clip, pixel_xy, light_inner_radius, settings
        )
    return jnp.where(any_inside, lit, 1.0)
