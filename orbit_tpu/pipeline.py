"""Pipeline: the fully GPU-driven culled frame (the TPU Context/App layer).

Orchestrates the two-phase occlusion-culled frame of the reference
(forward.rs:213-430 + app.rs:1050-1387):

  early pass : entity cull (prev-frame visibility) -> meshlet cull (bitset)
               -> raster what was visible last frame
  HiZ        : min-reduction depth pyramid from the early depth
  late pass  : entity+meshlet cull with occlusion tests -> raster only the
               newly visible set on top of the early buffers
  state      : visibility flags written back for the next frame
  shade      : one deferred PBR pass over the final visibility buffer

Everything is one traced jaxpr — the render graph "barriers" of the
reference are simply data dependencies here.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbit_tpu.camera import ViewParams
from orbit_tpu.cull import (
    build_depth_pyramid,
    cull_entities,
    cull_meshlet_instances,
    expand_instances,
)
from orbit_tpu.cull.entity_cull import PASS_EARLY, PASS_LATE, PASS_SINGLE
from orbit_tpu.cull.visibility import (
    VisibilityState,
    build_visibility_layout,
    gather_meshlet_bits,
    initial_state,
    scatter_meshlet_bits,
)
from orbit_tpu.math.color import srgb_to_linear, uint_hash
from orbit_tpu.passes import post as post_mod
from orbit_tpu.passes import shadow as shadow_mod
from orbit_tpu.passes.bloom import BloomSettings as BloomSettings_t
from orbit_tpu.passes.debug_overlay import DebugSettings as DebugSettings_t
from orbit_tpu.passes.cluster import ClusterSettings as ClusterSettings_t
from orbit_tpu.passes.ssao import SsaoSettings as SsaoSettings_t
from orbit_tpu.raster import (
    RasterConfig,
    process_geometry,
    rasterize,
    rasterize_gbuffer,
)
from orbit_tpu.renderer import RenderSettings, camera_ray_dirs
from orbit_tpu.shade import gbuffer as gbuffer_mod
from orbit_tpu.shade import ibl as ibl_mod
from orbit_tpu.shade import pbr as pbr_mod


@dataclass(frozen=True)
class BandInfo:
    """Multi-chip framebuffer-band context (the 'fb' mesh axis).

    When a frame runs inside shard_map over a device mesh with an 'fb'
    axis, each device renders a horizontal band of the framebuffer:
    binning/raster/shading are band-local, while full-frame consumers
    (HiZ pyramid, SSAO, clusters, bloom) all-gather over ICI. Band
    output is bit-identical to the same rows of a single-device frame.
    Replaces the reference's single-GPU queue model (device.rs:700-735)
    with the TPU-native scaling axis."""

    axis: str  # mesh axis name to all_gather over
    n_bands: int  # static device count along the axis
    rows_per_band: int  # static band height in raster tile rows
    row0: object  # first global tile row of this band (traced ok)

    def gather(self, x):
        """Concatenate bands along rows (axis 0) into the full image."""
        return jax.lax.all_gather(x, self.axis, axis=0, tiled=True)

    def slice_rows(self, x_full, tile_h: int):
        """Take this band's pixel rows from a full-height image."""
        start = (self.row0 * tile_h,) + (0,) * (x_full.ndim - 1)
        shape = (self.rows_per_band * tile_h,) + x_full.shape[1:]
        return jax.lax.dynamic_slice(x_full, start, shape)


@dataclass(frozen=True)
class CullSettings:
    frustum: bool = True
    cone: bool = True
    occlusion: bool = True  # two-pass HiZ
    meshlet_occlusion: bool = True
    lod_base: float = 4.0
    lod_step: float = 1.5
    min_lod: int = 0
    max_lod: int = 7


@dataclass(frozen=True)
class PipelineConfig:
    width: int = 1280
    height: int = 720
    raster: RasterConfig = field(default_factory=RasterConfig)
    cull: CullSettings = field(default_factory=CullSettings)
    instance_capacity: int = 1 << 13  # per pass
    # the late occlusion pass draws only the newly-visible difference —
    # a fraction of the early pass; its capacities (and therefore its
    # static cost) can be much smaller
    late_instance_capacity: int = 0  # 0 = same as instance_capacity
    late_pair_capacity: int = 0  # 0 = same as raster.pair_capacity
    # drawn-instance compaction: after the meshlet-level cull, compact
    # the surviving instances into this many slots before geometry +
    # raster (their static cost then tracks the real draw count, not the
    # expansion capacity). 0 = no compaction. The late pass draws only
    # the newly-visible difference, so its draw capacity can be tiny
    # even though its EXPANSION capacity must cover every visible entity.
    draw_capacity: int = 0
    late_draw_capacity: int = 0
    # drawn-instance compaction for the shadow cascade renders (0 = off)
    shadow_draw_capacity: int = 0
    # expansion capacity for the cascade renders (0 = inherit the main
    # view's instance_capacity); cascades see far fewer meshlet
    # instances thanks to the texel LOD floor, and the expansion
    # machinery's cost is O(capacity) per cascade
    shadow_instance_capacity: int = 0
    render_mode: int = 0
    exposure: float = 1.0
    shadows: Optional["shadow_mod.ShadowSettings"] = None
    shadow_raster: Optional[RasterConfig] = None
    clusters: Optional["ClusterSettings_t"] = None
    ssao: Optional["SsaoSettings_t"] = None
    bloom: Optional["BloomSettings_t"] = None
    # sampler parity (reference SamplerKind, device.rs:1291-1312): the 7
    # hardware samplers map to filter x wrap combinations here, plus the
    # ShadowComparison sampler (= passes/shadow VSM/PCSS filtering) and
    # the ReduceMin sampler (= cull/hiz min-mip atlas).
    # PER-TEXTURE samplers (gltf_loader.rs:559-569 parity): the fused
    # "bilinear"/"trilinear" modes read each material's own wrap +
    # filter (baked from the glTF samplers into GB_SAMPLER and the
    # quad-table neighbors; one sampler per MATERIAL — its base-color
    # texture's). texture_wrap is then only the bake-time default. The
    # legacy op-by-op path ("aniso", or fused_shade=False) still applies
    # these as global overrides.
    texture_filter: str = "nearest"  # nearest | bilinear | trilinear | aniso
    texture_wrap: str = "repeat"  # repeat | clamp | mirror
    max_aniso: int = 4  # probe budget for texture_filter="aniso"
    env_filter: str = "nearest"  # nearest | nearest_mip | trilinear
    supersample: int = 1  # SSAA factor (the TPU MSAA: k*k shading samples)
    # in-frame debug overlays (bounding spheres / frustum / cascades /
    # wireframe), composited onto the final image inside the jitted frame
    debug: Optional["DebugSettings_t"] = None
    # fused deferred shade: ONE Pallas kernel from G-buffer tiles to sRGB
    # (shade/fused.py), consuming the rasterizer's native tile layout.
    # Auto-falls-back to the op-by-op XLA shade for configs the kernel
    # does not cover (debug modes, SSAO/clusters/shadows/bloom/SSAA,
    # non-nearest filtering, band-sharded frames).
    fused_shade: bool = True



def _any_overflow(d):
    """OR-reduce the named per-capacity overflow flags to one scalar."""
    import functools as _ft

    vals = list(d.values())
    return _ft.reduce(lambda a, b: a | b, vals) if vals else jnp.zeros((), bool)

class Pipeline:
    """Holds static per-scene layout; `frame` is the jit-able step."""

    def __init__(self, config: PipelineConfig, assets_meta, scene_meta,
                 assets_host_lod_count, entity_mesh_host):
        self.config = config
        self.scene_meta = scene_meta
        offsets, total = build_visibility_layout(
            assets_host_lod_count, entity_mesh_host, scene_meta.num_entities
        )
        # keep as NUMPY: a device array closed over by the jitted frame
        # becomes an executable-embedded device constant, which permanently
        # degrades dispatch on this TPU stack (numpy constants are baked
        # into the program and are safe)
        self.vis_offsets = np.asarray(offsets)
        self.vis_total = total
        # winner-level alpha test in the rasterizer (MASKED materials)
        self.use_alpha = bool(getattr(assets_meta, "has_alpha_masks", False))
        # slice the VMEM-resident mask atlas to the slots actually baked
        # (capacity padding would waste raster-kernel VMEM)
        from orbit_tpu.raster.kernel_common import ALPHA_MASK_RES

        self.mask_rows = ALPHA_MASK_RES * int(
            getattr(assets_meta, "num_mask_slots", 0) or 0
        )
        # cull-stage alpha-mode filter (meshlet_cull.comp:207-213): with
        # TRANSPARENT materials in the store, the opaque G-buffer and
        # shadow passes draw only OPAQUE|MASKED meshlets
        self.opaque_alpha_mask = (
            0b011
            if bool(getattr(assets_meta, "has_transparent", False))
            else 0
        )

    def initial_state(self) -> VisibilityState:
        return initial_state(
            self.scene_meta.entity_capacity, self.vis_total
        )

    def _slice_masks(self, assets):
        if self.use_alpha and 0 < self.mask_rows < assets.alpha_masks.shape[0]:
            return replace(
                assets, alpha_masks=assets.alpha_masks[: self.mask_rows]
            )
        return assets

    # ------------------------------------------------------------------
    def cull_and_raster(
        self,
        assets,
        scene,
        view: ViewParams,
        state: VisibilityState,
        cull_view: Optional[jax.Array] = None,
        band: Optional[BandInfo] = None,
        tiled_io: bool = False,
    ):
        """The two-phase cull+raster producing the final visibility buffer.

        Returns (depth, vis, inst arrays (concatenated early+late), setup,
        new_state, overflow). With `band`, the returned images are this
        device's framebuffer band; culling is replicated (identical on
        every band of a view) and the HiZ pyramid is built from the
        all-gathered early depth. With `tiled_io`, framebuffers stay in
        the rasterizer's native tile layout throughout (raster.layout).
        """
        cfg = self.config
        assets = self._slice_masks(assets)
        W, H = cfg.width * cfg.supersample, cfg.height * cfg.supersample
        row_window = None
        if band is not None:
            row_window = (band.row0, band.rows_per_band)
        C = cfg.instance_capacity
        cv = view.view if cull_view is None else cull_view
        two_pass = cfg.cull.occlusion

        common = dict(
            cull_view=cv,
            cull_planes=view.cull_planes,
            num_planes=view.num_cull_planes if cfg.cull.frustum else 0,
            znear=view.znear,
            zfar=view.zfar,
            p00=view.p00,
            p11=view.p11,
            is_ortho=view.is_ortho,
        )
        lod = dict(
            lod_base=cfg.cull.lod_base,
            lod_step=cfg.cull.lod_step,
            min_lod=cfg.cull.min_lod,
            max_lod=cfg.cull.max_lod,
        )

        def run_pass(pass_id, pyramid, prev_entity, init, base):
            from orbit_tpu.graph import pass_scope

            with pass_scope(f"cull_pass_{pass_id}"):
                return _run_pass_inner(pass_id, pyramid, prev_entity, init, base)

        def _run_pass_inner(pass_id, pyramid, prev_entity, init, base):
            late = pass_id == PASS_LATE
            cap_i = (
                cfg.late_instance_capacity or C if late else C
            )
            raster_cfg = cfg.raster
            if late and cfg.late_pair_capacity:
                from dataclasses import replace as _replace

                raster_cfg = _replace(
                    cfg.raster, pair_capacity=cfg.late_pair_capacity
                )
            draw_e, lod_idx, vis_e = cull_entities(
                assets, scene, self.scene_meta.num_entities,
                occlusion_pass=pass_id, pyramid=pyramid,
                prev_visible=prev_entity, **common, **lod,
            )
            ie, im, il, iv, ovf = expand_instances(
                assets, draw_e, lod_idx, scene.entity_mesh, cap_i
            )
            prev_bits = gather_meshlet_bits(
                state, self.vis_offsets, ie, il, iv
            )
            draw_m, vis_m = cull_meshlet_instances(
                assets, scene, ie, im, iv,
                occlusion_pass=pass_id, pyramid=pyramid,
                prev_visible=prev_bits,
                use_meshlet_occlusion=cfg.cull.meshlet_occlusion,
                use_cone=cfg.cull.cone,
                alpha_mode_mask=self.opaque_alpha_mask,
                **common,
            )
            # drawn-instance compaction: geometry/raster slot space then
            # tracks the real draw count, not the expansion capacity
            # (crucial for the late pass, which expands every visible
            # entity but draws only the newly-visible meshlets)
            dcap = (
                cfg.late_draw_capacity if late else cfg.draw_capacity
            )
            ovf_c = jnp.zeros((), bool)
            if dcap and dcap < cap_i:
                from orbit_tpu.cull.entity_cull import compact_drawn

                ce, cm, cv, ovf_c = compact_drawn(ie, im, draw_m, dcap)
            else:
                ce, cm, cv = ie, im, draw_m
            geom = process_geometry(
                assets, cm, scene.entity_model[ce], view.view_proj, W, H,
                inst_valid=cv,
            )
            depth, vis, gb, bins = rasterize_gbuffer(
                geom, H, W, raster_cfg, init=init, vis_base_offset=base,
                row_window=row_window, tiled_io=tiled_io,
                alpha_masks=assets.alpha_masks if self.use_alpha else None,
                tri_ac=assets.tri_ac,
                overdraw=cfg.render_mode == 7,
                a2c_samples=cfg.supersample,
            )
            return dict(
                ie=ce, im=cm, il=il, iv=cv, vis_m=vis_m, vis_e=vis_e,
                full_ie=ie, full_il=il, full_iv=iv,
                depth=depth, vis=vis, gb=gb,
                # named per-capacity flags (the reference's runtime
                # validation analog): which ceiling was hit, not just
                # whether one was
                overflow={
                    "expand": ovf, "draw_compact": ovf_c,
                    "pairs": bins.overflow,
                },
            )

        if two_pass:
            early = run_pass(PASS_EARLY, None, state.entity_visible, None, 0)
            early_depth = early["depth"]
            if tiled_io:
                from orbit_tpu.raster.layout import tiles_to_image

                early_depth = tiles_to_image(
                    early_depth, H, W, cfg.raster.tile_h, cfg.raster.tile_w
                )
            if band is not None:
                early_depth = band.gather(early_depth)
            pyramid = build_depth_pyramid(early_depth)
            late = run_pass(
                PASS_LATE, pyramid, None,
                (early["depth"], early["vis"], early["gb"]),
                cfg.draw_capacity or C,
            )
            depth, vis, gb = late["depth"], late["vis"], late["gb"]
            inst = (late["ie"], late["im"], late["iv"])
            # write back visibility for next frame — over the FULL
            # (pre-compaction) instance list: every visible meshlet's
            # bit must be written, drawn this frame or not
            new_state = VisibilityState(
                entity_visible=late["vis_e"],
                meshlet_visible=state.meshlet_visible,
            )
            new_state = scatter_meshlet_bits(
                new_state, self.vis_offsets, late["full_ie"],
                late["full_il"], late["full_iv"], late["vis_m"],
            )
            overflow = {
                **{"early_" + k: v for k, v in early["overflow"].items()},
                **{"late_" + k: v for k, v in late["overflow"].items()},
            }
        else:
            single = run_pass(PASS_SINGLE, None, None, None, 0)
            depth, vis, gb = single["depth"], single["vis"], single["gb"]
            inst = (single["ie"], single["im"], single["iv"])
            new_state = state
            overflow = single["overflow"]
            pyramid = None

        return depth, vis, gb, new_state, overflow, inst, pyramid

    # ------------------------------------------------------------------
    def _frame_fused(
        self, assets, scene, view, env, state, num_lights, cull_view
    ):
        """The fast path: tiled raster -> ONE fused Pallas shade kernel.

        Covers the full north-star effects stack: CSM shadows enter as
        per-pixel lit planes (VSM: dense moment prefilter + one bilinear
        tap; PCSS also works, at its gather cost), SSAO as an AO plane,
        clustered point lights as per-tile light lists walked IN the
        kernel, and bloom via the kernel's HDR-tile output mode. No
        image<->tile transposes on the core path except the cheap final
        conversions, the HiZ pyramid input and the effect-plane builds."""
        from orbit_tpu.raster.layout import (
            gbuf_tiles_to_rows,
            image_to_tiles,
            tiles_to_image,
        )
        from orbit_tpu.raster.kernel_common import GB_NRM, GB_ROWS
        from orbit_tpu.shade.fused import shade_deferred_tiled, unpack_color

        cfg = self.config
        W, H = cfg.width, cfg.height
        th, tw = cfg.raster.tile_h, cfg.raster.tile_w
        depth_t, vis_t, gb_t, new_state, overflow, inst, pyramid = (
            self.cull_and_raster(
                assets, scene, view, state, cull_view, tiled_io=True
            )
        )
        backend = cfg.raster.resolve_backend()
        depth_img = tiles_to_image(depth_t, H, W, th, tw)

        use_vsm = (
            cfg.shadows is not None and cfg.shadows.filter == "vsm"
        )
        # geometric normal image (world space) for the XLA effect
        # planes. The fused VSM path computes normals/worldpos IN the
        # kernels, so only SSAO and PCSS lit planes still need these.
        need_normals = cfg.ssao is not None or (
            cfg.shadows is not None and not use_vsm
        )
        if need_normals:
            from orbit_tpu.math.transforms import normalize as _nrm

            gb_rows = gbuf_tiles_to_rows(gb_t, GB_ROWS)
            nrm_img = tiles_to_image(
                gb_rows[GB_NRM : GB_NRM + 3], H, W, th, tw
            )  # [3, H, W]
            n_world = _nrm(nrm_img.reshape(3, -1).T)  # [H*W, 3]

        # --- CSM shadows. VSM: cascade renders + moment prefilter only;
        # the per-pixel work (cascade select, bias, Chebyshev) moved
        # INTO the fused kernels (shade/fused._vsm_math), replacing the
        # XLA lit-plane pipeline that cost ~30 ms/frame at 1080p.
        # PCSS: legacy lit planes (its tap cloud can't run in-kernel).
        lit_t = None
        shadow_slots = ()
        vsm_sets = ()
        vsm_slots = ()
        if cfg.shadows is not None and not view.is_ortho:
            from orbit_tpu.scene import LIGHT_DIRECTIONAL

            fovy = 2.0 * jnp.arctan(1.0 / view.proj[1, 1])
            aspect = view.proj[1, 1] / view.proj[0, 0]
            dir_lights = [
                i
                for i, t in enumerate(
                    self.scene_meta.light_types[:num_lights]
                )
                if t == LIGHT_DIRECTIONAL
            ]
            if dir_lights:
                if not use_vsm:
                    inv_vp = jnp.linalg.inv(view.view_proj)
                    px = (
                        jnp.arange(W * H, dtype=jnp.int32) % W
                    ).astype(jnp.float32) + 0.5
                    py = (
                        jnp.arange(W * H, dtype=jnp.int32) // W
                    ).astype(jnp.float32) + 0.5
                    ndc = jnp.stack(
                        [
                            px / W * 2.0 - 1.0,
                            (1.0 - py / H) * 2.0 - 1.0,
                            depth_img.reshape(-1),
                            jnp.ones((W * H,), jnp.float32),
                        ],
                        axis=-1,
                    )
                    wp = ndc @ inv_vp.T
                    wpos = wp[:, :3] / jnp.where(
                        jnp.abs(wp[:, 3:4]) < 1e-20, 1.0, wp[:, 3:4]
                    )
                    pixel_xy = jnp.stack([px, py], axis=-1)
                planes = []
                sets = []
                for li in dir_lights:
                    sset = shadow_mod.render_shadow_cascades(
                        assets, scene, self.scene_meta.num_entities, view,
                        fovy, aspect, scene.light_dir[li], cfg.shadows,
                        raster_cfg=cfg.shadow_raster or cfg.raster,
                        instance_capacity=(
                            cfg.shadow_instance_capacity
                            or cfg.instance_capacity
                        ),
                        use_alpha=self.use_alpha,
                        draw_capacity=cfg.shadow_draw_capacity,
                        alpha_mode_mask=self.opaque_alpha_mask,
                        lod_base=cfg.cull.lod_base,
                        lod_step=cfg.cull.lod_step,
                        view_height=cfg.height,
                    )
                    for k, v in sset.overflow_detail.items():
                        key = "shadow_" + k
                        overflow[key] = overflow.get(key, False) | v
                    if use_vsm:
                        sets.append(sset)
                        continue
                    lit = shadow_mod.shadow_factor(
                        sset, wpos, n_world, scene.light_dir[li],
                        scene.light_inner_radius[li], pixel_xy,
                        cfg.shadows,
                    )
                    planes.append(
                        image_to_tiles(lit.reshape(H, W), H, W, th, tw)
                    )
                if use_vsm:
                    vsm_sets = tuple(sets)
                    vsm_slots = tuple(dir_lights)
                else:
                    lit_t = jnp.stack(planes)
                    shadow_slots = tuple(dir_lights)

        # --- SSAO -> AO plane
        ao_t = None
        if cfg.ssao is not None and not view.is_ortho:
            from orbit_tpu.passes import ssao as ssao_mod

            normal_view = n_world @ view.view[:3, :3].T
            ao_img = ssao_mod.compute_ssao(
                depth_img, normal_view.reshape(H, W, 3), view, cfg.ssao
            )
            ao_t = image_to_tiles(ao_img, H, W, th, tw)

        # --- clustered point lights -> per-tile lists (exact culling)
        tile_lights = None
        if cfg.clusters is not None:
            from orbit_tpu.passes.cluster import build_tile_lights

            ids, cnt, ovf = build_tile_lights(
                depth_t, scene, num_lights, view, H, W, th, tw,
                cfg.clusters.tile_light_cap,
                cfg.clusters.luminance_cutoff,
            )
            # ovf counts fallback tiles (full-list loop) — a perf
            # diagnostic, NOT an error: no light is ever dropped
            del ovf
            tile_lights = (ids, cnt)

        emit_hdr = cfg.bloom is not None
        ctex_mode = (
            cfg.texture_filter
            if cfg.texture_filter in ("bilinear", "trilinear")
            else "nearest"
        )
        res = shade_deferred_tiled(
            assets, scene, env, view, gb_t, depth_t,
            height=H, width=W, tile_h=th, tile_w=tw,
            light_kinds=tuple(self.scene_meta.light_types[:num_lights]),
            exposure=cfg.exposure,
            backend="xla" if backend == "xla" else "pallas",
            interpret=(backend == "pallas_interpret"),
            lit_t=lit_t, shadow_slots=shadow_slots, ao_t=ao_t,
            vsm_sets=vsm_sets, vsm_slots=vsm_slots,
            vsm_settings=cfg.shadows if vsm_slots else None,
            tile_lights=tile_lights, emit_hdr=emit_hdr,
            ctex_mode=ctex_mode,
        )
        hdr = None
        if emit_hdr:
            from orbit_tpu.passes import bloom as bloom_mod

            ntp, tpx = depth_t.shape
            hdr_rows = res.reshape(ntp, 4, tpx).transpose(1, 0, 2)[:3]
            hdr = tiles_to_image(hdr_rows, H, W, th, tw).transpose(1, 2, 0)
            bloom_img = bloom_mod.compute_bloom(hdr, cfg.bloom)
            srgb = post_mod.tonemap(
                hdr, cfg.exposure, bloom=bloom_img,
                bloom_intensity=cfg.bloom.intensity,
            )
            color = post_mod.to_u8(srgb)
        else:
            color = unpack_color(res, H, W, th, tw)
        if cfg.debug is not None:
            from orbit_tpu.passes.debug_overlay import (
                apply_overlay,
                build_overlay,
            )

            cvp = (
                view.proj @ cull_view
                if cull_view is not None
                else view.view_proj
            )
            segs, cols = build_overlay(
                assets, scene, self.scene_meta.num_entities, cfg.debug,
                cull_view_proj=cvp, inst_entity=inst[0],
                inst_meshlet=inst[1], inst_valid=inst[2],
            )
            color = apply_overlay(
                color, depth_img, view.view_proj, segs, cols, cfg.debug
            )
            if cfg.debug.depth_pyramid_mip >= 0 and pyramid is not None:
                from orbit_tpu.passes.debug_overlay import (
                    depth_pyramid_inset,
                )

                color = depth_pyramid_inset(
                    color, pyramid, cfg.debug.depth_pyramid_mip
                )
        out = {
            "color": color,
            "hdr": hdr,
            "depth": depth_img,
            "vis": tiles_to_image(vis_t, H, W, th, tw),
            "overflow": _any_overflow(overflow),
            "overflow_detail": overflow,
        }
        return out, new_state

    # ------------------------------------------------------------------
    def frame(
        self,
        assets,
        scene,
        view: ViewParams,
        env: Optional[ibl_mod.EnvironmentMap],
        state: VisibilityState,
        num_lights: int,
        cull_view: Optional[jax.Array] = None,
        band: Optional[BandInfo] = None,
    ):
        cfg = self.config
        W, H = cfg.width * cfg.supersample, cfg.height * cfg.supersample
        if band is not None:
            assert cfg.supersample == 1, "band mode does not support SSAA"
            Hl = band.rows_per_band * cfg.raster.tile_h
            row0_px = band.row0 * cfg.raster.tile_h
        else:
            Hl, row0_px = H, 0

        # the fused path covers nearest plus the filtered modes when the
        # quad tables were baked (AssetStore.to_device(filter_tables=
        # True)); filtered modes honor PER-MATERIAL samplers (wrap +
        # filter from the glTF), so the global texture_wrap knob only
        # gates the nearest path (where it must be the baked default)
        filtered_ok = (
            cfg.texture_filter in ("bilinear", "trilinear")
            and assets.ctex_quad is not None
        )
        use_fused = (
            cfg.fused_shade
            and band is None
            and cfg.render_mode == 0
            and env is not None
            and cfg.supersample == 1
            and (
                (
                    cfg.texture_filter == "nearest"
                    and cfg.texture_wrap == "repeat"
                )
                or filtered_ok
            )
            and cfg.env_filter == "nearest"
        )
        if use_fused:
            return self._frame_fused(
                assets, scene, view, env, state, num_lights, cull_view
            )

        depth, vis, gb, new_state, overflow, inst, pyramid = (
            self.cull_and_raster(
                assets, scene, view, state, cull_view, band=band
            )
        )

        inv_vp = jnp.linalg.inv(view.view_proj)

        # SSAO (reference: ssao.rs + ssao.comp; uses G-buffer normals).
        # Neighborhood taps cross band borders, so in band mode SSAO runs
        # on the all-gathered depth/normals and slices its band back out.
        ssao_flat = None
        if cfg.ssao is not None and not view.is_ortho:
            from orbit_tpu.math.transforms import normalize as _nrm
            from orbit_tpu.passes import ssao as ssao_mod
            from orbit_tpu.raster.kernel_common import GB_NRM

            n_world = _nrm(gb[GB_NRM : GB_NRM + 3].reshape(3, -1).T)
            normal_view = n_world @ view.view[:3, :3].T
            nv_img = normal_view.reshape(Hl, W, 3)
            depth_img = depth
            if band is not None:
                nv_img = band.gather(nv_img)
                depth_img = band.gather(depth_img)
            ao_img = ssao_mod.compute_ssao(
                depth_img, nv_img, view, cfg.ssao
            )
            if band is not None:
                ao_img = band.slice_rows(ao_img, cfg.raster.tile_h)
            ssao_flat = ao_img.reshape(-1)

        surface, gbuf = gbuffer_mod.surface_from_gbuffer(
            assets, gb, depth, vis, inv_vp,
            texture_filter=cfg.texture_filter, ssao=ssao_flat,
            row_offset_px=row0_px,
            full_size=(H, W) if band is not None else None,
            texture_wrap=cfg.texture_wrap, max_aniso=cfg.max_aniso,
        )

        shadow_fn = None
        shadows = None
        shadow_li = None
        if cfg.shadows is not None and not view.is_ortho:
            # EVERY directional light casts its own cascaded shadow set
            # (reference: scene.rs:450-464 registers one ShadowCommand per
            # directional light, MAX_SHADOW_COMMANDS=256)
            fovy = 2.0 * jnp.arctan(1.0 / view.proj[1, 1])
            aspect = view.proj[1, 1] / view.proj[0, 0]
            from orbit_tpu.scene import LIGHT_DIRECTIONAL

            dir_lights = [
                i
                for i, t in enumerate(
                    self.scene_meta.light_types[:num_lights]
                )
                if t == LIGHT_DIRECTIONAL
            ]
            if dir_lights:
                shadow_sets = {}
                for li in dir_lights:
                    shadow_sets[li] = shadow_mod.render_shadow_cascades(
                        assets, scene, self.scene_meta.num_entities, view,
                        fovy, aspect, scene.light_dir[li], cfg.shadows,
                        raster_cfg=cfg.shadow_raster or cfg.raster,
                        instance_capacity=(
                            cfg.shadow_instance_capacity
                            or cfg.instance_capacity
                        ),
                        use_alpha=self.use_alpha,
                        draw_capacity=cfg.shadow_draw_capacity,
                        alpha_mode_mask=self.opaque_alpha_mask,
                        lod_base=cfg.cull.lod_base,
                        lod_step=cfg.cull.lod_step,
                        view_height=cfg.height,
                    )
                for sset in shadow_sets.values():
                    for k, v in sset.overflow_detail.items():
                        key = "shadow_" + k
                        overflow[key] = overflow.get(key, False) | v
                shadow_li = dir_lights[0]
                shadows = shadow_sets[shadow_li]  # mode-1 visualization
                px = (
                    jnp.arange(W * Hl, dtype=jnp.int32) % W
                ).astype(jnp.float32) + 0.5
                py = (
                    jnp.arange(W * Hl, dtype=jnp.int32) // W + row0_px
                ).astype(jnp.float32) + 0.5
                pixel_xy = jnp.stack([px, py], axis=-1)

                def shadow_fn(li, gbuf_, surface_):
                    # li is a STATIC slot index from the light loop
                    if li not in shadow_sets:
                        return jnp.ones(gbuf_.world_pos.shape[0])
                    return shadow_mod.shadow_factor(
                        shadow_sets[li], gbuf_.world_pos, surface_.normal,
                        scene.light_dir[li], scene.light_inner_radius[li],
                        pixel_xy, cfg.shadows,
                    )

        # clustered point lights (reference: cluster.rs + light_cluster/*)
        from orbit_tpu.scene import LIGHT_POINT

        clusters = None
        cluster_ids = None
        if cfg.clusters is not None:
            from orbit_tpu.passes import cluster as cluster_mod

            # cluster building consumes the whole depth image (active-
            # cluster marking is a full-screen scatter); bands all-gather
            depth_full = depth if band is None else band.gather(depth)
            clusters = cluster_mod.build_clusters(
                depth_full, scene, num_lights, view, cfg.clusters
            )
            overflow["clusters"] = clusters.overflow
            cluster_ids = cluster_mod.pixel_cluster_ids(
                depth_full, view, cfg.clusters
            )
            if band is not None:
                cluster_ids = band.slice_rows(
                    cluster_ids.reshape(H, W), cfg.raster.tile_h
                ).reshape(-1)
            light_slots = [
                i
                for i, t in enumerate(self.scene_meta.light_types[:num_lights])
                if t != LIGHT_POINT
            ]
        else:
            light_slots = list(range(num_lights))

        mode = cfg.render_mode
        sky_img = None
        if mode == 1:
            # cascade visualization (forward.frag case 1)
            if cfg.shadows is not None and shadow_fn is not None:
                casc, inside = shadow_mod.select_cascade(
                    shadows, gbuf.world_pos
                )
                colors = jnp.array(
                    [
                        [1.0, 0.25, 0.25], [0.25, 1.0, 0.25],
                        [0.25, 0.25, 1.0], [1.0, 1.0, 0.25],
                    ]
                )
                cc = jnp.where(
                    inside[:, None], colors[casc % 4], jnp.float32(0.25)
                )
                ld = scene.light_dir[shadow_li]
                lit = shadow_fn(shadow_li, gbuf, surface)
                diffuse = jnp.maximum(
                    jnp.sum(gbuf.normal * ld[None, :], axis=-1), 0.0
                ) * jnp.maximum(lit, 0.2)
                shaded = cc * (0.3 + diffuse)[:, None]
            else:
                shaded = jnp.full((Hl * W, 3), 0.25)
        elif mode == 2:
            shaded = srgb_to_linear(surface.normal * 0.5 + 0.5)
        elif mode == 3:
            shaded = srgb_to_linear(surface.metallic[:, None].repeat(3, -1))
        elif mode == 4:
            shaded = srgb_to_linear(surface.roughness[:, None].repeat(3, -1))
        elif mode == 5:
            shaded = srgb_to_linear(surface.emissive)
        elif mode == 6:
            shaded = srgb_to_linear(surface.ao[:, None].repeat(3, -1))
        elif mode == 7:
            # exact per-pixel overdraw count accumulated by the rasterizer
            from orbit_tpu.math.color import heat_colormap
            from orbit_tpu.raster.kernel_common import GB_OVERDRAW

            od = gb[GB_OVERDRAW].reshape(-1)
            shaded = heat_colormap(jnp.clip(od / 8.0, 0.0, 1.0))
        elif mode == 8:
            if clusters is not None:
                from orbit_tpu.passes import cluster as cluster_mod

                shaded = cluster_mod.cluster_heatmap(
                    clusters, cluster_ids, (Hl * W,)
                ).reshape(Hl * W, 3)
            else:
                shaded = jnp.zeros((Hl * W, 3))
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
            # one merged prefiltered-environment sample serves BOTH the
            # sky-light specular term and the skybox background (gathers
            # are the scarce resource on TPU)
            spec_sample = None
            sky_img = None
            if env is not None:
                from orbit_tpu.math.transforms import normalize as _nrm

                vdir = _nrm(view.eye[None, :] - gbuf.world_pos)
                rdir = (
                    2.0
                    * jnp.sum(surface.normal * vdir, -1, keepdims=True)
                    * surface.normal
                    - vdir
                )
                bg_dirs = camera_ray_dirs(
                    view, W, Hl, row0=row0_px, full_height=H
                ).reshape(-1, 3)
                dir_all = jnp.where(gbuf.valid[:, None], rdir, bg_dirs)
                rough_all = jnp.where(gbuf.valid, surface.roughness, 0.0)
                spec_sample = ibl_mod.sample_specular(
                    env, dir_all, rough_all, mode=cfg.env_filter
                )
                sky_img = spec_sample
            shaded = pbr_mod.shade(
                surface, gbuf, scene, light_slots, view.eye, env,
                shadow_fn=shadow_fn, spec_sample=spec_sample,
            )
            if clusters is not None:
                from orbit_tpu.passes import cluster as cluster_mod

                shaded = shaded + cluster_mod.shade_clustered_points(
                    clusters, cluster_ids, scene, surface, gbuf, view.eye,
                    cfg.clusters.luminance_cutoff,
                )

        hdr = shaded.reshape(Hl, W, 3)
        if env is not None and mode == 0 and sky_img is not None:
            hdr = jnp.where(
                gbuf.valid.reshape(Hl, W, 1), hdr, sky_img.reshape(Hl, W, 3)
            )
        else:
            hdr = jnp.where(gbuf.valid.reshape(Hl, W, 1), hdr, 0.0)

        if band is not None:
            # full-frame post (bloom kernels cross band borders): gather
            # the shaded bands over ICI; downstream post runs replicated
            hdr = band.gather(hdr)
            depth = band.gather(depth)
            vis = band.gather(vis)
            overflow = {
                k: jax.lax.pmax(v.astype(jnp.int32), band.axis) > 0
                for k, v in overflow.items()
            }

        if cfg.supersample > 1:
            from orbit_tpu.passes.hdr_resolve import resolve_supersampled

            hdr = resolve_supersampled(hdr, cfg.supersample)

        bloom_img = None
        if cfg.bloom is not None:
            from orbit_tpu.passes import bloom as bloom_mod

            bloom_img = bloom_mod.compute_bloom(hdr, cfg.bloom)

        srgb = post_mod.tonemap(
            hdr, cfg.exposure, bloom=bloom_img,
            bloom_intensity=cfg.bloom.intensity if cfg.bloom else 0.0,
        )
        color = post_mod.to_u8(srgb)
        if cfg.debug is not None:
            from orbit_tpu.passes.debug_overlay import (
                apply_overlay,
                build_overlay,
            )

            cvp = (
                view.proj @ cull_view
                if cull_view is not None
                else view.view_proj
            )
            segs, cols = build_overlay(
                assets, scene, self.scene_meta.num_entities, cfg.debug,
                cull_view_proj=cvp,
                shadows=shadows,
                inst_entity=inst[0], inst_meshlet=inst[1],
                inst_valid=inst[2],
                clusters_data=clusters,
                inv_view=jnp.linalg.inv(view.view),
            )
            color = apply_overlay(
                color, depth, view.view_proj, segs, cols, cfg.debug
            )
            if cfg.debug.depth_pyramid_mip >= 0 and pyramid is not None:
                from orbit_tpu.passes.debug_overlay import (
                    depth_pyramid_inset,
                )

                color = depth_pyramid_inset(
                    color, pyramid, cfg.debug.depth_pyramid_mip
                )
        out = {
            "color": color,
            "hdr": hdr,
            "depth": depth,
            "vis": vis,
            "overflow": _any_overflow(overflow),
            "overflow_detail": overflow,
        }
        return out, new_state
