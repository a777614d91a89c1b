"""AssetStore: host-side builder for the device asset heap.

TPU-first equivalent of the reference's GpuAssets (assets/mod.rs:230-542):
the six global bindless buffers become one SoA numpy heap, filled by
add_texture/add_material/add_mesh, then shipped to HBM once via to_device().
Allocation is bump-pointer (assets are immutable for a scene's lifetime;
the reference's free-lists exist for interactive editing, which maps to
rebuilding the heap — a host-side, load-time operation)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbit_tpu.assets import lod as lod_mod
from orbit_tpu.assets import textures as tex_mod
from orbit_tpu.assets.mesh import (
    MeshData,
    compute_aabb,
    compute_bounding_sphere,
    dedupe_vertices,
    pack_normal_tangent_np,
    spatial_sort_triangles,
)
from orbit_tpu.assets.meshlet import build_meshlets
from orbit_tpu.assets import types as types_mod
from orbit_tpu.assets.types import (
    ALPHA_MODE_OPAQUE,
    ALPHA_MODE_TRANSPARENT,
    MAX_LODS,
    AssetArrays,
    AssetCaps,
    AssetMeta,
    empty_asset_numpy,
)
from orbit_tpu.math.packing import pack_normal_tangent


class AssetStore:
    def __init__(self, caps: AssetCaps = AssetCaps()):
        self.caps = caps
        self.h = empty_asset_numpy(caps)  # host heap
        self._mip_offsets = types_mod.mip_offsets(caps.texture_size)
        self.num_vertices = 0
        self.num_meshlets = 0
        self.num_meshes = 0
        self.num_materials = 0
        self.num_texture_layers = 0

    # -- textures ----------------------------------------------------------
    def add_texture(
        self, img: np.ndarray, srgb: bool = True,
        wrap: str = "repeat", filter: str = "linear",
    ) -> int:
        """wrap/filter: the texture's glTF sampler state (the reference
        binds a SamplerKind per texture, gltf_loader.rs:559-569)."""
        layer = self.num_texture_layers
        assert layer < self.caps.texture_layers, "texture capacity exceeded"
        mips = tex_mod.bake_layer(img, self.caps.texture_size, srgb)
        for k, m in enumerate(mips):
            off = self._mip_offsets[k]
            s = m.shape[0]
            self.h["tex_data"][layer, off : off + s * s] = m.reshape(-1, 4)
        self.h["tex_srgb"][layer] = srgb
        self.h["tex_wrap"][layer] = types_mod.WRAP_NAMES[wrap]
        self.h["tex_filter"][layer] = types_mod.FILTER_NAMES[filter]
        self.num_texture_layers += 1
        return layer

    # -- materials ----------------------------------------------------------
    def add_material(
        self,
        base_color=(1.0, 1.0, 1.0, 1.0),
        metallic: float = 0.0,
        roughness: float = 0.5,
        emissive=(0.0, 0.0, 0.0),
        base_color_tex: int = -1,
        normal_tex: int = -1,
        metallic_roughness_tex: int = -1,
        occlusion_tex: int = -1,
        emissive_tex: int = -1,
        alpha_mode: int = ALPHA_MODE_OPAQUE,
        alpha_cutoff: float = 0.5,
    ) -> int:
        i = self.num_materials
        assert i < self.caps.materials, "material capacity exceeded"
        h = self.h
        h["mat_base_color"][i] = base_color
        h["mat_emissive"][i] = emissive
        h["mat_metallic"][i] = metallic
        h["mat_roughness"][i] = roughness
        h["mat_tex"][i] = [
            base_color_tex,
            normal_tex,
            metallic_roughness_tex,
            occlusion_tex,
            emissive_tex,
        ]
        h["mat_alpha_mode"][i] = alpha_mode
        h["mat_alpha_cutoff"][i] = alpha_cutoff
        self.num_materials += 1
        return i

    # -- meshes --------------------------------------------------------------
    def add_mesh(
        self, mesh: MeshData, build_lods: bool = True,
        lod_step: float = 0.8,
    ) -> int:
        """Process + upload one mesh: dedupe, Morton sort, LOD chain,
        meshletize each LOD (reference: GpuAssets::add_mesh,
        assets/mod.rs:325-476). lod_step: per-level triangle-count
        factor (reference uses 0.8; dense high-poly content can use a
        steeper step so distant instances cost far fewer meshlets)."""
        mesh = dedupe_vertices(mesh.finalize())
        v_base = self.num_vertices
        n_verts = len(mesh.positions)
        assert v_base + n_verts <= self.caps.vertices, "vertex capacity exceeded"

        h = self.h
        h["positions"][v_base : v_base + n_verts] = mesh.positions
        h["uvs"][v_base : v_base + n_verts] = mesh.uvs
        h["normals_packed"][v_base : v_base + n_verts] = pack_normal_tangent_np(
            mesh.normals, mesh.tangents
        )

        tri_mat = mesh.tri_material
        if tri_mat is None:
            tri_mat = np.full(len(mesh.indices) // 3, mesh.material, np.int32)
        order = spatial_sort_triangles(mesh.positions, mesh.indices)
        tris = mesh.indices.reshape(-1, 3)[order]
        tri_mat = tri_mat[order]
        indices = tris.reshape(-1)

        lods = (
            lod_mod.build_lod_chain(
                mesh.positions, indices, tri_mat, MAX_LODS, step=lod_step
            )
            if build_lods
            else [(indices, tri_mat)]
        )

        mesh_id = self.num_meshes
        assert mesh_id < self.caps.meshes, "mesh capacity exceeded"
        for li, (lidx, lmat) in enumerate(lods):
            mlets = build_meshlets(mesh.positions, lidx, lmat)
            m_base = self.num_meshlets
            assert (
                m_base + len(mlets) <= self.caps.meshlets
            ), "meshlet capacity exceeded"
            for k, ml in enumerate(mlets):
                i = m_base + k
                nv, nt = len(ml.vertices), len(ml.triangles)
                # pad vertices with the first vertex (safe gathers), tris with 0s
                h["mlet_vertices"][i, :nv] = ml.vertices + v_base
                h["mlet_vertices"][i, nv:] = ml.vertices[0] + v_base
                h["mlet_tris"][i, :nt] = ml.triangles
                h["mlet_vcount"][i] = nv
                h["mlet_tcount"][i] = nt
                h["mlet_sphere"][i] = ml.sphere
                h["mlet_cone"][i] = ml.cone
                h["mlet_material"][i] = ml.material
                # corner-major expansion for the gather-free geometry stage
                gv = ml.vertices[ml.triangles.astype(np.int64)]  # [nt,3]
                h["tri_pos"][i].reshape(64, 3, 3)[:nt] = mesh.positions[gv]
                # corner-attr block (kernel_common CA_* layout): rows
                # c*9+ch over triangle lanes — consumed by the rasterizer
                # in-kernel, never materialized per frame
                att = np.concatenate(
                    [mesh.uvs[gv], mesh.normals[gv], mesh.tangents[gv]],
                    axis=-1,
                )  # [nt, 3, 9]
                h["tri_ac"][i, :27, :nt] = att.transpose(1, 2, 0).reshape(
                    27, nt
                )
            self.num_meshlets += len(mlets)
            h["mesh_lod_offset"][mesh_id, li] = m_base
            h["mesh_lod_count"][mesh_id, li] = len(mlets)
        # pad unused LOD slots with the last LOD (branch-free LOD pick)
        for li in range(len(lods), MAX_LODS):
            h["mesh_lod_offset"][mesh_id, li] = h["mesh_lod_offset"][
                mesh_id, len(lods) - 1
            ]
            h["mesh_lod_count"][mesh_id, li] = h["mesh_lod_count"][
                mesh_id, len(lods) - 1
            ]
        h["mesh_lod_levels"][mesh_id] = len(lods)
        h["mesh_sphere"][mesh_id] = compute_bounding_sphere(mesh.positions)
        h["mesh_aabb"][mesh_id] = compute_aabb(mesh.positions)

        self.num_vertices += n_verts
        self.num_meshes += 1
        return mesh_id

    # -- combined material textures ------------------------------------------
    def _build_combined_textures(self):
        """Bake each textured material's slots into one 12-channel texel
        stream (see AssetArrays.ctex_data). Missing slots bake neutral
        values (white base, flat normal, full metallic/roughness/occlusion
        multipliers, white emissive multiplier)."""
        h = self.h
        t4 = h["tex_data"].shape[1]
        neutral = np.zeros((t4, 16), np.uint8)
        neutral[:, 0:4] = 255  # base RGBA
        neutral[:, 4] = 128  # normal x
        neutral[:, 5] = 128  # normal y
        neutral[:, 6] = 255  # metallic multiplier (b channel semantics)
        neutral[:, 7] = 255  # roughness multiplier
        neutral[:, 8:11] = 255  # emissive multiplier
        neutral[:, 11] = 255  # occlusion

        n_c = 0
        self._ctex_wrap = []
        for m in range(self.num_materials):
            slots = h["mat_tex"][m]
            if (slots < 0).all():
                continue
            assert n_c < self.caps.texture_layers, "ctex capacity exceeded"
            c = neutral.copy()
            base, normal, mr, occl, emis = slots
            if base >= 0:
                c[:, 0:4] = h["tex_data"][base]
            if normal >= 0:
                c[:, 4:6] = h["tex_data"][normal][:, 0:2]
            if mr >= 0:
                # glTF: metallic in B, roughness in G
                c[:, 6] = h["tex_data"][mr][:, 2]
                c[:, 7] = h["tex_data"][mr][:, 1]
            if emis >= 0:
                c[:, 8:11] = h["tex_data"][emis][:, 0:3]
            if occl >= 0:
                c[:, 11] = h["tex_data"][occl][:, 0]
            h["ctex_data"][n_c] = c
            h["mat_ctex"][m] = n_c
            # the material's sampler = its base-color texture's (first
            # present slot as fallback): one combined texel shares one
            # sampler across the material's slots
            key = base if base >= 0 else max(slots)
            h["mat_sampler"][m] = types_mod.sampler_id(
                h["tex_wrap"][key], h["tex_filter"][key]
            )
            self._ctex_wrap.append(int(h["tex_wrap"][key]))
            n_c += 1
        self.num_ctex = n_c
        self._bake_alpha_masks()

    def _quad_neighbors(self, wrap: int) -> np.ndarray:
        """[T4, 3] flat-atlas texel index of (right, down, down-right)
        neighbors per texel, under `wrap`, per mip (filter tables)."""
        S = self.caps.texture_size
        T4 = types_mod.atlas_texels(S)
        out = np.zeros((T4, 3), np.int64)
        k, s = 0, S
        while True:
            off = self._mip_offsets[k] if k < len(self._mip_offsets) else 0
            y, x = np.mgrid[0:s, 0:s]

            def wrapc(v, s=s):
                if wrap == types_mod.WRAP_CLAMP:
                    return np.clip(v, 0, s - 1)
                if wrap == types_mod.WRAP_MIRROR:
                    pm = v % (2 * s)
                    return np.where(pm < s, pm, 2 * s - 1 - pm)
                return v % s  # repeat

            xr = wrapc(x + 1)
            yd = wrapc(y + 1)
            idx = (off + y * s + x).ravel()
            out[idx, 0] = (off + y * s + xr).ravel()
            out[idx, 1] = (off + yd * s + x).ravel()
            out[idx, 2] = (off + yd * s + xr).ravel()
            if s == 1:
                break
            s //= 2
            k += 1
        return out

    def _build_filter_tables(self) -> np.ndarray:
        """Quad tables for in-kernel bilinear/trilinear sampling: for
        word j in 0..2, row t = word j at texels (t, right, down,
        down-right) with each LAYER's OWN wrap mode baked into the
        neighbor choice — one 16-byte-row gather per (word, mip) yields
        a full bilinear footprint. Returns [3, Lc*T4, 4] u32."""
        h = self.h
        T4 = h["ctex_data"].shape[1]
        Lc = self.num_ctex
        words = (
            np.ascontiguousarray(h["ctex_data"][:Lc])
            .view(np.uint32)
            .reshape(Lc, T4, 4)
        )
        nbr_cache = {}
        quad = np.zeros((3, max(Lc, 1) * T4, 4), np.uint32)
        for lc in range(Lc):
            w = self._ctex_wrap[lc]
            if w not in nbr_cache:
                nbr_cache[w] = self._quad_neighbors(w)
            nb = nbr_cache[w]
            for j in range(3):
                ws = words[lc, :, j]
                quad[j, lc * T4 : (lc + 1) * T4] = np.stack(
                    [ws, ws[nb[:, 0]], ws[nb[:, 1]], ws[nb[:, 2]]], axis=-1
                )
        return quad

    def _bake_alpha_masks(self):
        """Bake each MASKED material's alpha into the small VMEM-resident
        block the rasterizer tests winners against (reference alpha test:
        forward_depth_prepass.frag:35-57).

        Columns 0..R-1 store the SIGNED alpha field s = alpha - cutoff
        (keep iff s > 0 — same winners as the old thresholded bitmap);
        columns R..2R-1 store the per-texel alpha gradient magnitude g,
        which the kernel turns into the screen-space alpha derivative
        (g * R * |duv/dpixel|) for the reference's mip-stable
        `(alpha-cutoff)/fwidth + 0.5` coverage sharpening under SSAA."""
        from orbit_tpu.assets.types import (
            ALPHA_MASK_CAP,
            ALPHA_MASK_RES,
            ALPHA_MODE_MASKED,
        )

        h = self.h
        R = ALPHA_MASK_RES
        n = 0
        for m in range(self.num_materials):
            if h["mat_alpha_mode"][m] != ALPHA_MODE_MASKED:
                continue
            assert n < ALPHA_MASK_CAP, "alpha mask capacity exceeded"
            cutoff = float(h["mat_alpha_cutoff"][m])
            base_a = float(h["mat_base_color"][m, 3])
            tex = h["mat_tex"][m, 0]  # base-color slot
            if tex >= 0:
                S = self.caps.texture_size
                a = (
                    h["tex_data"][tex][: S * S, 3]
                    .reshape(S, S)
                    .astype(np.float32)
                    / 255.0
                )
                blk = S // R
                a = a.reshape(R, blk, R, blk).mean(axis=(1, 3))
            else:
                a = np.ones((R, R), np.float32)
            a = a * base_a
            gu = np.abs(np.roll(a, -1, 1) - np.roll(a, 1, 1)) * 0.5
            gv = np.abs(np.roll(a, -1, 0) - np.roll(a, 1, 0)) * 0.5
            h["alpha_masks"][n * R : (n + 1) * R, :R] = a - cutoff
            h["alpha_masks"][n * R : (n + 1) * R, R : 2 * R] = np.maximum(
                gu, gv
            )
            h["mat_mask_slot"][m] = n
            n += 1
        self.num_mask_slots = n

    def _bake_tri_ac_constants(self):
        """Fill the per-meshlet material-constant rows of tri_ac (CA_BASE
        onward, GB order, broadcast across triangle lanes). Runs after
        _build_combined_textures so mask slots / combined-texture layers
        are assigned."""
        from orbit_tpu.raster.kernel_common import CA_BASE

        h = self.h
        n = self.num_meshlets
        if n == 0:
            return
        mats = np.maximum(h["mlet_material"][:n], 0)
        consts = np.concatenate(
            [
                h["mat_base_color"][mats],
                h["mat_emissive"][mats],
                h["mat_metallic"][mats][:, None],
                h["mat_roughness"][mats][:, None],
                h["mat_mask_slot"][mats][:, None].astype(np.float32),
                h["mat_ctex"][mats][:, None].astype(np.float32),
                mats[:, None].astype(np.float32),
                h["mat_sampler"][mats][:, None].astype(np.float32),
            ],
            axis=1,
        ).astype(np.float32)  # [n, 13] (== CA_CONST_ROWS, GB order)
        h["tri_ac"][:n, CA_BASE : CA_BASE + consts.shape[1], :] = consts[
            :, :, None
        ]

    # -- upload ---------------------------------------------------------------
    def to_device(
        self, device=None, filter_tables: bool = False
    ) -> tuple[AssetArrays, AssetMeta]:
        """filter_tables: also build + ship the bilinear/trilinear quad
        tables (3x the combined-texture memory; required for the fused
        kernel's texture_filter in ('bilinear','trilinear'))."""
        self._build_combined_textures()
        self._bake_tri_ac_constants()
        h = self.h
        put = lambda x: jax.device_put(x, device)
        d = dict(h)
        if filter_tables:
            d["ctex_quad"] = (
                self._build_filter_tables().view(np.float32)
            )
        # ship the 16-byte combined texels bitcast as f32x4: f32 rows are
        # the fastest gather dtype on TPU (u8 rows gather ~5x slower)
        d["ctex_data"] = np.ascontiguousarray(h["ctex_data"]).view(
            np.float32
        ).reshape(h["ctex_data"].shape[0], -1, 4)
        # flat 2-D form on device (see AssetArrays docstring)
        d["tri_ac"] = h["tri_ac"].reshape(-1, h["tri_ac"].shape[-1])
        arrays = AssetArrays(**{k: put(v) for k, v in d.items()})
        meta = AssetMeta(
            num_vertices=self.num_vertices,
            num_meshlets=self.num_meshlets,
            num_meshes=self.num_meshes,
            num_materials=self.num_materials,
            num_texture_layers=self.num_texture_layers,
            has_alpha_masks=bool((self.h["mat_mask_slot"] >= 0).any()),
            num_mask_slots=int(getattr(self, "num_mask_slots", 0)),
            has_transparent=bool(
                (
                    self.h["mat_alpha_mode"][: self.num_materials]
                    == ALPHA_MODE_TRANSPARENT
                ).any()
            ),
            caps=self.caps,
        )
        return arrays, meta
