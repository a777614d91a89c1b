"""Asset data layout: fixed-capacity SoA arrays (the TPU 'bindless heap').

Mirrors the reference's global GPU buffers (assets/mod.rs:197-205 capacities,
assets/mod.rs:18-150 struct layouts) as structure-of-arrays pytrees with
static shapes, which is what XLA wants. Counts live in `AssetMeta` as plain
Python ints — scene load implies retrace anyway.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple

import jax
import numpy as np

from orbit_tpu.raster.kernel_common import CA_ROWS

# reference: src/assets/mesh.rs:8-9
MAX_MESHLET_VERTICES = 64
MAX_MESHLET_TRIANGLES = 64
MAX_LODS = 8  # reference: assets/mod.rs:336-402 builds <=8 LOD levels

# reference: assets/mod.rs:124-150 AlphaMode
ALPHA_MODE_OPAQUE = 0
ALPHA_MODE_MASKED = 1
ALPHA_MODE_TRANSPARENT = 2

# per-texture sampler state (reference SamplerKind, device.rs:1291-1322,
# bound per glTF texture at gltf_loader.rs:559-569)
WRAP_REPEAT = 0
WRAP_CLAMP = 1
WRAP_MIRROR = 2
FILTER_LINEAR = 0  # trilinear-with-aniso in the reference's default
FILTER_NEAREST = 1
WRAP_NAMES = {"repeat": WRAP_REPEAT, "clamp": WRAP_CLAMP,
              "mirror": WRAP_MIRROR}
FILTER_NAMES = {"linear": FILTER_LINEAR, "nearest": FILTER_NEAREST}


def sampler_id(wrap: int, filt: int) -> int:
    """Packed per-material sampler id: wrap | filter << 2."""
    return int(wrap) | (int(filt) << 2)

# alpha-test masks: masked materials bake their thresholded base-texture
# alpha into a small VMEM-resident bitmap the rasterizer consults at
# winner-select time (reference: forward_depth_prepass.frag:35-57 /
# shadow.frag:23-38 sample the full texture per fragment; a 64x64 mask
# is the TPU-native budget — it must live in VMEM for every raster step)
ALPHA_MASK_RES = 64
ALPHA_MASK_CAP = 16

# material texture slots (reference: GpuMaterialData descriptor indices)
TEX_BASE_COLOR = 0
TEX_NORMAL = 1
TEX_METALLIC_ROUGHNESS = 2
TEX_OCCLUSION = 3
TEX_EMISSIVE = 4
NUM_TEX_SLOTS = 5


@dataclass(frozen=True)
class AssetCaps:
    """Static capacities. Defaults scaled for tests; production uses
    `AssetCaps.production()` matching the reference ceilings."""

    vertices: int = 1 << 16
    meshlets: int = 1 << 12
    meshes: int = 256
    materials: int = 64
    texture_layers: int = 16
    texture_size: int = 256  # all texture layers resampled to S x S

    @staticmethod
    def production() -> "AssetCaps":
        # reference: assets/mod.rs:197-205 (4M verts, 256k meshlets,
        # 10k meshes, 1k materials)
        return AssetCaps(
            vertices=4_000_000,
            meshlets=256_000,
            meshes=10_000,
            materials=1_000,
            texture_layers=256,
            texture_size=1024,
        )


@dataclass(frozen=True)
class AssetMeta:
    """Static (non-traced) sidecar: how much of each capacity is used."""

    num_vertices: int = 0
    num_meshlets: int = 0
    num_meshes: int = 0
    num_materials: int = 0
    num_texture_layers: int = 0
    has_alpha_masks: bool = False  # any MASKED material baked a mask
    has_transparent: bool = False  # any TRANSPARENT material present
    num_mask_slots: int = 0  # baked alpha-mask count (VMEM-resident
    #   raster operand is sliced to this — capacity padding costs VMEM)
    caps: AssetCaps = field(default_factory=AssetCaps)


def _data_fields(cls):
    return [f.name for f in dataclasses.fields(cls)]


def num_mips(size: int) -> int:
    return int(np.floor(np.log2(size))) + 1


def mip_offsets(size: int) -> np.ndarray:
    """Texel offset of each mip level in the flat atlas, plus mip sizes.

    Returns int32 [n_mips] offsets; total atlas texels = offsets[-1] +
    (size >> (n_mips-1))**2.
    """
    offs = []
    acc = 0
    s = size
    for _ in range(num_mips(size)):
        offs.append(acc)
        acc += s * s
        s //= 2
    return np.array(offs, np.int32)


def atlas_texels(size: int) -> int:
    offs = mip_offsets(size)
    last = size >> (num_mips(size) - 1)
    return int(offs[-1]) + last * last


@jax.tree_util.register_dataclass
@dataclass
class AssetArrays:
    """Device-resident asset heap. All shapes fixed by AssetCaps.

    Vertices (SoA; reference GpuMeshVertex, mesh.rs:12-20):
      positions       [V, 3] f32
      normals_packed  [V, 4] i8   (oct normal xy, tangent alpha, bitangent sign)
      uvs             [V, 2] f32
    Meshlets (reference GpuMeshlet, assets/mod.rs:111-122):
      mlet_vertices   [M, 64] i32  global vertex ids (padded with last valid)
      mlet_tris       [M, 64, 3] i8 local indices (padded degenerate 0,0,0)
      mlet_vcount     [M] i32
      mlet_tcount     [M] i32
      mlet_sphere     [M, 4] f32   model-space bounding sphere
      mlet_cone       [M, 4] f32   normal cone (axis, cutoff); cutoff==1 -> never cull
      mlet_material   [M] i32
    Pre-expanded triangle corners (TPU-first: per-pixel/per-corner HBM
    gathers cost ~5ns/row, so corner data is baked corner-major at load —
    the geometry stage reads one [I]-row gather instead of millions):
      tri_pos         [M, 576] f32 corner positions (model space), flat
                      row-major [tri 64, corner 3, xyz 3] — stored flat so
                      the per-frame row gather needs no relayout copy
      tri_ac          [M * CA_ROWS, 64] f32 corner-attr blocks consumed
                      by the rasterizer IN-KERNEL (kernel_common CA_*
                      layout: per meshlet, rows c*9+ch = corner
                      (u,v,nx,ny,nz,tx,ty,tz,tw), rows CA_BASE.. =
                      material constants broadcast over lanes; lanes =
                      triangles). Stored 2-D — host side keeps a 3-D
                      [M, CA_ROWS, 64] view, but the DEVICE array is
                      flat so the Pallas kernels' per-pair block fetch
                      and XLA's parameter layout agree (the 3-D form
                      cost a full ~550 MB relayout copy EVERY frame)
    Meshes (reference GpuMeshInfo, assets/mod.rs:18-28):
      mesh_sphere     [Me, 4] f32
      mesh_aabb       [Me, 2, 3] f32
      mesh_lod_offset [Me, 8] i32  meshlet range per LOD
      mesh_lod_count  [Me, 8] i32
      mesh_lod_levels [Me] i32
    Materials (reference GpuMaterialData, assets/mod.rs:487-531):
      mat_base_color  [Ma, 4] f32
      mat_emissive    [Ma, 3] f32 (factor-premultiplied)
      mat_metallic    [Ma] f32
      mat_roughness   [Ma] f32
      mat_tex         [Ma, 5] i32  texture layer per slot, -1 = none
      mat_alpha_mode  [Ma] i32
      mat_alpha_cutoff[Ma] f32
    Textures (flat mip atlas — one gatherable address space so per-pixel
    mip selection is a single gather, no per-mip loops):
      tex_data        [L, T4, 4] u8 where T4 = sum((S>>k)^2); texel
                      (layer, mip k, y, x) lives at mip_offsets(S)[k] + y*(S>>k) + x
      tex_srgb        [L] bool — layer stores sRGB-encoded data
      tex_wrap        [L] i32 WRAP_* (glTF sampler wrapS; reference binds
                      a SamplerKind per texture, gltf_loader.rs:559-569)
      tex_filter      [L] i32 FILTER_* (glTF sampler magFilter)
    Combined material texture (all of a material's texture slots share uv,
    so they are baked into ONE 12-channel texel — one gather per tap
    instead of five; missing slots bake neutral values):
      ctex_data       host: [Lc, T4, 16] u8; device: bitcast [Lc, T4, 4] f32
                      (f32 rows gather ~5x faster than u8 on TPU).
                      bytes: base RGBA(srgb), normal xy, metallic, roughness,
                      emissive RGB(srgb), occlusion, 4 pad
      mat_ctex        [Ma] i32 combined layer per material (-1 = untextured)
      mat_sampler     [Ma] i32 wrap | filter<<2 — the material's sampler
                      (its base-color texture's; one combined texel means
                      one sampler per MATERIAL, a slight narrowing of the
                      reference's per-texture binding: a material mixing
                      wrap modes across its own slots shares the base
                      texture's wrap)
      ctex_quad       OPTIONAL [3, Lc*T4, 4] u32-bitcast-f32 quad tables
                      (to_device(filter_tables=True)): row t of table j =
                      word j at texels (t, right, down, down-right) with
                      the layer's OWN wrap baked into the neighbors — one
                      16-byte-row gather per (word, mip) yields a full
                      bilinear footprint (in-kernel trilinear = 6 gathers)
    """

    positions: jax.Array
    normals_packed: jax.Array
    uvs: jax.Array

    mlet_vertices: jax.Array
    mlet_tris: jax.Array
    mlet_vcount: jax.Array
    mlet_tcount: jax.Array
    mlet_sphere: jax.Array
    mlet_cone: jax.Array
    mlet_material: jax.Array
    tri_pos: jax.Array
    tri_ac: jax.Array

    mesh_sphere: jax.Array
    mesh_aabb: jax.Array
    mesh_lod_offset: jax.Array
    mesh_lod_count: jax.Array
    mesh_lod_levels: jax.Array

    mat_base_color: jax.Array
    mat_emissive: jax.Array
    mat_metallic: jax.Array
    mat_roughness: jax.Array
    mat_tex: jax.Array
    mat_alpha_mode: jax.Array
    mat_alpha_cutoff: jax.Array
    mat_mask_slot: jax.Array
    alpha_masks: jax.Array

    tex_data: jax.Array
    tex_srgb: jax.Array
    tex_wrap: jax.Array
    tex_filter: jax.Array
    ctex_data: jax.Array
    mat_ctex: jax.Array
    mat_sampler: jax.Array
    ctex_quad: object = None


def empty_asset_numpy(caps: AssetCaps) -> dict:
    """Host-side zeroed asset heap as a dict of numpy arrays."""
    V, M, Me, Ma = caps.vertices, caps.meshlets, caps.meshes, caps.materials
    L, S = caps.texture_layers, caps.texture_size
    return dict(
        positions=np.zeros((V, 3), np.float32),
        normals_packed=np.zeros((V, 4), np.int8),
        uvs=np.zeros((V, 2), np.float32),
        mlet_vertices=np.zeros((M, MAX_MESHLET_VERTICES), np.int32),
        mlet_tris=np.zeros((M, MAX_MESHLET_TRIANGLES, 3), np.int8),
        mlet_vcount=np.zeros((M,), np.int32),
        mlet_tcount=np.zeros((M,), np.int32),
        mlet_sphere=np.zeros((M, 4), np.float32),
        mlet_cone=np.concatenate(
            [np.zeros((M, 3), np.float32), np.ones((M, 1), np.float32)], axis=1
        ),
        mlet_material=np.zeros((M,), np.int32),
        tri_pos=np.zeros((M, MAX_MESHLET_TRIANGLES * 9), np.float32),
        tri_ac=np.zeros((M, CA_ROWS, MAX_MESHLET_TRIANGLES), np.float32),
        mesh_sphere=np.zeros((Me, 4), np.float32),
        mesh_aabb=np.zeros((Me, 2, 3), np.float32),
        mesh_lod_offset=np.zeros((Me, MAX_LODS), np.int32),
        mesh_lod_count=np.zeros((Me, MAX_LODS), np.int32),
        mesh_lod_levels=np.zeros((Me,), np.int32),
        mat_base_color=np.ones((Ma, 4), np.float32),
        mat_emissive=np.zeros((Ma, 3), np.float32),
        mat_metallic=np.zeros((Ma,), np.float32),
        mat_roughness=np.full((Ma,), 0.5, np.float32),
        mat_tex=np.full((Ma, NUM_TEX_SLOTS), -1, np.int32),
        mat_alpha_mode=np.zeros((Ma,), np.int32),
        mat_alpha_cutoff=np.full((Ma,), 0.5, np.float32),
        mat_mask_slot=np.full((Ma,), -1, np.int32),
        # [CAP*RES, 128] f32 0/1 (lanes padded 64->128 for the kernel)
        alpha_masks=np.zeros(
            (ALPHA_MASK_CAP * ALPHA_MASK_RES, 128), np.float32
        ),
        tex_data=np.zeros((L, atlas_texels(S), 4), np.uint8),
        tex_srgb=np.zeros((L,), bool),
        tex_wrap=np.zeros((L,), np.int32),
        tex_filter=np.zeros((L,), np.int32),
        ctex_data=np.zeros((L, atlas_texels(S), 16), np.uint8),
        mat_ctex=np.full((Ma,), -1, np.int32),
        mat_sampler=np.zeros((Ma,), np.int32),
    )
