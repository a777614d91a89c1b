"""glTF 2.0 scene loader (reference: src/gltf_loader.rs:513-676).

Supports .gltf (JSON + external/embedded buffers) and .glb containers:
meshes (POSITION / NORMAL / TEXCOORD_0 / TANGENT, indexed or not,
interleaved or tightly packed, normalized integer attributes, sparse
accessors), pbrMetallicRoughness materials with all five texture slots,
sRGB detection by usage (gltf_loader.rs:542-551), and recursive
node->entity flattening with baked parent transforms
(gltf_loader.rs:643-675). Images decode via PIL (PNG/JPEG) or the
vectorized DDS/BCn decoder (assets/dds.py; the reference uploads BCn
blocks raw, gltf_loader.rs:24-216). Extensions: MSFT_texture_dds,
KHR_materials_emissive_strength, KHR_lights_punctual (directional +
point lights become scene lights).
"""

from __future__ import annotations

import base64
import io
import json
import struct
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from orbit_tpu.assets.mesh import MeshData
from orbit_tpu.assets.store import AssetStore
from orbit_tpu.assets.types import (
    ALPHA_MODE_MASKED,
    ALPHA_MODE_OPAQUE,
    ALPHA_MODE_TRANSPARENT,
)
from orbit_tpu.scene import SceneBuilder

_COMPONENT_DTYPES = {
    5120: np.int8,
    5121: np.uint8,
    5122: np.int16,
    5123: np.uint16,
    5125: np.uint32,
    5126: np.float32,
}
_TYPE_COUNTS = {
    "SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
    "MAT2": 4, "MAT3": 9, "MAT4": 16,
}


def _load_container(path: Path) -> Tuple[dict, list]:
    """Returns (gltf json, buffer bytes list)."""
    data = path.read_bytes()
    if data[:4] == b"glTF":  # GLB
        magic, version, length = struct.unpack_from("<III", data, 0)
        offset = 12
        doc = None
        bin_chunk = b""
        while offset < length:
            clen, ctype = struct.unpack_from("<II", data, offset)
            chunk = data[offset + 8 : offset + 8 + clen]
            if ctype == 0x4E4F534A:  # JSON
                doc = json.loads(chunk)
            elif ctype == 0x004E4942:  # BIN
                bin_chunk = chunk
            offset += 8 + clen + (-clen) % 4
        buffers = _resolve_buffers(doc, path.parent, bin_chunk)
        return doc, buffers
    doc = json.loads(data)
    return doc, _resolve_buffers(doc, path.parent, b"")


def _resolve_buffers(doc, base_dir: Path, glb_bin: bytes) -> list:
    out = []
    for buf in doc.get("buffers", []):
        uri = buf.get("uri")
        if uri is None:
            out.append(glb_bin)
        elif uri.startswith("data:"):
            out.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            out.append((base_dir / uri).read_bytes())
    return out


def _read_view(doc, buffers, view_idx, byte_off, dtype, count, ncomp):
    """Read [count, ncomp] of dtype from a buffer view, honoring
    byteStride (interleaved vertex buffers) without a Python loop."""
    view = doc["bufferViews"][view_idx]
    itemsize = np.dtype(dtype).itemsize * ncomp
    stride = view.get("byteStride", itemsize) or itemsize
    base = view.get("byteOffset", 0) + byte_off
    raw = buffers[view["buffer"]]
    if stride == itemsize:
        return np.frombuffer(
            raw, dtype=dtype, count=count * ncomp, offset=base
        ).reshape(count, ncomp)
    b = np.frombuffer(raw, np.uint8)
    win = np.lib.stride_tricks.as_strided(
        b[base:], shape=(count, itemsize), strides=(stride, 1)
    )
    return np.ascontiguousarray(win).view(dtype).reshape(count, ncomp)


def _read_accessor(doc, buffers, idx) -> np.ndarray:
    """Accessor -> [count, ncomp] array. Handles interleaved views,
    normalized integer attributes, accessors WITHOUT a bufferView
    (spec: all zeros) and SPARSE accessors (base + scattered overrides
    — gltf_loader.rs reads these via the gltf crate's dense views)."""
    acc = doc["accessors"][idx]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    ncomp = _TYPE_COUNTS[acc["type"]]
    count = acc["count"]
    if "bufferView" in acc:
        arr = _read_view(
            doc, buffers, acc["bufferView"], acc.get("byteOffset", 0),
            dtype, count, ncomp,
        )
    else:
        arr = np.zeros((count, ncomp), dtype)
    sp = acc.get("sparse")
    if sp:
        n = sp["count"]
        sidx = _read_view(
            doc, buffers, sp["indices"]["bufferView"],
            sp["indices"].get("byteOffset", 0),
            _COMPONENT_DTYPES[sp["indices"]["componentType"]], n, 1,
        ).reshape(-1).astype(np.int64)
        sval = _read_view(
            doc, buffers, sp["values"]["bufferView"],
            sp["values"].get("byteOffset", 0), dtype, n, ncomp,
        )
        arr = arr.copy()
        arr[sidx] = sval
    if acc.get("normalized"):
        info = np.iinfo(dtype)
        arr = arr.astype(np.float32) / info.max
    return arr


def _decode_image(doc, buffers, idx, base_dir: Path) -> np.ndarray:
    img = doc["images"][idx]
    if "uri" in img:
        uri = img["uri"]
        if uri.startswith("data:"):
            blob = base64.b64decode(uri.split(",", 1)[1])
        else:
            blob = (base_dir / uri).read_bytes()
    else:
        view = doc["bufferViews"][img["bufferView"]]
        off = view.get("byteOffset", 0)
        blob = buffers[view["buffer"]][off : off + view["byteLength"]]
    from orbit_tpu.assets import dds as dds_mod

    if dds_mod.is_dds(blob):
        # BCn decode to RGBA8; the atlas re-bakes mips (the reference
        # uploads the compressed blocks directly, gltf_loader.rs:119)
        rgba, _srgb = dds_mod.decode_dds(bytes(blob))
        if rgba.dtype != np.uint8:
            # BC6H (HDR) bound as a material texture: clamp to LDR u8;
            # HDR DDS content is meant for the envmap path
            # (ibl.build_environment consumes the float image directly)
            a = np.clip(rgba, 0.0, 1.0)
            if a.shape[-1] == 3:
                a = np.concatenate(
                    [a, np.ones_like(a[..., :1])], axis=-1
                )
            rgba = np.round(a * 255.0).astype(np.uint8)
        return rgba
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(blob)).convert("RGBA"))


def _node_matrix(node) -> np.ndarray:
    if "matrix" in node:
        return np.array(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    s = np.array(node.get("scale", [1, 1, 1]), np.float32)
    q = np.array(node.get("rotation", [0, 0, 0, 1]), np.float32)
    t = np.array(node.get("translation", [0, 0, 0]), np.float32)
    x, y, z, w = q
    r = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )
    m[:3, :3] = r * s[None, :]
    m[:3, 3] = t
    return m


def _tex_source(tex) -> int:
    """Image source of a texture, honoring MSFT_texture_dds (the DDS
    source override the reference consumes via its dds path)."""
    ext = tex.get("extensions", {}).get("MSFT_texture_dds")
    if ext and "source" in ext:
        return ext["source"]
    return tex["source"]


_ALPHA_MODES = {
    "OPAQUE": ALPHA_MODE_OPAQUE,
    "MASK": ALPHA_MODE_MASKED,
    "BLEND": ALPHA_MODE_TRANSPARENT,
}


def load_gltf(
    path,
    store: AssetStore,
    scene: SceneBuilder,
    build_lods: bool = True,
) -> dict:
    """Load a glTF/GLB file into the asset store + scene builder.

    Returns a summary dict (counts). Equivalent of load_gltf
    (gltf_loader.rs:513): textures -> atlas layers, materials, meshes
    (one MeshData per primitive with per-primitive material), nodes ->
    entities with baked world transforms.
    """
    path = Path(path)
    doc, buffers = _load_container(path)

    # sRGB detection by usage: base color + emissive are sRGB
    # (gltf_loader.rs:542-551)
    srgb_sources = set()
    linear_sources = set()
    for mat in doc.get("materials", []):
        pbr = mat.get("pbrMetallicRoughness", {})
        for key, bucket in [
            (pbr.get("baseColorTexture"), srgb_sources),
            (mat.get("emissiveTexture"), srgb_sources),
            (pbr.get("metallicRoughnessTexture"), linear_sources),
            (mat.get("normalTexture"), linear_sources),
            (mat.get("occlusionTexture"), linear_sources),
        ]:
            if key is not None:
                tex = doc["textures"][key["index"]]
                bucket.add(_tex_source(tex))

    # glTF sampler state per texture (the reference maps each texture's
    # sampler to a SamplerKind, gltf_loader.rs:559-569). glTF wrap enums:
    # 10497 REPEAT, 33071 CLAMP_TO_EDGE, 33648 MIRRORED_REPEAT; filter
    # 9728 NEAREST else linear (the reference's default samplers are
    # trilinear+aniso, device.rs:1321-1322).
    _WRAPS = {10497: "repeat", 33071: "clamp", 33648: "mirror"}

    def _sampler_of(tex):
        si = tex.get("sampler")
        if si is None:
            return "repeat", "linear"
        smp = doc.get("samplers", [])[si]
        wrap = _WRAPS.get(smp.get("wrapS", 10497), "repeat")
        filt = "nearest" if smp.get("magFilter") == 9728 else "linear"
        return wrap, filt

    tex_layer: Dict[int, int] = {}
    for t_idx, tex in enumerate(doc.get("textures", [])):
        src = _tex_source(tex)
        if src in tex_layer:
            continue
        img = _decode_image(doc, buffers, src, path.parent)
        wrap, filt = _sampler_of(tex)
        tex_layer[src] = store.add_texture(
            img, srgb=(src in srgb_sources), wrap=wrap, filter=filt
        )

    def layer_of(tex_info) -> int:
        if tex_info is None:
            return -1
        return tex_layer.get(
            _tex_source(doc["textures"][tex_info["index"]]), -1
        )

    mat_ids = []
    for mat in doc.get("materials", []):
        pbr = mat.get("pbrMetallicRoughness", {})
        # KHR_materials_emissive_strength scales the emissive factor
        # (the reference's gltf crate exposes the same product)
        estr = (
            mat.get("extensions", {})
            .get("KHR_materials_emissive_strength", {})
            .get("emissiveStrength", 1.0)
        )
        emissive = tuple(
            estr * e for e in mat.get("emissiveFactor", [0, 0, 0])
        )
        mat_ids.append(
            store.add_material(
                base_color=tuple(pbr.get("baseColorFactor", [1, 1, 1, 1])),
                metallic=pbr.get("metallicFactor", 1.0),
                roughness=pbr.get("roughnessFactor", 1.0),
                emissive=emissive,
                base_color_tex=layer_of(pbr.get("baseColorTexture")),
                normal_tex=layer_of(mat.get("normalTexture")),
                metallic_roughness_tex=layer_of(
                    pbr.get("metallicRoughnessTexture")
                ),
                occlusion_tex=layer_of(mat.get("occlusionTexture")),
                emissive_tex=layer_of(mat.get("emissiveTexture")),
                alpha_mode=_ALPHA_MODES.get(
                    mat.get("alphaMode", "OPAQUE"), ALPHA_MODE_OPAQUE
                ),
                alpha_cutoff=mat.get("alphaCutoff", 0.5),
            )
        )
    default_mat = store.add_material() if not mat_ids else None

    # meshes: one engine mesh per glTF primitive
    mesh_prims = []  # per glTF mesh: list of engine mesh ids
    for mesh in doc.get("meshes", []):
        prim_ids = []
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:  # triangles only
                continue
            attrs = prim["attributes"]
            pos = _read_accessor(doc, buffers, attrs["POSITION"]).astype(
                np.float32
            )
            normals = (
                _read_accessor(doc, buffers, attrs["NORMAL"]).astype(np.float32)
                if "NORMAL" in attrs
                else None
            )
            uvs = (
                _read_accessor(doc, buffers, attrs["TEXCOORD_0"]).astype(
                    np.float32
                )
                if "TEXCOORD_0" in attrs
                else None
            )
            tangents = (
                _read_accessor(doc, buffers, attrs["TANGENT"]).astype(
                    np.float32
                )
                if "TANGENT" in attrs
                else None
            )
            if "indices" in prim:
                idx = _read_accessor(doc, buffers, prim["indices"])
                idx = idx.reshape(-1).astype(np.uint32)
            else:
                idx = np.arange(len(pos), dtype=np.uint32)
            material = (
                mat_ids[prim["material"]]
                if "material" in prim
                else default_mat
                if default_mat is not None
                else 0
            )
            md = MeshData(
                positions=pos,
                indices=idx,
                normals=normals,
                uvs=uvs,
                tangents=tangents,
                material=material,
            )
            prim_ids.append(store.add_mesh(md, build_lods=build_lods))
        mesh_prims.append(prim_ids)

    # flatten the node hierarchy with baked transforms
    n_entities = 0
    scene_idx = doc.get("scene", 0)
    roots = doc.get("scenes", [{}])[scene_idx].get("nodes", [])

    # KHR_lights_punctual -> scene lights (node transform gives the
    # position; a glTF light shines down the node's -Z axis)
    from orbit_tpu.scene import LIGHT_DIRECTIONAL, LIGHT_POINT

    punctual = (
        doc.get("extensions", {})
        .get("KHR_lights_punctual", {})
        .get("lights", [])
    )
    n_lights = 0

    def add_punctual(light_idx, world: np.ndarray):
        nonlocal n_lights
        li = punctual[light_idx]
        color = tuple(li.get("color", [1, 1, 1]))
        intensity = li.get("intensity", 1.0)
        fwd = -world[:3, 2]
        if li.get("type") == "directional":
            scene.add_light(
                LIGHT_DIRECTIONAL, direction=tuple(-fwd), color=color,
                intensity=intensity,
            )
            n_lights += 1
        elif li.get("type") in ("point", "spot"):
            scene.add_light(
                LIGHT_POINT, position=tuple(world[:3, 3]), color=color,
                intensity=intensity,
                outer_radius=li.get("range", 8.0),
            )
            n_lights += 1

    def visit(node_idx, parent: np.ndarray):
        nonlocal n_entities
        node = doc["nodes"][node_idx]
        world = parent @ _node_matrix(node)
        if "mesh" in node:
            for mid in mesh_prims[node["mesh"]]:
                scene.add_entity_matrix(mid, world)
                n_entities += 1
        lref = node.get("extensions", {}).get("KHR_lights_punctual")
        if lref is not None:
            add_punctual(lref["light"], world)
        for child in node.get("children", []):
            visit(child, world)

    for r in roots:
        visit(r, np.eye(4, dtype=np.float32))

    return dict(
        meshes=sum(len(p) for p in mesh_prims),
        materials=len(mat_ids),
        textures=len(tex_layer),
        entities=n_entities,
        lights=n_lights,
    )
