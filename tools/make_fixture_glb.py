"""Generate tests/fixtures/feature_test.glb — a small GLB exercising
the loader's full feature matrix (run once; the binary is committed so
tests load a real on-disk asset through the real container path):

- interleaved vertex buffer (POSITION f32 + NORMAL f32 + TEXCOORD_0
  normalized u16 sharing one bufferView with byteStride)
- u16 indices
- a SPARSE accessor overriding a few positions (raises 4 grid verts)
- material 0: embedded PNG base color (bufferView image)
- material 1: MASKED, BC1 DDS base color via MSFT_texture_dds, emissive
  scaled by KHR_materials_emissive_strength
- node hierarchy with rotation/translation/scale + a shared mesh
  instanced by two nodes
- KHR_lights_punctual: one directional + one point light
"""

from __future__ import annotations

import io
import json
import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bc1_encode_flat(img: np.ndarray) -> bytes:
    """BC1-encode an image whose every 4x4 block is a single flat color
    (lossless for such content: both endpoints = the color, indices 0).
    img: [h, w, 3] u8 with h, w % 4 == 0."""
    h, w, _ = img.shape
    out = bytearray()
    for by in range(h // 4):
        for bx in range(w // 4):
            c = img[by * 4, bx * 4]
            r, g, b = int(c[0]), int(c[1]), int(c[2])
            c565 = ((r >> 3) << 11) | ((g >> 2) << 5) | (b >> 3)
            # c0 > c1 selects 4-color mode; indices all 0 -> endpoint 0
            c0 = c565
            c1 = c565 - 1 if c565 > 0 else 0
            if c0 <= c1:
                c0, c1 = c1 + 1, c1
            out += struct.pack("<HHI", c0, c1, 0)
    return bytes(out)


def make_dds_bc1(img: np.ndarray) -> bytes:
    """Wrap BC1 blocks in a legacy DXT1 DDS container."""
    h, w, _ = img.shape
    data = bc1_encode_flat(img)
    header = struct.pack(
        "<4s7I44x",  # magic, size, flags, h, w, pitch, depth, mips
        b"DDS ", 124, 0x0002100F, h, w, len(data), 0, 1,
    )
    pixfmt = struct.pack("<2I4s5I", 32, 0x4, b"DXT1", 0, 0, 0, 0, 0)
    caps = struct.pack("<4I4x", 0x1000, 0, 0, 0)
    return header + pixfmt + caps + data


def main():
    from PIL import Image

    # ---- geometry: an 8x8 grid plane, interleaved P/N/UV(u16 norm)
    n = 8
    xs, zs = np.meshgrid(
        np.linspace(-1, 1, n + 1), np.linspace(-1, 1, n + 1)
    )
    pos = np.stack(
        [xs, np.zeros_like(xs), zs], axis=-1
    ).reshape(-1, 3).astype(np.float32)
    nrm = np.tile(
        np.array([0, 1, 0], np.float32), (len(pos), 1)
    )
    uv01 = np.stack(
        [(xs + 1) / 2, (zs + 1) / 2], axis=-1
    ).reshape(-1, 2)
    uv16 = np.round(uv01 * 65535).astype(np.uint16)

    stride = 12 + 12 + 4  # pos + normal + uv16x2
    vcount = len(pos)
    inter = bytearray(stride * vcount)
    for i in range(vcount):
        struct.pack_into(
            "<3f3f2H", inter, i * stride, *pos[i], *nrm[i], *uv16[i]
        )

    idx = []
    for r in range(n):
        for c in range(n):
            a = r * (n + 1) + c
            b = a + 1
            d = a + (n + 1)
            e = d + 1
            idx += [a, d, b, b, d, e]
    idx = np.array(idx, np.uint16)

    # sparse override: raise 4 interior verts (indices u16, values vec3)
    sp_idx = np.array(
        [3 * (n + 1) + 3, 3 * (n + 1) + 5, 5 * (n + 1) + 3, 5 * (n + 1) + 5],
        np.uint16,
    )
    sp_val = pos[sp_idx.astype(int)].copy()
    sp_val[:, 1] = 0.35

    # ---- cube mesh (tightly packed f32, no uv) for instancing
    cpos = np.array(
        [
            [x, y, z]
            for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)
        ],
        np.float32,
    )
    cfaces = np.array(
        [
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        ],
        np.uint16,
    ).reshape(-1)

    # ---- textures: embedded PNG (checker) + BC1 DDS (flat color blocks)
    ch = np.zeros((32, 32, 4), np.uint8)
    yy, xx = np.mgrid[0:32, 0:32]
    ch[...] = np.where(
        ((xx // 8 + yy // 8) % 2 == 0)[..., None],
        np.array([220, 180, 90, 255], np.uint8),
        np.array([60, 80, 160, 255], np.uint8),
    )
    png_io = io.BytesIO()
    Image.fromarray(ch).save(png_io, format="PNG")
    png_bytes = png_io.getvalue()

    dimg = np.zeros((16, 16, 3), np.uint8)
    dy, dx = np.mgrid[0:16, 0:16]
    flat = ((dx // 4 + dy // 4) % 3)
    dimg[flat == 0] = (200, 40, 40)
    dimg[flat == 1] = (40, 200, 40)
    dimg[flat == 2] = (40, 40, 200)
    dds_bytes = make_dds_bc1(dimg)

    # ---- assemble the BIN chunk
    chunks = []  # (offset, length) per logical view

    def add(data: bytes, align=4):
        nonlocal binblob
        pad = (-len(binblob)) % align
        binblob += b"\0" * pad
        off = len(binblob)
        binblob += data
        return off, len(data)

    binblob = b""
    o_inter, l_inter = add(bytes(inter))
    o_idx, l_idx = add(idx.tobytes())
    o_spi, l_spi = add(sp_idx.tobytes())
    o_spv, l_spv = add(sp_val.tobytes())
    o_cpos, l_cpos = add(cpos.tobytes())
    o_cidx, l_cidx = add(cfaces.tobytes())
    o_png, l_png = add(png_bytes)
    o_dds, l_dds = add(dds_bytes)

    views = [
        dict(buffer=0, byteOffset=o_inter, byteLength=l_inter,
             byteStride=stride),
        dict(buffer=0, byteOffset=o_idx, byteLength=l_idx),
        dict(buffer=0, byteOffset=o_spi, byteLength=l_spi),
        dict(buffer=0, byteOffset=o_spv, byteLength=l_spv),
        dict(buffer=0, byteOffset=o_cpos, byteLength=l_cpos),
        dict(buffer=0, byteOffset=o_cidx, byteLength=l_cidx),
        dict(buffer=0, byteOffset=o_png, byteLength=l_png),
        dict(buffer=0, byteOffset=o_dds, byteLength=l_dds),
    ]
    accessors = [
        # 0: POSITION (interleaved, sparse-overridden)
        dict(bufferView=0, byteOffset=0, componentType=5126, count=vcount,
             type="VEC3",
             min=[-1.0, 0.0, -1.0], max=[1.0, 0.35, 1.0],
             sparse=dict(
                 count=len(sp_idx),
                 indices=dict(bufferView=2, componentType=5123),
                 values=dict(bufferView=3),
             )),
        # 1: NORMAL (interleaved)
        dict(bufferView=0, byteOffset=12, componentType=5126,
             count=vcount, type="VEC3"),
        # 2: TEXCOORD_0 (interleaved, normalized u16)
        dict(bufferView=0, byteOffset=24, componentType=5123,
             count=vcount, type="VEC2", normalized=True),
        # 3: indices
        dict(bufferView=1, componentType=5123, count=len(idx),
             type="SCALAR"),
        # 4: cube positions
        dict(bufferView=4, componentType=5126, count=len(cpos),
             type="VEC3", min=[-0.5] * 3, max=[0.5] * 3),
        # 5: cube indices
        dict(bufferView=5, componentType=5123, count=len(cfaces),
             type="SCALAR"),
    ]

    doc = dict(
        asset=dict(version="2.0", generator="orbit_tpu fixture"),
        extensionsUsed=[
            "KHR_lights_punctual", "KHR_materials_emissive_strength",
            "MSFT_texture_dds",
        ],
        extensions=dict(
            KHR_lights_punctual=dict(lights=[
                dict(type="directional", color=[1.0, 0.96, 0.9],
                     intensity=3.0),
                dict(type="point", color=[1.0, 0.5, 0.2], intensity=6.0,
                     range=7.5),
            ]),
        ),
        buffers=[dict(byteLength=0)],  # patched below
        bufferViews=views,
        accessors=accessors,
        images=[
            dict(bufferView=6, mimeType="image/png"),
            dict(bufferView=7, mimeType="image/vnd-ms.dds"),
        ],
        samplers=[dict(magFilter=9729, minFilter=9987)],
        textures=[
            dict(source=0, sampler=0),
            # source falls back to the PNG; MSFT_texture_dds overrides
            dict(source=0, sampler=0,
                 extensions=dict(MSFT_texture_dds=dict(source=1))),
        ],
        materials=[
            dict(name="checker",
                 pbrMetallicRoughness=dict(
                     baseColorTexture=dict(index=0),
                     metallicFactor=0.0, roughnessFactor=0.8)),
            dict(name="masked_dds",
                 pbrMetallicRoughness=dict(
                     baseColorTexture=dict(index=1),
                     baseColorFactor=[1, 1, 1, 1],
                     metallicFactor=0.1, roughnessFactor=0.5),
                 emissiveFactor=[0.1, 0.2, 0.3],
                 extensions=dict(
                     KHR_materials_emissive_strength=dict(
                         emissiveStrength=4.0)),
                 alphaMode="MASK", alphaCutoff=0.4),
        ],
        meshes=[
            dict(primitives=[dict(
                attributes=dict(POSITION=0, NORMAL=1, TEXCOORD_0=2),
                indices=3, material=0)]),
            dict(primitives=[dict(
                attributes=dict(POSITION=4), indices=5, material=1)]),
        ],
        nodes=[
            # 0: root (rotated 45deg about Y, scaled)
            dict(children=[1, 2, 3, 4, 5],
                 rotation=[0.0, 0.3826834, 0.0, 0.9238795],
                 scale=[1.5, 1.5, 1.5]),
            dict(mesh=0, translation=[0, 0, 0]),
            dict(mesh=1, translation=[-1.2, 0.5, 0.0]),
            dict(mesh=1, translation=[1.2, 0.5, 0.0],
                 matrix=None),  # removed below if None
            dict(extensions=dict(KHR_lights_punctual=dict(light=0)),
                 rotation=[0.3, 0.1, 0.0, 0.9486833]),
            dict(extensions=dict(KHR_lights_punctual=dict(light=1)),
                 translation=[0.0, 2.0, 1.0]),
        ],
        scenes=[dict(nodes=[0])],
        scene=0,
    )
    doc["nodes"][3] = dict(mesh=1, translation=[1.2, 0.5, 0.0])

    doc["buffers"][0]["byteLength"] = len(binblob)
    js = json.dumps(doc, separators=(",", ":")).encode()
    js += b" " * ((-len(js)) % 4)
    binpad = binblob + b"\0" * ((-len(binblob)) % 4)
    total = 12 + 8 + len(js) + 8 + len(binpad)
    glb = (
        struct.pack("<4sII", b"glTF", 2, total)
        + struct.pack("<II", len(js), 0x4E4F534A) + js
        + struct.pack("<II", len(binpad), 0x004E4942) + binpad
    )
    out = Path(__file__).resolve().parent.parent / "tests" / "fixtures"
    out.mkdir(parents=True, exist_ok=True)
    (out / "feature_test.glb").write_bytes(glb)
    print(f"wrote {out/'feature_test.glb'} ({len(glb)} bytes)")


if __name__ == "__main__":
    main()
