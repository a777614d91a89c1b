"""Generate tests/fixtures/blender_style.glb — a GLB laid out the way
the Khronos Blender exporter writes files, NOT the way our own
make_fixture_glb.py does.

No network access exists in this environment, so a file literally
authored by Blender cannot be fetched; this is the closest available
substitute for foreign-exporter coverage: a SECOND, independently
written exporter that deliberately follows the Blender I/O conventions
our first fixture writer does not use, so reader/writer-correlated
assumptions get crossed:

  make_fixture_glb.py (ours)          this file (Blender-style)
  -----------------------------       --------------------------------
  interleaved P/N/UV bufferView       one tightly-packed bufferView per
    with byteStride                     attribute, no byteStride
  TEXCOORD_0 normalized u16           TEXCOORD_0 float32
  u16 indices                         u32 indices
  no accessor min/max except POS      min/max on every accessor
  no names                            names on nodes/meshes/materials
  flat node list                      nested hierarchy under a rotated
                                        parent + an unused camera node
  no default-less samplers            two samplers: LINEAR/REPEAT and
                                        NEAREST/CLAMP_TO_EDGE
  DDS + PNG images                    PNG only, with mimeType fields
  asset.generator ours                asset.generator Blender I/O

Run once; the binary is committed as a fixture (tests/test_gltf.py).
"""

from __future__ import annotations

import json
import struct
import sys
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def png_encode(img: np.ndarray) -> bytes:
    """Minimal valid RGBA8 PNG (filter 0 rows, one zlib IDAT)."""
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def main(out_path: str):
    # ---- geometry: a 12x12 UV-gridded dome (quarter sphere) + a quad
    n = 12
    th = np.linspace(0, np.pi / 2, n)
    ph = np.linspace(0, 2 * np.pi, n)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pos = np.stack(
        [np.sin(T) * np.cos(P), np.cos(T), np.sin(T) * np.sin(P)], -1
    ).reshape(-1, 3).astype(np.float32)
    nrm = pos / np.maximum(
        np.linalg.norm(pos, axis=-1, keepdims=True), 1e-9
    )
    nrm = nrm.astype(np.float32)
    uv = np.stack(
        [P.reshape(-1) / (2 * np.pi), T.reshape(-1) / (np.pi / 2)], -1
    ).astype(np.float32)
    idx = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b = i * n + j, i * n + j + 1
            c, d = (i + 1) * n + j, (i + 1) * n + j + 1
            idx += [a, c, b, b, c, d]
    idx = np.asarray(idx, np.uint32)

    qpos = np.array(
        [[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32
    )
    qnrm = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    quv = np.array([[-0.5, -0.5], [1.5, -0.5], [1.5, 1.5], [-0.5, 1.5]],
                   np.float32)
    qidx = np.asarray([0, 2, 1, 0, 3, 2], np.uint32)

    # ---- textures: a gradient PNG (sphere) + a rings PNG (floor)
    g = np.zeros((32, 32, 4), np.uint8)
    gy, gx = np.mgrid[0:32, 0:32]
    g[..., 0] = gx * 8
    g[..., 1] = 128
    g[..., 2] = gy * 8
    g[..., 3] = 255
    r = np.zeros((32, 32, 4), np.uint8)
    rr = np.sqrt((gx - 16) ** 2 + (gy - 16) ** 2)
    ring = ((rr.astype(int) % 8) < 4).astype(np.uint8)
    r[..., 0] = 60 + 180 * ring
    r[..., 1] = 60 + 120 * ring
    r[..., 2] = 60
    r[..., 3] = 255
    png_a, png_b = png_encode(g), png_encode(r)

    # ---- buffer: per-attribute tightly packed views (Blender layout)
    blobs = [
        pos.tobytes(), nrm.tobytes(), uv.tobytes(), idx.tobytes(),
        qpos.tobytes(), qnrm.tobytes(), quv.tobytes(), qidx.tobytes(),
        png_a, png_b,
    ]
    views, offs = [], 0
    for b in blobs:
        views.append(dict(buffer=0, byteOffset=offs, byteLength=len(b)))
        offs += len(b)
        offs += (-offs) % 4
    bin_blob = b""
    for b in blobs:
        bin_blob += b + b"\x00" * ((-len(b)) % 4)

    def acc(view, ctype, count, atype, arr=None):
        a = dict(bufferView=view, componentType=ctype, count=count,
                 type=atype)
        if arr is not None:
            a["min"] = np.asarray(arr).min(0).reshape(-1).tolist()
            a["max"] = np.asarray(arr).max(0).reshape(-1).tolist()
        return a

    doc = dict(
        asset=dict(
            generator="Khronos glTF Blender I/O v4.2.57", version="2.0"
        ),
        scene=0,
        scenes=[dict(name="Scene", nodes=[0, 4])],
        nodes=[
            dict(  # rotated parent empty
                name="Root",
                rotation=[0.0, 0.3826834, 0.0, 0.9238795],
                children=[1, 2],
            ),
            dict(name="Dome", mesh=0, translation=[0, 0.05, 0]),
            dict(
                name="Dome.001", mesh=0,
                translation=[1.6, 0.05, 0.4],
                scale=[0.5, 0.5, 0.5],
            ),
            dict(name="Camera", camera=0),  # unused by loaders
            dict(name="Floor", mesh=1),
        ],
        cameras=[dict(type="perspective",
                      perspective=dict(yfov=0.8, znear=0.1))],
        meshes=[
            dict(name="Dome", primitives=[dict(
                attributes=dict(POSITION=0, NORMAL=1, TEXCOORD_0=2),
                indices=3, material=0,
            )]),
            dict(name="Floor", primitives=[dict(
                attributes=dict(POSITION=4, NORMAL=5, TEXCOORD_0=6),
                indices=7, material=1,
            )]),
        ],
        accessors=[
            acc(0, 5126, len(pos), "VEC3", pos),
            acc(1, 5126, len(nrm), "VEC3", nrm),
            acc(2, 5126, len(uv), "VEC2", uv),
            acc(3, 5125, len(idx), "SCALAR", idx[:, None]),
            acc(4, 5126, 4, "VEC3", qpos),
            acc(5, 5126, 4, "VEC3", qnrm),
            acc(6, 5126, 4, "VEC2", quv),
            acc(7, 5125, 6, "SCALAR", qidx[:, None]),
        ],
        bufferViews=views,
        buffers=[dict(byteLength=len(bin_blob))],
        samplers=[
            dict(magFilter=9729, minFilter=9987, wrapS=10497,
                 wrapT=10497),
            dict(magFilter=9728, minFilter=9728, wrapS=33071,
                 wrapT=33071),
        ],
        images=[
            dict(name="grad", mimeType="image/png", bufferView=8),
            dict(name="rings", mimeType="image/png", bufferView=9),
        ],
        textures=[
            dict(sampler=0, source=0),
            dict(sampler=1, source=1),
        ],
        materials=[
            dict(
                name="DomeMat", doubleSided=True,
                pbrMetallicRoughness=dict(
                    baseColorTexture=dict(index=0),
                    metallicFactor=0.1, roughnessFactor=0.6,
                ),
            ),
            dict(
                name="FloorMat",
                pbrMetallicRoughness=dict(
                    baseColorTexture=dict(index=1),
                    metallicFactor=0.0, roughnessFactor=0.9,
                ),
            ),
        ],
    )

    js = json.dumps(doc, separators=(",", ":")).encode()
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_blob)
    glb = (
        struct.pack("<III", 0x46546C67, 2, total)
        + struct.pack("<II", len(js), 0x4E4F534A) + js
        + struct.pack("<II", len(bin_blob), 0x004E4942) + bin_blob
    )
    Path(out_path).write_bytes(glb)
    print(f"wrote {out_path} ({len(glb)} bytes)")


if __name__ == "__main__":
    main(
        sys.argv[1]
        if len(sys.argv) > 1
        else "tests/fixtures/blender_style.glb"
    )
