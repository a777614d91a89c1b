"""glTF loader tests: build a real .gltf + .glb on disk (textured cube with
a node hierarchy), load through the full pipeline, render."""

import base64
import io
import json
import struct

import numpy as np
import pytest

from orbit_tpu.assets import AssetStore, AssetCaps
from orbit_tpu.assets.gltf import load_gltf
from orbit_tpu.assets import procedural as proc
from orbit_tpu.scene import SceneBuilder, LIGHT_DIRECTIONAL


def _build_cube_gltf(tmp_path, glb=False):
    """A 2-node scene: textured cube + scaled translated child cube."""
    from PIL import Image

    cube = proc.cube(1.0)
    cube.finalize()
    pos = cube.positions.astype(np.float32)
    nrm = cube.normals.astype(np.float32)
    uv = cube.uvs.astype(np.float32)
    idx = cube.indices.astype(np.uint16)

    blob = b"".join(
        [pos.tobytes(), nrm.tobytes(), uv.tobytes(), idx.tobytes()]
    )
    offs = np.cumsum(
        [0, pos.nbytes, nrm.nbytes, uv.nbytes]
    ).tolist()

    img = Image.fromarray(proc.checker_texture(32, tiles=4))
    png = io.BytesIO()
    img.save(png, "PNG")
    png_b64 = base64.b64encode(png.getvalue()).decode()

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0},
            {
                "mesh": 0,
                "translation": [2.5, 0, 0],
                "scale": [0.5, 0.5, 0.5],
            },
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {
                            "POSITION": 0,
                            "NORMAL": 1,
                            "TEXCOORD_0": 2,
                        },
                        "indices": 3,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [1, 1, 1, 1],
                    "baseColorTexture": {"index": 0},
                    "metallicFactor": 0.1,
                    "roughnessFactor": 0.8,
                },
            }
        ],
        "textures": [{"source": 0}],
        "images": [{"uri": "data:image/png;base64," + png_b64}],
        "accessors": [
            {
                "bufferView": 0, "componentType": 5126, "count": len(pos),
                "type": "VEC3",
                "min": pos.min(0).tolist(), "max": pos.max(0).tolist(),
            },
            {
                "bufferView": 1, "componentType": 5126, "count": len(nrm),
                "type": "VEC3",
            },
            {
                "bufferView": 2, "componentType": 5126, "count": len(uv),
                "type": "VEC2",
            },
            {
                "bufferView": 3, "componentType": 5123, "count": len(idx),
                "type": "SCALAR",
            },
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offs[0], "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": offs[1], "byteLength": nrm.nbytes},
            {"buffer": 0, "byteOffset": offs[2], "byteLength": uv.nbytes},
            {"buffer": 0, "byteOffset": offs[3], "byteLength": idx.nbytes},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }

    if glb:
        doc["buffers"][0].pop("uri", None)
        js = json.dumps(doc).encode()
        js += b" " * ((-len(js)) % 4)
        bin_chunk = blob + b"\x00" * ((-len(blob)) % 4)
        total = 12 + 8 + len(js) + 8 + len(bin_chunk)
        out = tmp_path / "scene.glb"
        with open(out, "wb") as f:
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(js), 0x4E4F534A))
            f.write(js)
            f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))
            f.write(bin_chunk)
        return out
    doc["buffers"][0]["uri"] = "scene.bin"
    (tmp_path / "scene.bin").write_bytes(blob)
    out = tmp_path / "scene.gltf"
    out.write_text(json.dumps(doc))
    return out


@pytest.mark.parametrize("glb", [False, True])
def test_load_and_render_gltf(tmp_path, glb):
    path = _build_cube_gltf(tmp_path, glb=glb)
    store = AssetStore(AssetCaps())
    sb = SceneBuilder()
    info = load_gltf(path, store, sb)
    assert info["meshes"] == 1 and info["entities"] == 2
    assert info["textures"] == 1 and info["materials"] == 1
    sb.add_light(LIGHT_DIRECTIONAL, direction=(0.3, 1.0, 0.4), intensity=3.0)

    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    assert smeta.num_entities == 2

    from orbit_tpu.camera import make_perspective_view
    from orbit_tpu.raster import RasterConfig
    from orbit_tpu.renderer import (
        RenderSettings, render_frame, static_instance_list,
    )

    W, H = 128, 96
    im, ie, iv = static_instance_list(store, smeta, 256)
    view = make_perspective_view(
        eye=(1.5, 2.0, 4.0), target=(1.0, 0.0, 0.0), aspect=W / H
    )
    out = render_frame(
        assets, scene, view, None, im, ie, iv, smeta.num_lights,
        RenderSettings(width=W, height=H,
                       raster=RasterConfig(backend="xla", pair_capacity=512)),
    )
    img = np.asarray(out["color"])
    vis = np.asarray(out["vis"])
    cov = (vis != 0).mean()
    assert 0.05 < cov < 0.9, f"coverage {cov}"
    assert img.max() > 30  # lit, textured pixels present
    # entity transforms applied: two distinct coverage blobs (main + child)
    cols = (vis != 0).any(axis=0)
    runs = np.diff(np.flatnonzero(np.diff(cols.astype(int)) != 0))
    assert cols.sum() > 10
