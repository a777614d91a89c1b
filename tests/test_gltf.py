"""glTF loader tests: build a real .gltf + .glb on disk (textured cube with
a node hierarchy), load through the full pipeline, render."""

import base64
import os as _os
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


# ---------------------------------------------------------------- fixture


def test_fixture_glb_features():
    """Load the committed on-disk fixture (tests/fixtures/feature_test.glb,
    generated once by tools/make_fixture_glb.py): interleaved + normalized
    + sparse accessors, embedded PNG + BC1 DDS (MSFT_texture_dds),
    KHR_materials_emissive_strength, KHR_lights_punctual, node hierarchy
    with a shared instanced mesh. Reference: gltf_loader.rs:513-676."""
    import os

    from orbit_tpu.scene import LIGHT_POINT

    path = os.path.join(os.path.dirname(__file__), "fixtures", "feature_test.glb")
    store = AssetStore()
    sb = SceneBuilder(entity_capacity=64, light_capacity=8)
    info = load_gltf(path, store, sb)
    assert info == dict(
        meshes=2, materials=2, textures=2, entities=3, lights=2
    )

    # sparse accessor raised 4 interior grid verts to y = 0.35; the rest
    # of the plane stays at y = 0 (mesh 0 = the 9x9 grid, deduped to 81
    # verts at the head of the store's vertex heap)
    ys = store.h["positions"][:81, 1]
    assert np.isclose(ys.max(), 0.35, atol=1e-6) and (ys > 0.2).sum() == 4
    assert np.isclose(ys.min(), 0.0, atol=1e-6)

    # normalized u16 uvs span [0, 1]
    uv = store.h["uvs"][:81]
    assert uv.min() >= 0.0 and np.isclose(uv.max(), 1.0, atol=1e-4)

    # emissive strength (4.0) scales the emissive factor [0.1, 0.2, 0.3]
    em = store.h["mat_emissive"][1]
    assert np.allclose(em, [0.4, 0.8, 1.2], atol=1e-5)

    # material 1 is MASKED with the DDS texture
    from orbit_tpu.assets.types import ALPHA_MODE_MASKED

    assert store.h["mat_alpha_mode"][1] == ALPHA_MODE_MASKED

    # punctual lights: one directional (node-rotated), one point at the
    # node's world position (root scale 1.5 applies)
    kinds = [l["kind"] for l in sb.lights]
    assert LIGHT_DIRECTIONAL in kinds and LIGHT_POINT in kinds
    pt = sb.lights[kinds.index(LIGHT_POINT)]
    assert np.isclose(pt["position"][1], 3.0, atol=1e-5)  # 2.0 * 1.5
    assert np.isclose(pt["outer_radius"], 7.5, atol=1e-6)


def test_dds_bc_decode_exact():
    """BC1/BC3/BC5 decode: flat 4x4 blocks round-trip exactly; BC3 alpha
    and BC5 two-channel paths decode their palettes correctly."""
    import struct as _st

    from orbit_tpu.assets import dds as dds_mod

    # BC1 flat blocks (fixture encoder) are lossless at 565 precision
    img = np.zeros((8, 8, 3), np.uint8)
    img[:4, :, :] = (255, 0, 0)
    img[4:, :, :] = (0, 255, 0)
    import sys as _sys, os as _os

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tools"))
    from make_fixture_glb import bc1_encode_flat, make_dds_bc1

    rgba, srgb = dds_mod.decode_dds(make_dds_bc1(img))
    assert rgba.shape == (8, 8, 4)
    assert np.array_equal(rgba[..., :3], img)
    assert (rgba[..., 3] == 255).all()

    # BC4 palette: a0 > a1 -> 8-interp mode; indices 0..7 in one block
    a0, a1 = 200, 40
    bits = sum((i % 8) << (3 * i) for i in range(16))
    blk = _st.pack("<BB", a0, a1) + int(bits).to_bytes(6, "little")
    ch = dds_mod._bc4_channel(np.frombuffer(blk, np.uint8).reshape(1, 8))
    expect = [a0, a1] + [((7 - k) * a0 + k * a1 + 3) // 7 for k in range(1, 7)]
    assert list(ch[0, :8]) == expect
    # a0 <= a1 -> 6-interp mode with literal 0 / 255 at indices 6, 7
    blk2 = _st.pack("<BB", 40, 200) + int(bits).to_bytes(6, "little")
    ch2 = dds_mod._bc4_channel(np.frombuffer(blk2, np.uint8).reshape(1, 8))
    assert ch2[0, 6] == 0 and ch2[0, 7] == 255


def test_foreign_style_glb_loads_and_renders():
    """The Blender-exporter-convention fixture (tools/make_foreign_glb:
    per-attribute bufferViews, f32 texcoords, u32 indices, accessor
    min/max, named nested node hierarchy under a rotated parent, an
    unused camera node, per-texture samplers LINEAR/REPEAT vs
    NEAREST/CLAMP) loads and renders — crossing the conventions our own
    feature_test.glb writer uses, the closest available stand-in for a
    foreign-authored file (no network in this environment)."""
    import jax

    from orbit_tpu.assets import procedural as proc
    from orbit_tpu.assets.gltf import load_gltf
    from orbit_tpu.assets.store import AssetStore
    from orbit_tpu.assets.types import (
        FILTER_LINEAR,
        FILTER_NEAREST,
        WRAP_CLAMP,
        WRAP_REPEAT,
    )
    from orbit_tpu.camera import make_perspective_view
    from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
    from orbit_tpu.raster import RasterConfig
    from orbit_tpu.scene import LIGHT_SKY, SceneBuilder
    from orbit_tpu.shade import ibl as ibl_mod

    path = _os.path.join(
        _os.path.dirname(__file__), "fixtures", "blender_style.glb"
    )
    store = AssetStore()
    sb = SceneBuilder()
    summary = load_gltf(path, store, sb)
    assert summary["meshes"] == 2 and summary["entities"] == 3
    # per-texture sampler state survived the import
    assert store.h["tex_wrap"][0] == WRAP_REPEAT
    assert store.h["tex_filter"][0] == FILTER_LINEAR
    assert store.h["tex_wrap"][1] == WRAP_CLAMP
    assert store.h["tex_filter"][1] == FILTER_NEAREST
    # rotated-parent hierarchy baked into entity matrices
    m1 = sb.matrices[1]
    assert m1 is not None
    np.testing.assert_allclose(
        m1[:3, 3], [1.414, 0.05, -0.849], atol=2e-3
    )

    sb.add_light(LIGHT_SKY, intensity=1.0)
    assets, ameta = store.to_device(filter_tables=True)
    scene, smeta = sb.to_device()
    env = ibl_mod.build_environment(
        proc.gradient_envmap(32, 16), cube_res=16, irr_res=8,
        spec_mips=2, spec_samples=8, brdf_res=16, brdf_samples=16,
    )
    W, H = 192, 120
    view = make_perspective_view(
        eye=(3.2, 2.2, 3.2), target=(0.0, 0.4, 0.0), aspect=W / H
    )
    cfg = PipelineConfig(
        width=W, height=H,
        raster=RasterConfig(backend="xla", pair_capacity=1 << 10),
        cull=CullSettings(occlusion=False),
        instance_capacity=1 << 8,
        texture_filter="bilinear",
    )
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"],
        smeta.entity_mesh_host,
    )
    out, _ = jax.jit(
        lambda st: pipe.frame(assets, scene, view, env, st, smeta.num_lights)
    )(pipe.initial_state())
    assert not bool(np.asarray(out["overflow"]))
    vis = np.asarray(out["vis"])
    assert (vis != 0).mean() > 0.12, "foreign scene drew too little"
