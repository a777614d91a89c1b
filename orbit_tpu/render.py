"""Front-door CLI: render a glTF scene to PNG frames on the TPU.

The reference's entry point is `orbit --scene-path x.glb --envmap-path
y.hdr` (main.rs:26-34) driving an interactive window; headless TPU
parity is a fly-around render:

    python -m orbit_tpu.render scene.glb --envmap sky.hdr \
        --out frame.png --frames 8

Capacities are sized from the file and verified by the frame's named
overflow flags (undersized ceilings are doubled and the frame re-jitted
— the CLI never silently drops geometry).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def estimate_caps(path: Path):
    """Size AssetCaps from the glTF document (verts/tris + LOD chains)."""
    from orbit_tpu.assets.gltf import _load_container, _resolve_buffers

    doc, buffers = _load_container(path)
    n_verts = 0
    n_tris = 0
    for mesh in doc.get("meshes", []):
        for prim in mesh.get("primitives", []):
            acc = doc["accessors"][prim["attributes"]["POSITION"]]
            n_verts += acc["count"]
            if "indices" in prim:
                n_tris += doc["accessors"][prim["indices"]]["count"] // 3
            else:
                n_tris += acc["count"] // 3
    n_mats = max(len(doc.get("materials", [])), 1)
    n_texs = max(len(doc.get("images", [])), 1)
    n_meshes = sum(
        len(m.get("primitives", [])) for m in doc.get("meshes", [])
    ) or 1
    # LOD chains multiply stored meshlets by ~1/(1-0.55) and corner
    # expansion stores 64-tri meshlets with padding
    meshlets = int(max(n_tris / 64 * 2.6, 64))

    def up(x, q=256):
        return int(-(-x // q) * q)

    from orbit_tpu.assets.types import AssetCaps

    return AssetCaps(
        vertices=up(int(n_verts * 2.4) + 1024, 4096),
        meshlets=up(meshlets, 1024),
        meshes=up(n_meshes * 9, 64),  # one slot per LOD level
        materials=up(n_mats + 1, 32),
        texture_layers=up(n_texs + 1, 8),
        texture_size=256,
    )


def scene_bounds(store, sb):
    """World-space center/radius over all entities (camera auto-fit)."""
    from orbit_tpu.scene import _compose_trs_np

    centers = []
    radii = []
    for i, mesh in enumerate(sb.meshes):
        m = sb.matrices[i]
        if m is None:
            m = _compose_trs_np(
                sb.translations[i], sb.rotations[i], sb.scales[i]
            )
        sph = store.h["mesh_sphere"][mesh]
        c = m[:3, :3] @ sph[:3] + m[:3, 3]
        s = float(np.linalg.norm(m[:3, :3], 2))
        centers.append(c)
        radii.append(sph[3] * s)
    if not centers:
        return np.zeros(3, np.float32), 1.0
    centers = np.stack(centers)
    radii = np.asarray(radii)
    lo = (centers - radii[:, None]).min(0)
    hi = (centers + radii[:, None]).max(0)
    center = (lo + hi) * 0.5
    radius = float(np.linalg.norm(hi - lo) * 0.5)
    return center.astype(np.float32), max(radius, 1e-3)


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="orbit_tpu.render",
        description="Render a glTF/GLB scene on the TPU (reference "
        "parity: main.rs --scene-path/--envmap-path).",
    )
    ap.add_argument("scene", help="path to .gltf / .glb")
    ap.add_argument("--envmap", help=".hdr equirect environment map")
    ap.add_argument("--out", default="frame.png", help="output PNG path")
    ap.add_argument("--frames", type=int, default=1,
                    help="fly-around frame count (>1: numbered PNGs)")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--render-mode", type=int, default=0,
                    help="debug render mode 0-9 (app.rs:1017-1039)")
    ap.add_argument("--no-shadows", action="store_true")
    ap.add_argument("--ssao", action="store_true")
    ap.add_argument("--bloom", action="store_true")
    ap.add_argument("--no-cull", action="store_true",
                    help="disable two-pass occlusion culling")
    ap.add_argument("--filter", default="trilinear",
                    choices=["nearest", "bilinear", "trilinear", "aniso"])
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "pallas", "xla", "pallas_interpret"])
    ap.add_argument("--exposure", type=float, default=1.0)
    args = ap.parse_args(argv)

    t0 = time.perf_counter()
    import jax

    from orbit_tpu.assets.gltf import load_gltf
    from orbit_tpu.assets.store import AssetStore
    from orbit_tpu.assets import procedural as proc
    from orbit_tpu.camera import make_perspective_view
    from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
    from orbit_tpu.raster import RasterConfig
    from orbit_tpu.scene import LIGHT_DIRECTIONAL, LIGHT_SKY, SceneBuilder
    from orbit_tpu.shade import ibl as ibl_mod

    path = Path(args.scene)
    if not path.exists():
        print(f"error: scene not found: {path}", file=sys.stderr)
        return 2
    caps = estimate_caps(path)
    store = AssetStore(caps)
    sb = SceneBuilder(entity_capacity=4096, light_capacity=16)
    summary = load_gltf(path, store, sb)
    print(f"loaded {path.name}: {json.dumps(summary)}", file=sys.stderr)

    # lights: keep the file's punctual lights; always add the IBL sky,
    # and a sun if the file has no directional light (the reference app
    # always creates its sun + sky pair, app.rs:640-655)
    kinds = [light["kind"] for light in sb.lights]
    sb.add_light(LIGHT_SKY, color=(1, 1, 1), intensity=1.0)
    if LIGHT_DIRECTIONAL not in kinds:
        sb.add_light(
            LIGHT_DIRECTIONAL, direction=(0.35, 0.8, 0.45),
            color=(1.0, 0.98, 0.9), intensity=2.5,
        )

    if args.envmap:
        from orbit_tpu.assets.hdr import load_hdr

        env_img = load_hdr(args.envmap)
    else:
        env_img = proc.gradient_envmap(256, 128)
    env = ibl_mod.build_environment(
        env_img, cube_res=128, irr_res=16, spec_mips=5,
        spec_samples=128, brdf_res=64, brdf_samples=128,
    )

    # bilinear/trilinear run fused off the baked quad tables (per-texture
    # samplers honored); aniso takes the op-by-op path
    assets, ameta = store.to_device(
        filter_tables=args.filter in ("bilinear", "trilinear")
    )
    scene, smeta = sb.to_device()
    center, radius = scene_bounds(store, sb)

    from orbit_tpu.passes.bloom import BloomSettings
    from orbit_tpu.passes.shadow import ShadowSettings
    from orbit_tpu.passes.ssao import SsaoSettings

    n_mlets = int(ameta.num_meshlets)
    inst_cap = 1 << max(int(np.ceil(np.log2(max(n_mlets, 1024)))), 10)
    pair_cap = min(int(-(-inst_cap * 3 // 8192) * 8192), 147456)
    cfg = PipelineConfig(
        width=args.width,
        height=args.height,
        raster=RasterConfig(backend=args.backend, pair_capacity=pair_cap),
        cull=CullSettings(occlusion=not args.no_cull),
        instance_capacity=inst_cap,
        render_mode=args.render_mode,
        exposure=args.exposure,
        shadows=None if args.no_shadows else ShadowSettings(
            resolution=1024, max_distance=radius * 2.5, filter="vsm",
        ),
        ssao=SsaoSettings(method="dense") if args.ssao else None,
        bloom=BloomSettings() if args.bloom else None,
        texture_filter=args.filter,
    )

    def build_frame(cfg):
        pipe = Pipeline(
            cfg, ameta, smeta, store.h["mesh_lod_count"],
            smeta.entity_mesh_host,
        )
        return pipe, jax.jit(
            lambda a, s, v, e, st: pipe.frame(
                a, s, v, e, st, smeta.num_lights
            )
        )

    pipe, frame = build_frame(cfg)

    def view_at(i):
        theta = 2.0 * np.pi * i / max(args.frames, 1) + 0.6
        eye = center + radius * np.asarray(
            [2.0 * np.cos(theta), 0.8, 2.0 * np.sin(theta)], np.float32
        )
        return make_perspective_view(
            eye=eye, target=center, aspect=args.width / args.height,
            fovy=np.radians(55.0),
        )

    # first frame with overflow verification: any capacity ceiling that
    # trips is doubled and the frame re-jitted (never silent drops)
    state = pipe.initial_state()
    for _attempt in range(4):
        out, state2 = frame(assets, scene, view_at(0), env, state)
        detail = {
            k: bool(np.asarray(v))
            for k, v in out["overflow_detail"].items()
        }
        if not any(detail.values()):
            state = state2
            break
        tripped = sorted(k for k, v in detail.items() if v)
        print(f"capacity overflow {tripped}; doubling", file=sys.stderr)
        from dataclasses import replace

        cfg = replace(
            cfg,
            instance_capacity=cfg.instance_capacity * 2,
            raster=replace(
                cfg.raster,
                pair_capacity=min(cfg.raster.pair_capacity * 2, 147456),
            ),
        )
        pipe, frame = build_frame(cfg)
        state = pipe.initial_state()
    else:
        print("error: capacity overflow persists", file=sys.stderr)
        return 3

    try:
        from PIL import Image

        def write(img, p):
            Image.fromarray(np.asarray(img)).save(p)
    except ImportError:  # minimal PPM fallback
        def write(img, p):
            p = str(p)
            if p.endswith(".png"):
                p = p[:-4] + ".ppm"
            a = np.asarray(img)
            with open(p, "wb") as f:
                f.write(b"P6\n%d %d\n255\n" % (a.shape[1], a.shape[0]))
                f.write(a[..., :3].tobytes())

    out_path = Path(args.out)
    for i in range(args.frames):
        # let two-pass visibility converge on the new viewpoint
        v = view_at(i)
        for _ in range(2 if cfg.cull.occlusion else 1):
            out, state = frame(assets, scene, v, env, state)
        img = np.asarray(out["color"])
        p = (
            out_path
            if args.frames == 1
            else out_path.with_name(
                f"{out_path.stem}_{i:03d}{out_path.suffix}"
            )
        )
        write(img, p)
        print(f"wrote {p}", file=sys.stderr)
    print(
        f"rendered {args.frames} frame(s) at {args.width}x{args.height} "
        f"in {time.perf_counter() - t0:.1f}s "
        f"({n_mlets} meshlets, {smeta.num_entities} entities)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
