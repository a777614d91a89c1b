"""Benchmark: Bistro-scale scene at 1080p, full cull+shade, on one TPU chip.

Mirrors BASELINE.json's headline config (4: Bistro exterior, meshlet
pipeline with frustum + cone + two-pass HiZ occlusion culling, PBR+IBL
shading). Prints ONE JSON line:
  {"metric": ..., "value": p50_ms, "unit": "ms", "vs_baseline": ...}

vs_baseline is measured against the north-star target of 16.67 ms/frame
(60 FPS on one v5e — the reference publishes no numbers, BASELINE.md):
vs_baseline = target_ms / measured_ms, so >= 1.0 means the target is met.
"""

from __future__ import annotations

import json
import time

import numpy as np


def build(W=1920, H=1080, rbackend=None):
    """Construct the full north-star bench setup (scene, env, config,
    pipeline, camera). Shared by main() and every tools/ profiler so
    profiling always measures the SAME program the bench times."""
    import os

    import jax

    # persistent compile cache: the bench frame is a large program
    # (~10 min cold compile through the tunnel); cache hits make
    # repeat runs start in seconds
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/orbit_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from orbit_tpu.assets import procedural as proc
    from orbit_tpu.camera import make_perspective_view
    from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
    from orbit_tpu.raster import RasterConfig
    from orbit_tpu.scenes import BENCH_CAMERAS, bistro_xl_scene
    from orbit_tpu.shade import ibl as ibl_mod

    backend = jax.default_backend()

    # reference-class content: ~80k stored meshlets (1.26M unique LOD0
    # triangles across 20k LOD0 meshlets + 0.8x LOD chains), ~5.9k
    # entities instancing ~40M triangles of scene content — the
    # reference's design point is 256k meshlets / 100k instances
    # (assets/mod.rs:197-205, scene.rs:303-304). 256 street-lamp point
    # lights feed the clustered shading path.
    store, sb = bistro_xl_scene(point_lights=256)
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    env = ibl_mod.build_environment(
        proc.gradient_envmap(256, 128), cube_res=64, irr_res=16,
        spec_mips=4, spec_samples=64, brdf_res=64, brdf_samples=128,
    )

    from orbit_tpu.passes.bloom import BloomSettings
    from orbit_tpu.passes.cluster import ClusterSettings
    from orbit_tpu.passes.shadow import ShadowSettings
    from orbit_tpu.passes.ssao import SsaoSettings

    if rbackend is None:
        rbackend = "pallas" if backend == "tpu" else "xla"
    cfg = PipelineConfig(
        width=W,
        height=H,
        raster=RasterConfig(
            backend=rbackend,
            # tile shape (round 5 measurements, tools/tile_experiment):
            # the kernel is ~0.4 us/pair fixed-overhead-bound, so the
            # pair count IS the raster cost — 32-row tiles cut it ~40%
            # at 1080p. n_chunks=8 keeps the pixel phases at 512 px,
            # which holds the G-buffer kernel's phase-2 live set at the
            # 16-row size (the VMEM cliff that used to force 16x128)
            tile_h=32,
            tile_w=128,
            n_chunks=8,
            pair_capacity=98304,  # 2 chained 49152-pair raster calls
        ),
        # aggressive distance LOD (the XL meshes carry steep 0.55x/level
        # chains, so far instances collapse to a handful of meshlets)
        cull=CullSettings(lod_base=3.0, lod_step=1.45),
        instance_capacity=65536,
        # geometry/raster slot space tracks the real draw count via
        # drawn-instance compaction; the late pass draws only the
        # newly-visible difference (all overflow-asserted)
        draw_capacity=32768,
        late_draw_capacity=16384,
        late_pair_capacity=49152,
        # THE NORTH-STAR EFFECTS STACK (BASELINE.json): 4-cascade CSM
        # (VSM filter: dense moment prefilter + one bilinear tap),
        # clustered point lights (per-tile lists walked in the fused
        # kernel), bloom (fused kernel emits HDR tiles)
        shadows=ShadowSettings(
            resolution=1024, cascade_count=4, max_distance=60.0,
            filter="vsm",
            # moments at half the cascade res: the per-pixel moment
            # gather was the frame's largest (2 x 9 ms from 67 MB
            # full-res tables); the VSM blur low-passes anyway
            vsm_moment_scale=2,
            # VSM's 7-texel prefilter swallows detail below ~2 texels,
            # so casters can drop one more LOD than the texel floor
            lod_texel_scale=2.0,
            # worst-case fly-through pairs per cascade at 16x128 tiles
            # (tools/shadow_caps.py: opaque 12.8k/9.7k/16.8k/30.8k,
            # masked 20.9k/6.2k/7.2k/13.3k over 20 sampled views) + ~30%
            # headroom — padding slots are cheap since the pair body
            # gates on `active`
            # generous: pair-body gating makes unused slots ~50 ns
            # each, and the measured worst cases under-predict the
            # pipeline's real streams in some tail views
            pair_capacities=(24576, 16384, 28672, 49152),
            masked_pair_capacities=(32768, 12288, 12288, 24576),
        ),
        shadow_raster=RasterConfig(
            backend=rbackend, tile_h=32, tile_w=128, n_chunks=8,
            pair_capacity=49152,
        ),
        # per-cascade ceilings from the measured fly-through worst case
        # (tools/shadow_caps.py: drawn <= 1.0k/2.4k/7.0k/26.8k,
        # expanded <= 2.6k/3.8k/9.2k/31.4k) + ~30%
        shadow_draw_capacity=(2048, 3072, 9216, 34816),
        shadow_instance_capacity=(4096, 5120, 12288, 40960),
        clusters=ClusterSettings(tile_light_cap=32),
        # config-5 stress parity: SSAO runs in the bench (dense method:
        # fixed screen-space spiral taps = zero gathers, see passes/ssao)
        ssao=SsaoSettings(method="dense"),
        bloom=BloomSettings(),
    )
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"],
        smeta.entity_mesh_host,
    )
    cam = BENCH_CAMERAS["bistro_xl"]
    view = make_perspective_view(
        eye=cam["eye"], target=cam["target"], aspect=W / H,
        fovy=np.radians(60.0),
    )
    return dict(
        W=W, H=H, backend=backend, store=store, sb=sb,
        assets=assets, ameta=ameta, scene=scene, smeta=smeta,
        env=env, cfg=cfg, pipe=pipe, view=view,
    )


def main():
    import jax
    import jax.numpy as jnp

    from orbit_tpu.camera import make_perspective_view
    from orbit_tpu.scenes import bistro_flythrough

    b = build()
    W, H = b["W"], b["H"]
    backend = b["backend"]
    store, assets, ameta = b["store"], b["assets"], b["ameta"]
    scene, smeta = b["scene"], b["smeta"]
    env, pipe, view = b["env"], b["pipe"], b["view"]

    frame = jax.jit(
        lambda assets, scene, view, env, state: pipe.frame(
            assets, scene, view, env, state, smeta.num_lights
        ),
        donate_argnums=(4,),
    )

    state = pipe.initial_state()
    # warm up: compile + let two-pass visibility converge
    out, state = frame(assets, scene, view, env, state)
    jax.block_until_ready(out["color"])
    for _ in range(3):
        out, state = frame(assets, scene, view, env, state)
    jax.block_until_ready(out["color"])

    # TIMING (environment quirk): on this tunneled TPU, block_until_ready
    # does NOT block in async mode; the first device->host readback flips
    # the client to synchronous dispatch (each call then waits for
    # completion + ~5-15 ms tunnel round-trip). So: force sync mode,
    # measure the round-trip with a no-op, and subtract it.
    # NOTE: the first frames after the all-visible initial state may
    # overflow while two-pass visibility converges (self-correcting);
    # the steady-state fly-through below asserts overflow-free frames.
    bool(out["overflow"])  # D2H readback flips the client to sync mode
    nop = jax.jit(lambda x: x + 1.0)
    z = nop(jnp.zeros((1,)))
    t0 = time.perf_counter()
    for _ in range(10):
        z = nop(z)
    jax.block_until_ready(z)
    latency_ms = (time.perf_counter() - t0) / 10 * 1e3

    # precompute the fly-through views: the camera advances down the
    # street while yawing side to side — meshlets stream through both
    # the frustum and the two-pass occlusion visibility set every frame
    views = []
    for i in range(40):
        eye, look = bistro_flythrough(i, 40)
        views.append(
            make_perspective_view(
                eye=eye, target=look, aspect=W / H, fovy=np.radians(60.0)
            )
        )
    jax.block_until_ready(views[-1].view_proj)

    # HEADLINE: steady-state render-loop throughput. Consecutive frames
    # are device-serial by construction (each consumes the previous
    # frame's visibility state), so timing a chained run and dividing by
    # N measures true device ms/frame while the host pipelines dispatch
    # — exactly how a production renderer runs (the reference keeps 2
    # frames in flight, src/graphics/context.rs:28). Blocking after
    # EVERY frame would add ~20 ms/frame of tunnel round-trip + host
    # serialization that is not device work; that serialized latency is
    # reported in extra for transparency.
    for v in views[:3]:
        out, state = frame(assets, scene, v, env, state)  # warm pipeline
    jax.block_until_ready(out["color"])
    timed = views[3:30]
    t0 = time.perf_counter()
    for v in timed:
        out, state = frame(assets, scene, v, env, state)
    jax.block_until_ready(out["color"])
    ms_frame = (time.perf_counter() - t0) * 1e3 / len(timed)

    # serialized tail continues the same path (no camera teleports)
    ser = []
    overflowed = set()
    for v in views[30:]:
        t0 = time.perf_counter()
        out, state = frame(assets, scene, v, env, state)
        jax.block_until_ready(out["color"])
        ser.append((time.perf_counter() - t0) * 1e3 - latency_ms)
        if bool(np.asarray(out["overflow"])):
            overflowed |= {
                k
                for k, f in out.get("overflow_detail", {}).items()
                if bool(np.asarray(f))
            }
    assert not overflowed, f"capacity overflow during fly-through: {sorted(overflowed)}"

    # in-frame per-pass device times from ONE compiled frame (the
    # reference's per-batch GPU timestamps, context.rs:1509-1529)
    pass_ms = {}
    try:
        import os
        import sys as _sys

        _sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "tools")
        )
        from pass_timing import frame_pass_times

        def _run_once():
            o, _ = frame(assets, scene, views[-1], env, state)
            jax.block_until_ready(o["color"])

        pass_ms = frame_pass_times(_run_once)
    except Exception:
        pass

    target_ms = 1000.0 / 60.0
    lod0_meshlets = int(store.h["mesh_lod_count"][:, 0].sum())
    lod0_tris = int(
        store.h["mlet_tcount"][: ameta.num_meshlets].sum()
        if "mlet_tcount" in store.h
        else 0
    )
    result = {
        "metric": (
            "ms/frame at 1080p, steady-state fly-through (bistro_xl: "
            "42k stored meshlets / 2.65M stored tris / 5.1k entities "
            "instancing ~40M tris; meshlet pipeline, frustum+cone+"
            "two-pass HiZ occlusion, PBR+IBL shade, 4-cascade "
            "CSM(VSM, half-res moments), 256 clustered point lights, "
            "SSAO(dense), bloom — the BASELINE north-star config; "
            "texture filtering: nearest-mip (reference default is "
            "trilinear aniso-16)"
        ),
        "value": round(ms_frame, 3),
        "unit": "ms",
        "vs_baseline": round(target_ms / ms_frame, 3),
        "extra": {
            "backend": backend,
            "fps": round(1000.0 / ms_frame, 2),
            "serialized_p50_ms": round(float(np.percentile(ser, 50)), 3),
            # wall-vs-device attribution (round-3 acceptance item): the
            # chained-loop wall clock minus the profiled on-device time.
            # tools/wallgap.py owns the decomposition: on this tunneled
            # TPU the first D2H flips the client into synchronous
            # dispatch, so each frame serializes host dispatch of ~1.5k
            # XLA ops (~10-15 ms) with device execution; on untunneled
            # hardware with 2 frames in flight the gap pipelines away.
            "wall_minus_device_ms": (
                round(ms_frame - pass_ms["total_device_ms"], 3)
                if pass_ms.get("total_device_ms")
                else None
            ),
            "dispatch_latency_ms": round(latency_ms, 3),
            "frames_timed": len(timed),
            "meshlets_in_store": int(ameta.num_meshlets),
            "lod0_meshlets": lod0_meshlets,
            "tris_in_store": lod0_tris,
            "entities": int(smeta.num_entities),
            "pass_ms": pass_ms,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
