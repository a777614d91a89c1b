"""In-frame per-pass device timing from ONE compiled frame.

Replaces the reference's per-batch GPU timestamp queries
(src/graphics/context.rs:1509-1529) and round 1's separately-jitted
GraphProfiler (which measured a *different* program than the fused
frame): the real frame is traced once with jax.profiler, the device's
"XLA Ops" timeline is read back via jax.profiler.ProfileData, and ops
are attributed to passes by segmenting the (serial) timeline at the
named Pallas kernel anchors (raster_gbuffer / ctex_addr / spec_addr /
shade_deferred). The result is the true in-context cost of each stage
of the single compiled program.
"""

from __future__ import annotations

import glob
import os
import tempfile


def device_op_timeline(run_fn):
    """Run `run_fn()` (one frame + block) under the profiler; returns a
    list of (name, offset_ps, duration_ps) device ops sorted by start."""
    import jax

    d = tempfile.mkdtemp(prefix="orbit_prof_")
    with jax.profiler.trace(d):
        run_fn()
    files = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    if not files:
        return []
    pd = jax.profiler.ProfileData.from_file(files[0])
    out = []
    for plane in pd.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                st = dict(e.stats)
                out.append(
                    (
                        e.name,
                        int(st.get("device_offset_ps", 0)),
                        int(st.get("device_duration_ps", 0)),
                    )
                )
    out.sort(key=lambda t: t[1])
    return out


def frame_pass_times(run_fn):
    """Per-pass ms of one frame. Returns a dict whose values sum to the
    frame's total device time."""
    evs = device_op_timeline(run_fn)
    if not evs:
        return {}

    def is_anchor(name, key):
        return key in name and "custom-call" in name

    # segment boundaries, in timeline order
    passes = {}

    def add(label, dur_ps):
        passes[label] = passes.get(label, 0.0) + dur_ps / 1e9

    # locate anchor groups
    raster_idx = [
        i for i, (n, _, _) in enumerate(evs) if is_anchor(n, "raster_gbuffer")
    ]
    # the early pass's raster chain comes first; the late pass's after.
    # chains are contiguous in index space except interleaved glue ops;
    # split where a ctex_addr/spec_addr/shade anchor intervenes or by
    # the largest index gap.
    split = 1
    if len(raster_idx) > 1:
        gaps = [
            raster_idx[k + 1] - raster_idx[k]
            for k in range(len(raster_idx) - 1)
        ]
        split = gaps.index(max(gaps)) + 1
    early_set = set(raster_idx[:split])
    late_set = set(raster_idx[split:])
    last_early = max(early_set) if early_set else -1
    last_late = max(late_set) if late_set else last_early

    shade_idx = [
        i
        for i, (n, _, _) in enumerate(evs)
        if is_anchor(n, "shade_deferred")
    ]
    last_shade = shade_idx[-1] if shade_idx else last_late

    for i, (name, off, dur) in enumerate(evs):
        if i in early_set:
            add("raster_early", dur)
        elif i in late_set:
            add("raster_late", dur)
        elif is_anchor(name, "ctex_addr") or is_anchor(name, "spec_addr"):
            add("shade_addr_kernels", dur)
        elif is_anchor(name, "shade_deferred"):
            add("shade_kernel", dur)
        elif i < last_early:
            add("early_cull_geom_bin", dur)
        elif i < (min(late_set) if late_set else last_early + 1):
            add("hiz_late_cull_geom_bin", dur)
        elif i < last_shade:
            # dominated by the two per-pixel texel gathers
            add("shade_gathers_glue", dur)
        else:
            add("post_output", dur)
    passes["total_device_ms"] = sum(
        v for k, v in passes.items() if k != "total_device_ms"
    )
    return {k: round(v, 3) for k, v in passes.items()}


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import numpy as np
    import jax

    from orbit_tpu.assets import procedural as proc
    from orbit_tpu.camera import make_perspective_view
    from orbit_tpu.pipeline import CullSettings, Pipeline, PipelineConfig
    from orbit_tpu.raster import RasterConfig
    from orbit_tpu.scenes import BENCH_CAMERAS, bistro_scene
    from orbit_tpu.shade import ibl as ibl_mod

    W, H = 1920, 1080
    store, sb = bistro_scene()
    assets, ameta = store.to_device()
    scene, smeta = sb.to_device()
    env = ibl_mod.build_environment(
        proc.gradient_envmap(64, 32), cube_res=64, irr_res=16,
        spec_mips=4, spec_samples=32, brdf_res=32, brdf_samples=32,
    )
    cam = BENCH_CAMERAS["bistro"]
    view = make_perspective_view(
        eye=cam["eye"], target=cam["target"], aspect=W / H,
        fovy=np.radians(60.0),
    )
    cfg = PipelineConfig(
        width=W, height=H,
        raster=RasterConfig(backend="pallas", pair_capacity=12288),
        cull=CullSettings(), instance_capacity=1 << 12,
        late_pair_capacity=1 << 13,
    )
    pipe = Pipeline(
        cfg, ameta, smeta, store.h["mesh_lod_count"], smeta.entity_mesh_host
    )
    frame = jax.jit(
        lambda a, s, v, e, st: pipe.frame(a, s, v, e, st, smeta.num_lights)
    )
    state = pipe.initial_state()
    for _ in range(3):
        out, state = frame(assets, scene, view, env, state)
    jax.block_until_ready(out["color"])

    def run():
        o, _ = frame(assets, scene, view, env, state)
        jax.block_until_ready(o["color"])

    for k, v in frame_pass_times(run).items():
        print(f"{k:<26} {v:9.3f} ms")
