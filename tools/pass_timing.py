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

    # shadow-cascade raster kernels have their own names; the glue
    # between the first and last of them is the cascades' cull/geom/bin
    # + VSM prefilter + per-pixel shadow factor work
    shadow_idx = [
        i
        for i, (n, _, _) in enumerate(evs)
        if is_anchor(n, "raster_depth")  # matches raster_depth_alpha too
    ]
    shadow_lo = min(shadow_idx) if shadow_idx else -1
    shadow_hi = max(shadow_idx) if shadow_idx else -1

    for i, (name, off, dur) in enumerate(evs):
        if i in early_set:
            add("raster_early", dur)
        elif i in late_set:
            add("raster_late", dur)
        elif is_anchor(name, "raster_depth"):
            add("shadow_raster", dur)
        elif is_anchor(name, "ctex_addr") or is_anchor(name, "spec_addr"):
            add("shade_addr_kernels", dur)
        elif is_anchor(name, "shade_deferred"):
            add("shade_kernel", dur)
        elif i < last_early:
            add("early_cull_geom_bin", dur)
        elif i < (min(late_set) if late_set else last_early + 1):
            add("hiz_late_cull_geom_bin", dur)
        elif shadow_lo >= 0 and i < shadow_lo:
            # cascade cull + expand + geometry + binning (everything
            # between the late raster and the first cascade-atlas call)
            add("shadow_prep", dur)
        elif shadow_lo <= i <= shadow_hi:
            add("shadow_glue", dur)
        elif i < last_shade:
            # VSM moment prefilter, tile-light build, and the per-pixel
            # texel gathers (ctex / prefiltered-env / VSM quads)
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
    import jax

    from bench import build

    b = build()
    pipe, smeta = b["pipe"], b["smeta"]
    assets, scene, view, env = (
        b["assets"], b["scene"], b["view"], b["env"],
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
