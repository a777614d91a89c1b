"""Drill-down of pass_timing's buckets: top ops INSIDE each pass window.

pass_timing.py attributes the frame's serial device timeline to buckets
by segmenting at the named Pallas kernel anchors; this tool prints the
individual XLA ops inside a chosen bucket (default: shade_gathers_glue,
the round-4 hot spot) so optimization targets are measured, not guessed.

Usage: python tools/glue_profile.py [bucket] [top_n]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def bucketize(evs):
    """Replicates pass_timing.frame_pass_times' segmentation but returns
    {bucket: [(name, dur_ps), ...]} instead of sums."""

    def is_anchor(name, key):
        return key in name and "custom-call" in name

    raster_idx = [
        i for i, (n, _, _) in enumerate(evs) if is_anchor(n, "raster_gbuffer")
    ]
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

    shade_idx = [
        i for i, (n, _, _) in enumerate(evs) if is_anchor(n, "shade_deferred")
    ]
    last_shade = shade_idx[-1] if shade_idx else (
        max(late_set) if late_set else last_early
    )
    shadow_idx = [
        i for i, (n, _, _) in enumerate(evs) if is_anchor(n, "raster_depth")
    ]
    shadow_lo = min(shadow_idx) if shadow_idx else -1
    shadow_hi = max(shadow_idx) if shadow_idx else -1

    out = {}

    def add(label, name, dur):
        out.setdefault(label, []).append((name, dur))

    for i, (name, off, dur) in enumerate(evs):
        if i in early_set:
            add("raster_early", name, dur)
        elif i in late_set:
            add("raster_late", name, dur)
        elif is_anchor(name, "raster_depth"):
            add("shadow_raster", name, dur)
        elif is_anchor(name, "ctex_addr") or is_anchor(name, "spec_addr"):
            add("shade_addr_kernels", name, dur)
        elif is_anchor(name, "shade_deferred"):
            add("shade_kernel", name, dur)
        elif i < last_early:
            add("early_cull_geom_bin", name, dur)
        elif i < (min(late_set) if late_set else last_early + 1):
            add("hiz_late_cull_geom_bin", name, dur)
        elif shadow_lo >= 0 and i < shadow_lo:
            add("shadow_prep", name, dur)
        elif shadow_lo <= i <= shadow_hi:
            add("shadow_glue", name, dur)
        elif i < last_shade:
            add("shade_gathers_glue", name, dur)
        else:
            add("post_output", name, dur)
    return out


def main(bucket="shade_gathers_glue", top_n=40):
    import numpy as np
    import jax

    from bench import build
    from orbit_tpu.camera import make_perspective_view
    from orbit_tpu.scenes import bistro_flythrough
    from pass_timing import device_op_timeline

    b = build()
    W, H = b["W"], b["H"]
    assets, scene, env = b["assets"], b["scene"], b["env"]
    pipe, smeta = b["pipe"], b["smeta"]
    eye, look = bistro_flythrough(20, 40)
    view = make_perspective_view(
        eye=eye, target=look, aspect=W / H, fovy=np.radians(60.0)
    )
    frame = jax.jit(
        lambda a, s, v, e, st: pipe.frame(a, s, v, e, st, smeta.num_lights)
    )
    state = pipe.initial_state()
    for _ in range(4):
        out, state = frame(assets, scene, view, env, state)
    jax.block_until_ready(out["color"])

    def run():
        o, _ = frame(assets, scene, view, env, state)
        jax.block_until_ready(o["color"])

    evs = device_op_timeline(run)
    buckets = bucketize(evs)
    for name, ops in sorted(
        buckets.items(), key=lambda kv: -sum(d for _, d in kv[1])
    ):
        print(f"== {name}: {sum(d for _, d in ops)/1e9:.2f} ms, {len(ops)} ops")
    ops = buckets.get(bucket, [])
    agg = {}
    for name, dur in ops:
        a = agg.setdefault(name, [0, 0])
        a[0] += 1
        a[1] += dur
    print(f"\n-- top ops in {bucket} --")
    for name, (n, ps) in sorted(agg.items(), key=lambda kv: -kv[1][1])[
        :top_n
    ]:
        print(f"{ps/1e9:9.3f} ms  x{n:<3d} {name[:130]}")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "shade_gathers_glue",
        int(sys.argv[2]) if len(sys.argv) > 2 else 40,
    )
