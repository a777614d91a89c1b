"""Op-level TPU profile of the bench frame: top ops by total device time.

Usage: python tools/op_profile.py [top_n]
Prints every XLA op of one compiled bench frame, aggregated by op name,
sorted by total duration — the drill-down behind pass_timing.py's
per-pass buckets.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(top_n=45):
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
    total = sum(d for _, _, d in evs) / 1e9
    agg = {}
    for name, off, dur in evs:
        a = agg.setdefault(name, [0, 0.0])
        a[0] += 1
        a[1] += dur / 1e9
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    print(f"total device ms: {total:.2f}  ({len(evs)} ops)")
    for name, (n, ms) in rows[:top_n]:
        print(f"{ms:9.3f} ms  x{n:<4d} {name[:120]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 45)
