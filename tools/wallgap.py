"""Own the wall-vs-device gap: what does a steady-state frame cost the
host, and how much of bench.py's ms/frame is not device work?

BENCH_r03: 364.3 ms/frame wall vs 313.1 ms total_device — 51 ms/frame
unaccounted. Hypotheses:
  (a) sync-mode dispatch: bench.py reads back `overflow` BEFORE timing,
      which permanently flips this tunneled client into synchronous
      ~5-15 ms/dispatch mode; each timed frame then serializes host
      dispatch + tunnel round-trip with device work.
  (b) host-side Python/dispatch cost of the big frame function.
  (c) profiler skew in pass_timing's total_device_ms.

Measures, in ONE process (order matters — sync-mode flip is permanent):
  1. async-mode chained N frames, ONE final D2H (the last frame's color
     depends on the whole chain through the carried visibility state,
     so the read bounds every frame) -> true pipelined ms/frame.
  2. host dispatch cost alone: time to ENQUEUE N frames in async mode
     (no blocking read) -> host-side floor per frame.
  3. the D2H flip, then bench.py's current sync-mode methodology.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(n_frames=24):
    import jax

    from bench import build
    from orbit_tpu.camera import make_perspective_view
    from orbit_tpu.scenes import bistro_flythrough

    b = build()
    W, H = b["W"], b["H"]
    assets, scene, env = b["assets"], b["scene"], b["env"]
    pipe, smeta = b["pipe"], b["smeta"]

    frame = jax.jit(
        lambda a, s, v, e, st: pipe.frame(a, s, v, e, st, smeta.num_lights)
    )

    views = []
    for i in range(n_frames + 8):
        eye, look = bistro_flythrough(i, n_frames + 8)
        views.append(
            make_perspective_view(
                eye=eye, target=look, aspect=W / H, fovy=np.radians(60.0)
            )
        )

    state = pipe.initial_state()
    # warmup WITHOUT any D2H: compile + converge visibility; sleep long
    # enough for the device queue to drain (block_until_ready cannot be
    # trusted in async mode on this stack)
    t0 = time.perf_counter()
    out, state = frame(assets, scene, views[0], env, state)
    print(f"compile+first dispatch: {time.perf_counter()-t0:.1f} s")
    for v in views[1:6]:
        out, state = frame(assets, scene, v, env, state)
    time.sleep(8.0)

    # 1. async chained: one D2H at the end bounds the whole chain
    t0 = time.perf_counter()
    for v in views[6 : 6 + n_frames]:
        out, state = frame(assets, scene, v, env, state)
    t_enq = time.perf_counter() - t0  # 2. pure enqueue cost
    _ = np.asarray(out["color"][0, :4])  # first D2H EVER in this process
    t_all = time.perf_counter() - t0
    print(
        f"async: enqueue {t_enq*1e3/n_frames:.2f} ms/frame, "
        f"chained wall {t_all*1e3/n_frames:.2f} ms/frame ({n_frames} frames)"
    )

    # now the client is in sync mode (D2H happened): bench methodology
    nop = jax.jit(lambda x: x + 1.0)
    import jax.numpy as jnp

    z = nop(jnp.zeros((1,)))
    jax.block_until_ready(z)
    t0 = time.perf_counter()
    for _ in range(10):
        z = nop(z)
    jax.block_until_ready(z)
    lat = (time.perf_counter() - t0) / 10 * 1e3
    print(f"sync-mode nop dispatch latency: {lat:.2f} ms")

    t0 = time.perf_counter()
    for v in views[6 : 6 + n_frames]:
        out, state = frame(assets, scene, v, env, state)
    jax.block_until_ready(out["color"])
    t_sync = (time.perf_counter() - t0) * 1e3 / n_frames
    print(f"sync-mode chained: {t_sync:.2f} ms/frame (bench.py's number)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
