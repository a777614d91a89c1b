"""Microbench: HBM random-gather ns/row vs TABLE SIZE (round 5).

The round-4 profile showed 2M-row [*, 4]-f32 gathers costing 9.1 ms from
64 MB tables but 3.8 ms from a 0.5 MB table — table size matters. This
measures the cliff to drive the texture/VSM table designs (half-res
moments, quad-packed trilinear tables).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def time_fn(f, *args, iters=12):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N = 2_073_600  # 1080p pixels
    key = jax.random.PRNGKey(0)

    # sync-mode latency (tunnel quirk): measure and subtract
    import numpy as np

    _ = np.asarray(jnp.zeros(()) + 1)
    nop = jax.jit(lambda x: x + 1.0)
    z = nop(jnp.zeros((1,)))
    t0 = time.perf_counter()
    for _ in range(20):
        z = nop(z)
    jax.block_until_ready(z)
    lat = (time.perf_counter() - t0) / 20 * 1e3
    print(f"dispatch latency: {lat:.3f} ms")

    g = jax.jit(lambda t, i: t[i])
    for rows in (
        8192, 32768, 131072, 262144, 524288, 1048576, 2097152, 4194304,
    ):
        tbl = jnp.arange(rows * 4, dtype=jnp.float32).reshape(rows, 4)
        idx = jax.random.randint(key, (N,), 0, rows, jnp.int32)
        ms = time_fn(g, tbl, idx) - lat
        mb = rows * 16 / 1e6
        print(
            f"table {mb:8.1f} MB ({rows:8d} rows): {ms:8.3f} ms "
            f"{ms*1e6/N:6.2f} ns/row"
        )


if __name__ == "__main__":
    main()
