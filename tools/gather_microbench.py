"""Microbench: HBM random-gather cost vs row width and table layout.

Drives the VSM-moment / ctex sampling design: XLA lowers an [N, k] row
gather either as k independent scalar gathers (column-major operand) or
as row DMAs (row-major). Measures ns/row for k in {1,2,4,8,16} and both
layouts, on the real TPU.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N = 2_073_600  # 1080p pixels
    T = 4_194_304  # 4 x 1024^2 shadow texels
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)

    # sync-mode latency (tunnel quirk): measure and subtract
    _ = np.asarray(jnp.zeros(()) + 1)
    nop = jax.jit(lambda x: x + 1.0)
    z = nop(jnp.zeros((1,)))
    t0 = time.perf_counter()
    for _ in range(20):
        z = nop(z)
    jax.block_until_ready(z)
    lat = (time.perf_counter() - t0) / 20 * 1e3
    print(f"dispatch latency: {lat:.3f} ms")

    for k in (1, 2, 4, 8, 16, 32, 128):
        tbl = jnp.arange(T * k, dtype=jnp.float32).reshape(T, k)

        g_row = jax.jit(lambda t, i: t[i])
        ms = time_fn(g_row, tbl, idx) - lat
        print(f"k={k:<4d} row-major param   {ms:8.3f} ms  {ms*1e6/N:6.2f} ns/row")

        if k <= 16:
            # column-major operand: transpose inside jit so XLA sees the
            # transposed producer (mimics the in-frame moment table)
            tblT = jnp.asarray(np.asarray(tbl).T.copy())  # [k, T]

            @jax.jit
            def g_col(tT, i):
                return tT.T[i]

            ms = time_fn(g_col, tblT, idx) - lat
            print(f"k={k:<4d} col-major operand {ms:8.3f} ms  {ms*1e6/N:6.2f} ns/row")

    # small table (VMEM-cacheable): spec-style
    for Ts, k in ((32_640, 4), (524_288, 4)):
        tbl = jnp.arange(Ts * k, dtype=jnp.float32).reshape(Ts, k)
        idx_s = jax.random.randint(key, (N,), 0, Ts, jnp.int32)
        g = jax.jit(lambda t, i: t[i])
        ms = time_fn(g, tbl, idx_s) - lat
        print(f"small T={Ts} k={k}: {ms:8.3f} ms  {ms*1e6/N:6.2f} ns/row")


if __name__ == "__main__":
    main()
