"""Truthful device timing on the axon-tunneled TPU.

Quirks of this environment (discovered empirically, see MEMORY):
  * block_until_ready does NOT block while the client is in async mode —
    wall-clock timings of jitted calls measure enqueue cost only (fiction)
  * the first device->host readback permanently switches the client to
    SYNCHRONOUS dispatch: every call then blocks until completion and
    costs ~14 ms of tunnel round-trip latency on top of true device time

So: force sync mode once, measure the tunnel latency with a no-op, then
time ops synchronously and subtract. Device-side truth can be
cross-checked with the xprof op profile (rawTime is accurate).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


_LATENCY = None


def force_sync_mode():
    """Trigger the readback that switches the client to sync dispatch."""
    global _LATENCY
    x = jnp.zeros((1,))
    np.asarray(x)  # D2H: flips the tunnel into synchronous mode
    # measure dispatch round-trip with a trivial op
    f = jax.jit(lambda v: v + 1.0)
    f(x)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    _LATENCY = (time.perf_counter() - t0) / n
    return _LATENCY


def devtime(fn, *args, n=5, name=None):
    """True device ms of one jitted call (sync mode must be active)."""
    assert _LATENCY is not None, "call force_sync_mode() first"
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n - _LATENCY
    if name:
        print(f"{name:<44} {dt*1e3:9.3f} ms")
    return dt * 1e3
