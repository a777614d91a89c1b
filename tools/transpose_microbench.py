"""Measure in-kernel [12,64] -> [64,12] transpose strategies (round 5).

The coefficient-major setup layout needs a per-pair transpose back to
triangles-on-sublanes. Candidates:
  dot6   - identity dot_general at HIGHEST (6-pass MXU)  [exact]
  dot1   - identity dot_general at DEFAULT (1-pass bf16) [NOT exact]
  jnpT   - jnp.transpose (Mosaic native lowering, if any) [exact]
  batch  - concat 8 pair blocks -> ONE [96,64] identity dot [exact]
  none   - no transpose (baseline step cost)
Runs a grid of 16384 steps, 8 block reads per step, minimal other work.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 16384
PACK = 8


def make_kernel(mode):
    def kernel(ps_ref, *refs):
        setup_refs = refs[:PACK]
        out_ref = refs[PACK]
        acc = jnp.zeros((1, 128), jnp.float32)
        if mode == "batch":
            sts = jnp.concatenate(
                [setup_refs[j][0] for j in range(PACK)], axis=0
            )  # [96, 64]
            eye = (
                jax.lax.broadcasted_iota(jnp.int32, (96, 96), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (96, 96), 1)
            ).astype(jnp.float32)
            ts = jax.lax.dot_general(
                sts, eye, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )  # [64, 96]
            acc = acc + jnp.sum(ts).reshape(1, 1)
        else:
            for j in range(PACK):
                st = setup_refs[j][0]  # [12, 64]
                if mode == "none":
                    s = st
                elif mode == "jnpT":
                    s = jnp.transpose(st)
                else:
                    eye = (
                        jax.lax.broadcasted_iota(jnp.int32, (12, 12), 0)
                        == jax.lax.broadcasted_iota(jnp.int32, (12, 12), 1)
                    ).astype(jnp.float32)
                    prec = (
                        jax.lax.Precision.HIGHEST
                        if mode == "dot6"
                        else jax.lax.Precision.DEFAULT
                    )
                    s = jax.lax.dot_general(
                        st, eye, (((0,), (0,)), ((), ())), precision=prec
                    )
                acc = acc + jnp.sum(s).reshape(1, 1)
        out_ref[...] = acc

    return kernel


def run(mode):
    setup = jnp.asarray(
        np.random.default_rng(0).normal(size=(32768, 12, 64)), jnp.float32
    )
    ps = jnp.asarray(
        np.random.default_rng(1).integers(0, 32768, size=(STEPS * PACK,)),
        jnp.int32,
    )

    def spec(j):
        return pl.BlockSpec(
            (1, 12, 64),
            functools.partial(
                lambda p, ps, j: (ps[p * PACK + j], 0, 0), j=j
            ),
        )

    f = pl.pallas_call(
        make_kernel(mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(STEPS,),
            in_specs=[spec(j) for j in range(PACK)],
            out_specs=pl.BlockSpec((1, 128), lambda p, ps: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        name=f"tbench_{mode}",
    )
    g = jax.jit(lambda ps, s: f(ps, *([s] * PACK)))
    try:
        r = g(ps, setup)
        jax.block_until_ready(r)
    except Exception as e:  # noqa: BLE001
        print(f"{mode:6s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return
    t0 = time.perf_counter()
    for _ in range(8):
        r = g(ps, setup)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 8
    print(
        f"{mode:6s} {dt*1e3:8.2f} ms  "
        f"({dt/ (STEPS*PACK) * 1e9:6.1f} ns/pair)"
    )


if __name__ == "__main__":
    for m in (sys.argv[1:] or ["none", "dot6", "dot1", "jnpT", "batch"]):
        run(m)
