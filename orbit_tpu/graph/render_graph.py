"""Render-graph layer: named passes, per-pass timing, graph dump.

In the reference, the render graph (graphics/graph.rs) exists to compute
barriers and schedule batches; under XLA the traced jaxpr *is* the graph
and barriers are data dependencies. What remains useful — and what this
module provides — is the *observability* half (the F2 graph debugger,
context.rs:1548-1641): naming passes so they show up in xprof traces, and
a profiler that times each pass on device for the per-batch-ms table.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax


@contextlib.contextmanager
def pass_scope(name: str):
    """Tag a pass: shows as a named scope in jaxprs/HLO and as a trace
    annotation in the JAX profiler (xprof)."""
    with jax.named_scope(name):
        with jax.profiler.TraceAnnotation(name):
            yield


@dataclass
class PassRecord:
    name: str
    ms: float = 0.0
    runs: int = 0


class GraphProfiler:
    """Times named sub-computations on device (per-pass ms table — the
    equivalent of the reference's per-batch GPU timestamps).

    Usage:
        prof = GraphProfiler()
        depth = prof.run("depth_prepass", fn, *args)   # jits + times fn
        print(prof.table())
    Each distinct name gets its own jitted callable (cached).
    """

    def __init__(self):
        self.records: Dict[str, PassRecord] = {}
        self._jitted: Dict[str, Callable] = {}

    def run(self, name: str, fn: Callable, *args, **kwargs):
        if name not in self._jitted:
            self._jitted[name] = jax.jit(fn)
        f = self._jitted[name]
        # warm-up compile outside the timed region
        out = f(*args, **kwargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*args, **kwargs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) * 1e3
        rec = self.records.setdefault(name, PassRecord(name))
        rec.ms += dt
        rec.runs += 1
        return out

    def table(self) -> str:
        lines = [f"{'pass':<32} {'ms (avg)':>10} {'runs':>5}"]
        total = 0.0
        for rec in self.records.values():
            avg = rec.ms / max(rec.runs, 1)
            total += avg
            lines.append(f"{rec.name:<32} {avg:>10.3f} {rec.runs:>5}")
        lines.append(f"{'TOTAL':<32} {total:>10.3f}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return {
            r.name: r.ms / max(r.runs, 1) for r in self.records.values()
        }


def dump_jaxpr_summary(fn, *args) -> str:
    """Graph dump: pass-level view of the traced frame (the textual
    equivalent of the reference's graph inspector)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    eqns = jaxpr.jaxpr.eqns
    counts: Dict[str, int] = {}
    for e in eqns:
        counts[e.primitive.name] = counts.get(e.primitive.name, 0) + 1
    lines = [f"traced equations: {len(eqns)}"]
    for k in sorted(counts, key=counts.get, reverse=True)[:20]:
        lines.append(f"  {k:<24} x{counts[k]}")
    return "\n".join(lines)
