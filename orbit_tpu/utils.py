"""Small shared utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather1(table, i):
    """table[i] forced to compile as a standalone gather kernel.

    XLA TPU executes gathers at full speed only when they are their own
    kernel; when a gather is fused with its index-computation producers or
    elementwise consumers ("custom fusion"), it lowers to a serialized
    per-element loop that is orders of magnitude slower. The optimization
    barriers on the index and the result pin the fusion boundary.
    """
    i = jax.lax.optimization_barrier(i)
    return jax.lax.optimization_barrier(table[i])


def gather2(table, i, j):
    """table[i, j] via a flat single-axis gather (see gather1 for why).

    Multi-index advanced indexing (table[i, j]) additionally lowers to a
    general multi-dim gather that is ~500x slower than a flat row gather.
    """
    a, b = table.shape[0], table.shape[1]
    flat = table.reshape((a * b,) + table.shape[2:])
    return gather1(flat, i * b + j)


def gather3(table, i, j, k):
    """table[i, j, k] via a flat single-axis gather."""
    a, b, c = table.shape[0], table.shape[1], table.shape[2]
    flat = table.reshape((a * b * c,) + table.shape[3:])
    return gather1(flat, (i * b + j) * c + k)
