"""Small shared utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather1(table, i):
    """table[i]. Single-axis gathers are the only fast-ish path on TPU
    (~5ns/row floor regardless of pattern — see MEMORY axon-tpu-quirks);
    use gather2/3 to flatten multi-axis indexing onto it."""
    return table[i]


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
