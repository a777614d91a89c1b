"""HiZ depth pyramid: min-reduction mip chain in a flat gatherable atlas.

Reference: DepthPyramid (draw_gen.rs:451-567) + depth_reduce.comp — a
chain of 2x2 min reductions over reverse-Z depth (min = farthest = the
conservative occluder depth), sampled by the cull shaders through a
min-reduction sampler at a computed LOD. Here each level is a 2x2
`reduce_window` min and all levels live in one flat array so per-sphere
LOD selection is a plain gather.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _level_sizes(h: int, w: int):
    sizes = []
    while True:
        h = max(1, (h + 1) // 2)
        w = max(1, (w + 1) // 2)
        sizes.append((h, w))
        if h == 1 and w == 1:
            break
    return sizes


@jax.tree_util.register_dataclass
@dataclass
class DepthPyramid:
    data: jax.Array  # [T] f32 flat atlas (level 0 first)
    sizes: Tuple[Tuple[int, int], ...] = field(metadata=dict(static=True), default=())
    offsets: Tuple[int, ...] = field(metadata=dict(static=True), default=())


def build_depth_pyramid(depth) -> DepthPyramid:
    """depth: [H,W] reverse-Z. Level k has size ceil(H/2^(k+1)) etc.

    Out-of-bounds window texels pad with 0 (= far), which keeps the
    occlusion test conservative at the borders.
    """
    H, W = depth.shape
    sizes = _level_sizes(H, W)
    offsets = []
    acc = 0
    for (h, w) in sizes:
        offsets.append(acc)
        acc += h * w

    chunks = []
    cur = depth
    for (h, w) in sizes:
        ph = h * 2 - cur.shape[0]
        pw = w * 2 - cur.shape[1]
        padded = jnp.pad(cur, ((0, ph), (0, pw)), constant_values=0.0)
        cur = jax.lax.reduce_window(
            padded, jnp.inf, jax.lax.min, (2, 2), (2, 2), "VALID"
        )
        # padding contributed +inf -> replace pure-padding results; the
        # pad above used 0.0 so edge windows already include a 0 (far)
        chunks.append(cur.reshape(-1))
    data = jnp.concatenate(chunks)
    return DepthPyramid(data=data, sizes=tuple(sizes), offsets=tuple(offsets))


def sample_pyramid_min(pyr: DepthPyramid, uv, level):
    """2x2 min tap at integer `level` around uv (in [0,1]^2).

    uv: [...,2]; level: [...] i32. Equivalent of the REDUCE_MIN sampler
    lookup in entity_cull.comp:184-188.
    """
    hs = jnp.asarray(np.array([s[0] for s in pyr.sizes], np.int32))
    ws = jnp.asarray(np.array([s[1] for s in pyr.sizes], np.int32))
    offs = jnp.asarray(np.array(pyr.offsets, np.int32))
    n = len(pyr.sizes)
    from orbit_tpu.utils import gather1

    level = jnp.clip(level, 0, n - 1)
    h = gather1(hs, level)
    w = gather1(ws, level)
    off = gather1(offs, level)

    x = uv[..., 0] * w.astype(jnp.float32) - 0.5
    y = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    def at(xx, yy):
        from orbit_tpu.utils import gather1 as _g1

        return _g1(pyr.data, off + yy * w + xx)

    return jnp.minimum(
        jnp.minimum(at(x0, y0), at(x1, y0)),
        jnp.minimum(at(x0, y1), at(x1, y1)),
    )


def occlusion_level(pyr: DepthPyramid, aabb_uv):
    """LOD pick: log2 of the AABB footprint in level-0 texels
    (entity_cull.comp:180-188)."""
    h0, w0 = pyr.sizes[0]
    wpx = (aabb_uv[..., 2] - aabb_uv[..., 0]) * w0
    hpx = (aabb_uv[..., 3] - aabb_uv[..., 1]) * h0
    m = jnp.maximum(jnp.maximum(wpx, hpx), 1e-6)
    return jnp.ceil(jnp.log2(m)).astype(jnp.int32)
