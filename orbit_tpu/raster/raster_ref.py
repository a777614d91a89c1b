"""Scalar numpy reference rasterizer — independent implementation for
differential testing of the vectorized paths (the CPU-twin pattern the
reference uses for its cull math, math.rs:170 vs entity_cull.comp:83)."""

from __future__ import annotations

import numpy as np

from orbit_tpu.raster.kernel_common import VIS_TRI_BITS


def rasterize_ref(setup, tri_valid, height, width):
    """setup: [I, 12, 64] coefficient-major np array; tri_valid: [I, 64]
    bool.

    Loops triangles; per-pixel edge eval over each triangle's bbox.
    Returns (depth [H,W] f32, vis [H,W] i32).
    """
    depth = np.zeros((height, width), np.float32)
    vis = np.zeros((height, width), np.int32)
    I, _, T = setup.shape
    for i in range(I):
        for t in range(T):
            if not tri_valid[i, t]:
                continue
            co = setup[i, :, t]
            # conservative bbox: evaluate over the full screen (slow but sure)
            ys = np.arange(height) + 0.5
            xs = np.arange(width) + 0.5
            X, Y = np.meshgrid(xs, ys)
            e0 = co[0] * X + co[1] * Y + co[2]
            e1 = co[3] * X + co[4] * Y + co[5]
            e2 = co[6] * X + co[7] * Y + co[8]
            z = co[9] * X + co[10] * Y + co[11]
            inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (z <= 1.0)
            win = inside & (z > depth)
            depth[win] = z[win]
            vis[win] = (i << VIS_TRI_BITS) + t + 1
    return depth, vis
