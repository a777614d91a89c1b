"""HDR-weighted anti-aliasing resolve (reference: passes/hdr_resolve.rs +
shaders/hdr_resolve.frag:31-86).

MSAA hardware does not exist on TPU; anti-aliasing is supersampling (the
pipeline rasters at k*k subpixel resolution — every subsample is a true
shading sample, which is BETTER than MSAA's shared-shading samples). The
resolve reproduces the reference's custom MSAA resolve: samples are
averaged with inverse-tonemap weights (w = 1/(1+luma)) so single bright
subpixels don't dominate edges.
"""

from __future__ import annotations

import jax.numpy as jnp

from orbit_tpu.math.color import luminance


def resolve_supersampled(hdr, factor: int):
    """hdr: [H*f, W*f, 3] -> [H, W, 3], tonemap-weighted box resolve."""
    if factor == 1:
        return hdr
    hs, ws, _ = hdr.shape
    h, w = hs // factor, ws // factor
    s = hdr.reshape(h, factor, w, factor, 3)
    wgt = 1.0 / (1.0 + luminance(s))  # [h,f,w,f]
    acc = (s * wgt[..., None]).sum(axis=(1, 3))
    return acc / wgt.sum(axis=(1, 3))[..., None]
