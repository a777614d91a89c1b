"""Tiled software rasterizer producing a visibility buffer.

TPU-first replacement for the reference's hardware raster path
(forward.vert/forward.mesh -> forward.frag): geometry is processed per
visible meshlet instance (64 verts / 64 tris), triangles are bound to
screen tiles by an exact sort-based binner, and a Pallas kernel performs
edge-function rasterization with reverse-Z depth max into a per-pixel
(depth, packed triangle id) visibility buffer. Shading happens afterwards
as one deferred vectorized pass (orbit_tpu/shade/) — the TPU-idiomatic
split: divergence-free raster, gather-heavy shade.
"""

from orbit_tpu.raster.geometry import GeometryBuffers, process_geometry  # noqa: F401
from orbit_tpu.raster.binning import BinLists, bin_meshlets  # noqa: F401
from orbit_tpu.raster.api import (  # noqa: F401
    RasterConfig,
    rasterize,
    rasterize_depth_alpha,
    rasterize_gbuffer,
)
