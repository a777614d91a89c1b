"""Two-level GPU-driven culling, TPU-native.

Replaces entity_cull.comp / meshlet_cull.comp / depth_reduce.comp with
vectorized stream-compaction kernels:
  * entity cull: frustum + two-pass HiZ occlusion + distance LOD pick,
    then exact searchsorted-expansion into a compacted meshlet-instance
    list (the MeshletDispatchBuffer equivalent, without atomics)
  * meshlet cull: frustum + normal-cone backface + HiZ occlusion as a
    mask over the instance list
  * HiZ: min-reduction mip pyramid stored as one flat gatherable atlas
  * visibility bitsets: persistent bool arrays carried across frames in
    the jitted step (the two-pass occlusion protocol of forward.rs:213-430)
"""

from orbit_tpu.cull.hiz import DepthPyramid, build_depth_pyramid, sample_pyramid_min  # noqa: F401
from orbit_tpu.cull.entity_cull import cull_entities, expand_instances  # noqa: F401
from orbit_tpu.cull.meshlet_cull import cull_meshlet_instances  # noqa: F401
