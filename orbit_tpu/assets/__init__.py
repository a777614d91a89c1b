"""Asset system: glTF import, mesh processing, meshlets, LODs, textures.

TPU-first redesign of the reference's asset layer (src/assets/, src/gltf_loader.rs):
all "GPU buffers" become fixed-capacity SoA device arrays (AssetArrays pytree);
bindless descriptor indices collapse to plain indices into stacked texture
mip arrays. The build pipeline runs host-side in numpy (and optionally the
C++ `meshproc` native module) at load time; steady-state rendering never
touches the host.
"""

from orbit_tpu.assets.types import (  # noqa: F401
    AssetCaps,
    AssetArrays,
    AssetMeta,
    MAX_MESHLET_VERTICES,
    MAX_MESHLET_TRIANGLES,
    ALPHA_MODE_OPAQUE,
    ALPHA_MODE_MASKED,
    ALPHA_MODE_TRANSPARENT,
)
from orbit_tpu.assets.store import AssetStore  # noqa: F401
from orbit_tpu.assets.mesh import MeshData  # noqa: F401
