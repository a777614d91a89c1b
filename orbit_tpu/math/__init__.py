"""Pure math layer (reference: src/math.rs, src/camera.rs).

All functions are jnp-vectorized and jit-safe: they take/return arrays and
never branch on traced values with Python control flow.
"""

from orbit_tpu.math.transforms import (  # noqa: F401
    look_at,
    perspective_infinite_reverse,
    orthographic_reverse_z,
    compose_trs,
    quat_to_mat3,
    quat_mul,
    quat_from_axis_angle,
    transform_points,
    transform_directions,
    mip_levels_from_size,
    next_pow2,
)
from orbit_tpu.math.frustum import (  # noqa: F401
    NDC_BOUNDS,
    frustum_planes_from_matrix,
    normalize_plane,
    frustum_split,
    frustum_corners_from_matrix,
    perspective_corners,
    transform_plane,
    transform_sphere,
    largest_scale_from_matrix,
    project_sphere_clip_space,
    sphere_inside_planes,
)
from orbit_tpu.math.packing import (  # noqa: F401
    pack_snorm8,
    unpack_snorm8,
    octahedron_encode,
    octahedron_decode,
    reference_orthonormal_vector,
    rotational_tangent_encode,
    rotational_tangent_decode,
    pack_normal_tangent,
    unpack_normal_tangent,
)
from orbit_tpu.math.color import (  # noqa: F401
    srgb_to_linear,
    linear_to_srgb,
    luminance,
    aces_hill_tonemap,
    heat_colormap,
    interleaved_gradient_noise,
    hammersley_2d,
    uint_hash,
)
