"""Vertex attribute packing: snorm8, octahedral normals, rotational tangents.

Behavioral parity with math.rs:201-273 and shaders/include/functions.glsl:
  octahedron encode/decode      math.rs:209-225 / functions.glsl:122-127
  reference orthonormal vector  functions.glsl:115-120 (Pixar ONB paper)
  rotational tangent            math.rs:237-258 (Doom Eternal packing)
All vectorized over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from orbit_tpu.math.transforms import normalize


def pack_snorm8(f):
    """float [-1,1] -> int8 (math.rs:201-203)."""
    return jnp.round(jnp.clip(f, -1.0, 1.0) * 127.0).astype(jnp.int8)


def unpack_snorm8(i):
    return jnp.maximum(i.astype(jnp.float32) / 127.0, -1.0)


def _octahedron_wrap(v):
    yx = jnp.stack([v[..., 1], v[..., 0]], axis=-1)
    return (1.0 - jnp.abs(yx)) * jnp.where(v >= 0.0, 1.0, -1.0)


def octahedron_encode(n):
    """[...,3] unit normal -> [...,2] octahedral coords in [-1,1]."""
    n = n / jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    xy = n[..., :2]
    return jnp.where(n[..., 2:3] >= 0.0, xy, _octahedron_wrap(xy))


def octahedron_decode(f):
    """[...,2] -> [...,3] unit normal."""
    z = 1.0 - jnp.abs(f[..., 0]) - jnp.abs(f[..., 1])
    t = jnp.maximum(-z, 0.0)[..., None]
    xy = f + jnp.where(f >= 0.0, -t, t)
    return normalize(jnp.concatenate([xy, z[..., None]], axis=-1))


def reference_orthonormal_vector(v):
    """Deterministic tangent-frame reference vector (Pixar ONB).

    Matches functions.glsl:115-120 (and glam's any_orthonormal_vector used
    by math.rs:227-234), so CPU-packed tangents decode identically on device.
    """
    sign = jnp.where(v[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + v[..., 2])
    b = v[..., 0] * v[..., 1] * a
    return jnp.stack(
        [b, sign + v[..., 1] * v[..., 1] * a, -v[..., 1]], axis=-1
    )


def rotational_tangent_encode(n, t):
    """Angle of tangent about normal relative to the reference vector.

    math.rs:237-251: alpha = atan2(dot(cross(t, ref), n), dot(t, ref)).
    """
    n = normalize(n)
    t = normalize(t)
    ref = normalize(reference_orthonormal_vector(n))
    return jnp.arctan2(
        jnp.sum(jnp.cross(t, ref) * n, axis=-1), jnp.sum(t * ref, axis=-1)
    )


def rotational_tangent_decode(n, alpha):
    """math.rs:253-258: t = ref*cos(a) + cross(ref, n)*sin(a)."""
    ref = reference_orthonormal_vector(n)
    return ref * jnp.cos(alpha)[..., None] + jnp.cross(ref, n) * jnp.sin(alpha)[
        ..., None
    ]


def pack_normal_tangent(normal, tangent4):
    """[...,3] normal + [...,4] tangent(xyz)+bitangent-sign(w) -> int8 [...,4].

    Layout (math.rs:260-265): (oct_x, oct_y, tangent_alpha/pi, bitangent_sign).
    """
    import numpy as np

    oct = octahedron_encode(normal)
    alpha = rotational_tangent_encode(normal, tangent4[..., :3]) / np.pi
    packed = jnp.concatenate(
        [oct, alpha[..., None], tangent4[..., 3:4]], axis=-1
    )
    return pack_snorm8(packed)


def unpack_normal_tangent(packed):
    """int8 [...,4] -> (normal [...,3], tangent [...,4])  (functions.glsl:129-139)."""
    import numpy as np

    f = unpack_snorm8(packed)
    n = octahedron_decode(f[..., :2])
    t = rotational_tangent_decode(n, f[..., 2] * np.pi)
    return n, jnp.concatenate([normalize(t), f[..., 3:4]], axis=-1)
