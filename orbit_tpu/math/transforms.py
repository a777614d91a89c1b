"""Matrix / quaternion transforms.

Conventions (chosen to match the reference renderer's glam usage,
src/camera.rs:87-97 and src/scene.rs:20-57):
  * column-vector convention: p' = M @ p, matrices are [4,4] float32
  * right-handed world, camera looks down -Z, +Y up
  * reverse-Z depth: near plane maps to depth 1, infinity to 0
  * NDC: x,y in [-1,1] with +y = up on screen, z in [0,1]
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize(v, axis=-1, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=True), eps))


def look_at(eye, center, up):
    """Right-handed view matrix; camera forward is -Z in view space."""
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = normalize(center - eye)          # forward
    s = normalize(jnp.cross(f, up))      # right
    u = jnp.cross(s, f)                  # true up
    m = jnp.stack(
        [
            jnp.concatenate([s, jnp.array([-jnp.dot(s, eye)])]),
            jnp.concatenate([u, jnp.array([-jnp.dot(u, eye)])]),
            jnp.concatenate([-f, jnp.array([jnp.dot(f, eye)])]),
            jnp.array([0.0, 0.0, 0.0, 1.0]),
        ]
    )
    return m.astype(jnp.float32)


def perspective_infinite_reverse(fovy: float, aspect, znear):
    """Infinite-far reverse-Z perspective (reference: camera.rs:87).

    depth = znear / -z_view; z_view = -znear -> 1.0, z -> -inf -> 0.0.
    """
    f = 1.0 / jnp.tan(jnp.asarray(fovy, jnp.float32) * 0.5)
    z = jnp.zeros((), jnp.float32)
    o = jnp.ones((), jnp.float32)
    return jnp.stack(
        [
            jnp.stack([f / aspect, z, z, z]),
            jnp.stack([z, f, z, z]),
            jnp.stack([z, z, z, jnp.asarray(znear, jnp.float32)]),
            jnp.stack([z, z, -o, z]),
        ]
    ).astype(jnp.float32)


def orthographic_reverse_z(left, right, bottom, top, near, far):
    """Reverse-Z orthographic: z_view=-near -> depth 1, z_view=-far -> 0.

    (reference: camera.rs:88-97 builds ortho with swapped near/far.)
    """
    left, right, bottom, top, near, far = (
        jnp.asarray(v, jnp.float32) for v in (left, right, bottom, top, near, far)
    )
    rml = right - left
    tmb = top - bottom
    # depth(z_view) = (z_view + far) / (far - near); at z=-near -> 1, z=-far -> 0
    fmn = far - near
    z = jnp.zeros(())
    return jnp.stack(
        [
            jnp.stack([2.0 / rml, z, z, -(right + left) / rml]),
            jnp.stack([z, 2.0 / tmb, z, -(top + bottom) / tmb]),
            jnp.stack([z, z, 1.0 / fmn, far / fmn]),
            jnp.stack([z, z, z, jnp.ones(())]),
        ]
    ).astype(jnp.float32)


def quat_from_axis_angle(axis, angle):
    axis = normalize(jnp.asarray(axis, jnp.float32))
    half = jnp.asarray(angle, jnp.float32) * 0.5
    s = jnp.sin(half)
    return jnp.concatenate([axis * s, jnp.cos(half)[None]])  # (x, y, z, w)


def quat_mul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_to_mat3(q):
    """Quaternion (x,y,z,w) -> 3x3 rotation. Batched over leading dims."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    xy, xz, yz = x * y2, x * z2, y * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    m = jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return m


def compose_trs(translation, rotation_quat, scale):
    """TRS -> 4x4 model matrix. Batched over leading dims.

    (reference: scene.rs Transform::compute_matrix semantics.)
    """
    t = jnp.asarray(translation, jnp.float32)
    s = jnp.asarray(scale, jnp.float32)
    r = quat_to_mat3(jnp.asarray(rotation_quat, jnp.float32))
    rs = r * s[..., None, :]
    top = jnp.concatenate([rs, t[..., :, None]], axis=-1)  # [...,3,4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(m, pts):
    """Apply 4x4 to [..., 3] points (divides by w)."""
    p = pts @ m[:3, :3].T + m[:3, 3]
    w = pts @ m[3, :3].T + m[3, 3]
    return p / w[..., None]


def transform_directions(m, dirs):
    return dirs @ m[:3, :3].T


def mip_levels_from_size(max_size: int) -> int:
    """reference: math.rs:18-20."""
    return max(1, int(np.floor(np.log2(max(1, max_size)))) + 1)


def next_pow2(x: int) -> int:
    return 1 if x <= 1 else 2 ** int(np.ceil(np.log2(x)))
