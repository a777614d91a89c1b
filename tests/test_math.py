"""Math-layer unit tests mirroring the reference's test strategy
(src/math.rs:275-365: octahedral + rotational-tangent round-trips)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbit_tpu import math as om


def _normed(rows):
    a = np.array(rows, np.float32)
    return a / np.linalg.norm(a, axis=-1, keepdims=True)


TEST_NORMALS = _normed(
    [
        [1, 0, 0], [0, 1, 0], [0, 0, 1],
        [-1, 0, 0], [0, -1, 0], [0, 0, -1],
        [1, 1, 0], [0, 1, 1], [1, 0, 1],
        [-1, 1, 0], [0, -1, 1], [1, 0, -1],
        [321, 12, 543], [432, 23, 43], [-431, -20, 21],
        [-1, 21, -30], [-30, -1, 1], [1, 10, -1],
    ]
)


def test_octahedron_roundtrip():
    n = jnp.asarray(TEST_NORMALS)
    dec = om.octahedron_decode(om.octahedron_encode(n))
    np.testing.assert_allclose(np.asarray(dec), TEST_NORMALS, atol=1e-6)


def test_rotational_tangent_roundtrip():
    n = TEST_NORMALS
    ref = np.asarray(om.reference_orthonormal_vector(jnp.asarray(n)))
    t0 = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    t1 = np.cross(n, t0)
    for t in (t0, t1):
        alpha = om.rotational_tangent_encode(jnp.asarray(n), jnp.asarray(t))
        dec = om.rotational_tangent_decode(jnp.asarray(n), alpha)
        np.testing.assert_allclose(np.asarray(dec), t, atol=1e-5)


def test_pack_normal_tangent_roundtrip():
    # avoid |n_z| ~ 0: the reference-orthonormal-vector sign flips at
    # n_z == 0 (Pixar ONB), so int8 quantization across that boundary
    # legitimately rotates the decoded tangent (same artifact exists in
    # the reference's encoding, math.rs:227-258)
    sel = np.abs(TEST_NORMALS[:, 2]) > 0.01
    normals = TEST_NORMALS[sel]
    n = jnp.asarray(normals)
    ref = om.reference_orthonormal_vector(n)
    t4 = jnp.concatenate([ref, jnp.ones((len(normals), 1))], axis=-1)
    packed = om.pack_normal_tangent(n, t4)
    assert packed.dtype == jnp.int8
    n2, t2 = om.unpack_normal_tangent(packed)
    # int8 quantization: tolerances are coarse
    np.testing.assert_allclose(np.asarray(n2), normals, atol=2e-2)
    np.testing.assert_allclose(np.asarray(t2[:, :3]), np.asarray(ref), atol=5e-2)


def test_snorm8_roundtrip():
    f = jnp.linspace(-1.0, 1.0, 255)
    packed = om.pack_snorm8(f)
    np.testing.assert_allclose(
        np.asarray(om.unpack_snorm8(packed)), np.asarray(f), atol=1 / 127 + 1e-6
    )


def test_perspective_infinite_reverse_depths():
    m = om.perspective_infinite_reverse(np.radians(60.0), 16 / 9, 0.1)
    # view-space point at z=-znear -> depth 1
    p = np.array([0, 0, -0.1, 1], np.float32)
    clip = np.asarray(m) @ p
    assert abs(clip[2] / clip[3] - 1.0) < 1e-6
    # far away -> depth ~ 0
    p = np.array([0, 0, -1e6, 1], np.float32)
    clip = np.asarray(m) @ p
    assert clip[2] / clip[3] < 1e-4


def test_orthographic_reverse_z_depths():
    m = om.orthographic_reverse_z(-1, 1, -1, 1, 0.0, 10.0)
    m = np.asarray(m)
    near = m @ np.array([0, 0, 0.0, 1], np.float32)
    far = m @ np.array([0, 0, -10.0, 1], np.float32)
    assert abs(near[2] / near[3] - 1.0) < 1e-6
    assert abs(far[2] / far[3]) < 1e-6


def test_look_at_forward_is_negative_z():
    eye = np.array([1.0, 2.0, 3.0])
    center = np.array([1.0, 2.0, 0.0])
    m = np.asarray(om.look_at(eye, center, np.array([0.0, 1.0, 0.0])))
    # center is straight ahead: view space (0, 0, -3)
    p = m @ np.array([1.0, 2.0, 0.0, 1.0], np.float32)
    np.testing.assert_allclose(p[:3], [0, 0, -3], atol=1e-6)


def test_frustum_planes_contain_points():
    view = om.look_at(
        np.array([0.0, 0.0, 5.0]), np.zeros(3), np.array([0.0, 1.0, 0.0])
    )
    proj = om.perspective_infinite_reverse(np.radians(60.0), 1.0, 0.1)
    vp = jnp.asarray(proj) @ jnp.asarray(view)
    planes = om.normalize_plane(om.frustum_planes_from_matrix(vp))
    # origin is in front of the camera, inside the frustum
    inside = om.sphere_inside_planes(
        jnp.array([0.0, 0.0, 0.0, 0.1]), planes[:5]
    )
    assert bool(inside)
    # point far behind the camera is outside
    outside = om.sphere_inside_planes(
        jnp.array([0.0, 0.0, 100.0, 0.1]), planes[:5]
    )
    assert not bool(outside)
    # point far off to the right is outside
    outside = om.sphere_inside_planes(
        jnp.array([100.0, 0.0, 0.0, 0.1]), planes[:5]
    )
    assert not bool(outside)


def test_project_sphere_clip_space():
    # camera at origin looking down -Z; view-space sphere at z=-10 (flipped
    # to +10 as the cull shader does), radius 1.
    znear = 0.1
    fovy = np.radians(90.0)
    f = 1.0 / np.tan(fovy / 2)
    p00, p11 = f, f
    valid, aabb = om.project_sphere_clip_space(
        jnp.array([0.0, 0.0, 10.0, 1.0]), znear, p00, p11
    )
    assert bool(valid)
    aabb = np.asarray(aabb)
    # centered sphere: symmetric box around uv (0.5, 0.5)
    np.testing.assert_allclose(aabb[0] + aabb[2], 1.0, atol=1e-5)
    np.testing.assert_allclose(aabb[1] + aabb[3], 1.0, atol=1e-5)
    assert aabb[2] - aabb[0] == pytest.approx(2 * (1 / 10) * f * 0.5, rel=0.05)
    # sphere crossing the near plane is not projectable
    valid, _ = om.project_sphere_clip_space(
        jnp.array([0.0, 0.0, 0.5, 1.0]), znear, p00, p11
    )
    assert not bool(valid)


def test_frustum_split_blend():
    assert om.frustum_split(1.0, 100.0, 0.0, 0.5) == pytest.approx(50.5)
    assert om.frustum_split(1.0, 100.0, 1.0, 0.5) == pytest.approx(10.0)


def test_transform_sphere_scale():
    m = np.diag([2.0, 3.0, 1.0, 1.0]).astype(np.float32)
    m[:3, 3] = [1, 0, 0]
    s = om.transform_sphere(jnp.asarray(m), jnp.array([1.0, 1.0, 1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(s), [3.0, 3.0, 1.0, 3.0], atol=1e-6)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    y = om.srgb_to_linear(om.linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_aces_range():
    rgb = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [10.0, 10.0, 10.0]])
    out = np.asarray(om.aces_hill_tonemap(rgb))
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert out[2].mean() > out[1].mean() > out[0].mean()


def test_hammersley_first_points():
    pts = np.asarray(om.hammersley_2d(jnp.arange(4), 4))
    np.testing.assert_allclose(pts[:, 0], [0, 0.25, 0.5, 0.75], atol=1e-7)
    np.testing.assert_allclose(pts[:, 1], [0, 0.5, 0.25, 0.75], atol=1e-7)
