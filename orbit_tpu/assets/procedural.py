"""Procedural geometry + textures for tests and benchmarks.

The reference's benchmark scenes (DamagedHelmet/Sponza/Bistro glTFs) are not
redistributable, so the benchmark configs are mirrored with deterministic
procedural stand-ins of matching scale (see orbit_tpu/scenes.py). The glTF
loader (assets/gltf.py) handles real scene files when present.
"""

from __future__ import annotations

import numpy as np

from orbit_tpu.assets.mesh import MeshData

# ---------------------------------------------------------------- primitives


def plane(size=1.0, segments=1) -> MeshData:
    s = segments
    xs = np.linspace(-size / 2, size / 2, s + 1)
    zs = np.linspace(-size / 2, size / 2, s + 1)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    pos = np.stack([X, np.zeros_like(X), Z], -1).reshape(-1, 3)
    uv = np.stack(
        [X / size + 0.5, Z / size + 0.5], -1
    ).reshape(-1, 2)
    idx = []
    for i in range(s):
        for j in range(s):
            a = i * (s + 1) + j
            b = a + 1
            c = a + (s + 1)
            d = c + 1
            idx += [a, b, c, b, d, c]  # CCW seen from +Y
    n = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (len(pos), 1))
    return MeshData(
        positions=pos.astype(np.float32),
        normals=n,
        uvs=uv.astype(np.float32),
        indices=np.array(idx, np.uint32),
    )


def cube(size=1.0) -> MeshData:
    hs = size / 2
    faces = []
    # (normal, u-axis, v-axis)
    axes = [
        ([1, 0, 0], [0, 0, -1], [0, 1, 0]),
        ([-1, 0, 0], [0, 0, 1], [0, 1, 0]),
        ([0, 1, 0], [1, 0, 0], [0, 0, -1]),
        ([0, -1, 0], [1, 0, 0], [0, 0, 1]),
        ([0, 0, 1], [1, 0, 0], [0, 1, 0]),
        ([0, 0, -1], [-1, 0, 0], [0, 1, 0]),
    ]
    pos, nrm, uv, idx = [], [], [], []
    for n, u, v in axes:
        n, u, v = np.array(n, np.float32), np.array(u, np.float32), np.array(v, np.float32)
        base = len(pos)
        for du, dv, tu, tv in [(-1, -1, 0, 0), (1, -1, 1, 0), (1, 1, 1, 1), (-1, 1, 0, 1)]:
            pos.append(n * hs + u * du * hs + v * dv * hs)
            nrm.append(n)
            uv.append([tu, tv])
        idx += [base, base + 1, base + 2, base, base + 2, base + 3]
    return MeshData(
        positions=np.array(pos, np.float32),
        normals=np.array(nrm, np.float32),
        uvs=np.array(uv, np.float32),
        indices=np.array(idx, np.uint32),
    )


def uv_sphere(radius=1.0, rings=32, sectors=64) -> MeshData:
    phi = np.linspace(0, np.pi, rings + 1)
    theta = np.linspace(0, 2 * np.pi, sectors + 1)
    P, T = np.meshgrid(phi, theta, indexing="ij")
    n = np.stack(
        [np.sin(P) * np.cos(T), np.cos(P), np.sin(P) * np.sin(T)], -1
    ).reshape(-1, 3)
    pos = n * radius
    uv = np.stack([T / (2 * np.pi), P / np.pi], -1).reshape(-1, 2)
    idx = []
    W = sectors + 1
    for i in range(rings):
        for j in range(sectors):
            a = i * W + j
            b = a + 1
            c = a + W
            d = c + 1
            if i > 0:
                idx += [a, b, c]
            if i < rings - 1:
                idx += [b, d, c]
    return MeshData(
        positions=pos.astype(np.float32),
        normals=n.astype(np.float32),
        uvs=uv.astype(np.float32),
        indices=np.array(idx, np.uint32),
    )


def torus(major=1.0, minor=0.35, rings=48, sides=24) -> MeshData:
    u = np.linspace(0, 2 * np.pi, rings + 1)
    v = np.linspace(0, 2 * np.pi, sides + 1)
    U, V = np.meshgrid(u, v, indexing="ij")
    cx, cz = np.cos(U) * major, np.sin(U) * major
    pos = np.stack(
        [
            (major + minor * np.cos(V)) * np.cos(U),
            minor * np.sin(V),
            (major + minor * np.cos(V)) * np.sin(U),
        ],
        -1,
    ).reshape(-1, 3)
    center = np.stack([cx, np.zeros_like(cx), cz], -1).reshape(-1, 3)
    n = pos - center
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    uv = np.stack([U / (2 * np.pi), V / (2 * np.pi)], -1).reshape(-1, 2)
    idx = []
    W = sides + 1
    for i in range(rings):
        for j in range(sides):
            a = i * W + j
            b = a + 1
            c = a + W
            d = c + 1
            idx += [a, b, c, b, d, c]  # outward-facing winding
    return MeshData(
        positions=pos.astype(np.float32),
        normals=n.astype(np.float32),
        uvs=uv.astype(np.float32),
        indices=np.array(idx, np.uint32),
    )


def cylinder(radius=0.5, height=2.0, sectors=32) -> MeshData:
    theta = np.linspace(0, 2 * np.pi, sectors + 1)
    ring = np.stack([np.cos(theta), np.zeros_like(theta), np.sin(theta)], -1)
    top = ring * radius + [0, height / 2, 0]
    bot = ring * radius + [0, -height / 2, 0]
    pos = [top, bot]
    nrm = [ring, ring]
    uv = [
        np.stack([theta / (2 * np.pi), np.ones_like(theta)], -1),
        np.stack([theta / (2 * np.pi), np.zeros_like(theta)], -1),
    ]
    idx = []
    W = sectors + 1
    for j in range(sectors):
        a, b, c, d = j, j + 1, W + j, W + j + 1
        idx += [a, b, c, b, d, c]
    # caps
    base = 2 * W
    pos.append(top)
    pos.append(bot)
    up = np.tile([0.0, 1.0, 0.0], (W, 1))
    nrm.append(up)
    nrm.append(-up)
    uv.append(ring[:, [0, 2]] * 0.5 + 0.5)
    uv.append(ring[:, [0, 2]] * 0.5 + 0.5)
    for j in range(1, sectors - 1):
        idx += [base, base + j + 1, base + j]
        idx += [base + W, base + W + j, base + W + j + 1]
    return MeshData(
        positions=np.concatenate(pos).astype(np.float32),
        normals=np.concatenate(nrm).astype(np.float32),
        uvs=np.concatenate(uv).astype(np.float32),
        indices=np.array(idx, np.uint32),
    )


# ---------------------------------------------------------------- textures


def checker_texture(size=256, tiles=8, c0=(200, 200, 200), c1=(40, 40, 40)):
    y, x = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    mask = ((x * tiles // size) + (y * tiles // size)) % 2 == 0
    img = np.where(mask[..., None], np.array(c0, np.uint8), np.array(c1, np.uint8))
    return img.astype(np.uint8)


def noise_texture(size=256, seed=0, lo=0, hi=255, grayscale=False):
    rng = np.random.default_rng(seed)
    if grayscale:
        v = rng.integers(lo, hi, (size // 8, size // 8, 1), dtype=np.uint8)
        base = np.repeat(v, 3, axis=-1)
    else:
        base = rng.integers(
            lo, hi, (size // 8, size // 8, 3), dtype=np.uint8
        )
    reps = size // base.shape[0]
    return np.kron(base, np.ones((reps, reps, 1), np.uint8))


def normal_map_flat(size=64):
    img = np.zeros((size, size, 3), np.uint8)
    img[..., 0] = 128
    img[..., 1] = 128
    img[..., 2] = 255
    return img


def gradient_envmap(width=128, height=64, seed=3):
    """Small equirect HDR environment: sky gradient + sun disk. f32 [H,W,3]."""
    v = np.linspace(0, 1, height)[:, None, None]  # 0 = up
    sky_top = np.array([0.35, 0.55, 1.1])
    sky_hor = np.array([0.8, 0.85, 0.95])
    ground = np.array([0.25, 0.22, 0.2])
    img = np.where(
        v < 0.5,
        sky_top + (sky_hor - sky_top) * (v / 0.5),
        ground * (1.0 - (v - 0.5) * 0.6),
    ).astype(np.float32)
    img = np.broadcast_to(img, (height, width, 3)).copy()
    # sun disk
    su, sv = 0.72, 0.26
    uu = np.linspace(0, 1, width)[None, :]
    vv = np.linspace(0, 1, height)[:, None]
    d2 = ((uu - su) * 2) ** 2 + (vv - sv) ** 2
    img += (np.exp(-d2 * 900.0)[..., None] * np.array([60.0, 55.0, 45.0])).astype(
        np.float32
    )
    return img


def displaced_sphere(
    radius=1.0, rings=64, sectors=128, seed=0, amp=0.15, freq=3.0,
    octaves=4,
) -> MeshData:
    """High-poly 'rock/terrain' primitive: a uv-sphere displaced radially
    by deterministic smooth trig noise (position-keyed, so the wrap seam
    stays crack-free). The XL benchmark scenes use these for reference-
    class unique-triangle density (Bistro-style organic geometry)."""
    m = uv_sphere(radius, rings, sectors)
    p = m.positions / radius
    d = np.zeros(len(p), np.float64)
    for o in range(octaves):
        f = freq * (2.0 ** o)
        ph = seed * 12.9898 + o * 7.77
        d += (amp / (2.0 ** o)) * (
            np.sin(f * p[:, 0] + 1.7 * np.cos(f * p[:, 2] + ph) + ph)
            * np.cos(f * p[:, 1] - 1.3 * np.sin(f * p[:, 0] + 0.6 * ph))
        )
    pos = (m.positions * (1.0 + d)[:, None]).astype(np.float32)
    out = MeshData(positions=pos, indices=m.indices, uvs=m.uvs)
    out.finalize()  # recompute normals + tangents for the displaced surface
    return out


def leaf_texture(size=256, seed=0):
    """Foliage card texture: green leaf blobs on a transparent ground
    (alpha-MASKED materials cut the gaps out at raster time)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((size, size, 4), np.uint8)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    alpha = np.zeros((size, size), np.float32)
    for _ in range(60):
        cx, cy = rng.uniform(0, size, 2)
        rx = rng.uniform(size * 0.04, size * 0.1)
        ry = rx * rng.uniform(0.5, 1.0)
        d = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2
        alpha = np.maximum(alpha, (d < 1.0).astype(np.float32))
    img[..., 0] = 40
    img[..., 1] = rng.integers(120, 190, (size, size), dtype=np.uint8)
    img[..., 2] = 30
    img[..., 3] = (alpha * 255).astype(np.uint8)
    return img
