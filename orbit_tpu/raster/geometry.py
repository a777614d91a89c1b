"""Geometry stage: meshlet vertex transform + triangle setup.

Replaces the reference's vertex/mesh shaders (forward.vert:11-35,
forward.mesh:18-63). All visible meshlet instances are processed in one
batched pass: gather vertices, transform to clip space (batched MXU
matmuls), derive screen-space edge and depth-plane coefficients for the
rasterizer, and compute per-meshlet screen bounds for binning.

Vis-buffer id convention: vis = slot * 64 + local_tri + 1; 0 = background.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class GeometryBuffers:
    """Per-frame geometry output, capacity = max visible meshlet instances.

    clip:      [I, 64, 4] f32 clip-space vertex positions
    setup:     [I, 64, 12] f32 (E0: ax,ay,c | E1 | E2 | Z: za,zb,zc),
               screen-space; invalid tris get all-reject coefficients
    tri_valid: [I, 64] bool
    bbox:      [I, 4] f32 screen-space meshlet bounds (minx,miny,maxx,maxy)
    inst_valid:[I] bool
    """

    clip: jax.Array
    setup: jax.Array
    tri_valid: jax.Array
    bbox: jax.Array
    inst_valid: jax.Array


def meshlet_vertices_world(assets, meshlet_ids, entity_matrices):
    """Gather + transform meshlet vertices to world space.

    meshlet_ids: [I] i32; entity_matrices: [I,4,4] model matrices.
    Returns (world [I,64,4] homogeneous, vert_ids [I,64] i32).
    """
    vert_ids = assets.mlet_vertices[meshlet_ids]  # [I,64]
    pos = assets.positions[vert_ids]  # [I,64,3]
    pos_h = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], axis=-1)
    world = jnp.einsum(
        "iab,ivb->iva", entity_matrices, pos_h, precision=jax.lax.Precision.HIGHEST
    )
    return world, vert_ids


def process_geometry(
    assets,
    meshlet_ids,
    entity_matrices,
    view_proj,
    width: int,
    height: int,
    inst_valid=None,
    two_sided: bool = False,
    w_eps: float = 1e-4,
) -> GeometryBuffers:
    """meshlet_ids: [I] i32 (compacted visible list, padded arbitrarily where
    inst_valid is False); entity_matrices: [I,4,4]."""
    world, _ = meshlet_vertices_world(assets, meshlet_ids, entity_matrices)
    clip = jnp.einsum(
        "ab,ivb->iva", view_proj, world, precision=jax.lax.Precision.HIGHEST
    )

    tris = assets.mlet_tris[meshlet_ids].astype(jnp.int32)  # [I,64,3]
    tcount = assets.mlet_tcount[meshlet_ids]  # [I]
    tri_in_range = (
        jnp.arange(tris.shape[1], dtype=jnp.int32)[None, :] < tcount[:, None]
    )
    if inst_valid is not None:
        tri_in_range = tri_in_range & inst_valid[:, None]

    setup, tri_valid, bbox = triangle_setup(
        clip, tris, tri_in_range, width, height, two_sided, w_eps
    )
    iv = (
        inst_valid
        if inst_valid is not None
        else jnp.ones(clip.shape[0], dtype=bool)
    )
    return GeometryBuffers(
        clip=clip, setup=setup, tri_valid=tri_valid, bbox=bbox, inst_valid=iv
    )


def clip_to_screen(clip, width, height):
    """Clip -> screen px. +y NDC = up = row 0; pixel centers at +0.5.

    Returns (x, y, z_ndc, w).
    """
    w = clip[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    ndc = clip[..., :3] / safe_w[..., None]
    x = (ndc[..., 0] * 0.5 + 0.5) * width
    y = (0.5 - ndc[..., 1] * 0.5) * height
    return x, y, ndc[..., 2], w


def triangle_setup(
    clip, tris, tri_in_range, width, height, two_sided=False, w_eps=1e-4
):
    """Edge + depth-plane coefficients per triangle.

    clip: [I,64,4]; tris: [I,T,3] local vertex indices.
    Returns (setup [I,T,12], valid [I,T], bbox [I,4]).
    """
    x, y, z, w = clip_to_screen(clip, width, height)

    # gather per-corner screen attrs: [I, T, 3]
    xs = _gather3(x, tris)
    ys = _gather3(y, tris)
    zs = _gather3(z, tris)
    ws = _gather3(w, tris)

    x0, x1, x2 = xs[..., 0], xs[..., 1], xs[..., 2]
    y0, y1, y2 = ys[..., 0], ys[..., 1], ys[..., 2]
    z0, z1, z2 = zs[..., 0], zs[..., 1], zs[..., 2]

    # signed 2x area in y-DOWN screen space: glTF front faces (CCW viewed
    # from outside, right-handed) come out with area2 < 0 after the y flip
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)

    behind = jnp.any(ws < w_eps, axis=-1)  # near-plane: reject (TODO: clip)
    degenerate = jnp.abs(area2) < 1e-12
    if two_sided:
        # flip edge signs so E >= 0 is inside regardless of winding
        flip = jnp.where(area2 >= 0.0, 1.0, -1.0)
        valid = ~behind & ~degenerate & tri_in_range
    else:
        flip = jnp.full_like(area2, -1.0)
        valid = ~behind & ~degenerate & (area2 < 0.0) & tri_in_range

    def edge(xa, ya, xb, yb):
        # E(p) = (p - a) x (b - a); >= 0 inside for positive-area triangles
        ax = -(yb - ya)
        ay = xb - xa
        c = xa * (yb - ya) - ya * (xb - xa)
        return ax, ay, c

    # E0 opposite v0 -> edge (v1 -> v2), etc.
    e0 = edge(x1, y1, x2, y2)
    e1 = edge(x2, y2, x0, y0)
    e2 = edge(x0, y0, x1, y1)

    inv_area = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, area2))
    za = ((z1 - z0) * (y2 - y0) - (z2 - z0) * (y1 - y0)) * inv_area
    zb = ((z2 - z0) * (x1 - x0) - (z1 - z0) * (x2 - x0)) * inv_area
    zc = z0 - za * x0 - zb * y0

    neg_inf = jnp.float32(-3e38)
    coefs = []
    for ax, ay, c in (e0, e1, e2):
        coefs += [
            jnp.where(valid, ax * flip, 0.0),
            jnp.where(valid, ay * flip, 0.0),
            jnp.where(valid, c * flip, neg_inf),  # invalid: E < 0 everywhere
        ]
    coefs += [
        jnp.where(valid, za, 0.0),
        jnp.where(valid, zb, 0.0),
        jnp.where(valid, zc, neg_inf),
    ]
    setup = jnp.stack(coefs, axis=-1)  # [I,T,12]

    # meshlet screen bbox over valid triangle vertices
    big = jnp.float32(3e38)
    vx = jnp.where(valid[..., None], xs, big)
    vy = jnp.where(valid[..., None], ys, big)
    minx = jnp.min(vx, axis=(1, 2))
    miny = jnp.min(vy, axis=(1, 2))
    vx = jnp.where(valid[..., None], xs, -big)
    vy = jnp.where(valid[..., None], ys, -big)
    maxx = jnp.max(vx, axis=(1, 2))
    maxy = jnp.max(vy, axis=(1, 2))
    bbox = jnp.stack(
        [
            jnp.clip(minx, 0.0, width),
            jnp.clip(miny, 0.0, height),
            jnp.clip(maxx, 0.0, width),
            jnp.clip(maxy, 0.0, height),
        ],
        axis=-1,
    )
    return setup, valid, bbox


def _gather3(attr, tris):
    """attr: [I, 64]; tris: [I, T, 3] -> [I, T, 3]."""
    I, T, _ = tris.shape
    flat = tris.reshape(I, T * 3)
    out = jnp.take_along_axis(attr, flat, axis=1)
    return out.reshape(I, T, 3)
