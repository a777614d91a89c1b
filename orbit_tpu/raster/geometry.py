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
    """Clipless homogeneous triangle setup (Olano-Greer style).

    Edge functionals are rows of the adjugate of the 3x3 clip matrix
    M = [x'|y'|w] in pixel-scale homogeneous coordinates, so triangles
    crossing the near plane rasterize correctly with NO clipping stage —
    the TPU-native answer to hardware guard-band clipping. The same
    functionals double as unnormalized perspective-correct barycentrics:
      b_i(p) = E_i(p) / sum_j E_j(p)
    and depth is affine: z_ndc(p) = sum_i z_ci * E_i(p) / det.

    clip: [I,64,4]; tris: [I,T,3] local vertex indices.
    Returns (setup [I,T,12], valid [I,T], bbox [I,4]).
    """
    w = clip[..., 3]
    # pixel-scale homogeneous coords: when w > 0, x'/w = pixel x
    xh = (clip[..., 0] * 0.5 + 0.5 * w) * width
    yh = (0.5 * w - clip[..., 1] * 0.5) * height  # y down in pixels
    zc = clip[..., 2]

    xs = _gather3(xh, tris)  # [I,T,3]
    ys = _gather3(yh, tris)
    zs = _gather3(zc, tris)
    ws = _gather3(w, tris)

    def cross_cols(a, b):
        """columns a, b as (x', y', w) triples -> cross product coeffs."""
        ax, ay, aw = a
        bx, by, bw = b
        return (
            ay * bw - aw * by,  # coefficient of px
            aw * bx - ax * bw,  # coefficient of py
            ax * by - ay * bx,  # constant
        )

    c0 = (xs[..., 0], ys[..., 0], ws[..., 0])
    c1 = (xs[..., 1], ys[..., 1], ws[..., 1])
    c2 = (xs[..., 2], ys[..., 2], ws[..., 2])
    e0 = cross_cols(c1, c2)
    e1 = cross_cols(c2, c0)
    e2 = cross_cols(c0, c1)
    det = c0[0] * e0[0] + c0[1] * e0[1] + c0[2] * e0[2]

    # front faces (glTF CCW, y-down pixels) come out with det < 0
    degenerate = jnp.abs(det) < 1e-10
    fully_behind = jnp.all(ws < w_eps, axis=-1)
    if two_sided:
        flip = jnp.where(det >= 0.0, 1.0, -1.0)
        valid = ~degenerate & ~fully_behind & tri_in_range
    else:
        flip = jnp.full_like(det, -1.0)
        valid = ~degenerate & ~fully_behind & (det < 0.0) & tri_in_range

    inv_det = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, det))
    za = (zs[..., 0] * e0[0] + zs[..., 1] * e1[0] + zs[..., 2] * e2[0]) * inv_det
    zb = (zs[..., 0] * e0[1] + zs[..., 1] * e1[1] + zs[..., 2] * e2[1]) * inv_det
    zzc = (zs[..., 0] * e0[2] + zs[..., 1] * e1[2] + zs[..., 2] * e2[2]) * inv_det

    neg_inf = jnp.float32(-3e38)
    coefs = []
    for ex, ey, ec in (e0, e1, e2):
        coefs += [
            jnp.where(valid, ex * flip, 0.0),
            jnp.where(valid, ey * flip, 0.0),
            jnp.where(valid, ec * flip, neg_inf),  # invalid: E < 0 everywhere
        ]
    coefs += [
        jnp.where(valid, za, 0.0),
        jnp.where(valid, zb, 0.0),
        jnp.where(valid, zzc, neg_inf),
    ]
    setup = jnp.stack(coefs, axis=-1)  # [I,T,12]

    # meshlet screen bbox: projected vertex bounds when every vertex is
    # safely in front; full screen for near-crossing meshlets (their
    # triangles still rasterize exactly — only binning is conservative)
    safe_w = jnp.maximum(ws, w_eps)
    px = xs / safe_w
    py = ys / safe_w
    any_near = jnp.any((ws < w_eps) & valid[..., None], axis=(1, 2))
    big = jnp.float32(3e38)
    vx = jnp.where(valid[..., None], px, big)
    vy = jnp.where(valid[..., None], py, big)
    minx = jnp.min(vx, axis=(1, 2))
    miny = jnp.min(vy, axis=(1, 2))
    vx = jnp.where(valid[..., None], px, -big)
    vy = jnp.where(valid[..., None], py, -big)
    maxx = jnp.max(vx, axis=(1, 2))
    maxy = jnp.max(vy, axis=(1, 2))
    minx = jnp.where(any_near, 0.0, minx)
    miny = jnp.where(any_near, 0.0, miny)
    maxx = jnp.where(any_near, jnp.float32(width), maxx)
    maxy = jnp.where(any_near, jnp.float32(height), maxy)
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
    """attr: [I, 64]; tris: [I, T, 3] -> [I, T, 3] (flat fast-path gather)."""
    from orbit_tpu.utils import gather1

    I = tris.shape[0]
    n = attr.shape[1]
    rows = jnp.arange(I, dtype=tris.dtype)[:, None, None]
    return gather1(attr.reshape(-1), rows * n + tris)
