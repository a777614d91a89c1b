"""Geometry stage: meshlet triangle transform + setup (gather-free).

Replaces the reference's vertex/mesh shaders (forward.vert:11-35,
forward.mesh:18-63). TPU-first: per-triangle corner positions are
pre-expanded at asset build (AssetArrays.tri_pos), so this stage is a
single [I]-row gather plus batched dense math — no per-corner gathers
(which cost ~5ns/row on TPU and would dominate the frame).

Surface ATTRIBUTES are not touched here at all (v3): the rasterizer
gathers per-corner attribute blocks straight from the load-time-baked
asset array (AssetArrays.tri_ac, kernel_common CA_* layout) by meshlet
id and interpolates in-kernel — the per-frame attribute stream this
stage used to materialize (~45 ms at bench scale) no longer exists.

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

    setup:     [I, 12, 64] f32 (E0: ax,ay,c | E1 | E2 | Z: za,zb,zc on the
               12 axis; 64 triangles on lanes), pixel-space homogeneous;
               invalid tris get all-reject coeffs. Coefficient-major with
               the 64-triangle axis minor so the forced row-major layout
               of Pallas operands stays dense: a [*, 12]-minor array pads
               its last dim to 128 lanes (10x HBM bloat, 32 KB DMA per
               pair, and an ~8 ms/frame relayout copy at bench scale)
    tri_valid: [I, 64] bool
    bbox:      [I, 4] f32 screen-space meshlet bounds (minx,miny,maxx,maxy)
    inst_valid:[I] bool
    max_z:     [I] f32 conservative max NDC depth over the meshlet's valid
               triangles (reverse-Z: larger = nearer). Drives front-to-back
               pair ordering and the rasterizer's per-pair early-z skip.
    inst_mid:  [I] i32 meshlet id per instance — the rasterizer's key into
               the asset-side tri_ac corner-attr array
    mask_slot: [I] i32 alpha-mask slot per instance (-1 none)
    """

    setup: jax.Array
    tri_valid: jax.Array
    bbox: jax.Array
    inst_valid: jax.Array
    max_z: jax.Array
    inst_mid: jax.Array
    mask_slot: jax.Array


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
    """meshlet_ids: [I] i32 (compacted visible list); entity_matrices
    [I,4,4]."""
    # gather as 2D rows (row-major both sides) so XLA does NOT relayout
    # the whole asset array every frame (a [M,64,3,9] gather was choosing
    # a transposed parameter layout + full-store copy: ~6 ms/frame)
    M = assets.tri_pos.shape[0]
    I = meshlet_ids.shape[0]
    tri_pos = (
        assets.tri_pos.reshape(M, -1)[meshlet_ids].reshape(I, 64, 3, 3)
    )
    mvp = jnp.einsum("ab,ibc->iac", view_proj, entity_matrices)  # [I,4,4]
    ph = jnp.concatenate(
        [tri_pos, jnp.ones_like(tri_pos[..., :1])], axis=-1
    )  # [I,64,3,4]
    clip = jnp.einsum(
        "iab,itcb->itca", mvp, ph, precision=jax.lax.Precision.HIGHEST
    )  # [I,64,3,4]

    tcount = assets.mlet_tcount[meshlet_ids]  # [I]
    tri_in_range = (
        jnp.arange(clip.shape[1], dtype=jnp.int32)[None, :] < tcount[:, None]
    )
    if inst_valid is not None:
        tri_in_range = tri_in_range & inst_valid[:, None]

    setup, edges, valid, bbox, max_z = triangle_setup_corners(
        clip, tri_in_range, width, height, two_sided, w_eps
    )

    mats = jnp.maximum(assets.mlet_material[meshlet_ids], 0)
    mask_slot = assets.mat_mask_slot[mats]

    iv = (
        inst_valid
        if inst_valid is not None
        else jnp.ones(clip.shape[0], dtype=bool)
    )
    return GeometryBuffers(
        setup=setup, tri_valid=valid, bbox=bbox, inst_valid=iv,
        max_z=max_z, inst_mid=meshlet_ids, mask_slot=mask_slot,
    )


def triangle_setup_corners(
    clip, tri_in_range, width, height, two_sided=False, w_eps=1e-4
):
    """Clipless homogeneous triangle setup (Olano-Greer style).

    Edge functionals are rows of the adjugate of the 3x3 clip matrix
    M = [x'|y'|w] in pixel-scale homogeneous coordinates, so triangles
    crossing the near plane rasterize correctly with NO clipping stage —
    the TPU-native answer to hardware guard-band clipping. The same
    functionals double as unnormalized perspective-correct barycentrics:
      b_i(p) = E_i(p) / sum_j E_j(p)
    and depth is affine: z_ndc(p) = sum_i z_ci * E_i(p) / det.

    clip: [I,T,3,4] per-corner clip positions.
    Returns (setup [I,12,T] coefficient-major, edges (e0,e1,e2 flipped
    coeff triples), valid [I,T], bbox [I,4], max_z [I]).
    """
    w = clip[..., 3]  # [I,T,3]
    xh = (clip[..., 0] * 0.5 + 0.5 * w) * width
    yh = (0.5 * w - clip[..., 1] * 0.5) * height  # y down in pixels
    zs = clip[..., 2]

    def cross_cols(a, b):
        ax, ay, aw = a
        bx, by, bw = b
        return (
            ay * bw - aw * by,  # coefficient of px
            aw * bx - ax * bw,  # coefficient of py
            ax * by - ay * bx,  # constant
        )

    c0 = (xh[..., 0], yh[..., 0], w[..., 0])
    c1 = (xh[..., 1], yh[..., 1], w[..., 1])
    c2 = (xh[..., 2], yh[..., 2], w[..., 2])
    e0 = cross_cols(c1, c2)
    e1 = cross_cols(c2, c0)
    e2 = cross_cols(c0, c1)
    det = c0[0] * e0[0] + c0[1] * e0[1] + c0[2] * e0[2]

    # front faces (glTF CCW, y-down pixels) come out with det < 0
    degenerate = jnp.abs(det) < 1e-10
    fully_behind = jnp.all(w < w_eps, axis=-1)
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
    flipped_edges = []
    for ex, ey, ec in (e0, e1, e2):
        fx, fy, fc = ex * flip, ey * flip, ec * flip
        flipped_edges.append((fx, fy, fc))
        coefs += [
            jnp.where(valid, fx, 0.0),
            jnp.where(valid, fy, 0.0),
            jnp.where(valid, fc, neg_inf),  # invalid: E < 0 everywhere
        ]
    coefs += [
        jnp.where(valid, za, 0.0),
        jnp.where(valid, zb, 0.0),
        jnp.where(valid, zzc, neg_inf),
    ]
    setup = jnp.stack(coefs, axis=1)  # [I,12,T]

    # meshlet screen bbox. Front corners (w >= eps) project normally. For
    # triangles crossing the near plane, the visible region is a wedge:
    # each crossing edge projects to a RAY from the front corner's
    # projection through the w=eps intersection and on to infinity (a 3D
    # segment projects to a straight 2D line, so the ray is exactly
    # collinear with the w->0+ asymptote). A ray is per-axis monotone, so
    # the exact conservative bbox extension is a sign test per axis —
    # no full-screen fallback (which previously binned near-crossing
    # meshlets to every tile: ~43% of bench pairs were that padding).
    safe_w = jnp.maximum(w, w_eps)
    px = xh / safe_w
    py = yh / safe_w
    in_front = w >= w_eps  # [I,T,3]
    big = jnp.float32(3e38)
    use_c = valid[..., None] & in_front
    minx = jnp.min(jnp.where(use_c, px, big), axis=(1, 2))
    miny = jnp.min(jnp.where(use_c, py, big), axis=(1, 2))
    maxx = jnp.max(jnp.where(use_c, px, -big), axis=(1, 2))
    maxy = jnp.max(jnp.where(use_c, py, -big), axis=(1, 2))

    for i, j in ((0, 1), (1, 2), (2, 0)):
        cross = valid & (in_front[..., i] != in_front[..., j])  # [I,T]
        wi, wj = w[..., i], w[..., j]
        denom = wj - wi
        t = (w_eps - wi) / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        xi = (xh[..., i] + t * (xh[..., j] - xh[..., i])) / w_eps
        yi = (yh[..., i] + t * (yh[..., j] - yh[..., i])) / w_eps
        xf = jnp.where(in_front[..., i], px[..., i], px[..., j])
        yf = jnp.where(in_front[..., i], py[..., i], py[..., j])
        # ray starts at the (already-included) front corner; extend the
        # bbox to infinity in the ray's per-axis direction
        maxx = jnp.maximum(
            maxx, jnp.max(jnp.where(cross & (xi >= xf), big, -big), axis=1)
        )
        minx = jnp.minimum(
            minx, jnp.min(jnp.where(cross & (xi <= xf), -big, big), axis=1)
        )
        maxy = jnp.maximum(
            maxy, jnp.max(jnp.where(cross & (yi >= yf), big, -big), axis=1)
        )
        miny = jnp.minimum(
            miny, jnp.min(jnp.where(cross & (yi <= yf), -big, big), axis=1)
        )
    bbox = jnp.stack(
        [
            jnp.clip(minx, 0.0, width),
            jnp.clip(miny, 0.0, height),
            jnp.clip(maxx, 0.0, width),
            jnp.clip(maxy, 0.0, height),
        ],
        axis=-1,
    )

    # conservative max NDC depth per meshlet: z_ndc is affine in screen
    # space, so inside a (non-near-crossing) triangle it is bounded by the
    # corner values zs/w; a near-crossing triangle can reach any depth up
    # to the kernel's z <= 1 clamp. Reverse-Z: bigger = nearer. Used for
    # front-to-back pair ordering + the per-pair early-z skip.
    zc = jnp.clip(zs / jnp.maximum(w, w_eps), -1.0, 1.0)
    tri_maxz = jnp.where(
        jnp.any(w < w_eps, axis=-1), 1.0, jnp.max(zc, axis=-1)
    )  # [I,T]
    max_z = jnp.max(jnp.where(valid, tri_maxz, -1.0), axis=1)  # [I]
    return setup, flipped_edges, valid, bbox, max_z
