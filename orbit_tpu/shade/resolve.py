"""Visibility-buffer resolve: per-pixel triangle attribute reconstruction.

Replaces the hardware interpolators + vertex fetch of the reference's
forward.vert/forward.mesh -> forward.frag path. For every pixel the packed
vis id recovers (instance slot, local tri); we gather the triangle's three
vertices, compute perspective-correct barycentrics analytically from the
stored clip positions, and interpolate attributes — including analytic
UV screen derivatives for mip selection (no quad-derivative hardware needed).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from orbit_tpu.math.packing import unpack_normal_tangent
from orbit_tpu.math.transforms import normalize
from orbit_tpu.raster.kernel_common import VIS_TRI_BITS


@jax.tree_util.register_dataclass
@dataclass
class GBuffer:
    """Flattened per-pixel surface attributes (N = H*W)."""

    valid: jax.Array  # [N] bool
    world_pos: jax.Array  # [N,3]
    normal: jax.Array  # [N,3] geometric/interpolated (pre normal-map)
    tangent: jax.Array  # [N,4]
    uv: jax.Array  # [N,2]
    duv_dx: jax.Array  # [N,2]
    duv_dy: jax.Array  # [N,2]
    material: jax.Array  # [N] i32
    entity: jax.Array  # [N] i32
    meshlet: jax.Array  # [N] i32
    tri: jax.Array  # [N] i32
    depth: jax.Array  # [N] f32 (reverse-Z)


def resolve_gbuffer(
    assets,
    vis,
    depth,
    setup,  # [I, 64, 12] geometry-stage functionals (homogeneous barys)
    inst_meshlet,  # [I] i32
    inst_entity,  # [I] i32
    entity_normal_mat,  # [E, 3, 3] world-space normal matrices
    inv_view_proj,  # [4, 4]
    width: int,
    height: int,
) -> GBuffer:
    H, W = vis.shape
    n = H * W
    visf = vis.reshape(-1)
    depthf = depth.reshape(-1)
    valid = visf != 0

    packed = jnp.maximum(visf - 1, 0)
    slot = packed >> VIS_TRI_BITS
    tri = packed & ((1 << VIS_TRI_BITS) - 1)
    from orbit_tpu.utils import gather1, gather2

    meshlet = gather1(inst_meshlet, slot)
    entity = gather1(inst_entity, slot)

    lv = gather2(assets.mlet_tris, meshlet, tri).astype(jnp.int32)  # [N,3]
    nmv = assets.mlet_vertices.shape[1]
    gv = gather1(assets.mlet_vertices.reshape(-1), meshlet[:, None] * nmv + lv)  # [N,3]

    # pixel centers
    px = (jnp.arange(n, dtype=jnp.int32) % W).astype(jnp.float32) + 0.5
    py = (jnp.arange(n, dtype=jnp.int32) // W).astype(jnp.float32) + 0.5

    # the raster setup coefficients ARE unnormalized perspective-correct
    # barycentric functionals (triangle_setup): b_i = E_i(p) / sum E_j(p)
    co = gather2(setup, slot, tri)  # [N,12]
    ga = co[:, 0:9:3]  # [N,3] x-gradients
    gb = co[:, 1:9:3]
    gc = co[:, 2:9:3]
    alpha = ga * px[:, None] + gb * py[:, None] + gc  # [N,3]
    asum = jnp.sum(alpha, axis=-1, keepdims=True)
    inv_asum = 1.0 / jnp.where(jnp.abs(asum) < 1e-20, 1.0, asum)
    lam = alpha * inv_asum
    ga_sum = jnp.sum(ga, axis=-1, keepdims=True)
    gb_sum = jnp.sum(gb, axis=-1, keepdims=True)

    uvs = gather1(assets.uvs, gv)  # [N,3,2]
    uv = jnp.einsum("ni,nic->nc", lam, uvs)
    duv_dx = (jnp.einsum("ni,nic->nc", ga, uvs) - uv * ga_sum) * inv_asum
    duv_dy = (jnp.einsum("ni,nic->nc", gb, uvs) - uv * gb_sum) * inv_asum

    # normals/tangents: unpack then interpolate (model space), then to world
    n_m, t_m = unpack_normal_tangent(gather1(assets.normals_packed, gv))  # [N,3,3/4]
    nrm_model = jnp.einsum("ni,nic->nc", lam, n_m)
    tan_model = jnp.einsum("ni,nic->nc", lam, t_m[..., :3])
    bit_sign = jnp.sum(lam * t_m[..., 3], axis=-1, keepdims=True)
    nm = gather1(entity_normal_mat, entity)  # [N,3,3]
    normal = normalize(jnp.einsum("nab,nb->na", nm, nrm_model))
    tangent = normalize(jnp.einsum("nab,nb->na", nm, tan_model))
    tangent4 = jnp.concatenate([tangent, jnp.sign(bit_sign + 1e-20)], axis=-1)

    # world position from depth (one inverse-VP transform per pixel)
    ndc_x = px / W * 2.0 - 1.0
    ndc_y = (1.0 - py / H) * 2.0 - 1.0
    ndc = jnp.stack([ndc_x, ndc_y, depthf, jnp.ones_like(depthf)], axis=-1)
    wp = ndc @ inv_view_proj.T
    world_pos = wp[:, :3] / jnp.where(jnp.abs(wp[:, 3:4]) < 1e-20, 1.0, wp[:, 3:4])

    material = gather1(assets.mlet_material, meshlet)
    return GBuffer(
        valid=valid,
        world_pos=world_pos,
        normal=normal,
        tangent=tangent4,
        uv=uv,
        duv_dx=duv_dx,
        duv_dy=duv_dy,
        material=material,
        entity=entity,
        meshlet=meshlet,
        tri=tri,
        depth=depthf,
    )
