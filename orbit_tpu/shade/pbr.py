"""Material evaluation + light accumulation (forward.frag main, re-expressed
as one deferred vectorized pass over the visibility buffer)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from orbit_tpu.assets.types import (
    TEX_BASE_COLOR,
    TEX_EMISSIVE,
    TEX_METALLIC_ROUGHNESS,
    TEX_NORMAL,
    TEX_OCCLUSION,
)
from orbit_tpu.math.transforms import normalize
from orbit_tpu.scene import LIGHT_DIRECTIONAL, LIGHT_POINT, LIGHT_SKY
from orbit_tpu.shade import brdf
from orbit_tpu.shade import ibl as ibl_mod

from orbit_tpu.shade.texture import (
    lod_from_derivatives,
    sample_texture,
    size_from_atlas,
)


@jax.tree_util.register_dataclass
@dataclass
class Surface:
    """Evaluated material per pixel (forward.frag:268-341)."""

    albedo: jax.Array  # [N,3] linear
    alpha: jax.Array  # [N]
    normal: jax.Array  # [N,3] shading normal (normal-mapped)
    metallic: jax.Array  # [N]
    roughness: jax.Array  # [N]
    emissive: jax.Array  # [N,3]
    ao: jax.Array  # [N]


def evaluate_material(assets, gbuf, ssao: Optional[jax.Array] = None) -> Surface:
    tex_size = size_from_atlas(assets.tex_data.shape[1])
    from orbit_tpu.utils import gather1

    mat = gbuf.material
    base = gather1(assets.mat_base_color, mat)
    metallic = gather1(assets.mat_metallic, mat)
    roughness = gather1(assets.mat_roughness, mat)
    emissive = gather1(assets.mat_emissive, mat)
    tex = gather1(assets.mat_tex, mat)  # [N,5]

    def sample_slot(slot):
        layer = tex[:, slot]
        lod = lod_from_derivatives(gbuf.duv_dx, gbuf.duv_dy, tex_size)
        c = sample_texture(
            assets.tex_data, assets.tex_srgb, layer, gbuf.uv, lod, tex_size
        )
        return c, layer >= 0

    c, has = sample_slot(TEX_BASE_COLOR)
    base = jnp.where(has[:, None], base * c, base)

    c, has = sample_slot(TEX_METALLIC_ROUGHNESS)
    metallic = jnp.where(has, metallic * c[:, 2], metallic)
    roughness = jnp.where(has, roughness * c[:, 1], roughness)

    c, has = sample_slot(TEX_EMISSIVE)
    emissive = jnp.where(has[:, None], emissive * c[:, :3], emissive)

    c, has = sample_slot(TEX_OCCLUSION)
    ao = jnp.where(has, c[:, 0], 1.0)

    # normal mapping (forward.frag:306-320): TBN from interpolated frame
    c, has = sample_slot(TEX_NORMAL)
    n = gbuf.normal
    t = gbuf.tangent[:, :3]
    b = jnp.cross(n, t) * gbuf.tangent[:, 3:4]
    nt = c[:, :3] * 2.0 - 1.0
    # note: normal maps are linear; slot must be added with srgb=False
    ntz = jnp.sqrt(jnp.abs(1.0 - nt[:, 0] ** 2 - nt[:, 1] ** 2))
    n_mapped = normalize(
        t * nt[:, 0:1] + b * nt[:, 1:2] + n * ntz[:, None]
    )
    normal = jnp.where(has[:, None], n_mapped, n)

    if ssao is not None:
        ao = jnp.minimum(ao, ssao)

    return Surface(
        albedo=base[:, :3],
        alpha=base[:, 3],
        normal=normal,
        metallic=metallic,
        roughness=roughness,
        emissive=emissive,
        ao=ao,
    )


def shade(
    surface: Surface,
    gbuf,
    scene,
    light_slots,
    eye,
    env: Optional[ibl_mod.EnvironmentMap],
    luminance_cutoff: float = 0.25,
    shadow_fn: Optional[Callable] = None,
    light_mask: Optional[jax.Array] = None,
    spec_sample: Optional[jax.Array] = None,
) -> jax.Array:
    """Accumulate radiance over the given light slots (forward.frag:368-487).

    light_slots: iterable of static slot indices (an int count also works
    and means range(count)). When clustered shading handles point lights,
    pass only the sky/directional slots here. Returns [N,3] HDR linear.
    """
    if isinstance(light_slots, int):
        light_slots = range(light_slots)
    v = normalize(eye[None, :] - gbuf.world_pos)
    n = surface.normal
    light_sum = surface.emissive

    for li in light_slots:
        kind = scene.light_type[li]
        color = scene.light_color[li]

        def sky():
            # IBL, gather-minimized: irradiance from SH9 (0 gathers),
            # env BRDF analytic (0 gathers), prefiltered specular either
            # precomputed by the caller (shared with the skybox) or one
            # bilinear tap here
            n_dot_v = jnp.maximum(jnp.sum(n * v, axis=-1), 0.0)
            f0 = brdf.base_reflectivity(surface.albedo, surface.metallic)
            ks = brdf.fresnel_schlick_roughness(n_dot_v, f0, surface.roughness)
            kd = (1.0 - ks) * (1.0 - surface.metallic[:, None])
            irr = jnp.maximum(
                ibl_mod.sh_irradiance_eval(env.sh_irradiance, n), 0.0
            )
            diffuse = irr * surface.albedo
            if spec_sample is not None:
                refl = spec_sample
            else:
                r = 2.0 * jnp.sum(n * v, axis=-1, keepdims=True) * n - v
                refl = ibl_mod.sample_specular(
                    env, r, surface.roughness, mode="nearest_mip"
                )
            env_brdf = ibl_mod.env_brdf_approx(n_dot_v, surface.roughness)
            specular = refl * (ks * env_brdf[:, 0:1] + env_brdf[:, 1:2])
            return (kd * diffuse + specular) * color[None, :] * surface.ao[:, None]

        def directional():
            ldir = scene.light_dir[li][None, :]
            shadow = (
                shadow_fn(li, gbuf, surface)
                if shadow_fn is not None
                else jnp.ones(n.shape[0])
            )
            return (
                brdf.calculate_light(
                    v,
                    jnp.broadcast_to(ldir, v.shape),
                    color[None, :],
                    jnp.ones(n.shape[0]),
                    surface.albedo,
                    n,
                    surface.metallic,
                    surface.roughness,
                )
                * shadow[:, None]
            )

        def point():
            delta = scene.light_pos[li][None, :] - gbuf.world_pos
            dist = jnp.linalg.norm(delta, axis=-1)
            ldir = delta / jnp.maximum(dist, 1e-12)[:, None]
            dist = jnp.maximum(dist, scene.light_inner_radius[li])
            att = brdf.point_attenuation(
                dist,
                scene.light_intensity[li],
                luminance_cutoff,
                scene.light_outer_radius[li],
            )
            # parity note: the reference feeds color*intensity AND an
            # intensity-scaled attenuation (forward.frag:461-487)
            return brdf.calculate_light(
                v, ldir, color[None, :], att,
                surface.albedo, n, surface.metallic, surface.roughness,
            )

        if env is not None:
            contrib = jnp.where(
                (kind == LIGHT_SKY)[..., None],
                sky(),
                jnp.where(
                    (kind == LIGHT_DIRECTIONAL)[..., None],
                    directional(),
                    point(),
                ),
            )
        else:
            contrib = jnp.where(
                (kind == LIGHT_DIRECTIONAL)[..., None], directional(), point()
            )
        if light_mask is not None:
            contrib = contrib * light_mask[:, li][:, None]
        light_sum = light_sum + contrib

    return light_sum
