"""PBR BRDF terms and the direct-light evaluator.

Parity: shaders/include/functions.glsl:82-106 (GGX / Smith-Schlick /
Fresnel), forward.frag calculate_light (Cook-Torrance with kD energy split),
cluster_common.glsl:26-29 (point-light attenuation with luminance cutoff).
All fully vectorized over pixels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PI = np.pi
EPSILON = 1e-5


def distribution_ggx(n_dot_h, roughness):
    a = roughness * roughness
    a2 = a * a
    denom = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    denom = PI * denom * denom
    return a2 / jnp.maximum(denom, EPSILON)


def geometry_smith(n_dot_v, n_dot_l, roughness):
    r = roughness + 1.0
    k = (r * r) / 8.0
    ggx1 = n_dot_v / (n_dot_v * (1.0 - k) + k)
    ggx2 = n_dot_l / (n_dot_l * (1.0 - k) + k)
    return ggx1 * ggx2


def fresnel_schlick(h_dot_v, f0):
    return f0 + (1.0 - f0) * (1.0 - h_dot_v)[..., None] ** 5


def fresnel_schlick_roughness(cos_theta, f0, roughness):
    fmax = jnp.maximum((1.0 - roughness)[..., None], f0)
    return f0 + (fmax - f0) * jnp.clip(1.0 - cos_theta, 0.0, 1.0)[..., None] ** 5


def base_reflectivity(albedo, metallic):
    return 0.04 * (1.0 - metallic[..., None]) + albedo * metallic[..., None]


def calculate_light(
    view_dir, light_dir, light_color, attenuation, albedo, normal,
    metallic, roughness,
):
    """Cook-Torrance direct lighting (forward.frag calculate_light).

    All args [...,3] or [...]; returns [...,3] radiance.
    """
    h = view_dir + light_dir
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)

    radiance = light_color * attenuation[..., None]

    n_dot_v = jnp.maximum(jnp.sum(normal * view_dir, axis=-1), EPSILON)
    n_dot_l = jnp.maximum(jnp.sum(normal * light_dir, axis=-1), EPSILON)
    n_dot_h = jnp.maximum(jnp.sum(normal * h, axis=-1), 0.0)
    h_dot_v = jnp.maximum(jnp.sum(h * view_dir, axis=-1), 0.0)

    d = distribution_ggx(n_dot_h, roughness)
    g = geometry_smith(n_dot_v, n_dot_l, roughness)
    f = fresnel_schlick(h_dot_v, base_reflectivity(albedo, metallic))

    specular = (d * g)[..., None] * f / (4.0 * n_dot_v * n_dot_l)[..., None]
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    return (kd * albedo / PI + specular) * radiance * n_dot_l[..., None]


def point_attenuation(dist, intensity, luminance_cutoff, outer_radius):
    """cluster_common.glsl:26-29."""
    d2 = dist * dist
    return jnp.maximum(
        intensity / d2 - luminance_cutoff * d2 / (outer_radius * outer_radius),
        0.0,
    )
