"""Physically based BRDF terms matching the reference shading model
(webgl.js:175-209, 1056-1092, 1155-1171): GGX specular with Schlick Fresnel
and Smith geometry, Lambert or Oren-Nayar diffuse with optional wrap
lighting, refraction, and the combined spec/diffuse sampling pdf used for
MIS. All elementwise.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PI = np.float32(np.pi)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def luminance(c):
    return c[..., 0] * 0.2126 + c[..., 1] * 0.7152 + c[..., 2] * 0.0722


def max_component(v):
    return jnp.max(v, axis=-1)


def wrap_ndotl(ndotl, wrap):
    return jnp.clip((ndotl + wrap) / (1.0 + wrap), 0.0, 1.0)


def oren_nayar_diffuse(n, v, l, base_color, sigma):
    """Oren-Nayar rough diffuse (webgl.js:175-198)."""
    ndl = jnp.maximum(_dot(n, l), 0.0)
    ndv = jnp.maximum(_dot(n, v), 0.0)
    sigma2 = sigma * sigma
    a = 1.0 - 0.5 * (sigma2 / (sigma2 + 0.33))
    b = 0.45 * (sigma2 / (sigma2 + 0.09))

    sin_l = jnp.sqrt(jnp.maximum(0.0, 1.0 - ndl * ndl))
    sin_v = jnp.sqrt(jnp.maximum(0.0, 1.0 - ndv * ndv))
    tan_l = sin_l / jnp.maximum(ndl, 1e-4)
    tan_v = sin_v / jnp.maximum(ndv, 1e-4)
    sin_alpha = jnp.maximum(sin_l, sin_v)
    tan_beta = jnp.minimum(tan_l, tan_v)

    def _norm(x):
        return x / jnp.maximum(jnp.sqrt(_dot(x, x)), 1e-12)[..., None]

    lp = _norm(l - n * ndl[..., None])
    vp = _norm(v - n * ndv[..., None])
    cos_phi = jnp.maximum(0.0, _dot(lp, vp))

    oren = a + b * cos_phi * sin_alpha * tan_beta
    res = base_color * (oren / PI)[..., None]
    lit = (ndl > 0.0) & (ndv > 0.0)
    return jnp.where(lit[..., None], res, 0.0)


def eval_diffuse_brdf(n, v, l, base_color, diff_rough, wrap):
    """Lambert or Oren-Nayar + wrap-lighting scale (webgl.js:200-209)."""
    lam = base_color / PI
    on = oren_nayar_diffuse(n, v, l, base_color, diff_rough)
    brdf = jnp.where(jnp.asarray(diff_rough > 1e-4)[..., None], on, lam)
    ndl = jnp.maximum(_dot(n, l), 0.0)
    scale = jnp.where(ndl > 1e-4, wrap_ndotl(ndl, wrap) / jnp.maximum(ndl, 1e-4), 0.0)
    scale = jnp.where(jnp.asarray(wrap > 0.0), scale, 1.0)
    return brdf * scale[..., None]


def fresnel_schlick(cos_theta, f0):
    """Schlick Fresnel; f0 may be scalar or [...,3] (webgl.js:1056-1062)."""
    w = jnp.power(jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0)
    if jnp.ndim(f0) > jnp.ndim(cos_theta):
        w = w[..., None]
    return f0 + (1.0 - f0) * w


def refract_dir(incident, normal, eta):
    """(can_refract, refracted) (webgl.js:1064-1073)."""
    cosi = jnp.clip(_dot(-incident, normal), 0.0, 1.0)
    sin2 = eta * eta * (1.0 - cosi * cosi)
    can = sin2 <= 1.0
    cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2))
    t = eta[..., None] * incident + (eta * cosi - cost)[..., None] * normal
    return can, t


def distribution_ggx(ndoth, roughness):
    a = roughness * roughness
    a2 = a * a
    denom = (ndoth * ndoth) * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom + 1e-6)


def geometry_schlick_ggx(ndotv, roughness):
    r = roughness + 1.0
    k = (r * r) / 8.0
    return ndotv / (ndotv * (1.0 - k) + k + 0.0001)


def geometry_smith(ndotv, ndotl, roughness):
    return geometry_schlick_ggx(ndotv, roughness) * geometry_schlick_ggx(ndotl, roughness)


def brdf_pdf(n, v, l, roughness, spec_prob):
    """Combined GGX + cosine pdf of sampling l (webgl.js:1155-1171)."""
    ndl = jnp.maximum(_dot(n, l), 0.0)
    diff_pdf = ndl / PI
    h = (v + l)
    h = h / jnp.maximum(jnp.sqrt(_dot(h, h)), 1e-12)[..., None]
    ndoth = jnp.maximum(_dot(n, h), 0.001)
    vdoth = jnp.maximum(_dot(v, h), 0.001)
    d = distribution_ggx(ndoth, roughness)
    spec_pdf = d * ndoth / (4.0 * vdoth)
    pdf = spec_prob * spec_pdf + (1.0 - spec_prob) * diff_pdf
    return jnp.where(ndl > 0.0, pdf, 0.0)


def spec_probability(f0, base_color, metallic):
    """Spec-vs-diffuse lobe selection probability (webgl.js:1133-1136)."""
    spec_w = max_component(f0)
    diff_w = (1.0 - metallic) * max_component(base_color)
    s = spec_w + diff_w
    return jnp.where(s > 0.0, spec_w / jnp.maximum(s, 1e-12), 0.5)


# ---------------------------------------------------------------------------
# Component-form variants (see ops/vec3.py). Scalar GGX terms above are
# already component-friendly; only the vector-valued pieces need twins.

from . import vec3 as V  # noqa: E402


def oren_nayar_diffuse_v3(n, v, l, base_color, sigma):
    ndl = jnp.maximum(V.dot(n, l), 0.0)
    ndv = jnp.maximum(V.dot(n, v), 0.0)
    sigma2 = sigma * sigma
    a = 1.0 - 0.5 * (sigma2 / (sigma2 + 0.33))
    b = 0.45 * (sigma2 / (sigma2 + 0.09))
    sin_l = jnp.sqrt(jnp.maximum(0.0, 1.0 - ndl * ndl))
    sin_v = jnp.sqrt(jnp.maximum(0.0, 1.0 - ndv * ndv))
    tan_l = sin_l / jnp.maximum(ndl, 1e-4)
    tan_v = sin_v / jnp.maximum(ndv, 1e-4)
    sin_alpha = jnp.maximum(sin_l, sin_v)
    tan_beta = jnp.minimum(tan_l, tan_v)
    lp = V.normalize(V.sub(l, V.scale(n, ndl)))
    vp = V.normalize(V.sub(v, V.scale(n, ndv)))
    cos_phi = jnp.maximum(0.0, V.dot(lp, vp))
    oren = (a + b * cos_phi * sin_alpha * tan_beta) / PI
    lit = (ndl > 0.0) & (ndv > 0.0)
    w = jnp.where(lit, oren, 0.0)
    return V.scale(base_color, w)


def eval_diffuse_brdf_v3(n, v, l, base_color, diff_rough, wrap):
    lam = V.scale(base_color, 1.0 / PI)
    on = oren_nayar_diffuse_v3(n, v, l, base_color, diff_rough)
    brdf = V.where(jnp.asarray(diff_rough > 1e-4), on, lam)
    ndl = jnp.maximum(V.dot(n, l), 0.0)
    scale = jnp.where(ndl > 1e-4, wrap_ndotl(ndl, wrap) / jnp.maximum(ndl, 1e-4), 0.0)
    scale = jnp.where(jnp.asarray(wrap > 0.0), scale, 1.0)
    return V.scale(brdf, scale)


def fresnel_schlick_v3(cos_theta, f0):
    """f0 is a component triple; returns a triple."""
    w = jnp.power(jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0)
    return (f0[0] + (1.0 - f0[0]) * w,
            f0[1] + (1.0 - f0[1]) * w,
            f0[2] + (1.0 - f0[2]) * w)


def refract_dir_v3(incident, normal, eta):
    cosi = jnp.clip(-V.dot(incident, normal), 0.0, 1.0)
    sin2 = eta * eta * (1.0 - cosi * cosi)
    can = sin2 <= 1.0
    cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2))
    k = eta * cosi - cost
    return can, (eta * incident[0] + k * normal[0],
                 eta * incident[1] + k * normal[1],
                 eta * incident[2] + k * normal[2])


def brdf_pdf_v3(n, v, l, roughness, spec_prob):
    ndl = jnp.maximum(V.dot(n, l), 0.0)
    diff_pdf = ndl / PI
    h = V.normalize(V.add(v, l))
    ndoth = jnp.maximum(V.dot(n, h), 0.001)
    vdoth = jnp.maximum(V.dot(v, h), 0.001)
    d = distribution_ggx(ndoth, roughness)
    spec_pdf = d * ndoth / (4.0 * vdoth)
    pdf = spec_prob * spec_pdf + (1.0 - spec_prob) * diff_pdf
    return jnp.where(ndl > 0.0, pdf, 0.0)


def spec_probability_v3(f0, base_color, metallic):
    spec_w = V.max_component(f0)
    diff_w = (1.0 - metallic) * V.max_component(base_color)
    s = spec_w + diff_w
    return jnp.where(s > 0.0, spec_w / jnp.maximum(s, 1e-12), 0.5)
