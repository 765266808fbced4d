"""Monte-Carlo direction sampling, in the same distributions and basis
conventions as the reference shader (webgl.js:902-1054).

Every sampler threads the uint32 PCG state through and returns it, keeping
draw order identical to the GLSL so low-spp outputs stay statistically
comparable. The local->world frame uses the same 'up' convention:
up = (0,0,1) unless |axis.z| >= 0.999, else (1,0,0).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .rng import rand, rand2

PI = np.float32(np.pi)
TWO_PI = np.float32(2.0 * np.pi)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize(v, eps=1e-12):
    return v / jnp.maximum(jnp.sqrt(_dot(v, v)), eps)[..., None]


def onb(axis):
    """Orthonormal (tangent, bitangent) around axis (webgl.js:992-994)."""
    use_z = jnp.abs(axis[..., 2]) < 0.999
    up = jnp.where(use_z[..., None],
                   jnp.array([0.0, 0.0, 1.0], axis.dtype),
                   jnp.array([1.0, 0.0, 0.0], axis.dtype))
    tangent = normalize(jnp.cross(up, axis))
    bitangent = jnp.cross(axis, tangent)
    return tangent, bitangent


def to_world(axis, local):
    t, b = onb(axis)
    return normalize(
        t * local[..., 0:1] + b * local[..., 1:2] + axis * local[..., 2:3]
    )


def disk_from_uv(r1, r2):
    r = jnp.sqrt(r1)
    phi = TWO_PI * r2
    return jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=-1) * r[..., None]


def sample_disk(state):
    """Uniform unit disk (webgl.js:902-906): (state, xy[...,2])."""
    state, r1, r2 = rand2(state)
    return state, disk_from_uv(r1, r2)


def cosine_hemisphere_from_uv(normal, r1, r2):
    phi = TWO_PI * r1
    cos_t = jnp.sqrt(1.0 - r2)
    sin_t = jnp.sqrt(r2)
    local = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)
    return to_world(normal, local)


def cosine_sample_hemisphere(normal, state):
    """Cosine-weighted hemisphere about normal (webgl.js:985-996)."""
    state, r1, r2 = rand2(state)
    return state, cosine_hemisphere_from_uv(normal, r1, r2)


def cone_from_uv(axis, angle, r1, r2):
    cos_max = jnp.cos(angle)
    cos_t = cos_max + (1.0 - cos_max) * r1
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = TWO_PI * r2
    local = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)
    solid = jnp.maximum(TWO_PI * (1.0 - cos_max), 1e-6)
    return to_world(axis, local), 1.0 / solid


def sample_cone(axis, angle, state):
    """Uniform cone of half-angle `angle` about axis (webgl.js:998-1012).
    Returns (state, dir, pdf = 1/solid angle)."""
    state, r1, r2 = rand2(state)
    d, pdf = cone_from_uv(axis, angle, r1, r2)
    return state, d, pdf


def ggx_half_vector_from_uv(normal, roughness, r1, r2):
    a = roughness * roughness
    a2 = a * a
    phi = TWO_PI * r1
    cos_t = jnp.sqrt((1.0 - r2) / (1.0 + (a2 - 1.0) * r2))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    local = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)
    return to_world(normal, local)


def sample_ggx_half_vector(normal, roughness, state):
    """GGX NDF half-vector sample (webgl.js:1041-1054)."""
    state, r1, r2 = rand2(state)
    return state, ggx_half_vector_from_uv(normal, roughness, r1, r2)


def reflect(d, n):
    return d - 2.0 * _dot(d, n)[..., None] * n


def reflect_from_uv(direction, normal, roughness, r1, r2):
    r = reflect(direction, normal)
    phi = TWO_PI * r1
    cos_t = jnp.power(1.0 - r2, 1.0 / (roughness * 4.0 + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    local = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)
    blurred = to_world(normalize(r), local)
    smooth = jnp.asarray(roughness <= 0.02)
    return jnp.where(smooth[..., None], normalize(r), blurred)


def reflect_sample(direction, normal, roughness, state):
    """Mirror reflection blurred by a roughness-driven lobe
    (webgl.js:1014-1029). Always consumes 2 draws; the smooth case ignores
    them (vectorized lanes share the stream)."""
    state, r1, r2 = rand2(state)
    return state, reflect_from_uv(direction, normal, roughness, r1, r2)


def around_direction_from_uv(axis, roughness, r1, r2):
    a = normalize(axis)
    cone_angle = jnp.clip(roughness * roughness * 0.75, 0.0, 1.2)
    d, _ = cone_from_uv(a, cone_angle, r1, r2)
    smooth = jnp.asarray(roughness <= 0.02)
    return jnp.where(smooth[..., None], a, d)


def sample_around_direction(axis, roughness, state):
    """Cone blur around a direction (webgl.js:1031-1039); 2 draws always."""
    state, r1, r2 = rand2(state)
    return state, around_direction_from_uv(axis, roughness, r1, r2)


def uniform_sphere(state):
    """Uniform direction on the sphere; pdf 1/4pi (webgl.js:913-919)."""
    state, r1, r2 = rand2(state)
    phi = TWO_PI * r1
    cos_t = 1.0 - 2.0 * r2
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    d = jnp.stack([jnp.cos(phi) * sin_t, cos_t, jnp.sin(phi) * sin_t], axis=-1)
    return state, d


def power_heuristic(pdf_a, pdf_b):
    """MIS power heuristic, beta = 2 (webgl.js:1148-1152)."""
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    return a2 / jnp.maximum(a2 + b2, 1e-8)


# ---------------------------------------------------------------------------
# Component-form (vec3-as-[B]-triples) variants — the integrator-hot path.
# Same math as the array forms above; see ops/vec3.py for why.

from . import vec3 as V  # noqa: E402


def onb_v3(axis):
    use_z = jnp.abs(axis[2]) < 0.999
    upx = jnp.where(use_z, 0.0, 1.0)
    upz = jnp.where(use_z, 1.0, 0.0)
    up = (upx, jnp.zeros_like(upx), upz)
    tangent = V.normalize(V.cross(up, axis))
    bitangent = V.cross(axis, tangent)
    return tangent, bitangent


def to_world_v3(axis, lx, ly, lz):
    t, b = onb_v3(axis)
    return V.normalize((
        t[0] * lx + b[0] * ly + axis[0] * lz,
        t[1] * lx + b[1] * ly + axis[1] * lz,
        t[2] * lx + b[2] * ly + axis[2] * lz,
    ))


def cosine_hemisphere_from_uv_v3(normal, r1, r2):
    phi = TWO_PI * r1
    cos_t = jnp.sqrt(1.0 - r2)
    sin_t = jnp.sqrt(r2)
    return to_world_v3(normal, jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t)


def cone_from_uv_v3(axis, angle, r1, r2):
    cos_max = jnp.cos(angle)
    cos_t = cos_max + (1.0 - cos_max) * r1
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = TWO_PI * r2
    d = to_world_v3(axis, jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t)
    solid = jnp.maximum(TWO_PI * (1.0 - cos_max), 1e-6)
    return d, 1.0 / solid


def ggx_half_vector_from_uv_v3(normal, roughness, r1, r2):
    a = roughness * roughness
    a2 = a * a
    phi = TWO_PI * r1
    cos_t = jnp.sqrt((1.0 - r2) / (1.0 + (a2 - 1.0) * r2))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    return to_world_v3(normal, jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t)


def reflect_from_uv_v3(direction, normal, roughness, r1, r2):
    r = V.reflect(direction, normal)
    phi = TWO_PI * r1
    cos_t = jnp.power(1.0 - r2, 1.0 / (roughness * 4.0 + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    blurred = to_world_v3(V.normalize(r), jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t)
    smooth = jnp.asarray(roughness <= 0.02)
    return V.where(smooth, V.normalize(r), blurred)


def around_direction_from_uv_v3(axis, roughness, r1, r2):
    a = V.normalize(axis)
    cone_angle = jnp.clip(roughness * roughness * 0.75, 0.0, 1.2)
    d, _ = cone_from_uv_v3(a, cone_angle, r1, r2)
    smooth = jnp.asarray(roughness <= 0.02)
    return V.where(smooth, a, d)
