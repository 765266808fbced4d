"""Branchless ray/primitive intersectors (elementwise over any batch shape).

Same math as the reference GLSL intersectors (webgl.js:270-541) and the CPU
oracle (scene/pick.py), expressed as mask/select arithmetic so the whole ray
batch evaluates on the VPU with no per-lane control flow. All functions
broadcast: pass [B] rays against [B] primitive rows (gathered per ray), or
[B,1] rays against [1,N] primitives for dense sweeps.

Misses are reported as t = -1.0 (matching the shader's sentinel), so callers
combine with `(t > t_min) & (t < closest)`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

BIG = np.float32(1e20)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def intersect_aabb(bmin, bmax, origin, direction, t_max):
    """Slab test: does the ray hit the box before t_max? (webgl.js:270-314).

    Parallel-axis handling matches the shader: |d| < 1e-8 passes the axis
    only when the origin lies inside the slab.
    """
    parallel = jnp.abs(direction) < 1e-8
    safe_dir = jnp.where(parallel, 1.0, direction)
    inv = 1.0 / safe_dir
    t1 = (bmin - origin) * inv
    t2 = (bmax - origin) * inv
    t_near = jnp.where(parallel, -BIG, jnp.minimum(t1, t2))
    t_far = jnp.where(parallel, BIG, jnp.maximum(t1, t2))
    inside = (origin >= bmin) & (origin <= bmax)
    axis_ok = ~parallel | inside
    tmin = jnp.maximum(jnp.max(t_near, axis=-1), 0.0)
    tmax = jnp.minimum(jnp.min(t_far, axis=-1), t_max)
    return jnp.all(axis_ok, axis=-1) & (tmax >= tmin)


def intersect_aabb_range(bmin, bmax, origin, direction):
    """(hit, t_near, t_far) over an unbounded range (webgl.js:316-362)."""
    parallel = jnp.abs(direction) < 1e-8
    safe_dir = jnp.where(parallel, 1.0, direction)
    inv = 1.0 / safe_dir
    t1 = (bmin - origin) * inv
    t2 = (bmax - origin) * inv
    t_near_ax = jnp.where(parallel, -BIG, jnp.minimum(t1, t2))
    t_far_ax = jnp.where(parallel, BIG, jnp.maximum(t1, t2))
    inside = (origin >= bmin) & (origin <= bmax)
    axis_ok = ~parallel | inside
    t_near = jnp.max(t_near_ax, axis=-1)
    t_far = jnp.min(t_far_ax, axis=-1)
    hit = jnp.all(axis_ok, axis=-1) & (t_far >= jnp.maximum(t_near, 0.0))
    return hit, t_near, t_far


def intersect_sphere(origin, direction, center, radius, t_min):
    """Nearest valid sphere hit t, or -1 (webgl.js:425-442)."""
    oc = origin - center
    b = _dot(oc, direction)
    c = _dot(oc, oc) - radius * radius
    disc = b * b - c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > t_min, t0, t1)
    return jnp.where(ok & (t > t_min), t, -1.0)


def intersect_cylinder(origin, direction, p1, p2, radius, t_min):
    """(t, hit_type) for a finite cylinder with hemispherical caps
    (webgl.js:446-523). hit_type: 0 side, 1 cap@p1, 2 cap@p2."""
    axis_raw = p2 - p1
    height = jnp.sqrt(_dot(axis_raw, axis_raw))
    degen = height < 1e-6
    safe_h = jnp.where(degen, 1.0, height)
    axis = axis_raw / safe_h[..., None]

    oc = origin - p1
    dir_dot = _dot(direction, axis)
    oc_dot = _dot(oc, axis)
    dir_perp = direction - axis * dir_dot[..., None]
    oc_perp = oc - axis * oc_dot[..., None]

    a = _dot(dir_perp, dir_perp)
    b = 2.0 * _dot(dir_perp, oc_perp)
    c = _dot(oc_perp, oc_perp) - radius * radius

    disc = b * b - 4.0 * a * c
    body_ok = (a > 1e-8) & (disc >= 0.0)
    sq = jnp.sqrt(jnp.where(body_ok, disc, 0.0))
    denom = jnp.where(body_ok, 2.0 * a, 1.0)
    t1 = (-b - sq) / denom
    t2 = (-b + sq) / denom
    h1 = oc_dot + t1 * dir_dot
    h2 = oc_dot + t2 * dir_dot
    t1_ok = body_ok & (t1 > t_min) & (h1 >= 0.0) & (h1 <= height)
    t2_ok = body_ok & ~t1_ok & (t2 > t_min) & (h2 >= 0.0) & (h2 <= height)
    best = jnp.where(t1_ok, t1, jnp.where(t2_ok, t2, -1.0))
    hit_type = jnp.zeros_like(best)

    for cap_code, cap_p, sign in ((1.0, p1, -1.0), (2.0, p2, 1.0)):
        tc = intersect_sphere(origin, direction, cap_p, radius, t_min)
        pos = origin + direction * tc[..., None]
        h = _dot(pos - cap_p, axis)
        better = (tc > t_min) & ((best < 0.0) | (tc < best)) & ((h * sign) >= 0.0)
        best = jnp.where(better, tc, best)
        hit_type = jnp.where(better, cap_code, hit_type)

    t_sph = intersect_sphere(origin, direction, p1, radius, t_min)
    best = jnp.where(degen, t_sph, best)
    hit_type = jnp.where(degen, 0.0, hit_type)
    return best, hit_type


def intersect_triangle(origin, direction, v0, v1, v2, t_min):
    """Moller-Trumbore: (t, u, v) with t = -1 on miss (webgl.js:364-392).

    Clip-plane rejection is applied by the caller (it needs scene state).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(direction, e2)
    det = _dot(e1, p)
    ok = jnp.abs(det) >= 1e-6
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tvec = origin - v0
    u = _dot(tvec, p) * inv
    q = jnp.cross(tvec, e1)
    v = _dot(direction, q) * inv
    t = _dot(e2, q) * inv
    ok &= (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > t_min)
    return jnp.where(ok, t, -1.0), u, v


def cylinder_normal(pos, p1, p2, hit_type):
    """Normal at a cylinder hit (webgl.js:527-541), vectorized."""
    axis_raw = p2 - p1
    n_axis = jnp.sqrt(_dot(axis_raw, axis_raw))
    axis = axis_raw / jnp.maximum(n_axis, 1e-12)[..., None]
    h = _dot(pos - p1, axis)
    side_n = pos - (p1 + axis * h[..., None])
    n = jnp.where(
        (hit_type == 1.0)[..., None], pos - p1,
        jnp.where((hit_type == 2.0)[..., None], pos - p2, side_n),
    )
    return n / jnp.maximum(jnp.sqrt(_dot(n, n)), 1e-12)[..., None]


def clip_reject(origin, direction, t, clip_normal, clip_offset, clip_side):
    """True where a hit at t violates the clip plane (webgl.js:384-390):
    reject when (n . hitPos - offset) * side > 0."""
    pos = origin + direction * t[..., None]
    s = _dot(pos, clip_normal) - clip_offset
    return s * clip_side > 0.0
