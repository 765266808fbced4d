"""Emission/absorption volume ray marching on device.

Equivalent of the shader's in-loop volume march (webgl.js:1191-1221) and the
trilinear 3D texture sample (:417-421): marches the volume AABB clipped to
the nearest surface hit, accumulating emission with per-step alpha
1 - exp(-density * sigma * dt), with early termination folded into the
masked arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from .intersect import intersect_aabb_range


@jax.tree_util.register_dataclass
@dataclass
class VolumeBuffers:
    """Density grid + bounds. data: f32[nz,ny,nx] (x fastest, matching the
    reference's x + y*nx + z*nx*ny layout, volume.js:106-145)."""
    data: jnp.ndarray
    vmin: jnp.ndarray        # f32[3]
    vmax: jnp.ndarray        # f32[3]
    max_value: jnp.ndarray   # f32 scalar
    nx: int = field(metadata=dict(static=True), default=1)
    ny: int = field(metadata=dict(static=True), default=1)
    nz: int = field(metadata=dict(static=True), default=1)


def sample_volume_trilinear(vol: VolumeBuffers, pos):
    """Normalized-coordinate trilinear lookup with edge clamping, matching
    GL LINEAR/CLAMP_TO_EDGE sampling of a 3D R32F texture."""
    inv_size = 1.0 / jnp.maximum(vol.vmax - vol.vmin, 1e-12)
    uvw = jnp.clip((pos - vol.vmin) * inv_size, 0.0, 1.0)
    dims = jnp.array([vol.nx, vol.ny, vol.nz], jnp.float32)
    # Texel-space coordinates: uvw * N - 0.5, clamped (edge clamp).
    xyz = uvw * dims - 0.5
    i0 = jnp.clip(jnp.floor(xyz).astype(jnp.int32), 0, jnp.array([vol.nx - 1, vol.ny - 1, vol.nz - 1]))
    i1 = jnp.clip(i0 + 1, 0, jnp.array([vol.nx - 1, vol.ny - 1, vol.nz - 1]))
    f = jnp.clip(xyz - jnp.floor(xyz), 0.0, 1.0)

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    d = vol.data
    c000 = d[z0, y0, x0]
    c100 = d[z0, y0, x1]
    c010 = d[z0, y1, x0]
    c110 = d[z0, y1, x1]
    c001 = d[z1, y0, x0]
    c101 = d[z1, y0, x1]
    c011 = d[z1, y1, x0]
    c111 = d[z1, y1, x1]

    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def march_volume(
    vol: VolumeBuffers,
    origin,
    direction,
    t_surface,
    t_min,
    color,
    density_scale,
    opacity,
    step_size,
    threshold,
    throughput,
    active,
    max_steps: int,
):
    """March the volume segment [max(enter, t_min), min(exit, t_surface)].

    Returns (added_radiance f32[...,3], new_throughput f32[...,3]).
    Follows webgl.js:1191-1221: density normalized by maxValue, thresholded,
    alpha = clamp((1-exp(-d*sigma*dt)) * opacity), emission = color*alpha,
    throughput *= (1-alpha), terminate when throughput < 1e-3.
    """
    hit_box, t_enter, t_exit = intersect_aabb_range(vol.vmin, vol.vmax, origin, direction)
    t_enter = jnp.maximum(t_enter, t_min)
    t_exit = jnp.minimum(t_exit, t_surface)
    run = active & hit_box & (t_exit > t_enter) & (step_size > 0.0)

    inv_max = 1.0 / jnp.maximum(vol.max_value, 1e-6)

    def body(i, carry):
        radiance, tp, alive = carry
        t_cur = t_enter + i.astype(jnp.float32) * step_size
        inside = alive & (t_cur <= t_exit)
        dt = jnp.minimum(step_size, t_exit - t_cur)
        pos = origin + direction * t_cur[..., None]
        density = sample_volume_trilinear(vol, pos) * inv_max
        density = jnp.maximum(0.0, density - threshold)
        alpha = 1.0 - jnp.exp(-density * density_scale * dt)
        alpha = jnp.clip(alpha * opacity, 0.0, 1.0)
        alpha = jnp.where(inside & (density > 0.0), alpha, 0.0)
        radiance = radiance + tp * color * alpha[..., None]
        tp = tp * (1.0 - alpha[..., None])
        dead = jnp.max(tp, axis=-1) < 1e-3
        tp = jnp.where((inside & dead)[..., None], 0.0, tp)
        alive = alive & ~dead & (t_cur + step_size <= t_exit)
        return radiance, tp, alive

    zero = jnp.zeros(origin.shape[:-1] + (3,), jnp.float32)
    radiance, tp, _ = jax.lax.fori_loop(0, max_steps, body, (zero, throughput, run))
    tp = jnp.where(run[..., None], tp, throughput)
    return radiance, tp
