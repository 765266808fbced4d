"""Environment-map radiance lookup and CDF importance sampling on device.

Equirect lookup with bilinear filtering and a soft luminance knee
(webgl.js:211-232), direction<->UV mapping (:235-240), and the two-level
(marginal row / conditional column) CDF importance sampler (:244-268,
910-983). The shader's per-sample binary search becomes a fixed-trip-count
vectorized bisection over the whole ray batch — log2(size) gathers instead
of a data-dependent loop, which is the TPU-friendly formulation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .rng import rand2
from .sampling import PI, TWO_PI

INV_4PI = np.float32(1.0 / (4.0 * math.pi))


@jax.tree_util.register_dataclass
@dataclass
class EnvBuffers:
    """Environment radiance + sampling CDFs as device arrays.

    radiance: f32[H,W,3]; marginal_cdf: f32[H+1];
    conditional_cdf: f32[H, W+1] (each row a CDF over columns).
    """
    radiance: jnp.ndarray
    marginal_cdf: jnp.ndarray
    conditional_cdf: jnp.ndarray
    width: int = field(metadata=dict(static=True), default=0)
    height: int = field(metadata=dict(static=True), default=0)


def dir_to_uv(d):
    u = jnp.arctan2(d[..., 2], d[..., 0]) / TWO_PI + 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / PI
    return u, v


def sample_env_radiance(env: EnvBuffers, direction, intensity, max_luminance):
    """Bilinear equirect lookup * intensity with the soft luminance clamp."""
    u, v = dir_to_uv(direction)
    h, w = env.height, env.width
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(x - jnp.floor(x), 0.0, 1.0)[..., None]
    fy = jnp.clip(y - jnp.floor(y), 0.0, 1.0)[..., None]

    img = env.radiance
    c00 = img[y0, x0]
    c10 = img[y0, x1]
    c01 = img[y1, x0]
    c11 = img[y1, x1]
    color = ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
             + (c01 * (1 - fx) + c11 * fx) * fy) * intensity

    lum = color[..., 0] * 0.2126 + color[..., 1] * 0.7152 + color[..., 2] * 0.0722
    excess = lum - max_luminance
    compressed = max_luminance + excess / (1.0 + excess / jnp.maximum(max_luminance, 1e-12))
    scale = jnp.where(
        (max_luminance > 0.0) & (lum > max_luminance),
        compressed / jnp.maximum(lum, 1e-12),
        1.0,
    )
    return color * scale[..., None]


def _bisect_cdf(gather, size: int, xi):
    """First index where cdf > xi, minus one; plus in-bucket interpolation.

    `gather(idx)` fetches cdf values at integer idx arrays. Matches the
    shader's binarySearchCdf (webgl.js:244-268). Returns (idx i32, f float).
    """
    lo = jnp.zeros_like(xi, jnp.int32)
    hi = jnp.full_like(lo, size - 1)
    for _ in range(max(1, math.ceil(math.log2(max(2, size))))):
        cont = lo < hi
        mid = (lo + hi) // 2
        val = gather(mid)
        go_right = cont & (val <= xi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(cont & ~go_right, mid, hi)
    idx = jnp.maximum(lo - 1, 0)
    c_lo = gather(idx)
    c_hi = gather(idx + 1)
    t = jnp.where(c_hi > c_lo, jnp.clip((xi - c_lo) / (c_hi - c_lo), 0.0, 1.0), 0.0)
    return idx, idx.astype(jnp.float32) + t


def sample_env_direction(env: EnvBuffers, state):
    """Importance-sample a direction ~ luminance*sin(theta).

    Returns (state, dir f32[...,3], pdf). Matches webgl.js:910-958 including
    the (idx+0.5)/size UV recovery and the solid-angle pdf conversion.
    """
    state, r1, r2 = rand2(state)
    h, w = env.height, env.width

    marg = env.marginal_cdf
    v_idx_raw, v_float = _bisect_cdf(lambda i: marg[i], h + 1, r1)
    v_idx = jnp.clip(v_idx_raw, 0, h - 1)
    v = (v_float + 0.5) / h

    cond = env.conditional_cdf
    u_idx_raw, u_float = _bisect_cdf(lambda i: cond[v_idx, i], w + 1, r2)
    u = (u_float + 0.5) / w

    theta = v * PI
    phi = u * TWO_PI - PI
    sin_t = jnp.sin(theta)
    direction = jnp.stack(
        [sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi)], axis=-1
    )

    marginal_pdf = marg[v_idx + 1] - marg[v_idx]
    u_bin = u_float.astype(jnp.int32)
    conditional_pdf = cond[v_idx, u_bin + 1] - cond[v_idx, u_bin]
    pdf_uv = marginal_pdf * h * conditional_pdf * w
    pdf = pdf_uv / (2.0 * PI * PI * jnp.maximum(sin_t, 1e-4))
    return state, direction, jnp.maximum(pdf, 1e-6)


def env_pdf(env: EnvBuffers, direction):
    """pdf of sampling `direction` from the env CDFs (webgl.js:961-983)."""
    u, v = dir_to_uv(direction)
    w, h = env.width, env.height
    u_idx = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    v_idx = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    marginal_pdf = env.marginal_cdf[v_idx + 1] - env.marginal_cdf[v_idx]
    conditional_pdf = env.conditional_cdf[v_idx, u_idx + 1] - env.conditional_cdf[v_idx, u_idx]
    pdf_uv = marginal_pdf * h * conditional_pdf * w
    theta = v * PI
    sin_t = jnp.maximum(jnp.sin(theta), 1e-4)
    return jnp.maximum(pdf_uv / (2.0 * PI * PI * sin_t), 1e-6)


# ---------------------------------------------------------------------------
# Component-form variants (see ops/vec3.py).

def dir_to_uv_v3(d):
    u = jnp.arctan2(d[2], d[0]) / TWO_PI + 0.5
    v = jnp.arccos(jnp.clip(d[1], -1.0, 1.0)) / PI
    return u, v


def sample_env_radiance_v3(env: EnvBuffers, d, intensity, max_luminance):
    """Bilinear equirect lookup; direction and color as component triples."""
    u, v = dir_to_uv_v3(d)
    h, w = env.height, env.width
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(x - jnp.floor(x), 0.0, 1.0)
    fy = jnp.clip(y - jnp.floor(y), 0.0, 1.0)

    flat = env.radiance.reshape(-1, 3)
    idx00 = y0 * w + x0
    idx10 = y0 * w + x1
    idx01 = y1 * w + x0
    idx11 = y1 * w + x1

    out = []
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    for c in range(3):
        ch = flat[:, c]
        val = (ch[idx00] * w00 + ch[idx10] * w10 + ch[idx01] * w01 + ch[idx11] * w11)
        out.append(val * intensity)

    lum = out[0] * 0.2126 + out[1] * 0.7152 + out[2] * 0.0722
    excess = lum - max_luminance
    compressed = max_luminance + excess / (1.0 + excess / jnp.maximum(max_luminance, 1e-12))
    scale = jnp.where((max_luminance > 0.0) & (lum > max_luminance),
                      compressed / jnp.maximum(lum, 1e-12), 1.0)
    return (out[0] * scale, out[1] * scale, out[2] * scale)


def sample_env_direction_v3(env: EnvBuffers, state):
    """Component-form importance sample: (state, dir triple, pdf)."""
    state, r1, r2 = rand2(state)
    h, w = env.height, env.width
    marg = env.marginal_cdf
    v_idx_raw, v_float = _bisect_cdf(lambda i: marg[i], h + 1, r1)
    v_idx = jnp.clip(v_idx_raw, 0, h - 1)
    v = (v_float + 0.5) / h
    cond = env.conditional_cdf
    u_idx_raw, u_float = _bisect_cdf(lambda i: cond[v_idx, i], w + 1, r2)
    u = (u_float + 0.5) / w

    theta = v * PI
    phi = u * TWO_PI - PI
    sin_t = jnp.sin(theta)
    d = (sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi))

    marginal_pdf = marg[v_idx + 1] - marg[v_idx]
    u_bin = u_float.astype(jnp.int32)
    conditional_pdf = cond[v_idx, u_bin + 1] - cond[v_idx, u_bin]
    pdf_uv = marginal_pdf * h * conditional_pdf * w
    pdf = pdf_uv / (2.0 * PI * PI * jnp.maximum(sin_t, 1e-4))
    return state, d, jnp.maximum(pdf, 1e-6)


def env_pdf_v3(env: EnvBuffers, d):
    u, v = dir_to_uv_v3(d)
    w, h = env.width, env.height
    u_idx = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    v_idx = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    marginal_pdf = env.marginal_cdf[v_idx + 1] - env.marginal_cdf[v_idx]
    conditional_pdf = env.conditional_cdf[v_idx, u_idx + 1] - env.conditional_cdf[v_idx, u_idx]
    pdf_uv = marginal_pdf * h * conditional_pdf * w
    theta = v * PI
    sin_t = jnp.maximum(jnp.sin(theta), 1e-4)
    return jnp.maximum(pdf_uv / (2.0 * PI * PI * sin_t), 1e-6)
