"""Environment importance-sampling CDF construction.

Equivalent of buildEnvSamplingData (hdr.js:133-194): per-pixel weight is
luminance * sin(theta); a marginal CDF over rows (size H+1) and per-row
conditional CDFs over columns (H x (W+1)). On TPU this is two prefix sums —
jitted jnp.cumsum — instead of a scalar double loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.envmap import EnvBuffers


@jax.jit
def _build_cdfs(radiance):
    h, w = radiance.shape[0], radiance.shape[1]
    theta = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * jnp.pi
    sin_theta = jnp.sin(theta)
    lum = (
        radiance[..., 0] * 0.2126
        + radiance[..., 1] * 0.7152
        + radiance[..., 2] * 0.0722
    ) * sin_theta[:, None]

    row_sums = jnp.sum(lum, axis=1)
    total = jnp.sum(row_sums)

    marginal = jnp.concatenate([
        jnp.zeros((1,), jnp.float32),
        jnp.cumsum(row_sums / jnp.maximum(total, 1e-20)),
    ])
    marginal = marginal.at[-1].set(1.0)

    safe_rows = jnp.where(row_sums > 0, row_sums, 1.0)
    cond = jnp.concatenate([
        jnp.zeros((h, 1), jnp.float32),
        jnp.cumsum(lum / safe_rows[:, None], axis=1),
    ], axis=1)
    cond = cond.at[:, -1].set(1.0)
    return marginal, cond, total


def build_env_sampling(radiance: np.ndarray):
    """radiance f32[H,W,3] (or [H,W,4], alpha dropped) ->
    (marginal f32[H+1], conditional f32[H,W+1], total_luminance)."""
    radiance = jnp.asarray(radiance, jnp.float32)
    if radiance.shape[-1] == 4:
        radiance = radiance[..., :3]
    marginal, cond, total = _build_cdfs(radiance)
    return marginal, cond, float(total)


def make_env_buffers(radiance: np.ndarray, device=None) -> EnvBuffers:
    """Full environment compile: image + CDFs as device arrays."""
    radiance = np.asarray(radiance, np.float32)
    if radiance.shape[-1] == 4:
        radiance = radiance[..., :3]
    h, w = radiance.shape[:2]
    marginal, cond, _ = build_env_sampling(radiance)
    return EnvBuffers(
        radiance=jax.device_put(jnp.asarray(radiance), device),
        marginal_cdf=jax.device_put(marginal, device),
        conditional_cdf=jax.device_put(cond, device),
        width=w,
        height=h,
    )


def constant_env(value=1.0, width: int = 16, height: int = 8, device=None) -> EnvBuffers:
    """Uniform environment (useful for furnace tests and as the 'white'
    fallback env the reference ships as a 1x1 HDR)."""
    img = np.full((height, width, 3), value, np.float32)
    return make_env_buffers(img, device)
