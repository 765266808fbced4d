"""Display transform: linear / ACES / Reinhard tone mapping
(webgl.js:1574-1597), as a jitted elementwise kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

TONE_MAP_MODES = {"linear": 0, "aces": 1, "reinhard": 2}


def tonemap_reinhard(c):
    return c / (1.0 + c)


def tonemap_aces(x):
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def apply_tonemap(color, mode):
    """mode: 0 linear, 1 ACES, 2 Reinhard (static int or string)."""
    if isinstance(mode, str):
        mode = TONE_MAP_MODES[mode]
    if mode == 1:
        return tonemap_aces(color)
    if mode == 2:
        return tonemap_reinhard(color)
    return color


def to_srgb_u8(color):
    """Linear [0,1] -> 8-bit (display framebuffer convention: the reference
    writes linear values to an sRGB-unaware canvas, so this is a plain
    quantization, no gamma)."""
    return jnp.clip(jnp.round(color * 255.0), 0, 255).astype(jnp.uint8)
