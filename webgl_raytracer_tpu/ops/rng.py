"""Counter-free PCG-style RNG, bit-exact with the reference shader stream.

The reference seeds per pixel as pcg(x + y*65536 + frame*15485863) and draws
via a PCG output permutation (webgl.js:883-900). Reproducing the exact
uint32 stream lets low-level sampling tests compare against hand-computed
values and keeps progressive frames decorrelated the same way.

All functions are elementwise over arbitrary-shape uint32 state arrays, so a
whole ray batch advances its RNG in one VPU op — no sequential dependency
across rays, only across draws within a ray.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_MUL = np.uint32(747796405)
_INC = np.uint32(2891336453)
_OUT = np.uint32(277803737)
_INV_U32_MAX = 1.0 / 4294967295.0


def pcg_hash(v):
    """One PCG hash round: uint32 -> uint32 (webgl.js:883-887)."""
    v = jnp.asarray(v, jnp.uint32)
    state = v * _MUL + _INC
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * _OUT
    return (word >> jnp.uint32(22)) ^ word


def init_seed(px, py, frame_index, sample_index=0):
    """Per-pixel seed: pcg(x + y*65536 + frame*15485863) (+ s*747796405 per
    extra sample-per-pixel, webgl.js:1526)."""
    px = jnp.asarray(px, jnp.uint32)
    py = jnp.asarray(py, jnp.uint32)
    f = jnp.uint32(frame_index) if jnp.ndim(frame_index) == 0 else jnp.asarray(frame_index, jnp.uint32)
    seed = px + py * jnp.uint32(65536) + f * jnp.uint32(15485863)
    return pcg_hash(seed) + jnp.uint32(sample_index) * _MUL


def rand(state):
    """Advance the stream: returns (new_state, uniform float32 in [0,1])."""
    state = state * _MUL + _INC
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * _OUT
    bits = (word >> jnp.uint32(22)) ^ word
    return state, bits.astype(jnp.float32) * jnp.float32(_INV_U32_MAX)


def rand2(state):
    """Two sequential draws: (new_state, u1, u2)."""
    state, u1 = rand(state)
    state, u2 = rand(state)
    return state, u1, u2
