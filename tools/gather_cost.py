#!/usr/bin/env python3
"""Cost of the per-ray row gathers around the traversal kernel: kernel-only
vs +sphere-recompute vs +finalize (what render actually runs)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webgl_raytracer_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from webgl_raytracer_tpu.app.pipeline import load_random_spheres
from webgl_raytracer_tpu.ops import pallas_trace as PS
from webgl_raytracer_tpu.ops.wavefront import wf_trace_closest_v3
from webgl_raytracer_tpu.render import Renderer
from webgl_raytracer_tpu.render.config import split_settings
from webgl_raytracer_tpu.render.integrator import generate_camera_rays
from webgl_raytracer_tpu.render.lights import light_dirs_for_camera


def best_ms(fn, u, px, py, reps=6):
    def _go(i):
        u2 = jax.tree_util.tree_map(
            lambda x: x + np.float32(i) * np.float32(1e-12)
            if hasattr(x, "dtype") and x.dtype == np.float32 else x, u)
        np.asarray(jax.tree_util.tree_leaves(fn(u2, px, py))[0])

    _go(0)
    best = float("inf")
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        _go(i)
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def main():
    loaded = load_random_spheres(1000)
    r = Renderer(loaded.scene, width=1920, height=1080)
    r.settings.tone_map = "linear"
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()
    scene = r.scene

    def rays(u):
        _, o3, d3 = generate_camera_rays(u, flags, px, py, jnp.uint32(0),
                                         jnp.uint32(0))
        tmin = jnp.broadcast_to(jnp.float32(u.t_min), o3[0].shape)
        return o3, d3, tmin

    @jax.jit
    def kernel_only(u, px, py):
        o3, d3, tmin = rays(u)
        t, row = PS.trace_closest(scene, o3, d3, tmin)
        return t

    @jax.jit
    def kernel_gather(u, px, py):
        o3, d3, tmin = rays(u)
        t, rowi = PS.trace_closest(scene, o3, d3, tmin)
        flat = scene.cluster_prims.reshape(-1, 12)
        row = flat[jnp.maximum(rowi, 0)]
        return t + row[:, 3]

    @jax.jit
    def full(u, px, py):
        o3, d3, tmin = rays(u)
        return wf_trace_closest_v3(scene, o3, d3, tmin).t

    @jax.jit
    def kernel_all_miss(u, px, py):
        # Rays reversed: every block fails the root gate -> pure
        # launch + staging + per-block gate floor.
        o3, d3, tmin = rays(u)
        d3 = tuple(-c for c in d3)
        t, row = PS.trace_closest(scene, o3, d3, tmin)
        return t

    @jax.jit
    def raygen_only(u, px, py):
        o3, d3, tmin = rays(u)
        return o3[0] + d3[0] + tmin

    print("raygen_only_ms", round(best_ms(raygen_only, u, px, py), 1))
    print("kernel_all_miss_ms", round(best_ms(kernel_all_miss, u, px, py), 1))
    print("kernel_only_ms", round(best_ms(kernel_only, u, px, py), 1))
    print("kernel_plus_gather_ms", round(best_ms(kernel_gather, u, px, py), 1))
    print("full_trace_ms", round(best_ms(full, u, px, py), 1))


if __name__ == "__main__":
    main()
