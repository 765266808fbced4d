#!/usr/bin/env python3
"""Tuning sweep for the full-sample champion path on the real chip.

Times _sample_radiance variants (all permuted-compaction) under different
chunk counts, and reports the kernel-primary stage, in one process so the
numbers are comparable despite tunnel variance.

  python tools/tune_sample.py --scene spheres1000 --chunks 4 8 16 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_ms(fn, *args, reps=6):
    # Best-of-reps wall time. Each rep perturbs the first argument by an
    # epsilon: the tunnel backend can serve bit-identical (executable,
    # inputs) pairs from cache, which makes same-input timing loops report
    # pure dispatch latency (measured: a 50 ms kernel "ran" in 0.03 ms).
    # np.asarray forces a real D2H sync.
    import jax
    import numpy as np

    def _go(i):
        head = jax.tree_util.tree_map(
            lambda x: x + np.float32(i) * np.float32(1e-12)
            if hasattr(x, "dtype") and x.dtype == np.float32 else x, args[0])
        out = fn(head, *args[1:])
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    _go(0)
    best = float("inf")
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        _go(i)
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="spheres1000")
    ap.add_argument("--molecule")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--chunks", type=int, nargs="*", default=[4, 8, 16, 32])
    ap.add_argument("--variants", action="store_true",
                    help="also time no-shadow / 1-bounce flag variants")
    args = ap.parse_args()

    from webgl_raytracer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from webgl_raytracer_tpu.app.pipeline import (load_molecule_scene,
                                                  load_random_spheres)
    from webgl_raytracer_tpu.models import get_builtin_molecule
    from webgl_raytracer_tpu.ops.wavefront import wf_trace_closest_v3
    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.render.config import split_settings
    from webgl_raytracer_tpu.render.integrator import (_sample_radiance,
                                                       generate_camera_rays)
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera

    if args.molecule:
        loaded = load_molecule_scene(get_builtin_molecule(args.molecule))
    else:
        loaded = load_random_spheres(int(args.scene.replace("spheres", "")))

    r = Renderer(loaded.scene, width=args.width, height=args.height)
    r.settings.tone_map = "linear"
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()
    out = {"scene": args.molecule or args.scene, "rays": int(px.shape[0])}

    # Primary kernel trace in isolation.
    @jax.jit
    def primary(u, px, py):
        _, o3, d3 = generate_camera_rays(u, flags, px, py, jnp.uint32(0),
                                         jnp.uint32(0))
        tmin = jnp.broadcast_to(jnp.float32(u.t_min), o3[0].shape)
        return wf_trace_closest_v3(r.scene, o3, d3, tmin).t

    out["raygen_plus_primary_ms"] = round(best_ms(primary, u, px, py), 1)

    for c in args.chunks:
        os.environ["WRT_CHUNKS"] = str(c)
        fn = jax.jit(lambda u, px, py: _sample_radiance(
            r.scene, None, None, flags, u, px, py, jnp.uint32(0), 0)[0])
        try:
            ms = best_ms(fn, u, px, py)
            out[f"sample_chunks{c}_ms"] = round(ms, 1)
        except Exception as e:  # noqa: BLE001
            out[f"sample_chunks{c}_ms"] = f"error: {e}"[:120]
        finally:
            del os.environ["WRT_CHUNKS"]

    if args.variants:
        import dataclasses

        for name, f2 in [
            ("noshadow", dataclasses.replace(flags, cast_shadows=False)),
            ("bounce1", dataclasses.replace(flags, max_bounces=1)),
            ("bounce1_noshadow", dataclasses.replace(
                flags, max_bounces=1, cast_shadows=False)),
        ]:
            fv = jax.jit(lambda u, px, py, f2=f2: _sample_radiance(
                r.scene, None, None, f2, u, px, py, jnp.uint32(0), 0)[0])
            out[f"sample_{name}_ms"] = round(best_ms(fv, u, px, py), 1)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
