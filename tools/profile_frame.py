#!/usr/bin/env python3
"""Frame-cost decomposition: where a progressive sample's time goes.

The renderer's frame is one fused XLA program, so stage costs are measured
by jitting each stage in isolation (ray generation, primary traversal,
hit-first permutation, one shading chunk, full frame). Timings are
best-of-N on the current backend; on shared-tunnel TPU rigs only
within-run comparisons are meaningful.

Usage:
  python tools/profile_frame.py --scene spheres1000 --width 1920 --height 1080
  python tools/profile_frame.py --molecule caffeine --frames 3
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def best_ms(fn, *args, reps=4):
    # Perturb the first f32 argument per rep and force D2H: the tunnel
    # backend serves bit-identical (executable, input) pairs from cache,
    # which turns same-input timing loops into dispatch-latency probes.
    import jax
    import numpy as np

    def _go(i):
        if args:
            head = jax.tree_util.tree_map(
                lambda x: x + np.float32(i) * np.float32(1e-12)
                if hasattr(x, "dtype") and x.dtype == np.float32 else x,
                args[0])
            out = fn(head, *args[1:])
        else:
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    _go(0)
    best = float("inf")
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        _go(i)
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="spheres1000")
    ap.add_argument("--molecule")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--out", help="also write the JSON report to this path")
    args = ap.parse_args()

    from webgl_raytracer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from webgl_raytracer_tpu.app.pipeline import (
        load_molecule_scene, load_random_spheres)
    from webgl_raytracer_tpu.models import get_builtin_molecule
    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.render.config import split_settings
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera
    import webgl_raytracer_tpu.render.integrator as I

    if args.molecule:
        loaded = load_molecule_scene(get_builtin_molecule(args.molecule))
    else:
        count = int(args.scene.replace("spheres", "") or 1000)
        loaded = load_random_spheres(count)

    r = Renderer(loaded.scene, width=args.width, height=args.height)
    r.settings.tone_map = "linear"
    r.settings.max_frames = 10 ** 9
    basis = r.camera.basis()
    flags, uniforms = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()
    n = px.shape[0]

    @jax.jit
    def raygen(u, px, py):
        return I.generate_camera_rays(u, flags, px, py, jnp.uint32(0),
                                      jnp.uint32(0))

    seed, o3, d3 = raygen(uniforms, px, py)
    jax.block_until_ready(o3[0])

    @jax.jit
    def primary(scene, u, o3, d3):
        tmin = jnp.broadcast_to(jnp.float32(u.t_min), o3[0].shape)
        return I._closest_hit(scene, flags, o3, d3, tmin, None)

    rec = primary(r.scene, uniforms, o3, d3)
    jax.block_until_ready(rec.t)

    @jax.jit
    def perm(seed, o3, d3, rec):
        p, inv = I._tile_permutation(rec.prim_type >= 0, I._PERM_BLOCK)
        g = lambda a: a.reshape((n // I._PERM_BLOCK, I._PERM_BLOCK)
                                + a.shape[1:])[p].reshape(a.shape)
        return jax.tree_util.tree_map(g, (seed, o3, d3, rec.t))

    def frame():
        r.render_frames(1)
        return r._accum

    # Full-sample A/B: block-permuted compaction vs relying on the Morton
    # tile order's natural coherence alone (WRT_NO_PERM, read at trace time
    # so each wrapper bakes its own variant).
    fs_perm = jax.jit(lambda u, px, py: I._sample_radiance(
        r.scene, None, None, flags, u, px, py, jnp.uint32(0), 0)[0])
    os.environ["WRT_NO_PERM"] = "1"
    fs_noperm = jax.jit(lambda u, px, py: I._sample_radiance(
        r.scene, None, None, flags, u, px, py, jnp.uint32(0), 0)[0])
    jax.block_until_ready(fs_noperm(uniforms, px, py)[0])
    del os.environ["WRT_NO_PERM"]

    stages = {
        "ray_generation": best_ms(raygen, uniforms, px, py),
        "primary_closest_trace": best_ms(primary, r.scene, uniforms, o3, d3),
        "hit_first_permutation": best_ms(perm, seed, o3, d3, rec),
        "sample_permuted": best_ms(fs_perm, uniforms, px, py),
        "sample_no_permutation": best_ms(fs_noperm, uniforms, px, py),
        "full_frame": best_ms(frame),
    }
    hit_frac = float(np.asarray(rec.prim_type >= 0).mean())
    report = {
        "resolution": f"{args.width}x{args.height}",
        "rays": n,
        "primary_hit_fraction": round(hit_frac, 4),
        "stages_ms": {k: round(v, 2) for k, v in stages.items()},
        "shade_tail_ms": round(
            stages["full_frame"] - stages["primary_closest_trace"]
            - stages["hit_first_permutation"] - stages["ray_generation"], 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
