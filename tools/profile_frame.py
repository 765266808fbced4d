#!/usr/bin/env python3
"""Frame-cost decomposition: where a progressive frame's time goes.

Single-dispatch stage timings are useless on this rig: the tunnel's
per-dispatch floor (25-270 ms depending on slice) swamps the stages, and
bit-identical (executable, input) pairs can be served from cache. So every
number here comes from FUSED multi-frame blocks (render_frames-style scan,
floor amortized 1/frames) of flag VARIANTS in one process, and the stage
costs are the differences:

  shadows_ms      = full - cast_shadows=False
  secondary_ms    = full - max_bounces=1   (secondary closest + their shadows)
  one_bounce_no_shadows ~ raygen + primary trace + permutation + shading
  permutation_gain= WRT_NO_PERM frame - full (how much compaction buys)

Usage:
  python tools/profile_frame.py --scene spheres1000 --out PROFILE_r02.json
  python tools/profile_frame.py --molecule caffeine
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="spheres1000")
    ap.add_argument("--molecule")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=10,
                    help="frames per fused block (floor amortization)")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out", help="also write the JSON report to this path")
    args = ap.parse_args()

    from webgl_raytracer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from webgl_raytracer_tpu.app.pipeline import (load_molecule_scene,
                                                  load_random_spheres)
    from webgl_raytracer_tpu.models import get_builtin_molecule
    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.render.config import split_settings
    from webgl_raytracer_tpu.render.integrator import (_closest_hit,
                                                       generate_camera_rays)
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera

    if args.molecule:
        loaded = load_molecule_scene(get_builtin_molecule(args.molecule))
    else:
        loaded = load_random_spheres(int(args.scene.replace("spheres", "")))

    r = Renderer(loaded.scene, width=args.width, height=args.height)
    r.settings.tone_map = "linear"
    r.settings.max_frames = 10 ** 9
    basis = r.camera.basis()
    flags, uniforms = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()
    n = px.shape[0]
    prev = jnp.zeros((n, 3), jnp.float32)

    def make_block(f2, env_kv=None):
        """Compile a fused `frames`-frame block under flags f2; returns a
        runner(start). Each variant gets its OWN jitted function — the
        module-level _render_frames_fused jit is keyed on (flags, shapes),
        so an env-var variant with identical flags would silently reuse
        the first variant's executable (the WRT_NO_PERM row measured pure
        noise before this)."""
        from webgl_raytracer_tpu.render.integrator import render_batch_v3

        if env_kv:
            os.environ[env_kv[0]] = env_kv[1]
        try:
            @jax.jit
            def fused(start, prev3):
                def step(accum, k):
                    fi_i = start + k
                    color = render_batch_v3(r.scene, None, None, f2,
                                            uniforms, px, py,
                                            fi_i.astype(jnp.uint32))
                    fi = fi_i.astype(jnp.float32)
                    return tuple(
                        jnp.where(fi_i == 0, color[c],
                                  (accum[c] * fi + color[c]) / (fi + 1.0))
                        for c in range(3)), None

                out, _ = jax.lax.scan(
                    step, prev3, jnp.arange(args.frames, dtype=jnp.int32))
                return out

            prev3 = (prev[:, 0], prev[:, 1], prev[:, 2])

            def block(start):
                np.asarray(fused(jnp.int32(start), prev3)[0])

            block(0)   # compile (env var read at trace time)
            return block
        finally:
            if env_kv:
                del os.environ[env_kv[0]]

    variants = {
        "full": make_block(flags),
        "no_shadows": make_block(
            dataclasses.replace(flags, cast_shadows=False)),
        "one_bounce": make_block(dataclasses.replace(flags, max_bounces=1)),
        "no_permutation": make_block(flags, env_kv=("WRT_NO_PERM", "1")),
        "one_bounce_no_shadows": make_block(
            dataclasses.replace(flags, max_bounces=1, cast_shadows=False)),
    }
    # Interleave reps round-robin so tunnel-slice drift between variants
    # cancels (a variant measured minutes later can read 30% off).
    best = {k: float("inf") for k in variants}
    for i in range(1, args.reps + 1):
        for k, block in variants.items():
            t0 = time.perf_counter()
            block(i * args.frames)  # varying start defeats input caching
            best[k] = min(best[k], time.perf_counter() - t0)
    per = {k: v * 1000.0 / args.frames for k, v in best.items()}
    full = per["full"]
    noshadow = per["no_shadows"]
    bounce1 = per["one_bounce"]
    noperm = per["no_permutation"]
    b1_ns = per["one_bounce_no_shadows"]

    # Primary hit fraction for context.
    _, o3, d3 = jax.jit(lambda u: generate_camera_rays(
        u, flags, px, py, jnp.uint32(0), jnp.uint32(0)))(uniforms)
    tmin = jnp.broadcast_to(jnp.float32(uniforms.t_min), o3[0].shape)
    rec = jax.jit(lambda o3, d3: _closest_hit(
        r.scene, flags, o3, d3, tmin, None))(o3, d3)
    hit_frac = float(np.asarray(rec.prim_type >= 0).mean())

    report = {
        "resolution": f"{args.width}x{args.height}",
        "rays": int(n),
        "frames_per_block": args.frames,
        "primary_hit_fraction": round(hit_frac, 4),
        "per_frame_ms": {
            "full": round(full, 1),
            "one_bounce_no_shadows": round(b1_ns, 1),
            "no_shadows": round(noshadow, 1),
            "one_bounce": round(bounce1, 1),
            "no_permutation": round(noperm, 1),
        },
        "derived_ms": {
            "shadow_rays": round(full - noshadow, 1),
            "secondary_bounces_incl_shadows": round(full - bounce1, 1),
            "permutation_gain": round(noperm - full, 1),
        },
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
