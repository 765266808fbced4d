#!/usr/bin/env python3
"""A/B the two transport formulations on the real chip.

Times fused multi-sample blocks (a lax.scan over the frame index, so
every defense from STATUS.md "Measured perf truths" applies: the
25-270 ms per-dispatch tunnel floor is amortized 1/T, the varying frame
index defeats both input-identity caching and XLA loop-invariant
hoisting, and the two variants interleave reps round-robin so slice
drift cancels):

  mega  — the Pallas path megakernel (ops/pallas_path.render_sample)
  xla   — the multi-launch XLA integrator with hit-first compaction
          (render/integrator._sample_radiance under WRT_NO_MEGAKERNEL)

Both consume the same RNG stream, so this is a pure formulation race.

  python tools/bench_paths.py --scene spheres1000 [--out F.json]
  python tools/bench_paths.py --molecule caffeine --skip-mega
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="spheres1000")
    ap.add_argument("--molecule")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--samples", type=int, default=10,
                    help="samples per fused dispatch")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--skip-mega", action="store_true")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--out")
    args = ap.parse_args()

    from webgl_raytracer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from webgl_raytracer_tpu.app.pipeline import (load_molecule_scene,
                                                  load_random_spheres)
    from webgl_raytracer_tpu.models import get_builtin_molecule
    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.render.config import split_settings
    from webgl_raytracer_tpu.render.integrator import _sample_radiance
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
    out = {"scene": args.molecule or args.scene,
           "resolution": f"{args.width}x{args.height}",
           "rays": int(px.shape[0]), "max_bounces": flags.max_bounces,
           "num_clusters": int(r.scene.num_clusters),
           "samples_per_dispatch": args.samples}

    def make_runner(sample_fn):
        @jax.jit
        def fused(start):
            def step(acc, k):
                c = sample_fn((start + k).astype(jnp.uint32))
                return acc + c[0].sum() + c[1].sum() + c[2].sum(), None

            o, _ = jax.lax.scan(step, jnp.float32(0.0),
                                jnp.arange(args.samples, dtype=jnp.int32))
            return o

        def run(i):
            return float(fused(jnp.int32(i * args.samples)))

        t0 = time.perf_counter()
        run(0)
        return run, round(time.perf_counter() - t0, 1)

    runners = {}
    if not args.skip_mega:
        from webgl_raytracer_tpu.ops import pallas_path as PP

        if PP.supports(r.scene, flags, None, None):
            runners["mega"], out["mega_compile_s"] = make_runner(
                lambda fi: PP.render_sample(r.scene, flags, u, px, py,
                                            fi, 0)[0])
        else:
            out["mega_ms"] = None
    if not args.skip_xla:
        os.environ["WRT_NO_MEGAKERNEL"] = "1"
        try:
            runners["xla"], out["xla_compile_s"] = make_runner(
                lambda fi: _sample_radiance(
                    r.scene, None, None, flags, u, px, py, fi, 0)[0])
        finally:
            del os.environ["WRT_NO_MEGAKERNEL"]

    best = {k: float("inf") for k in runners}
    for i in range(1, args.reps + 1):
        for k, run in runners.items():
            t0 = time.perf_counter()
            run(i)
            best[k] = min(best[k], time.perf_counter() - t0)
    for k, v in best.items():
        out[f"{k}_ms"] = round(v * 1000.0 / args.samples, 1)
    if "mega" in best and "xla" in best:
        out["mega_vs_xla"] = round(out["xla_ms"] / out["mega_ms"], 3)

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
