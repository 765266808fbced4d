#!/usr/bin/env python3
"""A/B the two transport formulations on the real chip.

Times ONE progressive sample (spp=1) at the given resolution through:
  mega  — the Pallas path megakernel (ops/pallas_path.render_sample)
  xla   — the multi-launch XLA integrator with hit-first compaction
          (render/integrator._sample_radiance under WRT_NO_MEGAKERNEL)

Both consume the same RNG stream, so this is a pure formulation race.

  python tools/bench_paths.py --scene spheres1000
  python tools/bench_paths.py --scene spheres10000 --skip-mega
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
    ap.add_argument("--skip-mega", action="store_true")
    ap.add_argument("--skip-xla", action="store_true")
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
           "num_clusters": int(r.scene.num_clusters)}

    if not args.skip_mega:
        from webgl_raytracer_tpu.ops import pallas_path as PP

        if PP.supports(r.scene, flags, None, None):
            fn = jax.jit(lambda u, px, py: PP.render_sample(
                r.scene, flags, u, px, py, jnp.uint32(0), 0)[0])
            t0 = time.perf_counter()
            jax.block_until_ready(fn(u, px, py)[0])
            out["mega_compile_s"] = round(time.perf_counter() - t0, 1)
            out["mega_ms"] = round(best_ms(fn, u, px, py), 1)
        else:
            out["mega_ms"] = None

    if not args.skip_xla:
        os.environ["WRT_NO_MEGAKERNEL"] = "1"
        fx = jax.jit(lambda u, px, py: _sample_radiance(
            r.scene, None, None, flags, u, px, py, jnp.uint32(0), 0)[0])
        t0 = time.perf_counter()
        jax.block_until_ready(fx(u, px, py)[0])
        del os.environ["WRT_NO_MEGAKERNEL"]
        out["xla_compile_s"] = round(time.perf_counter() - t0, 1)
        out["xla_ms"] = round(best_ms(fx, u, px, py), 1)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
