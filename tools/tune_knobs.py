#!/usr/bin/env python3
"""A/B the round-3 traversal knobs on the full production frame:

  WRT_SWEEP_GROUP  clusters swept per block-worklist loop trip (pop/bound
                   machinery amortization; ops/pallas_trace._sweep_group)
  WRT_PERM_G       hit-first compaction block granularity (finer packs
                   live lanes denser, gathers shorter DMA rows;
                   render/integrator._sample_radiance)

Methodology per docs/ARCHITECTURE.md "Measured perf truths": fused
multi-frame scan blocks (tunnel dispatch floor amortized), each variant
compiled into its OWN jit (env knobs are read at trace time; a shared
module-level jit would alias cache entries), varying start frame defeats
input-identity caching, round-robin best-of-reps cancels slice drift.

Usage:
  python tools/tune_knobs.py --scene spheres1000 [--frames 10 --reps 4]
  python tools/tune_knobs.py --scene spheres10000 --out /tmp/knobs10k.json
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--groups", default="1,2,4",
                    help="WRT_SWEEP_GROUP values to race")
    ap.add_argument("--perm-gs", default="256,128,64",
                    help="WRT_PERM_G values to race")
    ap.add_argument("--out")
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
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera

    if args.molecule:
        loaded = load_molecule_scene(get_builtin_molecule(args.molecule))
    else:
        loaded = load_random_spheres(int(args.scene.replace("spheres", "")))

    r = Renderer(loaded.scene, width=args.width, height=args.height)
    r.settings.tone_map = "linear"
    basis = r.camera.basis()
    flags, uniforms = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()
    n = px.shape[0]
    prev3 = (jnp.zeros((n,), jnp.float32),) * 3

    def make_block(env: dict):
        from webgl_raytracer_tpu.render.integrator import render_batch_v3

        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            @jax.jit
            def fused(start, prev3):
                def step(accum, k):
                    fi_i = start + k
                    color = render_batch_v3(r.scene, None, None, flags,
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

            def block(start):
                np.asarray(fused(jnp.int32(start), prev3)[0])

            t0 = time.perf_counter()
            block(0)   # compile; env knobs are read during this trace
            compile_s = time.perf_counter() - t0
            return block, compile_s
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    groups = [int(g) for g in args.groups.split(",")]
    perm_gs = [int(g) for g in args.perm_gs.split(",")]
    variants = {}
    for g in groups:
        variants[f"group{g}_perm256"] = {"WRT_SWEEP_GROUP": str(g),
                                         "WRT_PERM_G": "256"}
    for pg in perm_gs[1:]:
        variants[f"group1_perm{pg}"] = {"WRT_SWEEP_GROUP": "1",
                                        "WRT_PERM_G": str(pg)}

    blocks = {}
    compile_s = {}
    for name, env in variants.items():
        blocks[name], compile_s[name] = make_block(env)
        print(f"compiled {name} ({compile_s[name]:.1f}s)", flush=True)

    best = {k: float("inf") for k in blocks}
    for i in range(1, args.reps + 1):
        for k, block in blocks.items():
            t0 = time.perf_counter()
            block(i * args.frames)
            best[k] = min(best[k], time.perf_counter() - t0)
            print(f"rep{i} {k}: "
                  f"{(time.perf_counter() - t0) * 1000 / args.frames:.1f} "
                  "ms/frame", flush=True)

    per = {k: round(v * 1000.0 / args.frames, 2) for k, v in best.items()}
    report = {
        "scene": args.molecule or args.scene,
        "resolution": f"{args.width}x{args.height}",
        "frames_per_block": args.frames,
        "reps": args.reps,
        "per_frame_ms": per,
        "winner": min(per, key=per.get),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
