#!/usr/bin/env python3
"""Fine-grained stage decomposition of the progressive frame.

profile_frame.py's flag variants bound shadows/secondary cost; this tool
splits the remaining `one_bounce_no_shadows` time (raygen + primary trace
+ permutation + chunk-scan shading + accumulation) by building AMPUTATED
pipelines that stop after successive stages. All defenses from
STATUS.md "Measured perf truths" apply: fused multi-frame scans, per-rep
input perturbation via varying frame start, fresh local jit per variant,
round-robin reps.

Stages (cumulative):
  raygen        generate_camera_rays only
  trace         + primary closest hit (slim record)
  miss_env      + miss/ambient radiance for every lane + accumulation
  permute       + block permutation gather of the transport state
  full_b1ns     the real one-bounce/no-shadow frame (chunk scan + shading)
  full          the real full frame (4 bounces + shadows), for scale

Usage: python tools/profile_stages.py --scene spheres1000 [--out F.json]
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
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
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
    import webgl_raytracer_tpu.render.integrator as I
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera

    if args.molecule:
        loaded = load_molecule_scene(get_builtin_molecule(args.molecule))
    else:
        loaded = load_random_spheres(int(args.scene.replace("spheres", "")))

    r = Renderer(loaded.scene, width=args.width, height=args.height)
    r.settings.tone_map = "linear"
    r.settings.max_frames = 10 ** 9
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()
    n = px.shape[0]
    scene = r.scene
    f_b1ns = dataclasses.replace(flags, max_bounces=1, cast_shadows=False)

    def stage_fn(kind, f2):
        """One frame of the pipeline truncated after `kind`; returns a
        scalar so the fused scan carries almost nothing."""

        def one(fi):
            seed, o3, d3 = I.generate_camera_rays(u, f2, px, py, fi,
                                                  jnp.uint32(0))
            if kind == "raygen":
                return d3[0].sum() + d3[1].sum()
            rec0 = I._closest_hit(scene, f2, o3, d3, u.t_min, None,
                                  full_record=False)
            if kind == "trace":
                return rec0.t.sum()
            hit = rec0.prim_type >= 0
            amb = u.ambient_color * u.ambient_intensity
            miss_r = jnp.where(hit, 0.0, amb[0])
            if kind == "miss_env":
                return miss_r.sum() + rec0.t.sum()
            state = (seed,) + o3 + d3 + (rec0.t, rec0.prim_slot)
            if kind == "permute":
                g = I._PERM_BLOCK
                perm, inv = I._tile_permutation(hit, g)
                gather = lambda a: a.reshape(
                    (n // g, g) + a.shape[1:])[perm].reshape(a.shape)
                state = tuple(gather(a) for a in state)
                return sum(s.sum().astype(jnp.float32) for s in state[1:])
            if kind == "permute_lane":
                # Price a PER-LANE hit-first gather (9 arrays one way) +
                # the radiance scatter back (3 arrays) — the candidate
                # dense-compaction structure.
                perm, inv = I._hit_first_permutation(hit)
                state = tuple(a[perm] for a in state)
                out = sum(s.sum().astype(jnp.float32) for s in state[1:])
                r3 = tuple(state[i].astype(jnp.float32)[inv]
                           for i in range(1, 4))
                return out + sum(x.sum() for x in r3)
            if kind == "floor":
                # All-miss trace: rays pointing away from the scene — the
                # pure per-block floor of a full-width launch.
                away = tuple(jnp.full((n,), v) for v in (0.0, 0.0, -1.0))
                o_far = (o3[0] + 1e6, o3[1] + 1e6, o3[2] + 1e6)
                rec_f = I._closest_hit(scene, f2, o_far, away, u.t_min,
                                       None, full_record=False)
                return rec_f.t.sum() + rec0.t.sum()
            raise ValueError(kind)

        return one

    def frame_fn(f2):
        def one(fi):
            c = I.render_batch_v3(scene, None, None, f2, u, px, py, fi)
            return c[0].sum() + c[1].sum() + c[2].sum()

        return one

    def make_block(one):
        @jax.jit
        def fused(start):
            def step(acc, k):
                return acc + one((start + k).astype(jnp.uint32)), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(args.frames, dtype=jnp.int32))
            return out

        def run(i):
            return float(fused(jnp.int32(i * args.frames)))

        run(0)
        return run

    chunks = I._chunk_count(n)
    variants = {
        "raygen": make_block(stage_fn("raygen", f_b1ns)),
        "trace": make_block(stage_fn("trace", f_b1ns)),
        "miss_env": make_block(stage_fn("miss_env", f_b1ns)),
        "permute": make_block(stage_fn("permute", f_b1ns)),
        "permute_lane": make_block(stage_fn("permute_lane", f_b1ns)),
        "floor": make_block(stage_fn("floor", f_b1ns)),
        "full_b1ns": make_block(frame_fn(f_b1ns)),
        "full": make_block(frame_fn(flags)),
    }
    best = {k: float("inf") for k in variants}
    for i in range(1, args.reps + 1):
        for k, run in variants.items():
            t0 = time.perf_counter()
            run(i)
            best[k] = min(best[k], time.perf_counter() - t0)
    per = {k: round(v * 1000.0 / args.frames, 2) for k, v in best.items()}
    report = {
        "resolution": f"{args.width}x{args.height}",
        "rays": int(n),
        "chunks": chunks,
        "frames_per_block": args.frames,
        "cumulative_ms": per,
        "derived_ms": {
            "raygen": per["raygen"],
            "primary_trace": round(per["trace"] - per["raygen"], 2),
            "miss_env_accum": round(per["miss_env"] - per["trace"], 2),
            "permute_gather": round(per["permute"] - per["miss_env"], 2),
            "permute_lane_gather": round(per["permute_lane"] - per["miss_env"], 2),
            "allmiss_trace_floor": round(per["floor"] - per["trace"], 2),
            "chunk_shading_b1": round(per["full_b1ns"] - per["permute"], 2),
            "shadows_and_bounces": round(per["full"] - per["full_b1ns"], 2),
        },
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
