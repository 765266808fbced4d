#!/usr/bin/env python3
"""In-context decomposition of the wavefront transport's machinery.

bench_wavefront amputation (TPU v5e, 1k spheres 1080p, bounces=1, no
shadows) measured 52 ms of overhead vs the permuted path — far above the
sum of compact_cost.py's standalone prices (argsort 3.7 + pack 4.2 +
gather 4.2 + expand 1.6). Something cheap standalone is expensive in
context. This tool rebuilds _wavefront_transport's dense() pipeline
stage by stage INSIDE the real frame (raygen -> primary -> ...) and
times cumulative amputations, all with the proven defenses (fused
frame scan, per-step frame-index perturbation, fresh jit per variant).

Stages (cumulative):
  skeleton   raygen + primary trace + miss radiance (full width)
  argsort    + live_first_index over [n]
  pack       + pack_rows [n,16] + gather_rows [cap,16]
  finalize   + _finalize_hit over [cap]
  step0      + the dense bounce-0 step (shadows on/off per --no-shadows)
  deposit    + expand_cols deposit at [cap]
  expand     + final expand_cols back to [n]  (= the b=1 wavefront frame)

Usage: python tools/wavefront_cost.py [--no-shadows] [--out F.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="spheres1000")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--div", type=int, default=8)
    ap.add_argument("--no-shadows", action="store_true")
    ap.add_argument("--out")
    args = ap.parse_args()

    from webgl_raytracer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from bench import random_sphere_geometry

    import webgl_raytracer_tpu.render.integrator as I
    from webgl_raytracer_tpu.ops.wavefront import _finalize_hit
    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.render import compact as CP
    from webgl_raytracer_tpu.render.config import split_settings
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera
    from webgl_raytracer_tpu.scene import compile_scene
    from webgl_raytracer_tpu.ops import vec3 as V

    count = int(args.scene.replace("spheres", ""))
    scene = compile_scene(random_sphere_geometry(count))
    r = Renderer(scene, width=args.width, height=args.height)
    r.settings.tone_map = "linear"
    if args.no_shadows:
        r.settings.cast_shadows = False
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()
    n = px.shape[0]
    cap, _ = CP.compact_cap(n, args.div)
    clip = I._clip_tuple(flags, u)

    def pipeline(upto: str):
        order = ["skeleton", "argsort", "pack", "finalize", "step0",
                 "deposit", "expand"]
        k = order.index(upto)

        def frame(scene, frame_index):
            seed, origin, direction = I.generate_camera_rays(
                u, flags, px, py, frame_index, 0)
            rec0 = I._closest_hit(scene, flags, origin, direction, u.t_min,
                                  clip, full_record=False)
            hit = rec0.prim_slot >= 0
            n_live = jnp.sum(hit.astype(jnp.int32))
            amb = V.splat(u.ambient_color)
            env_contrib = V.scale(amb, u.ambient_intensity)
            env_contrib = tuple(jnp.broadcast_to(c, (n,))
                                for c in env_contrib)
            miss_rad = V.where(~hit, env_contrib,
                               V.zeros_like(env_contrib[0]))
            acc = jnp.sum(miss_rad[0] + miss_rad[1] + miss_rad[2])
            if k >= 1:
                idx = CP.live_first_index(hit, cap)
                acc = acc + jnp.sum(idx.astype(jnp.float32)) * 1e-12
            if k >= 2:
                packed = CP.pack_rows(
                    [seed] + list(origin) + list(direction)
                    + [rec0.t, rec0.prim_slot])
                rows = CP.gather_rows(packed, idx)
                acc = acc + jnp.sum(rows[:, 7]) * 1e-12
            if k >= 3:
                lanes = jnp.arange(cap, dtype=jnp.int32)
                alive_prefix = lanes < n_live
                seed_k = jax.lax.bitcast_convert_type(rows[:, 0], jnp.uint32)
                o3k = (rows[:, 1], rows[:, 2], rows[:, 3])
                d3k = (rows[:, 4], rows[:, 5], rows[:, 6])
                t_k = rows[:, 7]
                slot_k = jnp.where(
                    alive_prefix,
                    jax.lax.bitcast_convert_type(rows[:, 8], jnp.int32), -1)
                tmin_k = jnp.broadcast_to(u.t_min, (cap,)).astype(jnp.float32)
                rec_k = _finalize_hit(scene, o3k, d3k, tmin_k, clip, t_k,
                                      slot_k, cost=jnp.zeros_like(slot_k),
                                      refine_sphere_t=True)
                acc = acc + jnp.sum(rec_k.t) * 1e-12
            if k >= 4:
                step = I._make_bounce_step(scene, None, None, flags, u, cap)
                ones_c = jnp.ones((cap,), jnp.float32)
                zeros_c = jnp.zeros((cap,), jnp.float32)
                carry = (seed_k, o3k[0], o3k[1], o3k[2],
                         d3k[0], d3k[1], d3k[2],
                         ones_c, ones_c.copy(), ones_c.copy(),
                         zeros_c, zeros_c.copy(), zeros_c.copy(),
                         jnp.zeros((cap,), jnp.float32), alive_prefix,
                         jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
                carry = step(jnp.int32(0), carry, first_rec=rec_k)
                acc = acc + jnp.sum(carry[10]) * 1e-12
            if k >= 5:
                dep = CP.expand_cols((carry[10], carry[11], carry[12]),
                                     alive_prefix)
                acc = acc + jnp.sum(dep[0]) * 1e-12
            if k >= 6:
                grave = (carry[10], carry[11], carry[12])
                out = CP.expand_cols(grave, hit)
                acc = acc + jnp.sum(out[0])
            return acc

        def fused(start, scene):
            def step_fn(a, i):
                return a + frame(scene, (start + i).astype(jnp.uint32)), 0
            out, _ = jax.lax.scan(step_fn, jnp.zeros(()),
                                  jnp.arange(args.frames))
            return out

        j = jax.jit(fused)
        jax.block_until_ready(j(jnp.zeros((), jnp.int32), scene))
        best = float("inf")
        for rep in range(args.reps):
            s = jnp.asarray(rep * args.frames, jnp.int32)
            t0 = time.perf_counter()
            jax.block_until_ready(j(s, scene))
            best = min(best, (time.perf_counter() - t0) / args.frames)
        return best * 1000.0

    results = {"what": __doc__.split("\n")[0], "scene": args.scene,
               "cap": cap, "no_shadows": bool(args.no_shadows),
               "cumulative_ms": {}, "marginal_ms": {}}
    prev = None
    for stage in ["skeleton", "argsort", "pack", "finalize", "step0",
                  "deposit", "expand"]:
        ms = pipeline(stage)
        results["cumulative_ms"][stage] = round(ms, 2)
        if prev is not None:
            results["marginal_ms"][stage] = round(ms - prev, 2)
        prev = ms
        print(f"{stage:10s} {ms:8.2f} ms", file=sys.stderr, flush=True)

    import jax

    results["device"] = str(jax.devices()[0])
    out = json.dumps(results, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out)


if __name__ == "__main__":
    main()
