#!/usr/bin/env python3
"""Decompose the production frame's shadow cost (the ~70 ms tail of the
1000-sphere bench, PROFILE_r03 frame_variants: full - no_shadows).

Phase 1 (capture): reconstruct the production permuted + chunked
transport exactly (same permutation granularity, chunk count, RNG
stream) and run it with trace_paths(capture_shadow=True), which returns
each bounce's batched 3-light shadow-trace inputs as jit OUTPUTS (the
axon PJRT rejects host callbacks). Saves one npz per (chunk, bounce)
with any active lane.

Phase 2 (replay): time each captured launch standalone with the proven
methodology (fused T-trace scan, per-step origin perturbation, fresh
jit per variant, round-robin best-of-reps), under three formulations:
  block    — the production batched block-kernel any-hit
  perray   — the same batch routed to the per-ray worklist kernels
  split3   — the pre-round-3 style: 3 separate per-light launches

Reports per-launch ms, active-lane and live-block statistics, and the
sum over the frame vs the profile's shadow budget — the gap between
SUM(best launches) and the budget is glue (concats, occluded slicing,
fusion boundaries), not traversal.

Usage: python tools/shadow_cost.py [--scene spheres1000] [--out F.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CAP_DIR = "/tmp/wrt_shadow_capture"


def build(args):
    import jax  # noqa: F401

    sys.path.insert(0, REPO)
    from bench import random_sphere_geometry

    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.render.config import split_settings
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera
    from webgl_raytracer_tpu.scene import compile_scene

    count = int(args.scene.replace("spheres", ""))
    scene = compile_scene(random_sphere_geometry(count))
    r = Renderer(scene, width=args.width, height=args.height)
    r.settings.tone_map = "linear"
    basis = r.camera.basis()
    flags, uniforms = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()
    return scene, flags, uniforms, px, py


def capture(args, scene, flags, u, px, py) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import webgl_raytracer_tpu.render.integrator as I
    from webgl_raytracer_tpu.ops.wavefront import _finalize_hit

    n = px.shape[0]
    chunks = I._chunk_count(n)
    size = n // chunks
    clip = I._clip_tuple(flags, u)
    g = int(os.environ.get("WRT_PERM_G") or I._PERM_BLOCK)
    if n % g or size % g:
        g = 1

    def run(frame_index, scene):
        seed, origin, direction = I.generate_camera_rays(
            u, flags, px, py, frame_index, 0)
        rec0 = I._closest_hit(scene, flags, origin, direction, u.t_min,
                              clip, full_record=False)
        hit = rec0.prim_type >= 0
        state = (seed,) + origin + direction + (rec0.t, rec0.prim_slot)
        if chunks > 1:
            if g > 1:
                perm, _ = I._tile_permutation(hit, g)
                gather = lambda a: a.reshape(n // g, g)[perm].reshape(n)
            else:
                perm, _ = I._hit_first_permutation(hit)
                gather = lambda a: a[perm]
            state = tuple(gather(a) for a in state)
        state = tuple(a.reshape((chunks, size)) for a in state)

        def chunk_fn(a):
            seed_c = a[0]
            o_c, d_c = a[1:4], a[4:7]
            t_c, slot_c = a[7], a[8]
            tmin_c = jnp.broadcast_to(u.t_min, t_c.shape).astype(jnp.float32)
            rec_c = _finalize_hit(scene, o_c, d_c, tmin_c, clip, t_c, slot_c,
                                  cost=jnp.zeros_like(slot_c),
                                  refine_sphere_t=True)
            _, _, batches = I.trace_paths(scene, None, None, flags, u,
                                          o_c, d_c, seed_c, first_rec=rec_c,
                                          capture_shadow=True)
            return batches

        return jax.lax.map(chunk_fn, state)

    batches = jax.jit(run)(jnp.uint32(0), scene)
    batches = jax.tree_util.tree_map(np.asarray, batches)

    import shutil

    shutil.rmtree(CAP_DIR, ignore_errors=True)
    os.makedirs(CAP_DIR, exist_ok=True)
    saved = 0
    for b, batch in enumerate(batches):
        o0, o1, o2, d0, d1, d2, act, smin = batch
        for c in range(chunks):
            if not act[c].any():
                continue
            np.savez(os.path.join(CAP_DIR, f"shadow_c{c:02d}_b{b}.npz"),
                     o0=o0[c], o1=o1[c], o2=o2[c],
                     d0=d0[c], d1=d1[c], d2=d2[c],
                     act=act[c], smin=smin[c], bounce=b, chunk=c)
            saved += 1
    return saved


def replay(args, scene, flags, u) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from webgl_raytracer_tpu.ops.wavefront import wf_trace_any_v3

    t_min = float(u.t_min)
    files = sorted(glob.glob(os.path.join(CAP_DIR, "*.npz")))
    if not files:
        raise SystemExit(f"no captures in {CAP_DIR}")

    results = {"what": __doc__.split("\n")[0],
               "scene": args.scene, "t_min": t_min,
               "launches": []}

    def time_fused(fn, o, d, act, smin, traces, reps):
        def fused(start):
            def step(acc, k):
                o_p = (o[0] + (start + k).astype(jnp.float32) * 1e-7,
                       o[1], o[2])
                occ = fn(o_p, d, act, smin)
                return acc + jnp.sum(occ.astype(jnp.float32)), 0
            acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(traces))
            return acc

        j = jax.jit(fused)
        jax.block_until_ready(j(jnp.zeros((), jnp.int32)))
        best = float("inf")
        for rep in range(reps):
            s = jnp.asarray(rep * traces, jnp.int32)
            t0 = time.perf_counter()
            jax.block_until_ready(j(s))
            best = min(best, (time.perf_counter() - t0) / traces)
        return best * 1000.0

    def block_fn(o, d, act, smin):
        return wf_trace_any_v3(scene, o, d, t_min, accept_min=smin,
                               active=act, divergent=False)

    def perray_fn(o, d, act, smin):
        from webgl_raytracer_tpu.ops import pallas_trace as PS

        return PS.trace_any(scene, o, d,
                            jnp.broadcast_to(jnp.float32(t_min), o[0].shape),
                            accept_min=smin, active=act, perray=True)

    def split3_fn(o, d, act, smin):
        n3 = o[0].shape[0]
        nn = n3 // 3
        out = []
        for j in range(3):
            sl = slice(j * nn, (j + 1) * nn)
            out.append(wf_trace_any_v3(
                scene, tuple(c[sl] for c in o), tuple(c[sl] for c in d),
                t_min, accept_min=smin[sl], active=act[sl]))
        return jnp.concatenate(out)

    total_best = 0.0
    for f in files:
        z = np.load(f)
        o = tuple(jnp.asarray(z[k]) for k in ("o0", "o1", "o2"))
        d = tuple(jnp.asarray(z[k]) for k in ("d0", "d1", "d2"))
        act = jnp.asarray(z["act"])
        smin = jnp.asarray(z["smin"])
        n = int(o[0].shape[0])
        act_np = np.asarray(z["act"])
        blocks = act_np.reshape(-1, 1024)
        live_blocks = int(np.any(blocks, axis=1).sum())
        row = {
            "file": os.path.basename(f),
            "bounce": int(z["bounce"]),
            "lanes": n,
            "active": int(act_np.sum()),
            "blocks_1024": n // 1024,
            "live_blocks_1024": live_blocks,
            "occupancy_in_live_blocks": round(
                float(act_np.sum()) / max(live_blocks * 1024, 1), 3),
        }
        row["block_ms"] = round(time_fused(block_fn, o, d, act, smin,
                                           args.traces, args.reps), 3)
        row["us_per_live_block"] = round(
            row["block_ms"] * 1000.0 / max(live_blocks, 1), 2)
        if args.variants != "block":
            if scene.num_clusters >= 2:
                row["perray_ms"] = round(time_fused(
                    perray_fn, o, d, act, smin, args.traces, args.reps), 3)
            row["split3_ms"] = round(time_fused(
                split3_fn, o, d, act, smin, args.traces, args.reps), 3)
        total_best += row["block_ms"]
        results["launches"].append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    results["sum_block_ms"] = round(total_best, 2)
    results["device"] = str(jax.devices()[0])
    out = json.dumps(results, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="spheres1000")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--traces", type=int, default=20)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--variants", default="all",
                    help="'block' times only the production formulation")
    ap.add_argument("--skip-capture", action="store_true")
    ap.add_argument("--out")
    args = ap.parse_args()

    from webgl_raytracer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    scene, flags, u, px, py = build(args)
    if not args.skip_capture:
        saved = capture(args, scene, flags, u, px, py)
        print(f"captured {saved} shadow batches", file=sys.stderr)
    replay(args, scene, flags, u)


if __name__ == "__main__":
    main()
