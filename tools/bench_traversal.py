#!/usr/bin/env python3
"""A/B the traversal formulations on-chip: block worklist vs per-ray
worklist (ops/pallas_trace._make_*_perray).

Measures closest-hit and any-hit over three ray populations taken from a
real frame of the scene, because the formulations differ exactly in how
they price divergence:

  primary    — camera rays, fully active, screen-coherent (block's home turf)
  shadow     — cone-jittered rays toward a light from the primary hit
               points, hit-masked (~hit_frac live), divergent
  secondary  — hemisphere-sampled bounce rays from the hit points,
               hit-masked, fully divergent

Measurement defenses (every one earned by a wrong round-2 conclusion —
see STATUS.md "Measured perf truths"): fused scan of T traces per
dispatch; per-rep input perturbation + forced D2H (input-identity cache);
fresh local jit per variant (env-knob cache aliasing); round-robin reps
(slice drift).

Usage: python tools/bench_traversal.py --scene spheres1000 [--out F.json]
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
    ap.add_argument("--pdb-file", help="PDB file (e.g. the bundled protein)")
    ap.add_argument("--style", default="ball-and-stick",
                    help="display style for --pdb-file/--molecule")
    ap.add_argument("--surface", action="store_true", help="add SES surface")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--traces", type=int, default=10,
                    help="traces per fused dispatch")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--pops", help="comma-separated population filter "
                    "(e.g. dense_envnee,shadow)")
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
    from webgl_raytracer_tpu.render.integrator import (_closest_hit,
                                                       generate_camera_rays)
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera
    import webgl_raytracer_tpu.ops.pallas_trace as PS

    if args.pdb_file:
        from webgl_raytracer_tpu.models import parse_auto_detect

        with open(args.pdb_file) as f:
            mol = parse_auto_detect(f.read(), args.pdb_file)
        loaded = load_molecule_scene(mol, display_style=args.style,
                                     show_surface=args.surface)
    elif args.molecule:
        loaded = load_molecule_scene(get_builtin_molecule(args.molecule),
                                     display_style=args.style,
                                     show_surface=args.surface)
    else:
        loaded = load_random_spheres(int(args.scene.replace("spheres", "")))

    r = Renderer(loaded.scene, width=args.width, height=args.height)
    scene = r.scene        # device-resident buffers
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()
    n = px.shape[0]

    # --- Build the three ray populations from a real frame -------------
    _, o3, d3 = jax.jit(lambda uu: generate_camera_rays(
        uu, flags, px, py, jnp.uint32(0), jnp.uint32(0)))(u)
    tmin = jnp.broadcast_to(jnp.float32(u.t_min), (n,))
    rec = jax.jit(lambda a, b: _closest_hit(scene, flags, a, b, tmin,
                                            None))(o3, d3)
    hit = rec.prim_type >= 0
    hit_frac = float(np.asarray(hit).mean())
    t = jnp.where(hit, rec.t, 1.0)
    hx = tuple(o3[i] + d3[i] * t for i in range(3))
    bias = jnp.maximum(u.ray_bias, 1e-4)

    rng = np.random.default_rng(3)
    # shadow: toward light 0 with a small cone jitter (divergent but
    # roughly co-directional, like the 3-light NEE batch).
    ld = np.asarray(u.light_dir)[0]
    sd = ld[None, :] + rng.normal(size=(n, 3)).astype(np.float32) * 0.08
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    sd3 = tuple(jnp.asarray(sd[:, i]) for i in range(3))
    so3 = tuple(hx[i] + sd3[i] * bias for i in range(3))
    # secondary: hemisphere-random from the hit points.
    bd = rng.normal(size=(n, 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=1, keepdims=True)
    bd3 = tuple(jnp.asarray(bd[:, i]) for i in range(3))
    bo3 = tuple(hx[i] + bd3[i] * bias for i in range(3))

    # Dense compacted variants: the production integrator hit-first
    # permutes, so real shadow/secondary batches are ~100% ACTIVE and
    # divergent — the exact shape where the block kernel pays the cluster
    # UNION per block. Pack the hit rays contiguously (repeating to a
    # full batch so per-trace times stay comparable).
    hidx = np.flatnonzero(np.asarray(hit))
    reps = int(np.ceil(n / max(1, hidx.size)))
    dense = jnp.asarray(np.tile(hidx, reps)[:n])

    def take(t3):
        return tuple(t3[i][dense] for i in range(3))

    pops = {
        "primary": (o3, d3, None, "closest"),
        "secondary": (bo3, bd3, hit, "closest"),
        "shadow": (so3, sd3, hit, "any"),
        "dense_secondary": (take(bo3), take(bd3), None, "closest"),
        "dense_shadow": (take(so3), take(sd3), None, "any"),
        # env-NEE occlusion: ANY-hit over fully divergent (sphere-sampled)
        # directions — the shadow population above is co-directional
        # (cone toward one light); env CDF samples scatter over the whole
        # sphere, so the block union is maximal here.
        "dense_envnee": (take(bo3), take(bd3), None, "any"),
    }
    if args.pops:
        keep = set(args.pops.split(","))
        pops = {k: v for k, v in pops.items() if k in keep}

    def make_block(key, perray):
        o3k, d3k, act, kind = pops[key]

        @jax.jit
        def fused(eps):
            # The per-step origin must DEPEND on the scan index: with
            # loop-invariant inputs XLA hoists the trace out of the scan
            # and the tool measures (dispatch floor + ONE trace)/traces —
            # this produced wrong absolute numbers once (0.1*k*eps keeps
            # the perturbation ~1e-7, far below any decision boundary).
            def step(c, k):
                o3e = (o3k[0] + eps * (1.0 + 0.1 * k), o3k[1], o3k[2])
                if kind == "closest":
                    ct, cr = PS.trace_closest(scene, o3e, d3k, tmin,
                                              active=act, perray=perray)
                    return c + jnp.sum(ct * (cr >= 0)), None
                f = PS.trace_any(scene, o3e, d3k, tmin, active=act,
                                 perray=perray)
                return c + jnp.sum(f.astype(jnp.float32)), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(args.traces, dtype=jnp.float32))
            return out

        def run(rep):
            # perturb input per rep: the tunnel serves bit-identical
            # (executable, input) pairs from cache.
            return float(fused(jnp.float32(rep * 1e-6)))

        run(0)   # compile
        return run

    if not PS.perray_supported(scene):
        print(json.dumps({"error": "scene not perray-supported",
                          "clusters": scene.num_clusters}))
        return

    variants = {}
    for key in pops:
        for perray in (False, True):
            variants[f"{key}_{'perray' if perray else 'block'}"] = \
                make_block(key, perray)

    best = {k: float("inf") for k in variants}
    for i in range(1, args.reps + 1):
        for k, run in variants.items():
            t0 = time.perf_counter()
            run(i)
            best[k] = min(best[k], time.perf_counter() - t0)

    per = {k: round(v * 1000.0 / args.traces, 3) for k, v in best.items()}
    report = {
        "scene": args.pdb_file or args.molecule or args.scene,
        "clusters": scene.num_clusters,
        "rays": n,
        "hit_fraction": round(hit_frac, 4),
        "traces_per_dispatch": args.traces,
        "per_trace_ms": per,
        "speedup_perray": {
            key: round(per[f"{key}_block"] / per[f"{key}_perray"], 3)
            for key in pops
        },
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
