#!/usr/bin/env python3
"""Mean primitives TESTED per ray, by ray population — the work-
proportionality metric VERDICT r02 item 1 asks for (the reference's
per-pixel BVH walk tests ~30-60 prims/ray, webgl.js:556-686).

Uses the kernels' with_cost counters (pallas_trace): block kernels
report 128 x clusters-swept-by-the-ray's-block (the union cost every
lane pays), per-ray kernels report 128 x the ray's own worklist pops.
Populations are built from a real frame like tools/bench_traversal.py:
primary camera rays, cone-jittered shadow rays from the hit points
(hit-masked), hemisphere secondary rays (hit-masked), and the dense
variants that model the post-compaction batches.

  python tools/cost_profile.py --scene spheres1000 [--perray] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="spheres1000")
    ap.add_argument("--molecule")
    ap.add_argument("--pdb-file", help="PDB file (e.g. the bundled protein)")
    ap.add_argument("--style", default="ball-and-stick")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--perray", action="store_true",
                    help="also measure the per-ray worklist kernels")
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
        loaded = load_molecule_scene(mol, display_style=args.style)
    elif args.molecule:
        loaded = load_molecule_scene(get_builtin_molecule(args.molecule),
                                     display_style=args.style)
    else:
        loaded = load_random_spheres(int(args.scene.replace("spheres", "")))

    r = Renderer(loaded.scene, width=args.width, height=args.height)
    scene = r.scene
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()
    n = px.shape[0]

    _, o3, d3 = jax.jit(lambda uu: generate_camera_rays(
        uu, flags, px, py, jnp.uint32(0), jnp.uint32(0)))(u)
    tmin = jnp.broadcast_to(jnp.float32(u.t_min), (n,))
    rec = jax.jit(lambda a, b: _closest_hit(scene, flags, a, b, tmin,
                                            None))(o3, d3)
    hit = rec.prim_type >= 0
    t = jnp.where(hit, rec.t, 1.0)
    hx = tuple(o3[i] + d3[i] * t for i in range(3))
    bias = jnp.maximum(u.ray_bias, 1e-4)

    rng = np.random.default_rng(3)
    ld = np.asarray(u.light_dir)[0]
    sd = ld[None, :] + rng.normal(size=(n, 3)).astype(np.float32) * 0.08
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    sd3 = tuple(jnp.asarray(sd[:, i]) for i in range(3))
    so3 = tuple(hx[i] + sd3[i] * bias for i in range(3))
    bd = rng.normal(size=(n, 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=1, keepdims=True)
    bd3 = tuple(jnp.asarray(bd[:, i]) for i in range(3))
    bo3 = tuple(hx[i] + bd3[i] * bias for i in range(3))

    hidx = np.flatnonzero(np.asarray(hit))
    reps = int(np.ceil(n / max(1, hidx.size)))
    dense = jnp.asarray(np.tile(hidx, reps)[:n])
    take = lambda t3: tuple(t3[i][dense] for i in range(3))

    pops = {
        "primary": (o3, d3, None, "closest"),
        "secondary": (bo3, bd3, hit, "closest"),
        "shadow": (so3, sd3, hit, "any"),
        "dense_secondary": (take(bo3), take(bd3), None, "closest"),
        "dense_shadow": (take(so3), take(sd3), None, "any"),
    }

    # Coherence-binned variants of the dense batches: the SAME rays
    # sorted by compact.bin_key (origin Morton cell x direction octant) —
    # the _binned_transport's re-pack order. The block kernels' union
    # cost on these orders is exactly what the binned transport pays.
    from webgl_raytracer_tpu.render import compact as CP

    lo = jnp.min(scene.cluster_bmin, axis=0)
    hi = jnp.max(scene.cluster_bmax, axis=0)
    inv_extent = 1.0 / jnp.maximum(hi - lo, 1e-6)

    def binned(o, d, mode):
        key = CP.bin_key(o, d, lo, inv_extent, 3, mode)
        order = jnp.argsort(key, stable=True)
        return (tuple(o[i][order] for i in range(3)),
                tuple(d[i][order] for i in range(3)))

    key_mode = os.environ.get("WRT_BIN_KEY") or "oct_cell"
    bso, bsd = binned(take(bo3), take(bd3), key_mode)
    pops["binned_secondary"] = (bso, bsd, None, "closest")
    boo, bod = binned(take(so3), take(sd3), key_mode)
    pops["binned_shadow"] = (boo, bod, None, "any")

    variants = [False] + ([True] if args.perray
                          and PS.perray_supported(scene) else [])
    report = {"scene": args.pdb_file or args.molecule or args.scene,
              "clusters": int(scene.num_clusters),
              "rays": int(n),
              "hit_fraction": round(float(np.asarray(hit).mean()), 4),
              "mean_prims_tested_per_ray": {},
              "reference_for_scale": "~30-60 (per-pixel BVH walk, "
                                     "webgl.js:556-686)",
              "device": str(jax.devices()[0])}
    for perray in variants:
        key = "perray" if perray else "block"
        sub = {}
        for name, (o, d, act, kind) in pops.items():
            if kind == "closest":
                fn = jax.jit(lambda o, d, act=act, perray=perray:
                             PS.trace_closest(scene, o, d, tmin, active=act,
                                              perray=perray,
                                              with_cost=True)[-1])
            else:
                fn = jax.jit(lambda o, d, act=act, perray=perray:
                             PS.trace_any(scene, o, d, tmin, active=act,
                                          perray=perray, with_cost=True)[-1])
            cost = np.asarray(fn(o, d))
            live = (np.asarray(act) if act is not None
                    else np.ones(n, bool))
            sub[name] = round(float(cost[live].mean()), 1)
        report["mean_prims_tested_per_ray"][key] = sub
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
