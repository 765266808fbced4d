#!/usr/bin/env python3
"""Stage decomposition of the BINNED transport (render/integrator.py
_binned_transport) — where the 1080p frame's time goes after the round-5
coherence work. Cumulative stage subsets are jitted separately and timed
as fused multi-iteration scans (varying frame index defeats the tunnel's
input caching); stage costs are adjacent differences, so each line prices
exactly one production component:

  raygen     camera-ray generation
  primary    + full-width slim primary trace
  pack       + live-first index, 16-col row pack, cap gather, finalize
  b0         + chunked dense bounce 0 (3-light fan + BRDF sample)
  +rp1       + first coherence re-pack (bin_key argsort + row gather)
  +b1        + chunked dense bounce 1 (secondary trace + its shadows)
  +b2rp      + re-pack 2 and bounce 2
  +b3rp      + re-pack 3 and bounce 3
  full       + final inverse move + windowed expand (= the whole frame)

Knobs are read from the same WRT_* env vars as production; run under the
production operating point, e.g.
  WRT_WF_CAP_DIV=16 WRT_BIN_CHUNK=32768 WRT_BIN_KEY=oct_cell \
      python tools/profile_binned.py --scene spheres1000 --out F.json
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
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out")
    args = ap.parse_args()

    from webgl_raytracer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from webgl_raytracer_tpu.app.pipeline import load_random_spheres
    from webgl_raytracer_tpu.ops.wavefront import _finalize_hit
    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.render import compact as CP
    from webgl_raytracer_tpu.render.config import split_settings
    from webgl_raytracer_tpu.render.integrator import (_closest_hit,
                                                       _make_bounce_step,
                                                       generate_camera_rays)
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera

    loaded = load_random_spheres(int(args.scene.replace("spheres", "")))
    r = Renderer(loaded.scene, width=args.width, height=args.height)
    r.settings.tone_map = "linear"
    scene = r.scene
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()
    n = px.shape[0]

    div = int(os.environ.get("WRT_WF_CAP_DIV") or 16)
    cap, _ = CP.compact_cap(n, div)
    csize = min(int(os.environ.get("WRT_BIN_CHUNK") or 32768), cap)
    nchunks = cap // csize if cap % csize == 0 else 1
    csize = cap // nchunks
    cells_log2 = int(os.environ.get("WRT_BIN_CELLS") or 3)
    key_mode = os.environ.get("WRT_BIN_KEY") or "oct_cell"
    bounces = flags.max_bounces

    step = _make_bounce_step(scene, None, None, flags, u, csize)
    lanes = jnp.arange(cap, dtype=jnp.int32)

    def run_bounce(b, carry, rec=None):
        arrays = carry[:15]
        resh = tuple(a.reshape(nchunks, csize) for a in arrays)
        xs = resh if rec is None else (
            resh, jax.tree_util.tree_map(
                lambda a: a.reshape((nchunks, csize) + a.shape[1:]), rec))

        def chunk_fn(a):
            ar, rec_c = (a, None) if rec is None else a
            c = tuple(ar) + (jnp.zeros((), jnp.int32),
                             jnp.zeros((), jnp.int32))
            out = step(jnp.int32(b), c, static_bounce=b, first_rec=rec_c)
            return out[:15]

        outs = jax.lax.map(chunk_fn, xs)
        return tuple(a.reshape(cap) for a in outs) + carry[15:]

    def repack(carry, home, lo, inv_extent):
        alive_cur = carry[14]
        key = CP.bin_key((carry[1], carry[2], carry[3]),
                         (carry[4], carry[5], carry[6]),
                         lo, inv_extent, cells_log2, key_mode)
        key = jnp.where(alive_cur, key, jnp.int32(1) << 28)
        order = jnp.argsort(key, stable=True)
        packed_b = CP.pack_rows([
            carry[0], carry[1], carry[2], carry[3], carry[4], carry[5],
            carry[6], carry[7], carry[8], carry[9], carry[13],
            carry[10], carry[11], carry[12], home])
        rows_b = CP.gather_rows_perm(packed_b, order)
        n_live_b = jnp.sum(alive_cur.astype(jnp.int32))
        carry = (jax.lax.bitcast_convert_type(rows_b[:, 0], jnp.uint32),
                 rows_b[:, 1], rows_b[:, 2], rows_b[:, 3],
                 rows_b[:, 4], rows_b[:, 5], rows_b[:, 6],
                 rows_b[:, 7], rows_b[:, 8], rows_b[:, 9],
                 rows_b[:, 11], rows_b[:, 12], rows_b[:, 13],
                 rows_b[:, 10], lanes < n_live_b) + carry[15:]
        return carry, jax.lax.bitcast_convert_type(rows_b[:, 14], jnp.int32)

    def pipeline(fi, upto):
        seed, o3, d3 = generate_camera_rays(u, flags, px, py, fi,
                                            jnp.uint32(0))
        if upto == "raygen":
            return d3[0].sum() + d3[1].sum() + seed.sum().astype(jnp.float32)
        rec0 = _closest_hit(scene, flags, o3, d3, u.t_min, None,
                            full_record=False)
        if upto == "primary":
            return rec0.t.sum() + rec0.prim_slot.sum().astype(jnp.float32)
        hit = rec0.prim_slot >= 0
        n_live = jnp.sum(hit.astype(jnp.int32))
        idx = CP.live_first_index(hit, cap)
        packed = CP.pack_rows([seed] + list(o3) + list(d3)
                              + [rec0.t, rec0.prim_slot])
        rows = CP.gather_rows(packed, idx)
        alive = lanes < n_live
        seed_k = jax.lax.bitcast_convert_type(rows[:, 0], jnp.uint32)
        o3k = (rows[:, 1], rows[:, 2], rows[:, 3])
        d3k = (rows[:, 4], rows[:, 5], rows[:, 6])
        slot_k = jnp.where(alive,
                           jax.lax.bitcast_convert_type(rows[:, 8],
                                                        jnp.int32), -1)
        tmin_k = jnp.broadcast_to(u.t_min, (cap,)).astype(jnp.float32)
        rec_k = _finalize_hit(scene, o3k, d3k, tmin_k, None, rows[:, 7],
                              slot_k, cost=jnp.zeros_like(slot_k),
                              refine_sphere_t=True)
        if upto == "pack":
            return rec_k.t.sum() + rows.sum()
        lo = jnp.min(scene.cluster_bmin, axis=0)
        hi = jnp.max(scene.cluster_bmax, axis=0)
        inv_extent = 1.0 / jnp.maximum(hi - lo, 1e-6)
        ones_c = jnp.ones((cap,), jnp.float32)
        zeros_c = jnp.zeros((cap,), jnp.float32)
        carry = (seed_k, o3k[0], o3k[1], o3k[2], d3k[0], d3k[1], d3k[2],
                 ones_c, ones_c.copy(), ones_c.copy(),
                 zeros_c, zeros_c.copy(), zeros_c.copy(),
                 jnp.zeros((cap,), jnp.float32), alive)
        home = lanes
        carry = run_bounce(0, carry, rec=rec_k)
        if upto == "b0":
            return carry[10].sum() + carry[11].sum() + carry[12].sum()
        for b in range(1, bounces):
            carry, home = repack(carry, home, lo, inv_extent)
            if upto == f"rp{b}":
                return carry[10].sum() + carry[1].sum()
            carry = run_bounce(b, carry)
            if upto == f"b{b}":
                return (carry[10].sum() + carry[11].sum()
                        + carry[12].sum())
        back = jnp.argsort(home, stable=True)
        rad_rows = jnp.stack([carry[10], carry[11], carry[12],
                              jnp.zeros_like(carry[10])], axis=1)
        rad0 = CP.gather_rows_perm(rad_rows, back)
        exp = CP.expand_cols((rad0[:, 0], rad0[:, 1], rad0[:, 2]), hit)
        return exp[0].sum() + exp[1].sum() + exp[2].sum()

    stage_names = (["raygen", "primary", "pack", "b0"]
                   + [s for b in range(1, bounces)
                      for s in (f"rp{b}", f"b{b}")] + ["full"])

    runners = {}
    for name in stage_names:
        @jax.jit
        def fused(start, name=name):
            def body(acc, k):
                return acc + pipeline((start + k).astype(jnp.uint32),
                                      name), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(args.iters, dtype=jnp.int32))
            return out

        np.asarray(fused(jnp.int32(0)))     # compile
        runners[name] = fused

    best = {k: float("inf") for k in stage_names}
    for i in range(1, args.reps + 1):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            np.asarray(fn(jnp.int32(i * args.iters)))
            best[name] = min(best[name], time.perf_counter() - t0)
    per = {k: v * 1000.0 / args.iters for k, v in best.items()}
    deltas = {}
    prev = 0.0
    for name in stage_names:
        deltas[name] = round(per[name] - prev, 2)
        prev = per[name]
    report = {
        "what": "binned transport stage decomposition (cumulative jits, "
                "adjacent differences); ms per frame-equivalent",
        "scene": args.scene,
        "resolution": f"{args.width}x{args.height}",
        "cap": int(cap), "chunk": int(csize), "key": key_mode,
        "cumulative_ms": {k: round(v, 2) for k, v in per.items()},
        "stage_ms": deltas,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
