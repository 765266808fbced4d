#!/usr/bin/env python3
"""On-TPU kernel validation lane: run the COMPILED (non-interpret) Pallas
kernels against the pure-XLA paths on the real chip and assert equivalence.

The pytest suite exercises the kernels only under interpret=True on the CPU
mesh (tests/test_pallas.py); Mosaic compilation
differences (precision, lane stores, layout quirks) only show up on
hardware. This script is that missing lane — run it whenever kernels
change:

  python tools/tpu_smoke.py            # all checks
  python tools/tpu_smoke.py --fast     # skip the 1080p timing probe

Checks:
  1. traversal kernel closest-hit vs the XLA wavefront sweep — all prim
     types, t and winning-row agreement;
  2. traversal kernel any-hit vs XLA (shadow predicate semantics);
  3. binned (production) transport frame vs the permuted transport frame,
     compiled on chip — must be bit-identical (pure lane permutation);
  4. (unless --fast) a timing probe on the 1000-sphere bench scene.

Exit code 0 = all equivalences hold on this chip.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    from webgl_raytracer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() not in ("tpu",):
        print(f"SKIP: backend is {jax.default_backend()}, not tpu")
        return 0

    from webgl_raytracer_tpu.app.pipeline import (load_molecule_scene,
                                                  load_random_spheres)
    from webgl_raytracer_tpu.models import get_builtin_molecule
    from webgl_raytracer_tpu.ops import pallas_trace as PS
    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.render.config import split_settings
    from webgl_raytracer_tpu.render.integrator import _sample_radiance
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera

    failures = []

    def check(name, ok, detail=""):
        print(f"{'ok  ' if ok else 'FAIL'} {name} {detail}")
        if not ok:
            failures.append(name)

    # --- 1+2: traversal kernel vs XLA sweep on a mixed-prim scene ---------
    loaded = load_molecule_scene(get_builtin_molecule("caffeine"))
    scene = Renderer(loaded.scene).scene   # device_put
    rng = np.random.default_rng(3)
    n = 4096
    lo, hi = np.asarray(scene.node_bmin[0]), np.asarray(scene.node_bmax[0])
    mid, span = (lo + hi) / 2, (hi - lo)
    o = (mid + (rng.random((n, 3)) - 0.5) * span * 3).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o3 = tuple(jnp.asarray(o[:, i]) for i in range(3))
    d3 = tuple(jnp.asarray(d[:, i]) for i in range(3))
    t_min = jnp.full((n,), 1e-4, jnp.float32)

    t_k, row_k = jax.jit(lambda *a: PS.trace_closest(scene, *a))(o3, d3, t_min)
    from webgl_raytracer_tpu.ops.wavefront import wf_trace_closest_v3

    rec = jax.jit(lambda *a: wf_trace_closest_v3(
        scene, a[0], a[1], a[2], use_pallas=False))((o3), (d3), t_min)
    t_k = np.asarray(t_k)
    row_k = np.asarray(row_k)
    t_x = np.asarray(rec.t)
    slot_x = np.asarray(rec.prim_slot)
    hit_agree = (row_k >= 0) == (slot_x >= 0)
    both = (row_k >= 0) & (slot_x >= 0)
    # winner row may differ on exact ulp ties; t must agree to f32 tolerance
    rel = np.abs(t_k[both] - t_x[both]) / np.maximum(t_x[both], 1e-3)
    check("closest-hit kernel vs XLA (hits)", hit_agree.mean() > 0.999,
          f"hit agreement {hit_agree.mean():.4f}")
    check("closest-hit kernel vs XLA (t)", float(rel.max(initial=0)) < 2e-3,
          f"max rel dt {rel.max(initial=0):.2e}")

    from webgl_raytracer_tpu.ops.wavefront import wf_trace_any_v3

    any_k = np.asarray(jax.jit(lambda *a: PS.trace_any(scene, *a))(o3, d3, t_min))
    any_x = np.asarray(jax.jit(lambda *a: wf_trace_any_v3(
        scene, a[0], a[1], a[2], use_pallas=False))((o3), (d3), t_min))
    agree = (any_k == any_x).mean()
    check("any-hit kernel vs XLA", agree > 0.999, f"agreement {agree:.4f}")

    # --- 3: binned transport vs permuted transport, COMPILED on chip ------
    # (replaced the deleted path-megakernel leg, round 5: the binned
    # transport is the production default and must reproduce the permuted
    # frame bit-for-bit on the real compiled kernels, not just in the CPU
    # interpret-mode tests.)
    r = Renderer(loaded.scene, width=96, height=96)
    r.settings.tone_map = "linear"
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()

    def frame_with(knobs):
        os.environ.update(knobs)
        try:
            rad, _ = jax.jit(lambda u, px, py: _sample_radiance(
                r.scene, None, None, flags, u, px, py, jnp.uint32(0), 0))(
                    u, px, py)
            return np.stack([np.asarray(c) for c in rad], -1)
        finally:
            for k in knobs:
                del os.environ[k]

    a = frame_with({"WRT_BINNED": "1", "WRT_CHUNKS": "3"})
    b = frame_with({"WRT_BINNED": "0", "WRT_CHUNKS": "3"})
    same = float((a == b).mean())
    check("binned vs permuted transport (compiled)", same == 1.0,
          f"bit-identical fraction {same:.6f}")

    # --- 3b: large-scene (multi-group, >131k prims) kernel lane -----------
    big = load_random_spheres(150000)
    bscene = Renderer(big.scene).scene
    check("150k-prim scene on kernel path",
          PS.supports(bscene, None),
          f"{bscene.num_clusters} clusters")
    lo, hi = np.asarray(bscene.node_bmin[0]), np.asarray(bscene.node_bmax[0])
    mid, span = (lo + hi) / 2, (hi - lo)
    o = (mid + (rng.random((n, 3)) - 0.5) * span * 2).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o3b = tuple(jnp.asarray(o[:, i]) for i in range(3))
    d3b = tuple(jnp.asarray(d[:, i]) for i in range(3))
    t_k, row_k = jax.jit(lambda *a: PS.trace_closest(bscene, *a))(
        o3b, d3b, t_min)
    rec = jax.jit(lambda *a: wf_trace_closest_v3(
        bscene, a[0], a[1], a[2], use_pallas=False))(o3b, d3b, t_min)
    row_k = np.asarray(row_k)
    slot_x = np.asarray(rec.prim_slot)
    hit_agree = (row_k >= 0) == (slot_x >= 0)
    both = (row_k >= 0) & (slot_x >= 0)
    rel = (np.abs(np.asarray(t_k)[both] - np.asarray(rec.t)[both])
           / np.maximum(np.asarray(rec.t)[both], 1e-3))
    check("150k closest-hit kernel vs XLA", hit_agree.mean() > 0.999
          and float(rel.max(initial=0)) < 2e-3,
          f"hits {hit_agree.mean():.4f}, rel dt {rel.max(initial=0):.2e}, "
          f"hit frac {float(both.mean()):.2f}")

    # --- 3b: per-ray worklist kernels vs block kernels, compiled ----------
    # Interpret tests cover these too, but Mosaic divergence is invisible
    # there; this leg pins the on-chip bit-exactness the secondary-trace
    # auto-routing (perray_auto_secondary) relies on.
    from webgl_raytracer_tpu.models.molecular import Geometry
    from webgl_raytracer_tpu.scene import compile_scene

    prng = np.random.default_rng(23)
    _ns, _nc = 5000, 4000
    _p1 = (prng.random((_nc, 3)).astype(np.float32) - 0.5) * 30
    mixed_big = Renderer(compile_scene(Geometry(
        ((prng.random((_ns, 3)) - 0.5) * 30).astype(np.float32),
        (0.15 + prng.random(_ns) * 0.3).astype(np.float32),
        prng.random((_ns, 3)).astype(np.float32),
        _p1, _p1 + prng.normal(size=(_nc, 3)).astype(np.float32) * 1.2,
        (0.05 + prng.random(_nc) * 0.1).astype(np.float32),
        prng.random((_nc, 3)).astype(np.float32)))).scene
    _nt = 9000
    _v0 = ((prng.random((_nt, 3)) - 0.5) * 30).astype(np.float32)
    trimix_big = Renderer(compile_scene(Geometry(
        ((prng.random((400, 3)) - 0.5) * 30).astype(np.float32),
        (0.15 + prng.random(400) * 0.3).astype(np.float32),
        prng.random((400, 3)).astype(np.float32),
        _p1[:200], _p1[:200] + prng.normal(size=(200, 3)).astype(np.float32),
        (0.05 + prng.random(200) * 0.1).astype(np.float32),
        prng.random((200, 3)).astype(np.float32)),
        tri_verts=np.stack([_v0,
                            _v0 + prng.normal(size=(_nt, 3)).astype(np.float32),
                            _v0 + prng.normal(size=(_nt, 3)).astype(np.float32)],
                           axis=1))).scene
    for label, prs in (("10k spheres", Renderer(
            load_random_spheres(10000).scene).scene),
                       ("sphere+cyl mixed", mixed_big),
                       ("150k multi-group", bscene),
                       ("tri-mix (cartoon-shaped)", trimix_big)):
        if not PS.perray_supported(prs):
            check(f"per-ray kernel support ({label})", False,
                  "perray_supported returned False")
            continue
        # Scene-fitted ray batch (origins around each scene's own root).
        plo = np.asarray(jnp.min(prs.cluster_bmin, axis=0))
        phi = np.asarray(jnp.max(prs.cluster_bmax, axis=0))
        pmid, pspan = (plo + phi) / 2, (phi - plo)
        op = (pmid + (rng.random((n, 3)) - 0.5) * pspan * 1.5).astype(np.float32)
        o3p = tuple(jnp.asarray(op[:, i]) for i in range(3))
        act = jnp.asarray(rng.random(n) < 0.5)
        tb, rb = jax.jit(lambda *a, prs=prs: PS.trace_closest(
            prs, *a, active=act, perray=False))(o3p, d3, t_min)
        tp, rp = jax.jit(lambda *a, prs=prs: PS.trace_closest(
            prs, *a, active=act, perray=True))(o3p, d3, t_min)
        ab = jax.jit(lambda *a, prs=prs: PS.trace_any(
            prs, *a, active=act, perray=False))(o3p, d3, t_min)
        app = jax.jit(lambda *a, prs=prs: PS.trace_any(
            prs, *a, active=act, perray=True))(o3p, d3, t_min)
        rows_eq = bool((np.asarray(rb) == np.asarray(rp)).all())
        hitm = np.asarray(rb) >= 0
        t_eq = bool((np.asarray(tb)[hitm] == np.asarray(tp)[hitm]).all())
        any_eq = bool((np.asarray(ab) == np.asarray(app)).all())
        check(f"per-ray vs block kernels ({label}, compiled, K="
              f"{prs.num_clusters})", rows_eq and t_eq and any_eq,
              f"rows_eq {rows_eq}, t_eq {t_eq}, any_eq {any_eq}, "
              f"hits {int(hitm.sum())}")

    # --- 4: timing probe ---------------------------------------------------
    if not args.fast:
        bench = load_random_spheres(1000)
        rb = Renderer(bench.scene, width=1920, height=1080)
        rb.settings.tone_map = "linear"
        rb.settings.max_frames = 10 ** 9
        rb.render_frames(2)
        np.asarray(rb.accumulated())
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            rb.render_frames(2)
            np.asarray(rb.accumulated())
            best = min(best, (time.perf_counter() - t0) / 2)
        print(f"timing: 1080p bench frame {best*1000:.1f} ms")

    print("SMOKE", "PASS" if not failures else f"FAIL: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
