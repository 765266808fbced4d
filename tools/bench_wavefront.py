#!/usr/bin/env python3
"""Race the bounce-major wavefront transport (per-bounce live-ray
re-compaction, integrator._wavefront_transport) against the permuted and
single-pack compact paths on the 1080p bench scenes. One variant per
PROCESS (the WRT_* knobs are read at trace-build time); this wrapper
spawns itself.

Usage:
  python tools/bench_wavefront.py [frames] [reps]   # full matrix
  BC_SPHERES=10000 python tools/bench_wavefront.py  # 10k-sphere scene
  WRT_* set + python tools/bench_wavefront.py --one <frames> <reps>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(frames: int, reps: int) -> None:
    n_spheres = int(os.environ.get("BC_SPHERES") or 1000)
    import jax

    sys.path.insert(0, os.getcwd())
    from bench import random_sphere_geometry

    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.scene import compile_scene
    from webgl_raytracer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    scene = compile_scene(random_sphere_geometry(n_spheres))
    r = Renderer(scene, width=1920, height=1080)
    r.settings.tone_map = "linear"
    r.settings.max_frames = 10 ** 9
    if os.environ.get("BC_BOUNCES"):
        r.settings.max_bounces = int(os.environ["BC_BOUNCES"])
    if os.environ.get("BC_NO_SHADOWS"):
        r.settings.cast_shadows = False
    r.render_frames(frames)
    jax.block_until_ready(r._accum)
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r.render_frames(frames)
        jax.block_until_ready(r._accum)
        dt = min(dt, (time.perf_counter() - t0) / frames)
    print(json.dumps({"frame_ms": round(dt * 1000.0, 1)}))


def matrix() -> None:
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spheres = os.environ.get("BC_SPHERES", "1000")
    variants = [
        (f"permuted n={spheres}",
         {"WRT_WAVEFRONT": "0", "WRT_COMPACT": "0"}),
        (f"compact n={spheres}",
         {"WRT_WAVEFRONT": "0", "WRT_COMPACT": "1"}),
    ]
    for div in (4, 8):
        for rep in ("9", "2", "1"):
            variants.append(
                (f"wavefront div={div} repacks={rep} n={spheres}",
                 {"WRT_WAVEFRONT": "1", "WRT_COMPACT": "0",
                  "WRT_WF_CAP_DIV": str(div), "WRT_WF_REPACKS": rep}))
    results = {}
    for name, envs in variants:
        env = dict(os.environ)
        env.update(envs)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             str(frames), str(reps)],
            env=env, capture_output=True, text=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            results[name] = {"error": out.stderr[-500:]}
        else:
            results[name] = json.loads(line[-1])
        print(f"{name}: {results[name]}", file=sys.stderr, flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        run_one(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
    else:
        matrix()
