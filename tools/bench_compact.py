#!/usr/bin/env python3
"""Race the per-lane compaction transport (render/compact.py) against the
block-permutation path on the 1000-sphere 1080p bench scene, across the
cap-divisor and scan-chunk knobs. One variant per PROCESS (the knobs are
read at trace-build time); this wrapper spawns itself.

Usage:
  python tools/bench_compact.py            # full matrix, prints JSON table
  WRT_* set + python tools/bench_compact.py --one <frames> <reps>
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
    variants = [(f"permuted n={spheres}", {"WRT_COMPACT": "0"})]
    for div in (8, 12, 16):
        variants.append((f"compact div={div} unchunked n={spheres}",
                         {"WRT_COMPACT_CAP_DIV": str(div),
                          "WRT_COMPACT_CHUNK": "1000000000"}))
    for div in (8,):
        for chunk in (16384, 32768, 65536, 131072):
            variants.append((f"compact div={div} chunk={chunk} n={spheres}",
                             {"WRT_COMPACT_CAP_DIV": str(div),
                              "WRT_COMPACT_CHUNK": str(chunk)}))
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
