#!/usr/bin/env python3
"""Generic full-frame knob race: time the production frame under several
WRT_* environment variants, one variant per PROCESS (the knobs are read
at trace-build time, and cross-variant in-process timings corrupted once
on the axon tunnel — STATUS round 3). Variants run in ROUND-ROBIN rounds
(slice throughput drifts ~3x between sessions; interleaving keeps the
ordering honest), best-of over all rounds.

Presets:
  python tools/race_frame.py any3   [frames reps]   # fused 3-ray shadows
  python tools/race_frame.py pool   [frames reps]   # cross-frame pooling
  python tools/race_frame.py any3xpool [frames reps]
Custom:
  python tools/race_frame.py custom 'name1:K=V,K2=V2;name2:K=V' [frames reps]
Scene via RACE_SPHERES=10000 (default 1000) or RACE_MOLECULE=caffeine.
Writes RACE_<preset>.json to the cwd.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {
    "any3": [
        ("concat_3n", {"WRT_ANY3": "0"}),
        ("fused_any3", {"WRT_ANY3": "1"}),
    ],
    "pool": [
        ("pool1", {"WRT_POOL": "1"}),
        ("pool2", {"WRT_POOL": "2"}),
        ("pool3", {"WRT_POOL": "3"}),
        ("pool4", {"WRT_POOL": "4"}),
    ],
    "any3xpool": [
        ("concat_pool1", {"WRT_ANY3": "0", "WRT_POOL": "1"}),
        ("any3_pool1", {"WRT_ANY3": "1", "WRT_POOL": "1"}),
        ("any3_pool2", {"WRT_ANY3": "1", "WRT_POOL": "2"}),
        ("any3_pool4", {"WRT_ANY3": "1", "WRT_POOL": "4"}),
    ],
}


def run_one(frames: int, reps: int) -> None:
    import jax

    if os.environ.get("RACE_CPU"):
        # JAX_PLATFORMS is ignored here (sitecustomize preloads the axon
        # plugin); force through jax.config for CPU dress rehearsals.
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.getcwd())
    from bench import random_sphere_geometry

    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.scene import compile_scene
    from webgl_raytracer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    mol = os.environ.get("RACE_MOLECULE")
    pdb = os.environ.get("RACE_PDB")
    if mol or pdb:
        from webgl_raytracer_tpu.app.pipeline import load_molecule_scene
        from webgl_raytracer_tpu.models import (get_builtin_molecule,
                                                parse_auto_detect)

        if pdb:
            with open(pdb, encoding="utf-8") as f:
                m = parse_auto_detect(f.read(), pdb)
        else:
            m = get_builtin_molecule(mol)
        scene = load_molecule_scene(
            m, display_style=os.environ.get("RACE_STYLE", "ball-and-stick"),
            show_surface=bool(os.environ.get("RACE_SURFACE")),
        ).scene
    else:
        n_spheres = int(os.environ.get("RACE_SPHERES") or 1000)
        scene = compile_scene(random_sphere_geometry(n_spheres))
    # RACE_WIDTH/HEIGHT shrink the frame for CPU dress rehearsals of the
    # race mechanics (the production race is 1080p).
    r = Renderer(scene,
                 width=int(os.environ.get("RACE_WIDTH") or 1920),
                 height=int(os.environ.get("RACE_HEIGHT") or 1080))
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
    print(json.dumps({"frame_ms": round(dt * 1000.0, 2),
                      "device": str(jax.devices()[0])}))


def matrix(variants, label, frames: int, reps: int, rounds: int = 2) -> None:
    results = {name: {"frame_ms": float("inf")} for name, _ in variants}
    for rnd in range(rounds):
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
                d = json.loads(line[-1])
                prev = results[name].get("frame_ms", float("inf"))
                if d["frame_ms"] < prev:
                    results[name] = d
            print(f"round {rnd} {name}: {results[name]}", file=sys.stderr,
                  flush=True)
    w = os.environ.get("RACE_WIDTH") or 1920
    h = os.environ.get("RACE_HEIGHT") or 1080
    out = {
        "what": f"race_frame {label}: {w}x{h} production frame, one variant "
                "per process, round-robin best-of "
                f"({rounds} rounds x {reps} reps x {frames}-frame blocks)",
        "scene": os.environ.get("RACE_PDB") or os.environ.get("RACE_MOLECULE")
                 or f"spheres{os.environ.get('RACE_SPHERES', '1000')}",
        "results": results,
    }
    path = f"RACE_{label}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        run_one(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
    else:
        preset = sys.argv[1] if len(sys.argv) > 1 else "any3"
        if preset == "custom":
            variants = []
            for part in sys.argv[2].split(";"):
                name, _, kvs = part.partition(":")
                envs = dict(kv.split("=", 1) for kv in kvs.split(",") if kv)
                variants.append((name, envs))
            args = sys.argv[3:]
            label = "custom"
        else:
            variants = PRESETS[preset]
            args = sys.argv[2:]
            label = preset
        frames = int(args[0]) if args else 12
        reps = int(args[1]) if len(args) > 1 else 2
        rounds = int(args[2]) if len(args) > 2 else 2
        matrix(variants, label, frames, reps, rounds=rounds)
