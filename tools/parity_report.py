#!/usr/bin/env python3
"""Image-parity harness: render the bundled scenes at fixed configurations
and report RMSE/SSIM against a reference image directory.

BASELINE.md's parity criterion is <=1e-3 RMSE vs the WebGL reference on the
bundled molecule set. The WebGL app can't run in this environment, so this
tool renders the deterministic configurations and:

  * with --ref-dir REF: compares each render to REF/<name>.png (images
    captured from the reference app at the same camera/settings) and
    prints per-scene RMSE/SSIM plus a pass/fail line per image;
  * without --ref-dir: writes the renders to --out-dir as the comparison
    set (and, if the file already exists there, reports drift against it —
    a self-consistency regression check).

Configurations (fixed seeds, fixed camera fit, linear tone map):
  <molecule>-bas      ball-and-stick, 3 lights, no env
  <molecule>-vdw      space-filling, analytic sky
  primitives          the synthetic primitives scene
  spheres1000         the 1000-sphere scaling scene
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def configs():
    from webgl_raytracer_tpu.app.pipeline import (
        load_molecule_scene, load_random_spheres, load_test_primitives)
    from webgl_raytracer_tpu.models import get_builtin_molecule

    for name in ("caffeine", "aspirin", "ethanol"):
        yield f"{name}-bas", lambda n=name: (
            load_molecule_scene(get_builtin_molecule(n)), False)
        yield f"{name}-vdw", lambda n=name: (
            load_molecule_scene(get_builtin_molecule(n),
                                display_style="vdw"), True)
    yield "primitives", lambda: (load_test_primitives(), False)
    yield "spheres1000", lambda: (load_random_spheres(1000), False)


def render(loaded, use_sky, width, height, frames):
    from webgl_raytracer_tpu.env import EnvironmentController
    from webgl_raytracer_tpu.render import Renderer

    env = EnvironmentController().load_analytic_sky() if use_sky else None
    r = Renderer(loaded.scene, env=env, width=width, height=height)
    r.settings.tone_map = "linear"
    r.settings.max_frames = 10 ** 9
    r.render_frames(frames)
    return r.image_u8()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-dir", help="directory of reference PNGs")
    ap.add_argument("--out-dir", default="parity_out")
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=300)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--rmse-threshold", type=float, default=1e-3)
    args = ap.parse_args()

    from PIL import Image

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from compare_images import rmse, ssim

    os.makedirs(args.out_dir, exist_ok=True)
    failures = 0
    for name, loader in configs():
        loaded, use_sky = loader()
        img = render(loaded, use_sky, args.width, args.height, args.frames)
        out_path = os.path.join(args.out_dir, f"{name}.png")

        ref_path = None
        if args.ref_dir:
            ref_path = os.path.join(args.ref_dir, f"{name}.png")
        elif os.path.exists(out_path):
            ref_path = out_path

        if ref_path and os.path.exists(ref_path):
            ref = np.asarray(Image.open(ref_path).convert("RGB"))
            if ref.shape != img.shape:
                print(f"{name}: SKIP (shape {ref.shape} vs {img.shape})")
                continue
            a = img.astype(np.float64) / 255.0
            b = ref.astype(np.float64) / 255.0
            e = rmse(a, b)
            s = ssim(a, b)
            ok = e <= args.rmse_threshold
            failures += 0 if ok else 1
            print(f"{name}: RMSE {e:.6f}  SSIM {s:.4f}  "
                  f"{'PASS' if ok else 'FAIL'} (threshold {args.rmse_threshold})")
        else:
            print(f"{name}: rendered (no reference to compare)")
        Image.fromarray(img, "RGB").save(out_path)

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
