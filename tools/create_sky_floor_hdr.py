#!/usr/bin/env python3
"""Write a 64x32 sky/floor gradient HDR (parity with the reference
tools/create_sky_floor_hdr.py: blue-ish sky above the horizon, warm gray
floor below, smooth horizon blend)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from webgl_raytracer_tpu.env.hdr import save_hdr  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="assets/env/sky_floor_64x32.hdr")
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--height", type=int, default=32)
    args = p.parse_args()

    h, w = args.height, args.width
    v = (np.arange(h) + 0.5) / h            # 0 = zenith, 1 = nadir
    sky_top = np.array([0.35, 0.55, 1.0])
    sky_horizon = np.array([0.85, 0.9, 1.0])
    floor = np.array([0.45, 0.42, 0.38])
    img = np.zeros((h, w, 3), np.float32)
    for row in range(h):
        t = v[row]
        if t < 0.5:
            c = sky_top * (1 - t * 2) + sky_horizon * (t * 2)
        else:
            blend = min(1.0, (t - 0.5) * 8)
            c = sky_horizon * (1 - blend) + floor * blend
        img[row, :] = c
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_hdr(args.out, img)
    print(f"wrote {args.out} ({w}x{h})")


if __name__ == "__main__":
    main()
