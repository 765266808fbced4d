#!/usr/bin/env python3
"""Write a 1x1 pure-white Radiance HDR (the neutral env used for furnace
style setups; parity with the reference tools/create_white_hdr.py)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from webgl_raytracer_tpu.env.hdr import save_hdr  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="assets/env/white_1x1.hdr")
    p.add_argument("--value", type=float, default=1.0)
    args = p.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_hdr(args.out, np.full((1, 1, 3), args.value, np.float32))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
