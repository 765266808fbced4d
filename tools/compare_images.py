#!/usr/bin/env python3
"""Image parity metrics: RMSE + SSIM between two renders (the golden-image
comparison harness BASELINE.md calls for)."""

import argparse
import json

import numpy as np


def load(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float64) / 255.0


def rmse(a, b):
    return float(np.sqrt(((a - b) ** 2).mean()))


def ssim(a, b, c1=0.01 ** 2, c2=0.03 ** 2):
    """Global (single-window) SSIM on the luma channel."""
    la = a @ [0.2126, 0.7152, 0.0722]
    lb = b @ [0.2126, 0.7152, 0.0722]
    mu_a, mu_b = la.mean(), lb.mean()
    va, vb = la.var(), lb.var()
    cov = ((la - mu_a) * (lb - mu_b)).mean()
    return float(((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                 / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("image_a")
    p.add_argument("image_b")
    p.add_argument("--threshold", type=float, default=None,
                   help="exit nonzero if RMSE exceeds this")
    args = p.parse_args()
    a, b = load(args.image_a), load(args.image_b)
    if a.shape != b.shape:
        raise SystemExit(f"shape mismatch: {a.shape} vs {b.shape}")
    result = {"rmse": round(rmse(a, b), 6), "ssim": round(ssim(a, b), 6)}
    print(json.dumps(result))
    if args.threshold is not None and result["rmse"] > args.threshold:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
