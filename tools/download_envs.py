#!/usr/bin/env python3
"""Download a small set of CC0 Polyhaven 1k HDRIs into assets/env (parity
with the reference tools/download_envs.py). Needs network access; in
offline environments use create_white_hdr.py / create_sky_floor_hdr.py or
the built-in analytic sky instead."""

import argparse
import os
import urllib.request

ENVS = [
    "studio_small_03",
    "venice_sunset",
    "kloppenheim_02",
    "lebombo",
    "moonless_golf",
]
URL = "https://dl.polyhaven.org/file/ph-assets/HDRIs/hdr/1k/{name}_1k.hdr"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="assets/env")
    args = p.parse_args()
    os.makedirs(args.dir, exist_ok=True)
    for name in ENVS:
        out = os.path.join(args.dir, f"{name}_1k.hdr")
        if os.path.exists(out):
            print(f"skip {out} (exists)")
            continue
        url = URL.format(name=name)
        print(f"fetching {url}")
        try:
            urllib.request.urlretrieve(url, out)  # noqa: S310
        except Exception as exc:  # zero-egress environments
            print(f"  failed: {exc}")


if __name__ == "__main__":
    main()
