#!/usr/bin/env python3
"""Regenerate assets/env/manifest.json from the .hdr files present
(parity with tools/update_env_manifest.py / update_hdr_manifest.sh)."""

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="assets/env")
    args = p.parse_args()
    entries = [
        {"name": os.path.splitext(f)[0].replace("_", " "), "file": f}
        for f in sorted(os.listdir(args.dir))
        if f.lower().endswith(".hdr")
    ]
    path = os.path.join(args.dir, "manifest.json")
    with open(path, "w") as f:
        json.dump(entries, f, indent=2)
    print(f"wrote {path} ({len(entries)} environments)")


if __name__ == "__main__":
    main()
