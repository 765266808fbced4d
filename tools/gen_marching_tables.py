#!/usr/bin/env python3
"""Validate / dump the marching-cubes lookup tables
(webgl_raytracer_tpu/assets/marching_cubes.npz).

The 256-entry edge/triangle tables are the classic published marching
cubes tables. This tool checks internal consistency (the edge bitmask of
every case must equal the union of edges referenced by its triangle list
— the invariant the reference's table generator relied on) and can dump
them as Python/Rust source.
"""

import argparse
import os
import sys

import numpy as np

ASSET = os.path.join(os.path.dirname(__file__), "..",
                     "webgl_raytracer_tpu", "assets", "marching_cubes.npz")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dump", choices=("py", "rs"), help="print tables as source")
    args = p.parse_args()
    data = np.load(ASSET)
    edge = data["edge_table"]
    tri = data["tri_table"]
    assert edge.shape == (256,) and tri.shape == (256, 16)

    for ci in range(256):
        edges_used = 0
        row = tri[ci]
        for k in range(0, 16, 3):
            if k + 2 >= 16 or row[k] < 0:
                break
            for e in row[k:k + 3]:
                edges_used |= 1 << int(e)
        if edges_used != int(edge[ci]):
            print(f"INCONSISTENT case {ci}: edge=0x{int(edge[ci]):x} "
                  f"tri-union=0x{edges_used:x}")
            sys.exit(1)
    print("tables consistent (256 cases)")

    if args.dump == "py":
        print("EDGE_TABLE =", edge.tolist())
        print("TRI_TABLE =", tri.tolist())
    elif args.dump == "rs":
        vals = ", ".join(f"0x{v:x}" for v in edge.tolist())
        print(f"pub const EDGE_TABLE: [u16; 256] = [{vals}];")


if __name__ == "__main__":
    main()
