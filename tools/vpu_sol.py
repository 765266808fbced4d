#!/usr/bin/env python3
"""VPU speed-of-light probe: how fast does the chip execute the traversal
sweep's op mix on [1024, 128] f32 blocks?

Runs a Pallas kernel that performs `iters` sphere-test-shaped sweeps (same
op mix as pallas_trace._prim_ts: ~24 elementwise ops incl. one sqrt) per
grid step, and reports ns per sweep. Multiply by measured visits/frame to
get the traversal's floor on this chip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, C = 1024, 128


def make_kernel(iters, dtype=jnp.float32):
    """dtype=bfloat16 measures the same op mix in bf16 (VPU registers pack
    two bf16 per f32 word; whether the ALUs execute packed-2x on this chip
    is exactly what this probe decides before any bf16 traversal work —
    VERDICT r03 item 6). Inputs convert once outside the loop; the
    accumulator and compares stay in the compute dtype."""

    def kernel(a_ref, s_ref, out_ref, bt_ref):
        dx = a_ref[:, 0:1].astype(dtype)
        dy = a_ref[:, 1:2].astype(dtype)
        dz = a_ref[:, 2:3].astype(dtype)
        ox = a_ref[:, 3:4].astype(dtype)
        oy = a_ref[:, 4:5].astype(dtype)
        oz = a_ref[:, 5:6].astype(dtype)
        tmin = a_ref[:, 6:7].astype(dtype)
        bt_ref[:] = jnp.full((B, C), 1e20, dtype)

        def body(k, carry):
            kf = k.astype(dtype) * dtype(1e-3)
            cx = s_ref[pl.ds(3 * (k % 8), 1), :].astype(dtype) + kf
            cy = s_ref[pl.ds(3 * (k % 8) + 1, 1), :].astype(dtype) + kf
            cz = s_ref[pl.ds(3 * (k % 8) + 2, 1), :].astype(dtype) + kf
            sx = ox - cx
            sy = oy - cy
            sz = oz - cz
            b = sx * dx + sy * dy + sz * dz
            cterm = sx * sx + sy * sy + sz * sz - cx * cx
            disc = b * b - cterm
            sq = jnp.sqrt(disc)
            t0 = -b - sq
            ts = jnp.where(t0 > tmin, t0, -b + sq)
            ts = jnp.where(ts > tmin, ts, dtype(-1.0))
            bt = bt_ref[:]
            upd = (ts > dtype(0.0)) & (ts < bt)
            bt_ref[:] = jnp.where(upd, ts, bt)
            return carry

        jax.lax.fori_loop(0, iters, body, 0)
        out_ref[:] = jnp.min(bt_ref[:], axis=1).astype(jnp.float32)

    return kernel


def run(iters, dtype):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(B, 16)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(24, C)).astype(np.float32))

    fn = pl.pallas_call(
        make_kernel(iters, dtype),
        out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
        in_specs=[pl.BlockSpec((B, 16), lambda: (0, 0)),
                  pl.BlockSpec((24, C), lambda: (0, 0))],
        out_specs=pl.BlockSpec((B,), lambda: (0,)),
        scratch_shapes=[pltpu.VMEM((B, C), dtype)],
    )
    jitted = jax.jit(fn)
    out = jitted(a, s)
    jax.block_until_ready(out)
    best = float("inf")
    for i in range(8):
        a_i = a + np.float32(i) * 1e-6   # defeat any input-identity caching
        t0 = time.perf_counter()
        np.asarray(jitted(a_i, s))       # D2H forces real completion
        best = min(best, time.perf_counter() - t0)
    per_sweep_ns = best / iters * 1e9
    ops = 24 * B * C
    print(f"{np.dtype(dtype).name:9s} iters={iters} total={best*1e3:.3f} ms"
          f"  per-sweep={per_sweep_ns:.0f} ns"
          f"  ~{ops/ (per_sweep_ns*1e-9) / 1e12:.2f} Tops/s effective")
    return per_sweep_ns


def main():
    # Default sized so compute >> the tunnel's ~25 ms dispatch floor
    # (512 iters = 1.6 ms of sweeps, pure floor — measured 51.9 us/sweep
    # nonsense before this was raised).
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    f32 = run(iters, jnp.float32)
    try:
        bf16 = run(iters, jnp.bfloat16)
        print(f"bf16 speedup over f32: {f32 / bf16:.2f}x")
    except Exception as exc:
        # Measured on this stack (TPU v5e, round 4): Mosaic FAILS to
        # legalize bf16 elementwise arith ("failed to legalize operation
        # 'arith.mulf' : (bf16, bf16) -> bf16"), so a bf16 candidate
        # sweep is impossible at the toolchain level — bf16 reaches this
        # kernel's math only via MXU matmuls (which the per-ray gather
        # already uses). VERDICT r03 item 6 is thereby answered:
        # rejected, with this probe as the evidence.
        msg = str(exc).splitlines()
        head = next((l for l in msg if "legalize" in l), msg[0] if msg else "")
        print(f"bf16 sweep: UNSUPPORTED by Mosaic on this chip ({head.strip()})")


if __name__ == "__main__":
    main()
