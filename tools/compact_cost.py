#!/usr/bin/env python3
"""Price the building blocks of PER-LANE live-ray compaction on the real
chip, to decide whether a dense post-primary transport can beat the
256-lane block permutation (STATUS round-3: live blocks run shadows +
secondary at 10-25% lane occupancy; per-ARRAY per-lane gathers were
measured at ~8 ns/element = ~144 ms/frame and rejected — this tool prices
the PACKED-ROW alternative the round-3 analysis never measured).

Pieces priced (1080p batch, n = 2,073,600 rays, hit fraction ~5%):
  cumsum_n          prefix sum over [n] (position assignment)
  argsort_live      jnp.argsort(~live) — one-line stable live-first perm
  idx_two_level     block-count cumsum + per-128-block row gather + compare
  pack_state        9 x [n] components -> [n, 16] rows (stack + transpose)
  gather_capped     [cap, 16] row gather out of [n, 16]
  gather_full       [n, 16] row gather (full permutation, for reference)
  gather_128groups  [16, n/128, 128] slice gather of live 128-lane groups
  scatter_expand    [cap, 4] rows -> zeros[n, 4].at[idx].set
  per_array_capped  9 separate [cap] lane gathers (the naive capped form)

Each timing: fused 20-iteration scan with step-dependent input
perturbation (defeats hoisting + tunnel input-identity caching), best of
4 reps.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webgl_raytracer_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

N = 1920 * 1080
CAP = N // 8            # 259,200: live buffer capacity (bench hit ~5%)
T = 20                  # fused steps per timing block


def timed(name, make_step, *inputs):
    """make_step(k, *inputs) -> array; fused scan over T steps."""

    @jax.jit
    def block(*inputs):
        def step(acc, k):
            out = make_step(k, *inputs)
            return acc + out.astype(jnp.float32).sum(), None

        tot, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(T, dtype=jnp.int32))
        return tot

    np.asarray(block(*inputs))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(block(*inputs))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1000.0 / T
    print(f"{name:22s} {ms:8.3f} ms")
    return ms


def main():
    rng = np.random.default_rng(7)
    # Speckled coherent-ish liveness like the bench scene: 5% per-lane
    # with block structure (16x16 screen tiles partially covered).
    base = rng.random(N) < 0.05
    live = jnp.asarray(base)
    state9 = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(9)]
    packed = jnp.stack(state9 + state9[:7], axis=1)  # [n, 16]
    idx_cap = jnp.asarray(
        rng.integers(0, N, CAP, dtype=np.int32))
    idx_full = jnp.asarray(rng.permutation(N).astype(np.int32))
    rows4 = jnp.asarray(rng.random((CAP, 4), dtype=np.float32))
    g128 = packed.T.reshape(16, N // 128, 128)      # [16, 16200, 128]
    idx_g = jnp.asarray(rng.integers(0, N // 128, N // 128 // 8,
                                     dtype=np.int32))

    r = {}
    r["cumsum_n"] = timed(
        "cumsum_n",
        lambda k, lv: jnp.cumsum(lv.astype(jnp.int32) + k * 0), live)
    r["argsort_live"] = timed(
        "argsort_live",
        lambda k, lv: jnp.argsort(~(lv ^ (k % 2 == 1))), live)

    def two_level(k, lv, cum_rows):
        # block counts + offsets
        lv = lv ^ (k % 2 == 1)
        blk = lv.reshape(N // 128, 128)
        counts = blk.sum(axis=1)
        offs = jnp.cumsum(counts) - counts            # [16200]
        # coarse: 162 superblocks of 100 blocks -> [CAP, 162] compare
        j = jnp.arange(CAP, dtype=jnp.int32)
        sup = offs[::100]                              # [162]
        sb = jnp.sum(j[:, None] >= sup[None, :], axis=1) - 1
        # fine: gather each j's superblock's 100 offsets ([CAP,100] rows)
        offs_rows = offs.reshape(162, 100)[sb]         # [CAP, 100] gather
        fine = jnp.sum(j[:, None] >= offs_rows, axis=1) - 1
        blk_of_j = sb * 100 + fine
        # in-block rank -> lane: gather the block's 128-lane cumsum row
        rows = cum_rows[blk_of_j]                      # [CAP, 128] gather
        rank = j - offs[blk_of_j]
        lane = jnp.sum(rows <= rank[:, None], axis=1)
        return (blk_of_j * 128 + lane).astype(jnp.int32)

    cum_rows = jnp.cumsum(
        live.reshape(N // 128, 128).astype(jnp.int32), axis=1) - 1
    r["idx_two_level"] = timed("idx_two_level", two_level, live, cum_rows)

    r["pack_state"] = timed(
        "pack_state",
        lambda k, *s: jnp.stack([c + k * jnp.float32(1e-12) for c in s]
                                + list(s[:7]), axis=1),
        *state9)
    r["gather_capped"] = timed(
        "gather_capped",
        lambda k, p, i: p[(i + k) % N], packed, idx_cap)
    r["gather_full"] = timed(
        "gather_full",
        lambda k, p, i: p[(i + k) % N], packed, idx_full)
    r["gather_128groups"] = timed(
        "gather_128groups",
        lambda k, gp, i: gp[:, (i + k) % (N // 128), :], g128, idx_g)
    r["scatter_expand"] = timed(
        "scatter_expand",
        lambda k, rws, i: jnp.zeros((N, 4), jnp.float32)
        .at[(i + k) % N].set(rws), rows4, idx_cap)

    def per_array(k, i, *s):
        ii = (i + k) % N
        return sum(c[ii] for c in s)

    r["per_array_capped"] = timed("per_array_capped", per_array,
                                  idx_cap, *state9)

    import json
    print(json.dumps({k: round(v, 3) for k, v in r.items()}))


if __name__ == "__main__":
    main()
