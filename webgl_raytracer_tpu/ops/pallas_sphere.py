"""Pallas TPU traversal kernel for all-sphere scenes.

The wavefront tracer's dense sweep (ops/wavefront.py) is a chain of XLA
elementwise ops over [B, C] tiles; every intermediate is scheduled by XLA
and the per-cluster dot products round-trip through HBM at block
boundaries. This kernel fuses the whole sweep in VMEM and moves the
pairwise ray x sphere dot products onto the MXU:

  For the quadratic |o + t d - c|^2 = r^2 with unit d:
      b  = d.(o - c)        = d.o - d.c
      c0 = |o - c|^2 - r^2  = |o|^2 - 2 o.c + |c|^2 - r^2
  Every pairwise term is bilinear in (per-ray, per-sphere) quantities, so
  packing rays as A = [dx dy dz ox oy oz d.o |o|^2 1 ...] ([B, 16]) and
  spheres as two weight matrices W1/W2 ([16, C] per cluster) gives
      -b = A @ W1,   c0 = A @ W2
  as two tiny-K matmuls per cluster — MXU work — followed by a short
  elementwise tail (discriminant, roots, GLSL root selection
  webgl.js:270-307) and an elementwise best-(t, cluster) update per lane.
  One cross-lane reduction at the very end recovers the per-ray closest
  primitive. Cluster AABBs are slab-tested per block in 1-D lane form and
  whole clusters are skipped when no ray in the block enters them.

Numerical note: the expanded quadratic loses |o|^2-scale ulps, so rays and
spheres are shifted to scene-centered coordinates first (b, c0 and t are
translation-invariant); the dense sweep's cluster-local recentering
(ops/wavefront.py intersect_soa_t) plays the same role.

Used automatically by wf_trace_closest_v3/any_v3 for sphere-only scenes
(vdW molecules, the random-sphere scaling scenes of src/main.js:348-460)
on the TPU backend; everything else takes the XLA wavefront path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.float32(1e20)
INF = np.float32(np.inf)
BLOCK = 1024          # rays per kernel program (DMA granularity)
SUB = 1024            # rays per traversal worklist. Narrower frustums
                      # overlap fewer clusters but serialize extra worklists
                      # per program; measured on v5e, one worklist per
                      # 1024-ray program wins on both scaling scenes.
SUBS = BLOCK // SUB
MAX_CLUSTERS = 256    # W1/W2 VMEM budget: 2 * K * 16*128*4B = 4 MB at 256
EXIT_BOUND = True     # front-to-back early exit for fully-hit sub-blocks


def _slab_entry(bb, k, od):
    """Conservative 1-D [SUB] slab test against cluster k's AABB.
    Mirrors ops/wavefront.cluster_entry_t (including the parallel-axis
    inside check) — used only to skip clusters, never to accept hits."""
    tn = jnp.full((SUB,), -BIG)
    tf = jnp.full((SUB,), BIG)
    ok = jnp.ones((SUB,), bool)
    for axis in range(3):
        o = od[axis]
        d = od[3 + axis]
        lo = bb[k, axis]
        hi = bb[k, 3 + axis]
        parallel = jnp.abs(d) < 1e-8
        inv = 1.0 / jnp.where(parallel, 1.0, d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        tn = jnp.maximum(tn, jnp.where(parallel, -BIG, jnp.minimum(t1, t2)))
        tf = jnp.minimum(tf, jnp.where(parallel, BIG, jnp.maximum(t1, t2)))
        ok &= ~parallel | ((o >= lo) & (o <= hi))
    hit = ok & (tf >= jnp.maximum(tn, 0.0))
    return jnp.where(hit, jnp.maximum(tn, 0.0), INF)


def _sphere_ts(a_blk, w1_ref, w2_ref, k):
    """[BLOCK, C] candidate hit distances for cluster k (-1 = no hit)."""
    w1 = w1_ref[pl.ds(k * 16, 16), :]
    w2 = w2_ref[pl.ds(k * 16, 16), :]
    # Full-f32 MXU passes: the default bf16 path loses ~1e-2 relative on
    # the quadratic's b/c0 and misclassifies grazing hits.
    nb = jnp.dot(a_blk, w1, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)              # -b
    c0 = jnp.dot(a_blk, w2, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    tmin = a_blk[:, 9:10]
    disc = nb * nb - c0
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t0 = nb - sq
    t1 = nb + sq
    ts = jnp.where(t0 > tmin, t0, t1)
    return jnp.where(ok & (ts > tmin), ts, -1.0)


def _block_entries(num_k, bb_ref, od, t_cap=None):
    """[1, MAX_CLUSTERS] of each cluster's nearest entry distance over the
    block's rays (INF if no ray enters it, or if every entering ray's entry
    exceeds its t_cap). Kept as a loop-carried value — Mosaic has no
    dynamic single-lane stores — and consumed nearest-first."""
    kio = jax.lax.broadcasted_iota(jnp.int32, (1, MAX_CLUSTERS), 1)
    act = od[6]                     # 1.0 live / 0.0 dead (od row 7)

    def body(k, ev):
        entry = _slab_entry(bb_ref, k, od)
        entry = jnp.where(act > 0.0, entry, INF)
        if t_cap is not None:
            entry = jnp.where(entry < t_cap, entry, INF)
        return jnp.where(kio == k, jnp.min(entry), ev)

    ev = jax.lax.fori_loop(0, num_k, body,
                           jnp.full((1, MAX_CLUSTERS), INF, jnp.float32))
    return ev, kio


def _pop_nearest(ev, kio):
    """(min entry, its cluster index) over the remaining worklist."""
    m = jnp.min(ev)
    idx = jnp.min(jnp.where(ev == m, kio, jnp.int32(MAX_CLUSTERS)))
    return m, idx


def _closest_kernel(num_k_ref, a_ref, od_ref, w1_ref, w2_ref, bb_ref,
                    t_out, row_out, bt_ref, bk_ref):
    num_k = num_k_ref[0]
    bt_ref[:] = jnp.full((BLOCK, 128), BIG, jnp.float32)
    bk_ref[:] = jnp.zeros((BLOCK, 128), jnp.int32)

    # Each SUB-ray slice runs its own front-to-back worklist: sweep only
    # clusters some ray in the slice enters, nearest first, and stop once
    # every ray's closest hit precedes the next cluster's entry (the BVH's
    # front-to-back early-out, sub-block-granular).
    for sub in range(SUBS):
        lo, hi = sub * SUB, (sub + 1) * SUB
        a_sub = a_ref[lo:hi, :]
        od = [od_ref[i, lo:hi] for i in range(6)] + [od_ref[7, lo:hi]]
        ev0, kio = _block_entries(num_k, bb_ref, od)

        def cond(carry):
            return carry[1] < BIG

        def body(carry, lo=lo, hi=hi, a_sub=a_sub, kio=kio):
            ev, _, k = carry
            ts = _sphere_ts(a_sub, w1_ref, w2_ref, k)
            bt = bt_ref[lo:hi, :]
            upd = (ts > 0.0) & (ts < bt)
            bt = jnp.where(upd, ts, bt)
            bt_ref[lo:hi, :] = bt
            bk_ref[lo:hi, :] = jnp.where(upd, k, bk_ref[lo:hi, :])
            ev = jnp.where(kio == k, INF, ev)
            e_next, k_next = _pop_nearest(ev, kio)
            if EXIT_BOUND:
                # Farthest per-ray closest hit; rays with no hit keep it at
                # BIG, so only fully-hit sub-blocks exit early.
                bound = jnp.max(jnp.min(bt, axis=1))
                e_next = jnp.where(e_next < bound, e_next, INF)
            return ev, e_next, k_next

        e0, k0 = _pop_nearest(ev0, kio)
        jax.lax.while_loop(cond, body, (ev0, e0, k0))

    bt = bt_ref[:]
    tbest = jnp.min(bt, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 128), 1)
    packed = jnp.where(bt == tbest[:, None], bk_ref[:] * 128 + lane,
                       jnp.int32(2**30))
    row = jnp.min(packed, axis=1)
    t_out[:] = tbest
    row_out[:] = jnp.where(tbest < BIG, row, -1)


def _any_kernel(num_k_ref, a_ref, od_ref, w1_ref, w2_ref, bb_ref, found_out,
                found_ref):
    num_k = num_k_ref[0]
    found_ref[:] = jnp.zeros((BLOCK,), jnp.int32)

    for sub in range(SUBS):
        lo, hi = sub * SUB, (sub + 1) * SUB
        a_sub = a_ref[lo:hi, :]
        od = [od_ref[i, lo:hi] for i in range(6)] + [od_ref[7, lo:hi]]
        t_hi = od_ref[6, lo:hi]
        lo_col = a_sub[:, 10:11]
        hi_col = a_sub[:, 11:12]
        ev0, kio = _block_entries(num_k, bb_ref, od, t_cap=t_hi)

        def cond(carry):
            return carry[1] < BIG

        def body(carry, lo=lo, hi=hi, a_sub=a_sub, kio=kio,
                 lo_col=lo_col, hi_col=hi_col):
            ev, _, k = carry
            ts = _sphere_ts(a_sub, w1_ref, w2_ref, k)
            hit = jnp.any((ts > lo_col) & (ts < hi_col), axis=1)
            f = found_ref[lo:hi] | hit.astype(jnp.int32)
            found_ref[lo:hi] = f
            ev = jnp.where(kio == k, INF, ev)
            e_next, k_next = _pop_nearest(ev, kio)
            # Occlusion queries stop once every ray is shadowed.
            e_next = jnp.where(jnp.min(f) > 0, INF, e_next)
            return ev, e_next, k_next

        e0, k0 = _pop_nearest(ev0, kio)
        jax.lax.while_loop(cond, body, (ev0, e0, k0))

    found_out[:] = found_ref[:]


def _scene_operands(scene):
    """Scene-side kernel operands (scene-centered): W1/W2 [K*16, C],
    bounds [K, 8], centroid [3]."""
    k = scene.num_clusters
    c = scene.cluster_size
    soa = scene.cluster_soa                       # [K, 12, C]
    bmin = scene.cluster_bmin
    bmax = scene.cluster_bmax
    mid = 0.5 * (jnp.min(bmin, axis=0) + jnp.max(bmax, axis=0))

    cx = soa[:, 0, :] - mid[0]
    cy = soa[:, 1, :] - mid[1]
    cz = soa[:, 2, :] - mid[2]
    ra = soa[:, 3, :]
    pad = soa[:, 11, :] < 0.0                     # type < 0 marks padding

    zeros = jnp.zeros((k, c), jnp.float32)
    w1 = jnp.stack([cx, cy, cz, zeros, zeros, zeros,
                    jnp.full((k, c), -1.0), zeros] + [zeros] * 8, axis=1)
    const = jnp.where(pad, 2.0 * BIG, cx * cx + cy * cy + cz * cz - ra * ra)
    w2 = jnp.stack([zeros, zeros, zeros, -2.0 * cx, -2.0 * cy, -2.0 * cz,
                    zeros, jnp.ones((k, c)), const] + [zeros] * 7, axis=1)
    bb = jnp.concatenate([bmin - mid[None, :], bmax - mid[None, :],
                          jnp.zeros((k, 2), jnp.float32)], axis=1)
    return (w1.reshape(k * 16, c).astype(jnp.float32),
            w2.reshape(k * 16, c).astype(jnp.float32),
            bb.astype(jnp.float32), mid)


def _ray_operands(o3, d3, t_min, accept_lo, t_hi, mid, n_pad, active=None):
    """A [Np, 16] ray matrix and od [8, Np] 1-D component rows (row 7 is
    the activity mask — dead rays drop out of every block worklist),
    zero-padded to the block multiple."""
    n = o3[0].shape[0]
    ox, oy, oz = (o3[i] - mid[i] for i in range(3))
    dx, dy, dz = d3
    ddo = dx * ox + dy * oy + dz * oz
    oo = ox * ox + oy * oy + oz * oz
    one = jnp.ones((n,), jnp.float32)
    zero = jnp.zeros((n,), jnp.float32)
    act = one if active is None else active.astype(jnp.float32)
    cols = [dx, dy, dz, ox, oy, oz, ddo, oo, one, t_min, accept_lo, t_hi,
            zero, zero, zero, zero]
    a = jnp.stack(cols, axis=1)
    od = jnp.stack([ox, oy, oz, dx, dy, dz, t_hi, act], axis=0)
    if n_pad != n:
        a = jnp.concatenate(
            [a, jnp.zeros((n_pad - n, 16), jnp.float32)], axis=0)
        od = jnp.concatenate(
            [od, jnp.zeros((8, n_pad - n), jnp.float32)], axis=1)
    return a, od


def _grid_call(kernel, n_pad, k, outs, a, od, w1, w2, bb, interpret):
    nb = n_pad // BLOCK
    if kernel is _closest_kernel:
        scratch = [pltpu.VMEM((BLOCK, 128), jnp.float32),
                   pltpu.VMEM((BLOCK, 128), jnp.int32)]
    else:
        scratch = [pltpu.VMEM((BLOCK,), jnp.int32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BLOCK, 16), lambda i, s: (i, 0)),
            pl.BlockSpec((8, BLOCK), lambda i, s: (0, i)),
            pl.BlockSpec((k * 16, 128), lambda i, s: (0, 0)),
            pl.BlockSpec((k * 16, 128), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((BLOCK,), lambda i, s: (i,))
                   for _ in outs],
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad,), dt) for dt in outs],
        interpret=interpret,
    )(jnp.array([k], jnp.int32), a, od, w1, w2, bb)


def supports(scene, clip) -> bool:
    """Scene/trace shapes this kernel handles."""
    return (scene.sphere_count > 0 and scene.tri_count == 0
            and scene.cylinder_count == 0 and clip is None
            and 0 < scene.num_clusters <= MAX_CLUSTERS
            and scene.cluster_size == 128)


def trace_closest(scene, o3, d3, t_min, active=None, interpret=False):
    """Closest hit over all-sphere clusters. Returns (closest [N] f32 with
    BIG for miss, best_row [N] i32 with -1 for miss) matching
    ops/wavefront._dense_trace's accumulator outputs."""
    n = o3[0].shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    w1, w2, bb, mid = _scene_operands(scene)
    a, od = _ray_operands(o3, d3, t_min, jnp.zeros((n,), jnp.float32),
                          jnp.full((n,), BIG), mid, n_pad, active=active)
    t, row = _grid_call(_closest_kernel, n_pad, scene.num_clusters,
                        (jnp.float32, jnp.int32), a, od, w1, w2, bb,
                        interpret)
    closest = t[:n]
    best_row = row[:n]
    if active is not None:
        closest = jnp.where(active, closest, BIG)
        best_row = jnp.where(active, best_row, -1)
    return closest, best_row


def trace_any(scene, o3, d3, t_min, t_max=BIG, accept_min=None, active=None,
              interpret=False):
    """Any hit with t in (max(t_min-root filter), t_max) and t > accept_min
    — the shadow-ray predicate of ops/wavefront._dense_trace."""
    n = o3[0].shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    if accept_min is None:
        lo = jnp.zeros((n,), jnp.float32)
    else:
        lo = jnp.broadcast_to(jnp.asarray(accept_min, jnp.float32), (n,))
    hi = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    w1, w2, bb, mid = _scene_operands(scene)
    a, od = _ray_operands(o3, d3, t_min, lo, hi, mid, n_pad, active=active)
    (found,) = _grid_call(_any_kernel, n_pad, scene.num_clusters,
                          (jnp.int32,), a, od, w1, w2, bb, interpret)
    found = found[:n] != 0
    if active is not None:
        found = found & active
    return found
