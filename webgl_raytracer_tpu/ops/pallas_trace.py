"""Pallas TPU traversal kernel over the cluster SoA (all primitive types).

The XLA wavefront tracer (ops/wavefront.py) runs the same math as a chain
of compiler-scheduled [B, C] elementwise ops; this kernel fuses the whole
traversal in VMEM per 1024-ray block:

  1. Entries pass: each cluster AABB is slab-tested against the block's
     rays in 1-D lane form; dead rays contribute +inf, so blocks with no
     live lanes run zero sweeps.
  2. Front-to-back worklist: a loop-carried [1, MAX_CLUSTERS] vector of
     block-nearest entry distances is consumed nearest-first. Closest-hit
     blocks stop when the next entry exceeds the farthest per-ray closest
     hit; occlusion blocks stop when every ray is shadowed.
  3. Sweep: the visited cluster's SoA rows ([16, C] slice, lane axis = the
     128 primitives) broadcast against per-ray columns ([B, 1]); sphere /
     cylinder-with-caps / Moller-Trumbore tests are the same expressions
     as ops/wavefront.intersect_soa_t (webgl.js:270-541 semantics), so
     results agree with the XLA path to f32 rounding. Best (t, cluster)
     is tracked per lane slot; ONE cross-lane reduction at the end
     recovers the per-ray winner.

Rays and primitives are shifted to scene-centered coordinates (f32
conditioning). An earlier revision computed the sphere quadratic as two
[B,16]@[16,128] MXU matmuls of an expanded bilinear form; it measured no
faster than the broadcast-elementwise form (the VPU tail dominates) and
cost precision, so everything now uses the exact (o - c) expressions.

Dispatched automatically by wf_trace_closest_v3/any_v3 on the TPU backend
for scenes with <= MAX_CLUSTERS clusters and no clip plane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.bvh import PRIM_CYLINDER, PRIM_SPHERE, PRIM_TRIANGLE

import os

BIG = np.float32(1e20)
INF = np.float32(np.inf)
# Rays per kernel program. Smaller blocks have tighter frustums (fewer
# cluster visits) but more per-program overhead; 1024 measured best on
# the scaling scenes (WRT_TRACE_BLOCK overrides for experiments).
BLOCK = int(os.environ.get("WRT_TRACE_BLOCK", "1024"))
ROWS = 16             # SoA rows per cluster (12 data + 4 pad for alignment)
MAX_CLUSTERS = 4096   # SoA VMEM budget: K * 16 * 128 * 4B = 32 MB at 4096


def _kpad(k: int) -> int:
    """Worklist width: clusters rounded up to a lane multiple."""
    return -(-k // 128) * 128


def _slab_sweep(boxT, od, t_cap=None):
    """[1, L] nearest-entry distances of the block's live rays into L
    lane-packed AABBs (boxT [8, L]: rows 0-2 bmin, 3-5 bmax; inverted for
    padding). Mirrors ops/wavefront.cluster_entry_t (including the
    parallel-axis inside check) — used only to skip boxes, never to accept
    hits. One [BLOCK, L] sweep replaces the per-box scalar loop, which at
    large cluster counts used to dominate the whole traversal."""
    l = boxT.shape[1]
    tn = jnp.full((BLOCK, l), -BIG)
    tf = jnp.full((BLOCK, l), BIG)
    ok = jnp.ones((BLOCK, l), bool)
    for axis in range(3):
        o = od[3 + axis][:, None]
        d = od[axis][:, None]
        lo = boxT[axis:axis + 1, :]
        hi = boxT[3 + axis:4 + axis, :]
        parallel = jnp.abs(d) < 1e-8
        inv = 1.0 / jnp.where(parallel, 1.0, d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        tn = jnp.maximum(tn, jnp.where(parallel, -BIG, jnp.minimum(t1, t2)))
        tf = jnp.minimum(tf, jnp.where(parallel, BIG, jnp.maximum(t1, t2)))
        ok &= ~parallel | ((o >= lo) & (o <= hi))
    hit = ok & (tf >= jnp.maximum(tn, 0.0))
    entry = jnp.where(hit, jnp.maximum(tn, 0.0), INF)
    act = od[6][:, None]
    entry = jnp.where(act > 0.0, entry, INF)
    if t_cap is not None:
        entry = jnp.where(entry < t_cap[:, None], entry, INF)
    ent = jnp.min(entry, axis=0)[None, :]
    # Inverted (padding) boxes slip through the per-axis min/max slab
    # algebra as always-hit-at-0; kill them on the reduced row, or every
    # block sweeps kpad-num_k empty clusters first (measured 10x frame
    # regression before this line).
    return jnp.where(boxT[0:1, :] <= boxT[3:4, :], ent, INF)


def _root_gate(cp_ref, od):
    """Scalar: does any LIVE ray enter the scene root AABB (cp slots
    8-13)? A ~0.5 us [BLOCK] 1-D slab that lets pure-sky and fully-masked
    blocks skip the traversal prologue — the entries sweep + accumulator
    init + winner reduction cost ~9 us/block, and on a 1080p frame of a
    centered molecule ~90% of blocks never touch the scene."""
    act = od[6]
    tn = jnp.full((BLOCK,), -BIG)
    tf = jnp.full((BLOCK,), BIG)
    ok = act > 0.0
    for axis in range(3):
        o = od[3 + axis]
        d = od[axis]
        lo = cp_ref[8 + axis]
        hi = cp_ref[11 + axis]
        parallel = jnp.abs(d) < 1e-8
        inv = 1.0 / jnp.where(parallel, 1.0, d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        tn = jnp.maximum(tn, jnp.where(parallel, -BIG, jnp.minimum(t1, t2)))
        tf = jnp.minimum(tf, jnp.where(parallel, BIG, jnp.maximum(t1, t2)))
        ok &= ~parallel | ((o >= lo) & (o <= hi))
    return jnp.any(ok & (tf >= jnp.maximum(tn, 0.0)))


def _prim_ts(cols, soa_ref, k, types, clip=None):
    """[BLOCK, C] candidate hit distances for cluster k (-1 = no hit).
    `cols` = (dx, dy, dz, ox, oy, oz, tmin) as [B, 1] columns sliced from
    the lane-major od operand — a 2nd-minor-axis [B, 16] operand would be
    tile-padded 8x by Mosaic (measured ~1 GB of wasted HBM per 1080p
    traversal)."""
    def row(i):
        return soa_ref[pl.ds(k * ROWS + i, 1), :]     # [1, C]

    return _prim_ts_rows(cols, row, soa_ref.shape[1], types, clip)


def _prim_ts_rows(cols, row, c, types, clip=None, pad_guard=False):
    """[BLOCK, C] candidate hit distances (-1 = no hit) against primitive
    SoA rows served by `row(i)` — either a shared [1, C] cluster slice (the
    block-worklist kernels) or per-ray gathered [BLOCK, C] rows (the
    per-ray worklist kernels). Same per-type math as
    ops/wavefront.intersect_soa_t; `types` is the static (has_spheres,
    has_cylinders, has_triangles) triple; `clip` is None or
    ((nx, ny, nz), offset, side) scalars — triangle hits on the clipped
    side are rejected (webgl.js:384-390).

    pad_guard: padding primitives carry radius -1 instead of the shared
    kernels' NaN (the per-ray one-hot MXU gather cannot use NaN padding:
    0 x NaN = NaN would poison every unselected lane column), so
    sphere/cylinder candidates are masked on ra > 0. Zero triangles are
    degenerate (det = 0) and miss without a guard."""
    has_sph, has_cyl, has_tri = types

    dx, dy, dz, ox, oy, oz, tmin = cols

    single = has_sph + has_cyl + has_tri == 1
    if not single:
        ptype = row(11)
        t = jnp.full((BLOCK, c), -1.0, jnp.float32)

    if has_sph:
        ra = row(3)
        # (An MXU bilinear form — c.d and |c|^2-r^2-2o.c as [B,16]x[16,C]
        # matmuls — was measured twice, round 1 and round 2, and does NOT
        # beat this elementwise form: the matmul is too small to amortize
        # and the VPU tail dominates. Don't re-litigate without numbers.)
        sx = ox - row(0)
        sy = oy - row(1)
        sz = oz - row(2)
        b = sx * dx + sy * dy + sz * dz
        cterm = sx * sx + sy * sy + sz * sz - ra * ra
        disc = b * b - cterm
        # No explicit miss mask: sqrt(disc<0) is NaN, every later compare
        # with a NaN is false, and padding prims carry NaN radii
        # (_scene_operands), so misses fall out of (ts > tmin) for free.
        sq = jnp.sqrt(disc)
        t0 = -b - sq
        ts = jnp.where(t0 > tmin, t0, -b + sq)
        ts = jnp.where(ts > tmin, ts, -1.0)
        if pad_guard:
            ts = jnp.where(ra > 0.0, ts, -1.0)
        if single:
            return ts
        t = jnp.where(ptype == PRIM_SPHERE, ts, t)

    if has_cyl:
        ra = row(3)
        p1x, p1y, p1z = row(0), row(1), row(2)
        p2x, p2y, p2z = row(4), row(5), row(6)
        avx = p2x - p1x
        avy = p2y - p1y
        avz = p2z - p1z
        h2 = avx * avx + avy * avy + avz * avz
        height = jnp.sqrt(h2)
        degen = height < 1e-6
        inv_h = 1.0 / jnp.where(degen, 1.0, height)
        ax_ = avx * inv_h
        ay_ = avy * inv_h
        az_ = avz * inv_h

        ocx = ox - p1x
        ocy = oy - p1y
        ocz = oz - p1z
        dir_dot = dx * ax_ + dy * ay_ + dz * az_
        oc_dot = ocx * ax_ + ocy * ay_ + ocz * az_
        dpx = dx - ax_ * dir_dot
        dpy = dy - ay_ * dir_dot
        dpz = dz - az_ * dir_dot
        opx = ocx - ax_ * oc_dot
        opy = ocy - ay_ * oc_dot
        opz = ocz - az_ * oc_dot
        a_q = dpx * dpx + dpy * dpy + dpz * dpz
        b_q = 2.0 * (dpx * opx + dpy * opy + dpz * opz)
        c_q = opx * opx + opy * opy + opz * opz - ra * ra
        disc = b_q * b_q - 4.0 * a_q * c_q
        okq = (a_q > 1e-8) & (disc >= 0.0)
        sq = jnp.sqrt(jnp.where(okq, disc, 0.0))
        den = jnp.where(okq, 2.0 * a_q, 1.0)
        t1c = (-b_q - sq) / den
        t2c = (-b_q + sq) / den
        hh1 = oc_dot + t1c * dir_dot
        hh2 = oc_dot + t2c * dir_dot
        ok1 = okq & (t1c > tmin) & (hh1 >= 0.0) & (hh1 <= height)
        ok2 = okq & ~ok1 & (t2c > tmin) & (hh2 >= 0.0) & (hh2 <= height)
        tc = jnp.where(ok1, t1c, jnp.where(ok2, t2c, -1.0))

        for px_, py_, pz_, sign in ((p1x, p1y, p1z, -1.0),
                                    (p2x, p2y, p2z, 1.0)):
            qx = ox - px_
            qy = oy - py_
            qz = oz - pz_
            bq = qx * dx + qy * dy + qz * dz
            cq = qx * qx + qy * qy + qz * qz - ra * ra
            dq = bq * bq - cq
            okc = dq >= 0.0
            sqc = jnp.sqrt(jnp.where(okc, dq, 0.0))
            tq = jnp.where(-bq - sqc > tmin, -bq - sqc, -bq + sqc)
            tq = jnp.where(okc & (tq > tmin), tq, -1.0)
            h = ((qx + dx * tq) * ax_ + (qy + dy * tq) * ay_
                 + (qz + dz * tq) * az_)
            better = (tq > tmin) & ((tc < 0.0) | (tq < tc)) & ((h * sign) >= 0.0)
            tc = jnp.where(better, tq, tc)

        # Degenerate cylinder: plain sphere at p1.
        qx = ox - p1x
        qy = oy - p1y
        qz = oz - p1z
        bq = qx * dx + qy * dy + qz * dz
        cq = qx * qx + qy * qy + qz * qz - ra * ra
        dq = bq * bq - cq
        okc = dq >= 0.0
        sqc = jnp.sqrt(jnp.where(okc, dq, 0.0))
        tq = jnp.where(-bq - sqc > tmin, -bq - sqc, -bq + sqc)
        tq = jnp.where(okc & (tq > tmin), tq, -1.0)
        tc = jnp.where(degen, tq, tc)
        if pad_guard:
            tc = jnp.where(ra > 0.0, tc, -1.0)
        if single:
            return tc
        t = jnp.where(ptype == PRIM_CYLINDER, tc, t)

    if has_tri:
        v0x, v0y, v0z = row(0), row(1), row(2)
        e1x = row(4) - v0x
        e1y = row(5) - v0y
        e1z = row(6) - v0z
        e2x = row(8) - v0x
        e2y = row(9) - v0y
        e2z = row(10) - v0z
        px_ = dy * e2z - dz * e2y
        py_ = dz * e2x - dx * e2z
        pz_ = dx * e2y - dy * e2x
        det = e1x * px_ + e1y * py_ + e1z * pz_
        okt = jnp.abs(det) >= 1e-6
        inv = 1.0 / jnp.where(okt, det, 1.0)
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        u = (tvx * px_ + tvy * py_ + tvz * pz_) * inv
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        okt &= (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (tt > tmin)
        tt = jnp.where(okt, tt, -1.0)
        if clip is not None:
            (cnx, cny, cnz), coff, cside = clip
            hx = ox + dx * tt
            hy = oy + dy * tt
            hz = oz + dz * tt
            s = hx * cnx + hy * cny + hz * cnz - coff
            tt = jnp.where(s * cside > 0.0, -1.0, tt)
        if single:
            return tt
        t = jnp.where(ptype == PRIM_TRIANGLE, tt, t)

    return t


def _prim_ts_rows_gated(cols, row, c, types, clip, sel, emit):
    """Per-ray-gathered candidate evaluation with PER-STEP type gating:
    each present intersector runs only when some SELECTED lane's popped
    cluster actually contains that type (a scalar any over the gathered
    ptype row). On a cartoon scene most pops are triangle-only, so the
    sphere+cylinder math (the majority of the full-mix step cost) is
    skipped dynamically. emit(ts) is called per type with other-type
    columns at -1 — update order is irrelevant because each column
    belongs to exactly one type.

    Gating applies ONLY to the full three-type mode: splitting the merged
    evaluation into pl.when branches changes XLA's FMA contraction by a
    last ulp on ~10% of candidate t's (winning rows stay identical — the
    familiar formulation-switch knife-edge noise, STATUS 'Measured perf
    truths'). Single-type and sphere+cylinder modes keep the merged
    single-pass form and its BIT-exactness vs the block kernels; the
    three-type mode is new in round 3, trades that last ulp for skipping
    the sphere+cylinder math on triangle-only steps (most cartoon pops),
    and is equivalence-tested at exact-rows + 1e-5-relative t."""
    if sum(types) <= 2:
        emit(_prim_ts_rows(cols, row, c, types, clip, pad_guard=True))
        return
    pt = row(11)
    sel_col = sel[:, None]
    for flag, tcode, single in (
            (types[0], PRIM_SPHERE, (True, False, False)),
            (types[1], PRIM_CYLINDER, (False, True, False)),
            (types[2], PRIM_TRIANGLE, (False, False, True))):
        if not flag:
            continue

        @pl.when(jnp.any((pt == tcode) & sel_col))
        def _(tcode=tcode, single=single):
            ts = _prim_ts_rows(cols, row, c, single, clip, pad_guard=True)
            emit(jnp.where(pt == tcode, ts, -1.0))


def _block_entries(num_k, kpad, bbT_ref, bgT_ref, od, ev_ref, t_cap=None):
    """Fill ev_ref [1, kpad] with each cluster's nearest entry distance
    over the block's live rays (INF if nobody enters / everyone's cap is
    closer); returns the cluster-index iota.

    Two-level: the 128-cluster GROUP AABBs are swept first (one
    [BLOCK, 128] slab sweep); only groups some live ray enters refine
    their member clusters with a second sweep (pl.when over a scalar —
    vector-valued conds crash Mosaic). Cost scales with the groups a
    block touches, not with the scene's cluster count — this removes the
    per-cluster scalar loop that dominated traversal beyond ~64 clusters
    and capped scenes at 1024."""
    kio = jax.lax.broadcasted_iota(jnp.int32, (1, kpad), 1)
    ngroups = kpad // 128
    if ngroups == 1:
        ev_ref[:] = _slab_sweep(bbT_ref[:, :], od, t_cap=t_cap)
        return kio

    ev_ref[:] = jnp.full((1, kpad), INF, jnp.float32)
    gent = _slab_sweep(bgT_ref[:, :], od, t_cap=t_cap)     # [1, 128]
    gio = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for g in range(ngroups):
        touched = jnp.min(jnp.where(gio == g, gent, INF)) < BIG

        @pl.when(touched)
        def _(g=g):
            ev_ref[0, g * 128:(g + 1) * 128] = _slab_sweep(
                bbT_ref[:, g * 128:(g + 1) * 128], od, t_cap=t_cap)[0, :]

    return kio


def _pop_nearest(ev, kio):
    m = jnp.min(ev)
    idx = jnp.min(jnp.where(ev == m, kio, jnp.int32(2 ** 30)))
    return m, idx


def _sweep_cluster(cols, soa_ref, k, types, clip, ct_ref, apply):
    """Run one cluster's intersector sweep and hand ts to `apply`.

    Clusters are type-homogeneous (scene/compile._build_clusters), so on
    multi-type scenes the body branches on the cluster's type scalar and
    runs ONLY that intersector — a visited sphere cluster costs the ~14-op
    MXU sphere tail instead of sphere+cylinder+triangle math. A ct < 0
    fallback keeps hand-built mixed clusters correct."""
    has_sph, has_cyl, has_tri = types
    if has_sph + has_cyl + has_tri <= 1:
        apply(_prim_ts(cols, soa_ref, k, types, clip))
        return
    ct = ct_ref[k]
    if has_sph:
        @pl.when(ct == PRIM_SPHERE)
        def _():
            apply(_prim_ts(cols, soa_ref, k, (True, False, False), clip))
    if has_cyl:
        @pl.when(ct == PRIM_CYLINDER)
        def _():
            apply(_prim_ts(cols, soa_ref, k, (False, True, False), clip))
    if has_tri:
        @pl.when(ct == PRIM_TRIANGLE)
        def _():
            apply(_prim_ts(cols, soa_ref, k, (False, False, True), clip))

    @pl.when(ct < 0)
    def _():
        apply(_prim_ts(cols, soa_ref, k, types, clip))


def _sweep_group() -> int:
    """Clusters swept per worklist-loop iteration in the BLOCK kernels
    (WRT_SWEEP_GROUP, default 1). Grouping amortizes the per-iteration
    pop + front-to-back bound machinery (a full [BLOCK, 128] reduction
    each trip) over several SOL-bound intersector sweeps, at the price of
    refreshing the early-exit bound only once per group (extra sweeps are
    wasted work, never wrong: hits only replace strictly-closer ones).
    Read at kernel-build time — benchmarks must build a fresh jit per
    variant (see docs/ARCHITECTURE.md 'Measured perf truths')."""
    return max(1, int(os.environ.get("WRT_SWEEP_GROUP", "1")))


def _make_closest_kernel(types, kpad, clip_on=False, with_cost=False):
    group = _sweep_group()

    def kernel(num_k_ref, od_ref, soa_ref, bbT_ref, bgT_ref, cp_ref,
               ct_ref, t_out, row_out, *rest):
        if with_cost:
            cost_out, bt_ref, bk_ref, ev_ref = rest
        else:
            bt_ref, bk_ref, ev_ref = rest
        od = [od_ref[i, :] for i in range(6)] + [od_ref[7, :]]
        num_k = num_k_ref[0]
        clip = (((cp_ref[0], cp_ref[1], cp_ref[2]), cp_ref[3], cp_ref[4])
                if clip_on else None)
        act = od[6]
        gate = _root_gate(cp_ref, od)

        @pl.when(gate)
        def _run():
            # cols must be built INSIDE the gate: each [BLOCK] -> [B, 1]
            # column is a sublane-scatter relayout (~128 mostly-empty
            # VREGs), and seven of them emitted unconditionally cost
            # ~4 us per DEAD block — 8 ms of a 1080p all-miss trace's
            # 12 ms (measured by kernel ablation, round 3).
            cols = tuple(od_ref[i, :][:, None] for i in range(6)) + (
                od_ref[8, :][:, None],)
            # Inactive lanes start at -BIG so the front-to-back bound is
            # the farthest ACTIVE lane's closest hit — otherwise one masked
            # lane (secondary/shadow traces are heavily masked) pins the
            # bound at BIG and the early exit never fires. Outputs for
            # inactive lanes are garbage; trace_closest masks them.
            bt_ref[:] = jnp.broadcast_to(
                jnp.where(act[:, None] > 0.0, BIG, -BIG), (BLOCK, 128))
            bk_ref[:] = jnp.zeros((BLOCK, 128), jnp.int32)
            kio = _block_entries(num_k, kpad, bbT_ref, bgT_ref, od, ev_ref)
            ev0 = ev_ref[:]

            def cond(carry):
                return carry[1] < BIG

            def body(carry):
                ev, e, k, nswept = carry

                def sweep_k(k):
                    def apply(ts):
                        bt = bt_ref[:]
                        upd = (ts > 0.0) & (ts < bt)
                        bt_ref[:] = jnp.where(upd, ts, bt)
                        bk_ref[:] = jnp.where(upd, k, bk_ref[:])

                    _sweep_cluster(cols, soa_ref, k, types, clip, ct_ref,
                                   apply)

                # First sweep unconditional (cond guarantees e < BIG);
                # the group - 1 extra pops are gated on a live entry. The
                # bound refresh happens once per GROUP, so grouped trips
                # may sweep clusters an exact bound would have culled —
                # wasted work, never wrong.
                sweep_k(k)
                nswept = nswept + 1
                ev = jnp.where(kio == k, INF, ev)
                e, k = _pop_nearest(ev, kio)
                for _ in range(group - 1):
                    @pl.when(e < BIG)
                    def _(k=k):
                        sweep_k(k)

                    nswept = nswept + (e < BIG).astype(jnp.int32)
                    ev = jnp.where(kio == k, INF, ev)
                    e, k = _pop_nearest(ev, kio)
                # Farthest per-ray closest hit; no-hit rays keep it at
                # BIG, so only fully-hit blocks exit early.
                bound = jnp.max(jnp.min(bt_ref[:], axis=1))
                e = jnp.where(e < bound, e, INF)
                return ev, e, k, nswept

            e0, k0 = _pop_nearest(ev0, kio)
            carry = jax.lax.while_loop(cond, body,
                                       (ev0, e0, k0, jnp.int32(0)))
            if with_cost:
                # Every ray in the block pays every sweep: the cluster
                # UNION cost (vs the per-ray kernels' own-chain cost).
                cost_out[:] = jnp.full((BLOCK,), carry[3] * 128, jnp.int32)

            bt = bt_ref[:]
            tbest = jnp.min(bt, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 128), 1)
            packed = jnp.where(bt == tbest[:, None], bk_ref[:] * 128 + lane,
                               jnp.int32(2 ** 30))
            rw = jnp.min(packed, axis=1)
            t_out[:] = tbest
            row_out[:] = jnp.where(tbest < BIG, rw, -1)

        @pl.when(~gate)
        def _miss():
            t_out[:] = jnp.full((BLOCK,), BIG, jnp.float32)
            row_out[:] = jnp.full((BLOCK,), -1, jnp.int32)
            if with_cost:
                cost_out[:] = jnp.zeros((BLOCK,), jnp.int32)

    return kernel


def _make_closest_attrs_kernel(types, kpad, clip_on=False):
    """Closest hit + per-ray winner ATTRIBUTES in one launch.

    Identical traversal to _make_closest_kernel, but each sweep reduces
    the block's candidates to a per-ray winner and extracts the winning
    primitive's 32-column attribute row (12 SoA values ++ color ++ tri
    vertex normals ++ flag ++ flat slot, see _attr_operand) via a one-hot
    [BLOCK, 128] x [128, 32] MXU matmul. The XLA
    alternative is a per-lane [B, 12] row gather after the trace
    (wavefront._finalize_hit), which is the TPU's slow path: ~26 ms per
    1080p frame of random-access gathers that this kernel replaces with
    ~0.5 us per cluster visit of dense matrix work."""

    def kernel(num_k_ref, od_ref, soa_ref, at_tab_ref, bbT_ref, bgT_ref,
               cp_ref, ct_ref, t_out, attr_out, bt_ref, at_ref, ev_ref):
        od = [od_ref[i, :] for i in range(6)] + [od_ref[7, :]]
        num_k = num_k_ref[0]
        clip = (((cp_ref[0], cp_ref[1], cp_ref[2]), cp_ref[3], cp_ref[4])
                if clip_on else None)
        act = od[6]
        gate = _root_gate(cp_ref, od)
        bt_ref[:] = jnp.where(act > 0.0, BIG, -BIG)[:, None]
        # Miss/padding lanes must read ptype < 0: bake -1 into column 11.
        at_ref[:] = -(jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK, 32), 1) == 11).astype(jnp.float32)

        @pl.when(gate)
        def _run():
            lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 128), 1)
            cols = tuple(od_ref[i, :][:, None] for i in range(6)) + (
                od_ref[8, :][:, None],)
            kio = _block_entries(num_k, kpad, bbT_ref, bgT_ref, od, ev_ref)
            ev0 = ev_ref[:]

            def cond(carry):
                return carry[1] < BIG

            def body(carry):
                ev, _, k = carry

                def apply(ts):
                    tsv = jnp.where(ts > 0.0, ts, BIG)
                    best = bt_ref[:, 0]
                    m = jnp.min(tsv, axis=1)
                    improved = m < best
                    packed = jnp.where(tsv == m[:, None], lane,
                                       jnp.int32(2 ** 30))
                    wl = jnp.min(packed, axis=1)
                    onehot = ((lane == wl[:, None])
                              & improved[:, None]).astype(jnp.float32)
                    table = at_tab_ref[pl.ds(k * 128, 128), :]     # [C, 32]
                    # HIGHEST precision: the MXU's default bf16 passes
                    # truncate the table values (measured: TPU frames
                    # differed from the gather path at default precision);
                    # with the 3-way decomposition a one-hot selection is
                    # exact (hi+mid+lo times an exact 1.0, f32 accumulate).
                    new_attrs = jax.lax.dot_general(
                        onehot, table, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    at_ref[:] = jnp.where(improved[:, None], new_attrs,
                                          at_ref[:])
                    bt_ref[:] = jnp.where(improved, m, best)[:, None]

                _sweep_cluster(cols, soa_ref, k, types, clip, ct_ref, apply)
                ev = jnp.where(kio == k, INF, ev)
                e_next, k_next = _pop_nearest(ev, kio)
                bound = jnp.max(bt_ref[:, 0])
                e_next = jnp.where(e_next < bound, e_next, INF)
                return ev, e_next, k_next

            e0, k0 = _pop_nearest(ev0, kio)
            jax.lax.while_loop(cond, body, (ev0, e0, k0))

        t_out[:] = jnp.where(act > 0.0, bt_ref[:, 0], BIG)
        attr_out[:] = at_ref[:]

    return kernel


AROWS = 16


def build_attr_soa(num_clusters, cluster_size, cluster_prims, cluster_color,
                   tri_normals, tri_flags, tri_count):
    """[K, C, 16] prim-major shading attributes aligned with cluster_prims:
    color rgb (cols 0-2), tri vertex normals n0/n1/n2 (3-11), tri flag (12).
    Prim-major so the attrs kernel's one-hot [B,128]x[128,32] matmul reads
    it as the right operand directly (Mosaic crashes on transposed
    contractions). Host NumPy; called once by scene.compile.compile_scene.
    (Moved here from the deleted path megakernel, round 5.)"""
    k, c = num_clusters, cluster_size
    prims = np.asarray(cluster_prims)                # [K, C, 12]
    colors = np.asarray(cluster_color).reshape(k, c, 3)
    attr = np.zeros((k, c, AROWS), np.float32)
    attr[:, :, 0:3] = colors
    if tri_count:
        ptype = prims[..., 11]
        local = prims[..., 7].astype(np.int32)
        tri_m = ptype == PRIM_TRIANGLE
        tn = np.asarray(tri_normals)                 # [Nt, 3, 3]
        tf = np.asarray(tri_flags)
        li = np.clip(local, 0, tn.shape[0] - 1)
        kk, cc = np.nonzero(tri_m)
        l2 = li[kk, cc]
        attr[kk, cc, 3:6] = tn[l2, 0]
        attr[kk, cc, 6:9] = tn[l2, 1]
        attr[kk, cc, 9:12] = tn[l2, 2]
        attr[kk, cc, 12] = tf[l2]
    return attr


def _attr_operand(scene):
    """Prim-major one-hot attribute table [K*C, 32] for the attrs kernel:
    cols 0-11 the traversal row (cluster_prims, GLOBAL coordinates),
    12-27 the shading attrs (color rgb, tri vertex normals, flag — see
    build_attr_soa), 28 the flat prim slot as f32 (exact to
    2^24; MAX_CLUSTERS*128 = 524k), 29-31 pad."""
    k = scene.num_clusters
    c = scene.cluster_size
    slot = jnp.arange(k * c, dtype=jnp.float32).reshape(k, c, 1)
    return jnp.concatenate(
        [jnp.asarray(scene.cluster_prims, jnp.float32),
         jnp.asarray(scene.cluster_attr, jnp.float32),
         slot,
         jnp.zeros((k, c, 3), jnp.float32)], axis=2).reshape(k * c, 32)


def _grid_call_attrs(kernel, n_pad, k, od, soa, at_tab, bbT, bgT, cp, ct,
                     interpret):
    nb = n_pad // BLOCK
    kp = _kpad(k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((16, BLOCK), lambda i, s: (0, i)),
            pl.BlockSpec((k * ROWS, 128), lambda i, s: (0, 0)),
            pl.BlockSpec((k * 128, 32), lambda i, s: (0, 0)),
            pl.BlockSpec((8, kp), lambda i, s: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((BLOCK,), lambda i, s: (i,)),
                   pl.BlockSpec((BLOCK, 32), lambda i, s: (i, 0))],
        scratch_shapes=[pltpu.VMEM((BLOCK, 1), jnp.float32),
                        pltpu.VMEM((BLOCK, 32), jnp.float32),
                        pltpu.VMEM((1, kp), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 32), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.array([k], jnp.int32), od, soa, at_tab, bbT, bgT, cp, ct)


def supports_attrs(scene) -> bool:
    """The attrs kernel needs the compiled shading-attribute SoA."""
    return getattr(scene, "cluster_attr", None) is not None


def trace_closest_attrs(scene, o3, d3, t_min, clip=None, active=None,
                        interpret=False):
    """Closest hit + winner attributes: (t [N] f32 BIG-miss, attrs
    [N, 32] — see _attr_operand; attrs[:, 11] < 0 marks a miss). The t is
    the kernel's scene-centered rounding, like trace_closest; callers
    refine sphere winners in global coordinates (wavefront._finalize_hit
    with row=attrs does it without any gather)."""
    n = o3[0].shape[0]
    n_pad = _round_pad(n)
    soa, bbT, bgT, mid, ct = _scene_operands(scene)
    cp, clip_on = _scalar_operand(clip, mid, scene)
    od = _ray_operands(o3, d3, t_min, jnp.zeros((n,), jnp.float32),
                       jnp.full((n,), BIG), mid, n_pad, active=active)
    t, attrs = _grid_call_attrs(
        _make_closest_attrs_kernel(_types(scene), _kpad(scene.num_clusters),
                                   clip_on),
        n_pad, scene.num_clusters, od, soa, _attr_operand(scene), bbT, bgT,
        cp, ct, interpret)
    t = t[:n]
    attrs = attrs[:n]
    if active is not None:
        t = jnp.where(active, t, BIG)
        attrs = jnp.where(active[:, None], attrs, jnp.float32(0.0))
        attrs = attrs.at[:, 11].set(jnp.where(active, attrs[:, 11], -1.0))
    return t, attrs


def _make_any_kernel(types, kpad, clip_on=False, with_cost=False):
    group = _sweep_group()

    def kernel(num_k_ref, od_ref, soa_ref, bbT_ref, bgT_ref, cp_ref,
               ct_ref, found_out, *rest):
        if with_cost:
            cost_out, found_ref, ev_ref = rest
        else:
            found_ref, ev_ref = rest
        od = [od_ref[i, :] for i in range(6)] + [od_ref[7, :]]
        t_hi = od_ref[6, :]
        num_k = num_k_ref[0]
        clip = (((cp_ref[0], cp_ref[1], cp_ref[2]), cp_ref[3], cp_ref[4])
                if clip_on else None)
        act = od[6]
        gate = _root_gate(cp_ref, od)

        @pl.when(gate)
        def _run():
            # Column relayouts only when the block traverses (see the
            # closest kernel: unconditional [:, None] columns cost ~4 us
            # per dead block).
            cols = tuple(od_ref[i, :][:, None] for i in range(6)) + (
                od_ref[8, :][:, None],)
            lo_col = od_ref[9, :][:, None]
            hi_col = od_ref[6, :][:, None]
            # Inactive lanes start as "found" so the every-ray-shadowed
            # early exit counts only ACTIVE lanes — shadow batches are
            # candidate-masked, and without this the exit never fired.
            found_ref[:] = (act <= 0.0).astype(jnp.int32)
            kio = _block_entries(num_k, kpad, bbT_ref, bgT_ref, od, ev_ref,
                                 t_cap=t_hi)
            ev0 = ev_ref[:]

            def cond(carry):
                return carry[1] < BIG

            def body(carry):
                ev, e, k, nswept = carry

                def apply(ts):
                    hit = jnp.any((ts > lo_col) & (ts < hi_col), axis=1)
                    found_ref[:] = found_ref[:] | hit.astype(jnp.int32)

                _sweep_cluster(cols, soa_ref, k, types, clip, ct_ref, apply)
                nswept = nswept + 1
                ev = jnp.where(kio == k, INF, ev)
                e, k = _pop_nearest(ev, kio)
                for _ in range(group - 1):
                    # Extra grouped sweeps skip once every ray is
                    # shadowed — the all-found check is a cheap [BLOCK]
                    # reduce vs the sweep it saves.
                    go = (e < BIG) & (jnp.min(found_ref[:]) == 0)

                    @pl.when(go)
                    def _(k=k):
                        _sweep_cluster(cols, soa_ref, k, types, clip,
                                       ct_ref, apply)

                    nswept = nswept + go.astype(jnp.int32)
                    ev = jnp.where(kio == k, INF, ev)
                    e, k = _pop_nearest(ev, kio)
                # Occlusion queries stop once every ray is shadowed.
                e = jnp.where(jnp.min(found_ref[:]) > 0, INF, e)
                return ev, e, k, nswept

            e0, k0 = _pop_nearest(ev0, kio)
            carry = jax.lax.while_loop(cond, body,
                                       (ev0, e0, k0, jnp.int32(0)))
            found_out[:] = jnp.where(act > 0.0, found_ref[:], 0)
            if with_cost:
                cost_out[:] = jnp.full((BLOCK,), carry[3] * 128, jnp.int32)

        @pl.when(~gate)
        def _miss():
            found_out[:] = jnp.zeros((BLOCK,), jnp.int32)
            if with_cost:
                cost_out[:] = jnp.zeros((BLOCK,), jnp.int32)

    return kernel


def _block_entries_multi(kpad, bbT_ref, bgT_ref, ods, ev_ref,
                         ev_dir_refs=None):
    """_block_entries generalized to SEVERAL ray sets per lane: the entry
    distance of a cluster is the nearest entry over every live ray of
    every set (the fused shadow fan shares one worklist across its three
    directions). Same two-level group refinement as _block_entries.

    ev_dir_refs: optional per-direction [1, kpad] scratch refs — filled
    with each direction's OWN entry vector (INF where no live ray of
    that direction enters the cluster), which the relevance-gated sweep
    (WRT_ANY3_GATE=2) reads to skip direction/cluster pairs the slab
    test already proved empty."""
    kio = jax.lax.broadcasted_iota(jnp.int32, (1, kpad), 1)

    def each(boxT):
        return [_slab_sweep(boxT, od) for od in ods]

    def combined(ents):
        e = ents[0]
        for x in ents[1:]:
            e = jnp.minimum(e, x)
        return e

    ngroups = kpad // 128
    if ngroups == 1:
        ents = each(bbT_ref[:, :])
        if ev_dir_refs is not None:
            for ref, e in zip(ev_dir_refs, ents):
                ref[:] = e
        ev_ref[:] = combined(ents)
        return kio

    ev_ref[:] = jnp.full((1, kpad), INF, jnp.float32)
    if ev_dir_refs is not None:
        for ref in ev_dir_refs:
            ref[:] = jnp.full((1, kpad), INF, jnp.float32)
    gent = combined(each(bgT_ref[:, :]))                   # [1, 128]
    gio = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for g in range(ngroups):
        touched = jnp.min(jnp.where(gio == g, gent, INF)) < BIG

        @pl.when(touched)
        def _(g=g):
            ents = each(bbT_ref[:, g * 128:(g + 1) * 128])
            if ev_dir_refs is not None:
                for ref, e in zip(ev_dir_refs, ents):
                    ref[0, g * 128:(g + 1) * 128] = e[0, :]
            ev_ref[0, g * 128:(g + 1) * 128] = combined(ents)[0, :]

    return kio


def _make_any3_kernel(types, kpad, clip_on=False, with_cost=False):
    """Fused THREE-ray occlusion kernel: each lane carries three rays that
    share one origin — the 3-cone-light shadow fan at a surface hit
    (webgl.js:1094-1145 shadeDirect's three traceAnyMin calls). The
    launch runs ONE front-to-back worklist per block (entries = nearest
    over all three directions) and each visited cluster is swept once per
    still-unresolved direction, so the per-block fixed costs the
    concatenated [3N] launch pays three times — operand columns, entries
    pass, pop/bound machinery, output moves — are paid once, and the
    block count drops 3x.

    Exactness: occlusion is an order-independent OR over (ray, prim)
    predicates, and each predicate here is the same _prim_ts expression
    on the same inputs as the single-ray any kernel, so results are
    BIT-identical to three separate traces no matter how blocks, sweeps,
    or early exits differ (a skipped sweep only ever skips lanes already
    found). Verified by tests/test_any3.py.

    od rows: 0-2 d0, 3-5 centered origin, 6 act bitmask (a0 + 2 a1 +
    4 a2 as f32), 7 unused, 8 t_min, 9 accept_lo, 10-12 d1, 13-15 d2.
    t_max is fixed at BIG (shadow/NEE rays are unbounded; picking-style
    bounded queries keep the single-ray kernel). Output: one int32
    bitmask per lane (bit j = direction j occluded).

    WRT_ANY3_GATE picks the per-direction sweep-skip policy, raced on
    TPU v5e (RACE_any3.json, 1000-sphere 1080p, round 4):
      0  unconditional 3-direction sweeps per popped cluster;
      1  saturation gates — skip a direction once every lane has it
         resolved (three [BLOCK] reduces per cluster). LOSES: 118.7 ms
         vs ungated 110.1 vs concat [3N] 113.9 — the reduce+branch cost
         exceeds the sweeps it skips;
      2  relevance gates (default) — skip direction j on cluster k when
         NO live ray of direction j enters k (per-direction entry
         vectors from the slab pass; the gate is one [1, kpad] masked
         reduce, ~8x cheaper than mode 1's, and prunes exactly the
         dir/cluster pairs the concatenated launch never swept — e.g.
         the rim light's clusters against the key light's fan)."""
    gate_mode = os.environ.get("WRT_ANY3_GATE", "2")

    def kernel(num_k_ref, od_ref, soa_ref, bbT_ref, bgT_ref, cp_ref,
               ct_ref, found_out, *rest):
        if with_cost:
            cost_out, f0_ref, f1_ref, f2_ref, ev_ref, e0_ref, e1_ref, \
                e2_ref = rest
        else:
            f0_ref, f1_ref, f2_ref, ev_ref, e0_ref, e1_ref, e2_ref = rest
        ev_dir_refs = (e0_ref, e1_ref, e2_ref)
        num_k = num_k_ref[0]
        clip = (((cp_ref[0], cp_ref[1], cp_ref[2]), cp_ref[3], cp_ref[4])
                if clip_on else None)
        o = [od_ref[3 + i, :] for i in range(3)]
        dir_rows = ((0, 1, 2), (10, 11, 12), (13, 14, 15))
        # Decode the activity bitmask arithmetically (f32 is exact on
        # 0..7; Mosaic's 1-D int bitwise path is not worth relying on).
        am = od_ref[6, :]
        a2 = jnp.floor(am * 0.25)
        rem = am - 4.0 * a2
        a1 = jnp.floor(rem * 0.5)
        a0 = rem - 2.0 * a1
        acts = (a0, a1, a2)
        ods = [[od_ref[r, :] for r in dir_rows[j]] + o + [acts[j]]
               for j in range(3)]

        gate = _root_gate(cp_ref, ods[0])
        for j in (1, 2):
            gate = gate | _root_gate(cp_ref, ods[j])

        @pl.when(gate)
        def _run():
            # Column relayouts only when the block traverses (dead-block
            # floor discipline, see _make_closest_kernel).
            cols_o = tuple(od_ref[3 + i, :][:, None] for i in range(3))
            tmin_col = od_ref[8, :][:, None]
            lo_col = od_ref[9, :][:, None]
            cols_j = [tuple(od_ref[r, :][:, None] for r in dir_rows[j])
                      + cols_o + (tmin_col,) for j in range(3)]
            # Inactive directions start "found" so the early exit and the
            # per-direction sweep skips count only live queries.
            f0_ref[:] = (a0 <= 0.0).astype(jnp.int32)
            f1_ref[:] = (a1 <= 0.0).astype(jnp.int32)
            f2_ref[:] = (a2 <= 0.0).astype(jnp.int32)
            frefs = (f0_ref, f1_ref, f2_ref)
            kio = _block_entries_multi(
                kpad, bbT_ref, bgT_ref, ods, ev_ref,
                ev_dir_refs=ev_dir_refs if gate_mode == "2" else None)
            ev0 = ev_ref[:]

            def cond(carry):
                return carry[1] < BIG

            def body(carry):
                ev, e, k, nswept = carry

                for j in range(3):
                    fr = frefs[j]

                    def sweep_dir(j=j, fr=fr):
                        def apply(ts):
                            hit = jnp.any((ts > lo_col) & (ts < BIG),
                                          axis=1)
                            fr[:] = fr[:] | hit.astype(jnp.int32)

                        _sweep_cluster(cols_j[j], soa_ref, k, types, clip,
                                       ct_ref, apply)

                    if gate_mode == "1":
                        # Saturation gate (raced, loses — see docstring).
                        go = jnp.min(fr[:]) == 0
                        pl.when(go)(sweep_dir)
                        if with_cost:
                            nswept = nswept + go.astype(jnp.int32)
                    elif gate_mode == "2":
                        # Relevance gate: the slab pass already proved
                        # whether any live ray of direction j enters k —
                        # skipping a non-entered cluster cannot change
                        # that direction's occlusion (its prims lie
                        # inside the AABB the ray misses).
                        go = jnp.min(jnp.where(kio == k,
                                               ev_dir_refs[j][:],
                                               INF)) < BIG
                        pl.when(go)(sweep_dir)
                        if with_cost:
                            nswept = nswept + go.astype(jnp.int32)
                    else:
                        sweep_dir()
                        if with_cost:
                            nswept = nswept + 1
                ev = jnp.where(kio == k, INF, ev)
                e, k = _pop_nearest(ev, kio)
                # Stop once every lane's three queries are resolved.
                done = jnp.min(f0_ref[:] + f1_ref[:] + f2_ref[:]) == 3
                e = jnp.where(done, INF, e)
                return ev, e, k, nswept

            e0, k0 = _pop_nearest(ev0, kio)
            carry = jax.lax.while_loop(cond, body,
                                       (ev0, e0, k0, jnp.int32(0)))
            mask = (a0 > 0.0).astype(jnp.int32)
            m1 = (a1 > 0.0).astype(jnp.int32)
            m2 = (a2 > 0.0).astype(jnp.int32)
            found_out[:] = (f0_ref[:] * mask + 2 * f1_ref[:] * m1
                            + 4 * f2_ref[:] * m2)
            if with_cost:
                cost_out[:] = jnp.full((BLOCK,), carry[3] * 128, jnp.int32)

        @pl.when(~gate)
        def _miss():
            found_out[:] = jnp.zeros((BLOCK,), jnp.int32)
            if with_cost:
                cost_out[:] = jnp.zeros((BLOCK,), jnp.int32)

    return kernel


def _grid_call3(kernel, n_pad, k, outs, od, soa, bbT, bgT, cp, ct,
                interpret):
    nb = n_pad // BLOCK
    kp = _kpad(k)
    scratch = [pltpu.VMEM((BLOCK,), jnp.int32) for _ in range(3)]
    # Combined worklist entries + the three per-direction entry vectors
    # (the relevance gate's input; dead weight in the other gate modes).
    scratch.extend(pltpu.VMEM((1, kp), jnp.float32) for _ in range(4))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((16, BLOCK), lambda i, s: (0, i)),
            pl.BlockSpec((k * ROWS, 128), lambda i, s: (0, 0)),
            pl.BlockSpec((8, kp), lambda i, s: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.array([k], jnp.int32), od, soa, bbT, bgT, cp, ct)


def trace_any3(scene, o3, d3s, t_min, accept_min=None, clip=None,
               actives=(None, None, None), interpret=False,
               with_cost=False):
    """Fused 3-direction occlusion from a SHARED origin per lane: returns
    (occ0, occ1, occ2) bool [N] — bit-identical to three trace_any calls
    with t_max=BIG (see _make_any3_kernel). d3s: three direction triples;
    actives: three per-ray candidate masks (None = all live)."""
    n = o3[0].shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    soa, bbT, bgT, mid, ct = _scene_operands(scene)
    cp, clip_on = _scalar_operand(clip, mid, scene)

    ox, oy, oz = (o3[i] - mid[i] for i in range(3))
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    if accept_min is None:
        lo = jnp.zeros((n,), jnp.float32)
    else:
        lo = jnp.broadcast_to(jnp.asarray(accept_min, jnp.float32), (n,))
    ones = jnp.ones((n,), jnp.float32)
    amask = jnp.zeros((n,), jnp.float32)
    for j, a in enumerate(actives):
        bit = ones if a is None else a.astype(jnp.float32)
        amask = amask + bit * float(1 << j)
    zero = jnp.zeros((n,), jnp.float32)
    od = jnp.stack([
        d3s[0][0], d3s[0][1], d3s[0][2], ox, oy, oz, amask, zero, t_min,
        lo, d3s[1][0], d3s[1][1], d3s[1][2], d3s[2][0], d3s[2][1],
        d3s[2][2]], axis=0)
    if n_pad != n:
        od = jnp.concatenate(
            [od, jnp.zeros((16, n_pad - n), jnp.float32)], axis=1)

    outs = (jnp.int32,) + ((jnp.int32,) if with_cost else ())
    out = _grid_call3(
        _make_any3_kernel(_types(scene), _kpad(scene.num_clusters),
                          clip_on, with_cost=with_cost),
        n_pad, scene.num_clusters, outs, od, soa, bbT, bgT, cp, ct,
        interpret)
    bits = out[0][:n]
    occ = []
    for j, a in enumerate(actives):
        f = (bits // (1 << j)) % 2 != 0
        occ.append(f if a is None else f & a)
    if with_cost:
        return tuple(occ), out[1][:n]
    return tuple(occ)


# ---------------------------------------------------------------------------
# Per-ray worklist kernels (work-proportional traversal).
#
# The block-worklist kernels above make every ray in a 1024-ray block sweep
# every cluster ANY ray in the block wants — on divergent batches (secondary
# bounces, shadow rays, sparse live masks) each ray pays for the block
# UNION of cluster chains. These kernels give each ray its OWN front-to-back
# worklist: per while-loop step every ray pops its own nearest untested
# cluster, a one-hot [BLOCK, kpad] bf16 MXU matmul gathers that cluster's
# SoA rows per ray (Mosaic has no per-lane gather; the systolic array does
# the selection as dense matrix work), and the sweep tests per-ray rows.
# Steps until every ray's remaining entries lie beyond its own closest hit:
# the block's cost is max-per-ray-chain, not union size.
#
# Exactness: gathered f32 values are reconstructed EXACTLY from three bf16
# matmuls (v = bf16(v) + bf16(v - hi) + bf16(residual) splits a 24-bit f32
# mantissa into 3x8 bits; the one-hot weights are exact in bf16; the MXU
# accumulates in f32), so hits agree with the block-worklist kernels to the
# last ulp. Padding primitives carry radius -1 (NaN cannot ride the matmul:
# 0 x NaN = NaN) and are masked by _prim_ts_rows' pad_guard.
#
# Scope: single-primitive-type scenes or sphere+cylinder mixes (a mix
# involving triangles would force every intersector every step). Up to 128
# clusters the [BLOCK, kpad] entries matrix and the matmul contraction stay
# one 128-lane group; beyond that the kernels go TWO-LEVEL: an outer
# block-uniform front-to-back worklist over 128-cluster GROUPS (the same
# group AABBs the block kernels use), and the per-ray worklist/one-hot
# gather runs within the current group only — so the entries matrix stays
# [BLOCK, 128] and each gather matmul contracts over 128 rows (a dynamic
# 128-aligned sublane slice of the [kpad, R*128] operands) regardless of
# scene size. Block cost = (groups the block touches) x (max per-ray chain
# within each group), vs the block kernels' full cluster union.

PERRAY_MAX_CLUSTERS = MAX_CLUSTERS

# SoA rows each single-type sweep needs (gathered per ray per step).
_PERRAY_ROWS = {
    PRIM_SPHERE: (0, 1, 2, 3),
    PRIM_CYLINDER: (0, 1, 2, 3, 4, 5, 6),
    PRIM_TRIANGLE: (0, 1, 2, 4, 5, 6, 8, 9, 10),
}
# Mixed sphere+cylinder scenes (every molecule style except cartoon/SES)
# gather the union of both row sets PLUS the per-prim type row 11 —
# _prim_ts_rows' multi-type path masks each intersector on ptype, so a
# per-ray gathered cluster may mix types freely at ~2x the gather width.
_PERRAY_ROWS_SPH_CYL = (0, 1, 2, 3, 4, 5, 6, 11)
# Full three-type mixes (cartoon/SES scenes carry a few HETATM
# spheres/cylinders beside the triangle soup) gather every data row except
# the local index and run all three ptype-masked intersectors per step —
# ~3x the single-type step cost, worth it only where per-ray chains are
# much shorter than block unions (the K >= PERRAY_MIN_CLUSTERS routing
# gate).
_PERRAY_ROWS_ALL = (0, 1, 2, 3, 4, 5, 6, 8, 9, 10, 11)


def _perray_mode(scene):
    """(rows_idx, types) for the per-ray kernels."""
    types = _types(scene)
    if sum(types) == 1:
        st = (PRIM_SPHERE, PRIM_CYLINDER, PRIM_TRIANGLE)[types.index(True)]
        return _PERRAY_ROWS[st], (st == PRIM_SPHERE, st == PRIM_CYLINDER,
                                  st == PRIM_TRIANGLE)
    if types[0] and types[1] and not types[2]:
        return _PERRAY_ROWS_SPH_CYL, (True, True, False)
    return _PERRAY_ROWS_ALL, (True, True, True)


def _slab_entries_rows(boxT, od, t_cap=None):
    """[BLOCK, L] per-ray nearest-entry distances into L lane-packed AABBs
    (INF: miss / inactive ray / at-or-beyond the per-ray cap). Same slab
    algebra as _slab_sweep without the cross-ray reduction."""
    l = boxT.shape[1]
    tn = jnp.full((BLOCK, l), -BIG)
    tf = jnp.full((BLOCK, l), BIG)
    ok = jnp.ones((BLOCK, l), bool)
    for axis in range(3):
        o = od[3 + axis][:, None]
        d = od[axis][:, None]
        lo = boxT[axis:axis + 1, :]
        hi = boxT[3 + axis:4 + axis, :]
        parallel = jnp.abs(d) < 1e-8
        inv = 1.0 / jnp.where(parallel, 1.0, d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        tn = jnp.maximum(tn, jnp.where(parallel, -BIG, jnp.minimum(t1, t2)))
        tf = jnp.minimum(tf, jnp.where(parallel, BIG, jnp.maximum(t1, t2)))
        ok &= ~parallel | ((o >= lo) & (o <= hi))
    hit = ok & (tf >= jnp.maximum(tn, 0.0))
    entry = jnp.where(hit, jnp.maximum(tn, 0.0), INF)
    entry = jnp.where(od[6][:, None] > 0.0, entry, INF)
    if t_cap is not None:
        entry = jnp.where(entry < t_cap[:, None], entry, INF)
    # Inverted (padding) boxes pass the slab algebra as hit-at-0; kill them.
    return jnp.where(boxT[0:1, :] <= boxT[3:4, :], entry, INF)


def _perray_gather(oh_b, ws_refs, base=None):
    """Per-ray SoA rows via one-hot MXU selection: [BLOCK, W] bool one-hot
    against three bf16 mantissa-split operands [kpad, R*128] -> exact f32
    [BLOCK, R*128] (see section comment). With `base` (a 128-aligned
    dynamic scalar) the contraction uses only the current group's 128
    operand rows — the two-level kernels' gathers stay one MXU pass no
    matter how many clusters the scene has."""
    oh = oh_b.astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def rows(r):
        return r[pl.ds(base, 128), :] if base is not None else r[:, :]

    g = jax.lax.dot_general(oh, rows(ws_refs[0]), dn,
                            preferred_element_type=jnp.float32)
    g = g + jax.lax.dot_general(oh, rows(ws_refs[1]), dn,
                                preferred_element_type=jnp.float32)
    return g + jax.lax.dot_general(oh, rows(ws_refs[2]), dn,
                                   preferred_element_type=jnp.float32)


def _perray_pop(ev_ref, kio2, stop_mask):
    """One per-ray worklist pop: (sel [BLOCK] bool, idx [BLOCK] i32,
    one-hot [BLOCK, kpad] bool). Retires the popped entries in ev_ref.
    stop_mask lanes (per-ray done) never pop."""
    e = ev_ref[:]
    m = jnp.min(e, axis=1)
    sel = (m < BIG) & ~stop_mask
    idx = jnp.min(jnp.where(e == m[:, None], kio2, jnp.int32(2 ** 30)),
                  axis=1)
    idx = jnp.where(sel, idx, 0)
    oh_b = (kio2 == idx[:, None]) & sel[:, None]
    ev_ref[:] = jnp.where(oh_b, INF, e)
    return sel, idx, oh_b


def _make_closest_kernel_perray(mode, kpad, clip_on=False, with_cost=False):
    """Per-ray front-to-back closest hit (see section comment). bt/bk are
    [BLOCK, 128] per-lane-slot accumulators exactly like the block-worklist
    kernel; idx is a per-ray column instead of a loop scalar (bk stores the
    GLOBAL cluster index). `mode` is _perray_mode's (rows_idx, types).
    kpad > 128 selects the TWO-LEVEL body: outer block-uniform group
    worklist, inner per-ray worklist within the current group (bbT_ref is
    the group-stacked [ngroups*8, 128] layout)."""
    rows_idx, types = mode
    rowmap = {r: j for j, r in enumerate(rows_idx)}
    ngroups = kpad // 128

    def kernel(num_k_ref, od_ref, ws1_ref, ws2_ref, ws3_ref, bbT_ref,
               bgT_ref, cp_ref, t_out, row_out, *rest):
        if with_cost:
            cost_out, bt_ref, bk_ref, ev_ref, cc_ref = rest
        else:
            bt_ref, bk_ref, ev_ref = rest
        od = [od_ref[i, :] for i in range(6)] + [od_ref[7, :]]
        clip = (((cp_ref[0], cp_ref[1], cp_ref[2]), cp_ref[3], cp_ref[4])
                if clip_on else None)
        act = od[6]
        gate = _root_gate(cp_ref, od)

        @pl.when(gate)
        def _run():
            # Column relayouts gated (dead blocks must not pay them —
            # see _make_closest_kernel).
            cols = tuple(od_ref[i, :][:, None] for i in range(6)) + (
                od_ref[8, :][:, None],)
            bt_ref[:] = jnp.broadcast_to(
                jnp.where(act[:, None] > 0.0, BIG, -BIG), (BLOCK, 128))
            bk_ref[:] = jnp.zeros((BLOCK, 128), jnp.int32)
            if with_cost:
                cc_ref[:] = jnp.zeros((BLOCK,), jnp.int32)
            width = 128 if ngroups > 1 else kpad
            kio2 = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, width), 1)

            def pending():
                return jnp.any(jnp.min(ev_ref[:], axis=1)
                               < jnp.min(bt_ref[:], axis=1))

            def inner(base):
                """Per-ray worklist over ev_ref (entries of the current
                group; base = first cluster of the group, 0 when
                single-group)."""
                def body(_go):
                    # A ray stops once its nearest remaining entry is at
                    # or beyond its own closest hit (front-to-back).
                    done = (jnp.min(ev_ref[:], axis=1)
                            >= jnp.min(bt_ref[:], axis=1))
                    sel, idx, oh_b = _perray_pop(ev_ref, kio2, done)
                    g = _perray_gather(oh_b, (ws1_ref, ws2_ref, ws3_ref),
                                       base=None if ngroups == 1 else base)

                    def row(i):
                        j = rowmap[i]
                        return g[:, j * 128:(j + 1) * 128]

                    kglob = idx if ngroups == 1 else base + idx

                    def emit(ts):
                        bt = bt_ref[:]
                        upd = (ts > 0.0) & (ts < bt) & sel[:, None]
                        bt_ref[:] = jnp.where(upd, ts, bt)
                        bk_ref[:] = jnp.where(upd, kglob[:, None], bk_ref[:])

                    _prim_ts_rows_gated(cols, row, 128, types, clip, sel,
                                        emit)
                    if with_cost:
                        cc_ref[:] = cc_ref[:] + sel.astype(jnp.int32)
                    return pending()

                jax.lax.while_loop(lambda go: go, body, pending())

            if ngroups == 1:
                ev_ref[:] = _slab_entries_rows(bbT_ref[:, :], od)
                inner(jnp.int32(0))
            else:
                # Outer: block-uniform front-to-back 128-cluster groups
                # (same group AABBs as the block kernels' two-level
                # entries pass), bounded by the farthest per-ray closest.
                gent = _slab_sweep(bgT_ref[:, :], od)
                gio = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

                def ocond(carry):
                    return carry[1] < BIG

                def obody(carry):
                    gent, _, grp = carry
                    ev_ref[:] = _slab_entries_rows(
                        bbT_ref[pl.ds(grp * 8, 8), :], od,
                        t_cap=jnp.min(bt_ref[:], axis=1))
                    inner(grp * 128)
                    gent = jnp.where(gio == grp, INF, gent)
                    e_next, g_next = _pop_nearest(gent, gio)
                    bound = jnp.max(jnp.min(bt_ref[:], axis=1))
                    e_next = jnp.where(e_next < bound, e_next, INF)
                    return gent, e_next, g_next

                e0, g0 = _pop_nearest(gent, gio)
                jax.lax.while_loop(ocond, obody, (gent, e0, g0))

            if with_cost:
                cost_out[:] = cc_ref[:] * 128

            bt = bt_ref[:]
            tbest = jnp.min(bt, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 128), 1)
            packed = jnp.where(bt == tbest[:, None], bk_ref[:] * 128 + lane,
                               jnp.int32(2 ** 30))
            rw = jnp.min(packed, axis=1)
            t_out[:] = tbest
            row_out[:] = jnp.where(tbest < BIG, rw, -1)

        @pl.when(~gate)
        def _miss():
            t_out[:] = jnp.full((BLOCK,), BIG, jnp.float32)
            row_out[:] = jnp.full((BLOCK,), -1, jnp.int32)
            if with_cost:
                cost_out[:] = jnp.zeros((BLOCK,), jnp.int32)

    return kernel


def _make_any_kernel_perray(mode, kpad, clip_on=False, with_cost=False):
    """Per-ray any-hit; kpad > 128 selects the two-level body (see
    _make_closest_kernel_perray). Group order is arbitrary for occlusion —
    the outer worklist still runs front-to-back so fully-shadowed blocks
    exit after the nearest groups."""
    rows_idx, types = mode
    rowmap = {r: j for j, r in enumerate(rows_idx)}
    ngroups = kpad // 128

    def kernel(num_k_ref, od_ref, ws1_ref, ws2_ref, ws3_ref, bbT_ref,
               bgT_ref, cp_ref, found_out, *rest):
        if with_cost:
            cost_out, fd_ref, ev_ref, cc_ref = rest
        else:
            fd_ref, ev_ref = rest
        od = [od_ref[i, :] for i in range(6)] + [od_ref[7, :]]
        t_hi = od_ref[6, :]
        clip = (((cp_ref[0], cp_ref[1], cp_ref[2]), cp_ref[3], cp_ref[4])
                if clip_on else None)
        act = od[6]
        gate = _root_gate(cp_ref, od)

        @pl.when(gate)
        def _run():
            # Column relayouts gated (dead blocks must not pay them —
            # see _make_closest_kernel).
            cols = tuple(od_ref[i, :][:, None] for i in range(6)) + (
                od_ref[8, :][:, None],)
            lo_col = od_ref[9, :][:, None]
            hi_col = t_hi[:, None]
            # Inactive lanes start as "found": they never pop work.
            fd_ref[:] = (act <= 0.0).astype(jnp.int32)
            if with_cost:
                cc_ref[:] = jnp.zeros((BLOCK,), jnp.int32)
            width = 128 if ngroups > 1 else kpad
            kio2 = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, width), 1)

            def pending():
                return jnp.any((jnp.min(ev_ref[:], axis=1) < BIG)
                               & (fd_ref[:] == 0))

            def inner(base):
                def body(_go):
                    sel, idx, oh_b = _perray_pop(ev_ref, kio2, fd_ref[:] > 0)
                    g = _perray_gather(oh_b, (ws1_ref, ws2_ref, ws3_ref),
                                       base=None if ngroups == 1 else base)

                    def row(i):
                        j = rowmap[i]
                        return g[:, j * 128:(j + 1) * 128]

                    def emit(ts):
                        hit = jnp.any((ts > lo_col) & (ts < hi_col)
                                      & sel[:, None], axis=1)
                        fd_ref[:] = fd_ref[:] | hit.astype(jnp.int32)

                    _prim_ts_rows_gated(cols, row, 128, types, clip, sel,
                                        emit)
                    if with_cost:
                        cc_ref[:] = cc_ref[:] + sel.astype(jnp.int32)
                    return pending()

                jax.lax.while_loop(lambda go: go, body, pending())

            if ngroups == 1:
                ev_ref[:] = _slab_entries_rows(bbT_ref[:, :], od, t_cap=t_hi)
                inner(jnp.int32(0))
            else:
                gent = _slab_sweep(bgT_ref[:, :], od, t_cap=t_hi)
                gio = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

                def ocond(carry):
                    return carry[1] < BIG

                def obody(carry):
                    gent, _, grp = carry
                    ev_ref[:] = _slab_entries_rows(
                        bbT_ref[pl.ds(grp * 8, 8), :], od, t_cap=t_hi)
                    # Already-found lanes never pop (stop mask), so no
                    # per-lane entry masking is needed here.
                    inner(grp * 128)
                    gent = jnp.where(gio == grp, INF, gent)
                    e_next, g_next = _pop_nearest(gent, gio)
                    e_next = jnp.where(jnp.min(fd_ref[:]) > 0, INF, e_next)
                    return gent, e_next, g_next

                e0, g0 = _pop_nearest(gent, gio)
                jax.lax.while_loop(ocond, obody, (gent, e0, g0))

            found_out[:] = jnp.where(act > 0.0, fd_ref[:], 0)
            if with_cost:
                cost_out[:] = cc_ref[:] * 128

        @pl.when(~gate)
        def _miss():
            found_out[:] = jnp.zeros((BLOCK,), jnp.int32)
            if with_cost:
                cost_out[:] = jnp.zeros((BLOCK,), jnp.int32)

    return kernel


def _gather_operands(scene, mid):
    """bf16 mantissa-split gather operands for the per-ray kernels: three
    [kpad, R*128] arrays whose f32 sum reconstructs the scene-centered SoA
    the mode's rows exactly (24-bit mantissa = 3 x 8-bit bf16 splits).
    Padding prims get radius -1 (pad_guard masks them; zero triangles
    are degenerate and miss on their own; mixed-mode padding also
    carries ptype -1, which matches no intersector)."""
    rows_idx, _ = _perray_mode(scene)
    k = scene.num_clusters
    c = scene.cluster_size
    soa = scene.cluster_soa                       # [K, 12, C]
    shift = jnp.array([mid[0], mid[1], mid[2], 0.0,
                       mid[0], mid[1], mid[2], 0.0,
                       mid[0], mid[1], mid[2], 0.0], jnp.float32)
    soa_c = soa - shift[None, :, None]
    pad_lane = soa[:, 11, :] < 0.0
    soa_c = soa_c.at[:, 3, :].set(
        jnp.where(pad_lane, jnp.float32(-1.0), soa_c[:, 3, :]))
    w = jnp.stack([soa_c[:, r, :] for r in rows_idx], axis=1)
    w = w.reshape(k, len(rows_idx) * c)
    kp = _kpad(k)
    if kp != k:
        w = jnp.concatenate(
            [w, jnp.zeros((kp - k, len(rows_idx) * c), jnp.float32)])
    w1 = w.astype(jnp.bfloat16)
    r1 = w - w1.astype(jnp.float32)
    w2 = r1.astype(jnp.bfloat16)
    w3 = (r1 - w2.astype(jnp.float32)).astype(jnp.bfloat16)
    return w1, w2, w3, len(rows_idx)


def perray_supported(scene) -> bool:
    """Scenes the per-ray worklist kernels handle: a single primitive
    type or a sphere+cylinder mix (molecule styles). One 128-cluster
    group runs the flat per-ray body; larger scenes (up to MAX_CLUSTERS)
    run the two-level group-outer/per-ray-inner body."""
    return (_perray_mode(scene) is not None
            and MIN_CLUSTERS <= scene.num_clusters <= PERRAY_MAX_CLUSTERS
            and scene.cluster_size == 128)


def _group_stack_boxes(bbT):
    """[8, kpad] lane-packed cluster AABBs -> the per-ray kernels'
    group-stacked [ngroups*8, 128] layout (group g at sublane rows
    g*8..g*8+8). Identity at one group."""
    kp = bbT.shape[1]
    ng = kp // 128
    if ng == 1:
        return bbT
    return bbT.reshape(8, ng, 128).transpose(1, 0, 2).reshape(ng * 8, 128)


def _grid_call_perray(kernel, is_closest, n_pad, k, nr, outs, od, ws, bbT,
                      bgT, cp, interpret, with_cost=False):
    """bbT here is the GROUP-STACKED box layout [ngroups*8, 128] (group g's
    [8, 128] AABBs at sublane rows g*8..g*8+8) so the two-level kernels can
    take a dynamic 8-aligned sublane slice per group; at one group it is
    exactly the block kernels' [8, 128]."""
    nb = n_pad // BLOCK
    kp = _kpad(k)
    width = 128 if kp > 128 else kp
    if is_closest:
        scratch = [pltpu.VMEM((BLOCK, 128), jnp.float32),
                   pltpu.VMEM((BLOCK, 128), jnp.int32)]
    else:
        scratch = [pltpu.VMEM((BLOCK,), jnp.int32)]
    scratch.append(pltpu.VMEM((BLOCK, width), jnp.float32))  # per-ray entries
    if with_cost:
        scratch.append(pltpu.VMEM((BLOCK,), jnp.int32))    # per-ray pops
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((16, BLOCK), lambda i, s: (0, i)),
            pl.BlockSpec((kp, nr * 128), lambda i, s: (0, 0)),
            pl.BlockSpec((kp, nr * 128), lambda i, s: (0, 0)),
            pl.BlockSpec((kp, nr * 128), lambda i, s: (0, 0)),
            pl.BlockSpec(((kp // 128) * 8, 128), lambda i, s: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, s: (0, 0)),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.array([k], jnp.int32), od, ws[0], ws[1], ws[2], bbT, bgT, cp)


def _scene_operands(scene):
    """Scene-side kernel operands: scene-centered SoA [K*ROWS, C], AABBs
    [K, 8], centroid [3]."""
    k = scene.num_clusters
    c = scene.cluster_size
    soa = scene.cluster_soa                      # [K, 12, C]
    bmin = scene.cluster_bmin
    bmax = scene.cluster_bmax
    mid = 0.5 * (jnp.min(bmin, axis=0) + jnp.max(bmax, axis=0))

    # Shift positional rows (a.xyz, b.xyz, c.xyz) by the scene centroid;
    # radius / local-index / type rows pass through. Padding prims keep
    # type -1, which never matches a primitive test.
    shift = jnp.array([mid[0], mid[1], mid[2], 0.0,
                       mid[0], mid[1], mid[2], 0.0,
                       mid[0], mid[1], mid[2], 0.0], jnp.float32)
    # b.xyz rows are real positions for cylinders/triangles but carry the
    # local index at row 7 and type at row 11 — those have 0 shift above.
    soa_c = soa - shift[None, :, None]
    # Padding prims (type < 0) get NaN radii so their sphere/cylinder
    # discriminants are NaN and every hit-acceptance compare is false —
    # the kernel then needs no explicit type mask on single-type scenes.
    soa_c = soa_c.at[:, 3, :].set(
        jnp.where(soa[:, 11, :] < 0.0, jnp.float32(np.nan), soa_c[:, 3, :]))
    pad = jnp.zeros((k, ROWS - 12, c), jnp.float32)
    soa16 = jnp.concatenate([soa_c, pad], axis=1).reshape(k * ROWS, c)
    # Lane-packed cluster AABBs [8, kpad] (rows 0-2 bmin, 3-5 bmax) plus
    # 128-cluster GROUP AABBs [8, 128] for the two-level entries pass.
    # Padding boxes are inverted (+BIG/-BIG) so the slab sweep misses them.
    kp = _kpad(k)
    bmin_c = bmin - mid[None, :]
    bmax_c = bmax - mid[None, :]
    bmin_p = jnp.concatenate(
        [bmin_c, jnp.full((kp - k, 3), BIG, jnp.float32)])
    bmax_p = jnp.concatenate(
        [bmax_c, jnp.full((kp - k, 3), -BIG, jnp.float32)])
    bbT = jnp.concatenate([bmin_p.T, bmax_p.T,
                           jnp.zeros((2, kp), jnp.float32)])       # [8, kpad]
    ng = kp // 128
    gmin = jnp.min(bmin_p.reshape(ng, 128, 3), axis=1)
    gmax = jnp.max(bmax_p.reshape(ng, 128, 3), axis=1)
    gmin = jnp.concatenate(
        [gmin, jnp.full((128 - ng, 3), BIG, jnp.float32)])
    gmax = jnp.concatenate(
        [gmax, jnp.full((128 - ng, 3), -BIG, jnp.float32)])
    bgT = jnp.concatenate([gmin.T, gmax.T,
                           jnp.zeros((2, 128), jnp.float32)])      # [8, 128]
    # Per-cluster type (-1 = mixed/hand-built): compiled scenes are
    # type-homogeneous (scene/compile._build_clusters), letting the sweep
    # dispatch run only the visited cluster's intersector.
    prow = soa[:, 11, :]
    valid = prow >= 0
    tmax = jnp.max(jnp.where(valid, prow, -1.0), axis=1)
    tmn = jnp.min(jnp.where(valid, prow, 99.0), axis=1)
    ctype = jnp.where((tmax == tmn) & (tmax >= 0), tmax, -1.0).astype(jnp.int32)
    return (soa16.astype(jnp.float32), bbT.astype(jnp.float32),
            bgT.astype(jnp.float32), mid, ctype)


def _ray_operands(o3, d3, t_min, accept_lo, t_hi, mid, n_pad, active=None):
    """od [16, Np] lane-major per-ray rows: 0-5 = d, centered o; 6 = t_hi;
    7 = activity mask; 8 = t_min; 9 = accept_lo; 10-15 pad. One operand —
    a 2nd-minor [Np, 16] layout would be tile-padded 8x by Mosaic."""
    n = o3[0].shape[0]
    ox, oy, oz = (o3[i] - mid[i] for i in range(3))
    dx, dy, dz = d3
    zero = jnp.zeros((n,), jnp.float32)
    act = (jnp.ones((n,), jnp.float32) if active is None
           else active.astype(jnp.float32))
    od = jnp.stack([dx, dy, dz, ox, oy, oz, t_hi, act, t_min, accept_lo,
                    zero, zero, zero, zero, zero, zero], axis=0)
    if n_pad != n:
        od = jnp.concatenate(
            [od, jnp.zeros((16, n_pad - n), jnp.float32)], axis=1)
    return od


# Ray blocks handled per grid STEP (experiment knob). Looping M blocks
# inside one grid step via sliced refs amortizes per-step machinery, but
# measured NEUTRAL on TPU v5e once the dead-block floor was fixed (the
# 12 ms all-miss floor was unconditional [:, None] column relayouts, not
# grid-step overhead; with those gated, M=8 vs M=1 both measure ~116 ms
# full frame / ~1.5 ms all-miss floor). Default 1; the machinery stays
# for block-size experiments on other workloads.
TRACE_MULTI = int(os.environ.get("WRT_TRACE_MULTI", "1"))


def _round_pad(n: int) -> int:
    """Ray padding for _grid_call: a multiple of BLOCK x TRACE_MULTI (pad
    lanes carry act=0, so padded sub-blocks are root-gated dead)."""
    g = BLOCK * TRACE_MULTI
    return -(-n // g) * g


def _multiblock(kernel, m, n_outs):
    """Wrap a one-block kernel body to process m consecutive ray blocks
    per grid step via sliced refs (program emitted once, fori over
    sub-blocks). Scratch refs are shared — each sub-block fully
    re-initializes them before use."""
    if m == 1:
        return kernel

    def wrapped(num_k_ref, od_ref, soa_ref, bbT_ref, bgT_ref, cp_ref,
                ct_ref, *rest):
        outs, scratch = rest[:n_outs], rest[n_outs:]

        def body(j, _):
            od_j = od_ref.at[:, pl.ds(j * BLOCK, BLOCK)]
            outs_j = tuple(o.at[pl.ds(j * BLOCK, BLOCK)] for o in outs)
            kernel(num_k_ref, od_j, soa_ref, bbT_ref, bgT_ref, cp_ref,
                   ct_ref, *outs_j, *scratch)
            return 0

        jax.lax.fori_loop(0, m, body, 0)

    return wrapped


def _grid_call(kernel, is_closest, n_pad, k, outs, od, soa, bbT, bgT,
               cp, ct, interpret):
    nb = n_pad // BLOCK
    m = TRACE_MULTI if nb % TRACE_MULTI == 0 else 1
    kp = _kpad(k)
    if is_closest:
        scratch = [pltpu.VMEM((BLOCK, 128), jnp.float32),
                   pltpu.VMEM((BLOCK, 128), jnp.int32)]
    else:
        scratch = [pltpu.VMEM((BLOCK,), jnp.int32)]
    scratch.append(pltpu.VMEM((1, kp), jnp.float32))   # entries
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // m,),
        in_specs=[
            pl.BlockSpec((16, m * BLOCK), lambda i, s: (0, i)),
            pl.BlockSpec((k * ROWS, 128), lambda i, s: (0, 0)),
            pl.BlockSpec((8, kp), lambda i, s: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((m * BLOCK,), lambda i, s: (i,))
                   for _ in outs],
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        _multiblock(kernel, m, len(outs)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad,), dt) for dt in outs],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.array([k], jnp.int32), od, soa, bbT, bgT, cp, ct)


# With only a handful of clusters the XLA dense sweep has no culling to
# exploit and no launch overhead; the kernel wins from ~4 clusters up
# (measured: 1-cluster caffeine 85ms XLA vs 105ms kernel; 12-cluster
# sphere scene 122ms vs 56ms).
MIN_CLUSTERS = 4


def supports(scene, clip) -> bool:
    """Scene/trace shapes this kernel handles. Clip planes are applied
    in-kernel (triangle rejection in _prim_ts), so they no longer force
    the XLA path."""
    return (MIN_CLUSTERS <= scene.num_clusters <= MAX_CLUSTERS
            and scene.cluster_size == 128)


def _types(scene):
    return (scene.sphere_count > 0, scene.cylinder_count > 0,
            scene.tri_count > 0)


def _scalar_operand(clip, mid, scene):
    """16 SMEM scalars: clip plane (slots 0-4, scene-centered: the plane
    n.x = off becomes n.(x - mid) = off - n.mid) and the scene root AABB
    (slots 8-13, centered) for the kernels' block gate."""
    root = jnp.concatenate([
        jnp.min(scene.cluster_bmin, axis=0) - mid,
        jnp.max(scene.cluster_bmax, axis=0) - mid])
    if clip is None:
        return jnp.concatenate([jnp.zeros(8, jnp.float32), root,
                                jnp.zeros(2, jnp.float32)]), False
    normal, offset, side = clip
    normal = jnp.asarray(normal, jnp.float32).reshape(3)
    off_c = jnp.asarray(offset, jnp.float32) - jnp.dot(normal, mid)
    return jnp.concatenate([
        normal, off_c.reshape(1), jnp.asarray(side, jnp.float32).reshape(1),
        jnp.zeros(3, jnp.float32), root, jnp.zeros(2, jnp.float32)]), True


# Cluster count from which the per-ray worklist beats the block worklist
# on DIVERGENT closest-hit batches (secondary bounce rays). Measured on
# TPU v5e (tools/bench_traversal.py, fused scans): at K=10 per-ray loses
# everywhere (0.5-0.95x — chains are as long as the union and the
# pop+MXU-gather step cost dominates); at K=127 it wins 2.0x on sparse
# and 2.25x on dense secondary closest batches, while PRIMARY (coherent,
# block-friendly) and SHADOW (any-hit early exits) stay faster on the
# block kernels at both sizes. So per-ray is auto-enabled only for
# secondary closest traces on cluster-rich scenes.
PERRAY_MIN_CLUSTERS = 64


def perray_auto_secondary(scene) -> bool:
    """Should a SECONDARY-bounce closest trace use the per-ray kernels?

    Every mode is now a measured on-chip winner at K >=
    PERRAY_MIN_CLUSTERS (tools/tpu_smoke.py compiled-equivalence +
    tools/bench_traversal.py races, round 4):
      - single-group single-type / sph+cyl: 2.0-2.25x at K=127 (round 3);
      - TWO-LEVEL (>128 clusters): 3.8x secondary / 4.0x dense-secondary
        / 3.5x dense env-NEE on 150k spheres at K=1984
        (RACE_perray_150k.json);
    Primary (coherent) and co-directional shadow batches stay on the
    block kernels at every size (0.64-0.96x / 0.86-1.13x there).

    THREE-TYPE tri-mixes (cartoon/SES) stay OPT-IN (WRT_PERRAY_TRIMIX=1):
    they win the isolated dense-population races (2.0x dense-secondary /
    1.5x dense env-NEE on the TSTP cartoon at K=185,
    RACE_perray_cartoon.json) but LOSE the production frame (247.8 block
    vs 256.3 ms routed, RACE_frame_cartoon.json) — at the scene's 0.5%
    hit fraction the real per-bounce batches are far smaller than the
    benchmark's full-width populations, and the per-step pop + one-hot
    gather overhead outweighs the union savings on tiny live sets."""
    if not (perray_supported(scene)
            and scene.num_clusters >= PERRAY_MIN_CLUSTERS):
        return False
    return (sum(_perray_mode(scene)[1]) <= 2
            or os.environ.get("WRT_PERRAY_TRIMIX") == "1")


def perray_auto_any(scene, divergent=False) -> bool:
    """Should an any-hit trace use the per-ray kernels? Depends on the
    BATCH SHAPE, not just the scene (10k spheres, K=127,
    tools/bench_traversal.py on TPU v5e):

    - co-directional batches (the 3-light cone-jittered shadow fan):
      per-ray LOSES — 0.76x sparse, 0.80x dense. An any-hit ray has no
      tightening t-bound, so an UNOCCLUDED per-ray lane pops and sweeps
      its entire cluster chain one cluster per trip, while the block
      kernel resolves the (small, co-directional) union in a few wide
      sweeps and exits when every lane is shadowed.
    - DIVERGENT batches (env-NEE occlusion: CDF-sampled directions
      scattered over the sphere): per-ray WINS 2.14x (276.9 vs 591.7 ms
      dense) — the block union is maximal, exactly the secondary-closest
      overfetch the per-ray routing already avoids.

    So callers pass divergent=True only for env-NEE-shaped batches, and
    the routing then follows the race-proven secondary-closest criterion
    (cluster-rich scenes; K=10 loses everywhere, 0.42-0.56x).
    WRT_PERRAY_ANY=1/0 force on/off for experiments."""
    env = os.environ.get("WRT_PERRAY_ANY")
    if env == "0":
        return False
    if env == "1":
        return perray_supported(scene)
    return divergent and perray_auto_secondary(scene)


def _use_perray(scene, perray):
    """Resolve the traversal formulation: per-ray worklist (work
    proportional to each ray's own cluster chain) vs block worklist.
    perray=None consults WRT_PERRAY ('1' force on, '0' force off; unset =
    block — callers opt secondary closest traces in via
    perray_auto_secondary)."""
    if not perray_supported(scene):
        return False
    env = os.environ.get("WRT_PERRAY")
    if env == "0":       # global kill switch (A/B the auto routing)
        return False
    if perray is None:
        return env == "1"
    return bool(perray)


def trace_closest(scene, o3, d3, t_min, clip=None, active=None,
                  interpret=False, perray=None, with_cost=False):
    """Closest hit. Returns (closest [N] f32 with BIG for miss, best_row
    [N] i32 with -1 for miss) matching ops/wavefront._dense_trace's
    accumulator outputs. with_cost appends a [N] i32 primitives-tested
    counter (block kernels: 128 x clusters swept by the ray's block;
    per-ray kernels: 128 x the ray's own pops)."""
    n = o3[0].shape[0]
    n_pad = _round_pad(n)
    outs = (jnp.float32, jnp.int32) + ((jnp.int32,) if with_cost else ())
    soa, bbT, bgT, mid, ct = _scene_operands(scene)
    cp, clip_on = _scalar_operand(clip, mid, scene)
    od = _ray_operands(o3, d3, t_min, jnp.zeros((n,), jnp.float32),
                       jnp.full((n,), BIG), mid, n_pad, active=active)
    if _use_perray(scene, perray):
        w1, w2, w3, nr = _gather_operands(scene, mid)
        out = _grid_call_perray(
            _make_closest_kernel_perray(_perray_mode(scene),
                                        _kpad(scene.num_clusters), clip_on,
                                        with_cost=with_cost),
            True, n_pad, scene.num_clusters, nr, outs,
            od, (w1, w2, w3), _group_stack_boxes(bbT), bgT, cp, interpret,
            with_cost=with_cost)
    else:
        out = _grid_call(
            _make_closest_kernel(_types(scene), _kpad(scene.num_clusters),
                                 clip_on, with_cost=with_cost),
            True, n_pad, scene.num_clusters, outs,
            od, soa, bbT, bgT, cp, ct, interpret)
    t, row = out[0], out[1]
    closest = t[:n]
    best_row = row[:n]
    if active is not None:
        closest = jnp.where(active, closest, BIG)
        best_row = jnp.where(active, best_row, -1)
    if with_cost:
        cost = out[2][:n]
        if active is not None:
            cost = jnp.where(active, cost, 0)
        return closest, best_row, cost
    return closest, best_row


def trace_any(scene, o3, d3, t_min, t_max=BIG, accept_min=None, clip=None,
              active=None, interpret=False, perray=None, with_cost=False):
    """Any hit with t in (accept_min, t_max) — the shadow-ray predicate of
    ops/wavefront._dense_trace. with_cost appends a [N] i32
    primitives-tested counter (see trace_closest)."""
    n = o3[0].shape[0]
    n_pad = _round_pad(n)
    if accept_min is None:
        lo = jnp.zeros((n,), jnp.float32)
    else:
        lo = jnp.broadcast_to(jnp.asarray(accept_min, jnp.float32), (n,))
    hi = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    outs = (jnp.int32,) + ((jnp.int32,) if with_cost else ())
    soa, bbT, bgT, mid, ct = _scene_operands(scene)
    cp, clip_on = _scalar_operand(clip, mid, scene)
    od = _ray_operands(o3, d3, t_min, lo, hi, mid, n_pad, active=active)
    if _use_perray(scene, perray):
        w1, w2, w3, nr = _gather_operands(scene, mid)
        out = _grid_call_perray(
            _make_any_kernel_perray(_perray_mode(scene),
                                    _kpad(scene.num_clusters), clip_on,
                                    with_cost=with_cost),
            False, n_pad, scene.num_clusters, nr, outs,
            od, (w1, w2, w3), _group_stack_boxes(bbT), bgT, cp, interpret,
            with_cost=with_cost)
    else:
        out = _grid_call(
            _make_any_kernel(_types(scene), _kpad(scene.num_clusters),
                             clip_on, with_cost=with_cost),
            False, n_pad, scene.num_clusters, outs,
            od, soa, bbT, bgT, cp, ct, interpret)
    found = out[0][:n] != 0
    if active is not None:
        found = found & active
    if with_cost:
        cost = out[1][:n]
        if active is not None:
            cost = jnp.where(active, cost, 0)
        return found, cost
    return found
