"""TPU-native wavefront tracer: dense cluster culling instead of per-ray
stack walks.

The reference's BVH stack traversal (webgl.js:556-695) is the wrong shape
for a vector machine: per-lane divergent node fetches and stack scatters
serialize on the VPU. This tracer reformulates traversal as dense,
regular work:

  Phase 1 — every ray slab-tests every *cluster* AABB (a cluster is a
  SAH-BVH leaf of up to `cluster_size` primitives, so clusters are
  spatially coherent). This is a [B, K] elementwise sweep — pure VPU math,
  zero gathers.

  Phase 2 — a short while_loop: each iteration every live ray picks its
  nearest untested overlapping cluster (masked argmin over K — again dense
  VPU work), gathers that cluster's primitive block as one contiguous
  [cluster_size, 12] row (a single large-row gather, the only irregular
  access), dense-intersects the whole block, and folds the result into its
  closest hit. Rays whose next cluster entry-t exceeds their current
  closest hit are finished — the same early-out the stack walk gets from
  front-to-back ordering.

Work per ray = (overlapping clusters) x cluster_size primitive tests, the
dense analog of BVH leaf visits, with every op batched across the full ray
wavefront.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.bvh import PRIM_CYLINDER, PRIM_SPHERE, PRIM_TRIANGLE
from .intersect import clip_reject
from .traversal import HitRecord

BIG = np.float32(1e20)
INF = np.float32(np.inf)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cluster_entry_t(bmin, bmax, origin, direction):
    """Entry distance of each ray into each cluster AABB, +inf on miss.

    origin/direction [B,3]; bmin/bmax [K,3] -> [B,K]. Branchless slab test
    (the |d|<1e-8 path folds into +/-inf arithmetic with an inside check).
    """
    o = origin[:, None, :]
    d = direction[:, None, :]
    parallel = jnp.abs(d) < 1e-8
    inv = 1.0 / jnp.where(parallel, 1.0, d)
    t1 = (bmin[None, :, :] - o) * inv
    t2 = (bmax[None, :, :] - o) * inv
    t_near = jnp.where(parallel, -BIG, jnp.minimum(t1, t2))
    t_far = jnp.where(parallel, BIG, jnp.maximum(t1, t2))
    inside = (o >= bmin[None]) & (o <= bmax[None])
    axis_ok = ~parallel | inside
    tn = jnp.max(t_near, axis=-1)
    tf = jnp.min(t_far, axis=-1)
    hit = jnp.all(axis_ok, axis=-1) & (tf >= jnp.maximum(tn, 0.0))
    return jnp.where(hit, jnp.maximum(tn, 0.0), INF)


def intersect_block(scene, blk, origin, direction, t_min, clip, want_extra=True):
    """Dense-intersect a [B, C, 12] primitive block against [B] rays.

    Row layout (compile.py): a=[0:4] (pos/center+radius), b=[4:8]
    (p2 + local-index), c=[8:12] (v2 + type; type < 0 marks padding).
    Returns (t [B,C] with -1 misses, extra [B,C,3], ptype [B,C] i32,
    plocal [B,C] i32). With want_extra=False the extra/type/local outputs
    are None — the hot loops only need t and re-derive attributes for the
    single winning primitive afterwards (_finalize_hit).
    """
    o = origin[:, None, :]
    d = direction[:, None, :]
    tmin = t_min[:, None]
    pa = blk[..., 0:3]
    ra = blk[..., 3]
    ptype = blk[..., 11].astype(jnp.int32)
    plocal = blk[..., 7].astype(jnp.int32)

    t = jnp.full(blk.shape[:2], -1.0, jnp.float32)
    extra = jnp.zeros(blk.shape[:2] + (3,), jnp.float32) if want_extra else None

    if scene.sphere_count:
        oc = o - pa
        b = _dot(oc, d)
        c = _dot(oc, oc) - ra * ra
        disc = b * b - c
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        ts = jnp.where(t0 > tmin, t0, t1)
        ts = jnp.where(ok & (ts > tmin), ts, -1.0)
        t = jnp.where(ptype == PRIM_SPHERE, ts, t)

    if scene.cylinder_count:
        p2 = blk[..., 4:7]
        axis_raw = p2 - pa
        height = jnp.sqrt(_dot(axis_raw, axis_raw))
        degen = height < 1e-6
        axis = axis_raw / jnp.where(degen, 1.0, height)[..., None]
        oc = o - pa
        dir_dot = _dot(d, axis)
        oc_dot = _dot(oc, axis)
        dir_perp = d - axis * dir_dot[..., None]
        oc_perp = oc - axis * oc_dot[..., None]
        a_q = _dot(dir_perp, dir_perp)
        b_q = 2.0 * _dot(dir_perp, oc_perp)
        c_q = _dot(oc_perp, oc_perp) - ra * ra
        disc = b_q * b_q - 4.0 * a_q * c_q
        ok = (a_q > 1e-8) & (disc >= 0.0)
        sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
        den = jnp.where(ok, 2.0 * a_q, 1.0)
        t1c = (-b_q - sq) / den
        t2c = (-b_q + sq) / den
        h1 = oc_dot + t1c * dir_dot
        h2 = oc_dot + t2c * dir_dot
        ok1 = ok & (t1c > tmin) & (h1 >= 0.0) & (h1 <= height)
        ok2 = ok & ~ok1 & (t2c > tmin) & (h2 >= 0.0) & (h2 <= height)
        tc = jnp.where(ok1, t1c, jnp.where(ok2, t2c, -1.0))
        htype = jnp.zeros_like(tc)
        for code, cap_p, sign in ((1.0, pa, -1.0), (2.0, p2, 1.0)):
            occ = o - cap_p
            bq = _dot(occ, d)
            cq = _dot(occ, occ) - ra * ra
            dq = bq * bq - cq
            okq = dq >= 0.0
            sqq = jnp.sqrt(jnp.where(okq, dq, 0.0))
            tq0 = -bq - sqq
            tq1 = -bq + sqq
            tq = jnp.where(tq0 > tmin, tq0, tq1)
            tq = jnp.where(okq & (tq > tmin), tq, -1.0)
            hp = o + d * tq[..., None]
            h = _dot(hp - cap_p, axis)
            better = (tq > tmin) & ((tc < 0.0) | (tq < tc)) & ((h * sign) >= 0.0)
            tc = jnp.where(better, tq, tc)
            htype = jnp.where(better, code, htype)
        # Degenerate cylinder: sphere at p1.
        occ = o - pa
        bq = _dot(occ, d)
        cq = _dot(occ, occ) - ra * ra
        dq = bq * bq - cq
        okq = dq >= 0.0
        sqq = jnp.sqrt(jnp.where(okq, dq, 0.0))
        tq = jnp.where(-bq - sqq > tmin, -bq - sqq, -bq + sqq)
        tq = jnp.where(okq & (tq > tmin), tq, -1.0)
        tc = jnp.where(degen, tq, tc)
        htype = jnp.where(degen, 0.0, htype)
        sel = ptype == PRIM_CYLINDER
        t = jnp.where(sel, tc, t)
        if want_extra:
            extra = jnp.where(
                sel[..., None],
                jnp.stack([htype, jnp.zeros_like(htype), jnp.zeros_like(htype)], -1),
                extra,
            )

    if scene.tri_count:
        v0 = pa
        v1 = blk[..., 4:7]
        v2 = blk[..., 8:11]
        e1 = v1 - v0
        e2 = v2 - v0
        p = jnp.cross(jnp.broadcast_to(d, e2.shape), e2)
        det = _dot(e1, p)
        ok = jnp.abs(det) >= 1e-6
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tvec = o - v0
        u = _dot(tvec, p) * inv
        q = jnp.cross(tvec, e1)
        v = _dot(jnp.broadcast_to(d, q.shape), q) * inv
        tt = _dot(e2, q) * inv
        ok &= (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (tt > tmin)
        tt = jnp.where(ok, tt, -1.0)
        if clip is not None:
            normal, offset, side = clip
            rejected = clip_reject(o, d, tt, normal[:, None, :], offset, side)
            tt = jnp.where(rejected, -1.0, tt)
        sel = ptype == PRIM_TRIANGLE
        t = jnp.where(sel, tt, t)
        if want_extra:
            extra = jnp.where(
                sel[..., None],
                jnp.stack([u, v, jnp.zeros_like(u)], -1),
                extra,
            )

    t = jnp.where(ptype >= 0, t, -1.0)
    if not want_extra:
        return t, None, None, None
    return t, extra, ptype, plocal


# Below this many clusters the dense sweep (no gathers at all) beats the
# per-ray nearest-cluster gather loop: every cluster block is a single
# VMEM-resident [C,12] constant broadcast against the whole ray batch.
DENSE_MAX_CLUSTERS = 192


def _dense_trace(scene, origin, direction, t_min, clip, any_hit, accept_min,
                 t_max, active):
    """Gather-free brute sweep: fori over cluster blocks, each block
    dense-intersected against every ray. Optimal when K is small — all
    irregularity disappears and XLA sees pure streaming VPU work."""
    n = origin.shape[0]
    k = scene.num_clusters

    closest0 = (
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        if t_max is not None else jnp.full((n,), BIG)
    )
    if accept_min is None:
        accept_lo = jnp.zeros((n,), jnp.float32)
    else:
        accept_lo = jnp.broadcast_to(jnp.asarray(accept_min, jnp.float32), (n,))
    act = jnp.ones((n,), bool) if active is None else jnp.asarray(active)

    clip_b = None
    if clip is not None:
        normal, offset, side = clip
        clip_b = (jnp.broadcast_to(normal, (n, 3)), offset, side)

    def body(kk, carry):
        closest, best_row, found = carry
        blk = jax.lax.dynamic_index_in_dim(scene.cluster_prims, kk, 0, keepdims=False)
        blk = jnp.broadcast_to(blk[None], (n,) + blk.shape)
        t_c, _, _, _ = intersect_block(
            scene, blk, origin, direction, t_min, clip_b, want_extra=False
        )
        if any_hit:
            valid = (t_c > accept_lo[:, None]) & (t_c < closest[:, None]) & act[:, None]
            found = found | jnp.any(valid, axis=1)
        else:
            valid = (t_c > 0.0) & (t_c < closest[:, None]) & act[:, None]
            t_masked = jnp.where(valid, t_c, INF)
            j = jnp.argmin(t_masked, axis=1)
            t_best = jnp.min(t_masked, axis=1)
            upd = t_best < closest
            closest = jnp.where(upd, t_best, closest)
            best_row = jnp.where(upd, kk * scene.cluster_size + j, best_row)
        return closest, best_row, found

    init = (closest0, jnp.full((n,), -1, jnp.int32), jnp.zeros((n,), bool))
    closest, best_row, found = jax.lax.fori_loop(0, k, body, init)
    if any_hit:
        return found
    return _finalize_hit(scene, origin, direction, t_min, clip_b, closest, best_row,
                         cost=jnp.full((n,), k * scene.cluster_size, jnp.int32))


def _finalize_hit(scene, origin, direction, t_min, clip_b, closest, best_row, cost):
    """Re-intersect only the winning primitive per ray to recover hit extras
    (barycentrics / cylinder cap type). One row gather + one intersection —
    keeps the hot loop free of [B,C,*] attribute selection."""
    n = origin.shape[0]
    flat = scene.cluster_prims.reshape(-1, 12)
    row = flat[jnp.maximum(best_row, 0)]
    t_c, extra_c, type_c, local_c = intersect_block(
        scene, row[:, None, :], origin, direction, t_min, clip_b
    )
    hit = best_row >= 0
    return HitRecord(
        t=jnp.where(hit, closest, BIG),
        prim_type=jnp.where(hit, type_c[:, 0], -1),
        prim_local=jnp.where(hit, local_c[:, 0], -1),
        prim_slot=best_row,
        extra=jnp.where(hit[:, None], extra_c[:, 0], 0.0),
        cost=cost,
    )


def _wf_trace_flat(scene, origin, direction, t_min, clip, any_hit, accept_min,
                   t_max, active, max_iters):
    n = origin.shape[0]
    k = scene.num_clusters
    c = scene.cluster_size
    rows = jnp.arange(n)

    entry = cluster_entry_t(scene.cluster_bmin, scene.cluster_bmax, origin, direction)
    if active is not None:
        entry = jnp.where(active[:, None], entry, INF)

    closest0 = (
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        if t_max is not None else jnp.full((n,), BIG)
    )
    if accept_min is None:
        accept_lo = jnp.zeros((n,), jnp.float32)
    else:
        accept_lo = jnp.broadcast_to(jnp.asarray(accept_min, jnp.float32), (n,))

    clip_b = None
    if clip is not None:
        normal, offset, side = clip
        clip_b = (jnp.broadcast_to(normal, (n, 3)), offset, side)

    def cond(s):
        it, entry, closest, *_ = s
        return (it < max_iters) & jnp.any(jnp.min(entry, axis=1) < closest)

    def body(s):
        it, entry, closest, best_row, found, cost = s
        knext = jnp.argmin(entry, axis=1)
        tnext = entry[rows, knext]
        work = tnext < closest

        blk = scene.cluster_prims[jnp.where(work, knext, 0)]
        t_c, _, _, _ = intersect_block(
            scene, blk, origin, direction, t_min, clip_b, want_extra=False
        )
        valid = (t_c > 0.0) & (t_c < closest[:, None]) & work[:, None]
        if any_hit:
            valid &= t_c > accept_lo[:, None]
            found = found | jnp.any(valid, axis=1)
            closest = jnp.where(found, -INF, closest)  # stops the lane
        else:
            t_masked = jnp.where(valid, t_c, INF)
            j = jnp.argmin(t_masked, axis=1)
            t_best = jnp.min(t_masked, axis=1)
            upd = work & (t_best < closest)
            closest = jnp.where(upd, t_best, closest)
            best_row = jnp.where(upd, knext * c + j, best_row)
        entry = entry.at[rows, knext].set(INF)
        cost = cost + work.astype(jnp.int32) * (c + 1)
        return (it + 1, entry, closest, best_row, found, cost)

    init = (
        jnp.zeros((), jnp.int32),
        entry,
        closest0,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), bool),
        jnp.zeros((n,), jnp.int32),
    )
    _, _, closest, best_row, found, cost = jax.lax.while_loop(cond, body, init)

    if any_hit:
        return found
    return _finalize_hit(scene, origin, direction, t_min, clip_b, closest,
                         best_row, cost=cost)


def wf_trace_closest(scene, origin, direction, t_min, clip=None, active=None,
                     max_iters: int = 256) -> HitRecord:
    """Closest hit via the cluster wavefront. prim_slot indexes the padded
    cluster table (scene.cluster_prims reshaped to [K*C, 12])."""
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), origin.shape[:-1])
    if scene.num_clusters <= DENSE_MAX_CLUSTERS:
        return _dense_trace(scene, origin, direction, t_min, clip,
                            any_hit=False, accept_min=None, t_max=None,
                            active=active)
    return _wf_trace_flat(scene, origin, direction, t_min, clip,
                          any_hit=False, accept_min=None, t_max=None,
                          active=active, max_iters=max_iters)


def wf_trace_any(scene, origin, direction, t_min, t_max=BIG, accept_min=None,
                 clip=None, active=None, max_iters: int = 256):
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), origin.shape[:-1])
    if scene.num_clusters <= DENSE_MAX_CLUSTERS:
        return _dense_trace(scene, origin, direction, t_min, clip,
                            any_hit=True, accept_min=accept_min, t_max=t_max,
                            active=active)
    return _wf_trace_flat(scene, origin, direction, t_min, clip,
                          any_hit=True, accept_min=accept_min, t_max=t_max,
                          active=active, max_iters=max_iters)
