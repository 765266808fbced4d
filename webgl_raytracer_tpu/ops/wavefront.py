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


def cluster_entry_t(bmin, bmax, o3, d3):
    """Entry distance of each ray into each cluster AABB, +inf on miss.

    o3/d3: component triples of [B]; bmin/bmax [K,3] -> [B,K]. Branchless
    slab test per axis in lane-aligned [B,K] form (the |d|<1e-8 path folds
    into an inside check)."""
    tn = jnp.full((o3[0].shape[0], bmin.shape[0]), -BIG)
    tf = jnp.full_like(tn, BIG)
    axis_ok = jnp.ones(tn.shape, bool)
    for axis in range(3):
        o = o3[axis][:, None]
        d = d3[axis][:, None]
        lo = bmin[None, :, axis]
        hi = bmax[None, :, axis]
        parallel = jnp.abs(d) < 1e-8
        inv = 1.0 / jnp.where(parallel, 1.0, d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        near = jnp.where(parallel, -BIG, jnp.minimum(t1, t2))
        far = jnp.where(parallel, BIG, jnp.maximum(t1, t2))
        tn = jnp.maximum(tn, near)
        tf = jnp.minimum(tf, far)
        axis_ok &= ~parallel | ((o >= lo) & (o <= hi))
    hit = axis_ok & (tf >= jnp.maximum(tn, 0.0))
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


def intersect_soa_t(scene, soa, o3, d3, t_min, clip, center=None):
    """Lane-aligned dense intersection: t [B,C] against an SoA block.

    soa is [12, C] (one cluster block shared by every ray — the dense
    sweep) or [B, 12, C] (per-ray gathered blocks). The C axis is the TPU
    lane axis, so each of the ~15-50 elementwise ops below runs 128-wide
    with no sub-lane padding — this is the speed-of-light formulation; the
    AoS [B,C,3] form wastes ~40x of the VPU on size-3 minor axes.

    With a shared block the sphere quadratic's two dot products run on the
    MXU as [B,3]x[3,C] matmuls in cluster-local coordinates (`center`
    subtracts out to keep f32 cancellation in check).
    """
    shared = soa.ndim == 2

    def row(i):
        return soa[i][None, :] if shared else soa[:, i, :]

    ox, oy, oz = (c[:, None] for c in o3)
    dx, dy, dz = (c[:, None] for c in d3)
    tmin = t_min[:, None]
    ptype = row(11)
    ra = row(3)

    t = jnp.full((o3[0].shape[0], soa.shape[-1]), -1.0, jnp.float32)

    if scene.sphere_count:
        sx = ox - row(0)
        sy = oy - row(1)
        sz = oz - row(2)
        b = sx * dx + sy * dy + sz * dz
        cterm = sx * sx + sy * sy + sz * sz - ra * ra
        disc = b * b - cterm
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        ts = jnp.where(t0 > tmin, t0, t1)
        ts = jnp.where(ok & (ts > tmin), ts, -1.0)
        t = jnp.where(ptype == PRIM_SPHERE, ts, t)

    if scene.cylinder_count:
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

        for px, py, pz, sign in ((p1x, p1y, p1z, -1.0), (p2x, p2y, p2z, 1.0)):
            qx = ox - px
            qy = oy - py
            qz = oz - pz
            bq = qx * dx + qy * dy + qz * dz
            cq = qx * qx + qy * qy + qz * qz - ra * ra
            dq = bq * bq - cq
            okc = dq >= 0.0
            sqc = jnp.sqrt(jnp.where(okc, dq, 0.0))
            tq = jnp.where(-bq - sqc > tmin, -bq - sqc, -bq + sqc)
            tq = jnp.where(okc & (tq > tmin), tq, -1.0)
            h = (qx + dx * tq) * ax_ + (qy + dy * tq) * ay_ + (qz + dz * tq) * az_
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
        t = jnp.where(ptype == PRIM_CYLINDER, tc, t)

    if scene.tri_count:
        v0x, v0y, v0z = row(0), row(1), row(2)
        e1x = row(4) - v0x
        e1y = row(5) - v0y
        e1z = row(6) - v0z
        e2x = row(8) - v0x
        e2y = row(9) - v0y
        e2z = row(10) - v0z
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        okt = jnp.abs(det) >= 1e-6
        inv = 1.0 / jnp.where(okt, det, 1.0)
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        u = (tvx * px + tvy * py + tvz * pz) * inv
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        okt &= (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (tt > tmin)
        tt = jnp.where(okt, tt, -1.0)
        if clip is not None:
            normal, offset, side = clip
            hx = ox + dx * tt
            hy = oy + dy * tt
            hz = oz + dz * tt
            s = hx * normal[0] + hy * normal[1] + hz * normal[2] - offset
            tt = jnp.where(s * side > 0.0, -1.0, tt)
        t = jnp.where(ptype == PRIM_TRIANGLE, tt, t)

    return jnp.where(ptype >= 0.0, t, -1.0)


# Below this many clusters the dense sweep (no gathers at all) wins: with
# few clusters, per-tile front-to-back selection saves nothing (some tile
# overlaps everything) and its while-loop overhead loses to a straight
# fori sweep. Measured crossover ~30 clusters at 2M rays on v5e.
DENSE_MAX_CLUSTERS = 32

# Rays per tile for the tile-wavefront tracer. Tiles share one cluster
# work-list: per iteration each tile picks its nearest untested cluster
# (by the min entry-t over its rays) and all its rays dense-test that one
# block. Must divide the ray batch; callers pad.
TILE = 256

# Tile mode handles cluster counts up to this; beyond it the [B,K] entry
# matrix gets too expensive and the per-ray gather loop takes over.
TILE_MAX_CLUSTERS = 1024


def _tile_trace(scene, o3, d3, t_min, clip, any_hit, accept_min, t_max,
                active, max_iters):
    """Tile-coherent front-to-back traversal.

    Rays are grouped in TILE-sized blocks (the caller orders primary rays
    in screen-space tiles; secondary rays inherit that locality). Each
    while-loop iteration, every unfinished tile:
      1. picks its nearest untested cluster (argmin over the tile's
         min-entry distances — dense [T,K] work),
      2. gathers that single [12,C] block (one small gather per TILE, not
         per ray — 256x less gather traffic than a per-ray loop),
      3. dense-intersects all TILE rays against the block,
      4. retires the cluster; the tile finishes when its nearest remaining
         cluster lies beyond every ray's current closest hit.

    Work per tile = (clusters overlapping the tile) x TILE x C tests,
    instead of the dense sweep's K x TILE x C — with per-tile front-to-back
    early termination on top.
    """
    n = o3[0].shape[0]
    k = scene.num_clusters
    c = scene.cluster_size
    n_tiles = n // TILE

    entry = cluster_entry_t(scene.cluster_bmin, scene.cluster_bmax, o3, d3)
    if active is not None:
        entry = jnp.where(active[:, None], entry, INF)

    closest0 = (
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        if t_max is not None else jnp.full((n,), BIG)
    )
    if active is not None:
        # Inactive lanes get closest = -inf: they accept nothing, never
        # update best_row, and never keep a tile's front-to-back bound open.
        closest0 = jnp.where(active, closest0, -INF)
    if accept_min is None:
        accept_lo = jnp.zeros((n,), jnp.float32)
    else:
        accept_lo = jnp.broadcast_to(jnp.asarray(accept_min, jnp.float32), (n,))

    # Per-tile K-vector of entry distances: min over the tile's rays.
    tile_entry = jnp.min(entry.reshape(n_tiles, TILE, k), axis=1)   # [T,K]

    t_min_t = t_min.reshape(n_tiles, TILE)
    accept_t = accept_lo.reshape(n_tiles, TILE)
    o_t = tuple(x.reshape(n_tiles, TILE) for x in o3)
    d_t = tuple(x.reshape(n_tiles, TILE) for x in d3)
    tiles = jnp.arange(n_tiles)

    def tile_bound(closest):
        # A cluster can still matter to the tile if it starts before the
        # farthest unresolved ray's closest hit.
        return jnp.max(closest.reshape(n_tiles, TILE), axis=1)

    def cond(s):
        it, tile_entry, closest, *_ = s
        return (it < max_iters) & jnp.any(
            jnp.min(tile_entry, axis=1) < tile_bound(closest))

    def body(s):
        it, tile_entry, closest, best_row, found, tile_cost = s
        knext = jnp.argmin(tile_entry, axis=1)                       # [T]
        tnext = tile_entry[tiles, knext]
        work_tile = tnext < tile_bound(closest)

        soa = scene.cluster_soa[jnp.where(work_tile, knext, 0)]      # [T,12,C]

        def row(i):
            return soa[:, i, :][:, None, :]                          # [T,1,C]

        ox = o_t[0][:, :, None]
        oy = o_t[1][:, :, None]
        oz = o_t[2][:, :, None]
        dx = d_t[0][:, :, None]
        dy = d_t[1][:, :, None]
        dz = d_t[2][:, :, None]
        tmin = t_min_t[:, :, None]
        ptype = row(11)
        ra = row(3)

        t_c = jnp.full((n_tiles, TILE, c), -1.0, jnp.float32)

        if scene.sphere_count:
            sx = ox - row(0)
            sy = oy - row(1)
            sz = oz - row(2)
            b = sx * dx + sy * dy + sz * dz
            cterm = sx * sx + sy * sy + sz * sz - ra * ra
            disc = b * b - cterm
            okq = disc >= 0.0
            sq = jnp.sqrt(jnp.where(okq, disc, 0.0))
            t0 = -b - sq
            t1 = -b + sq
            ts = jnp.where(t0 > tmin, t0, t1)
            ts = jnp.where(okq & (ts > tmin), ts, -1.0)
            t_c = jnp.where(ptype == PRIM_SPHERE, ts, t_c)

        if scene.cylinder_count:
            p1x, p1y, p1z = row(0), row(1), row(2)
            p2x, p2y, p2z = row(4), row(5), row(6)
            avx = p2x - p1x
            avy = p2y - p1y
            avz = p2z - p1z
            height = jnp.sqrt(avx * avx + avy * avy + avz * avz)
            degen = height < 1e-6
            inv_h = 1.0 / jnp.where(degen, 1.0, height)
            ax_, ay_, az_ = avx * inv_h, avy * inv_h, avz * inv_h
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
            for px, py, pz, sign in ((p1x, p1y, p1z, -1.0), (p2x, p2y, p2z, 1.0)):
                qx = ox - px
                qy = oy - py
                qz = oz - pz
                bq = qx * dx + qy * dy + qz * dz
                cq = qx * qx + qy * qy + qz * qz - ra * ra
                dq = bq * bq - cq
                okc = dq >= 0.0
                sqc = jnp.sqrt(jnp.where(okc, dq, 0.0))
                tq = jnp.where(-bq - sqc > tmin, -bq - sqc, -bq + sqc)
                tq = jnp.where(okc & (tq > tmin), tq, -1.0)
                h = (qx + dx * tq) * ax_ + (qy + dy * tq) * ay_ + (qz + dz * tq) * az_
                better = (tq > tmin) & ((tc < 0.0) | (tq < tc)) & ((h * sign) >= 0.0)
                tc = jnp.where(better, tq, tc)
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
            t_c = jnp.where(ptype == PRIM_CYLINDER, tc, t_c)

        if scene.tri_count:
            v0x, v0y, v0z = row(0), row(1), row(2)
            e1x = row(4) - v0x
            e1y = row(5) - v0y
            e1z = row(6) - v0z
            e2x = row(8) - v0x
            e2y = row(9) - v0y
            e2z = row(10) - v0z
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            okt = jnp.abs(det) >= 1e-6
            inv = 1.0 / jnp.where(okt, det, 1.0)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv
            okt &= (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > tmin)
            tt = jnp.where(okt, tt, -1.0)
            if clip is not None:
                normal, offset, side = clip
                hx = ox + dx * tt
                hy = oy + dy * tt
                hz = oz + dz * tt
                sdist = hx * normal[0] + hy * normal[1] + hz * normal[2] - offset
                tt = jnp.where(sdist * side > 0.0, -1.0, tt)
            t_c = jnp.where(ptype == PRIM_TRIANGLE, tt, t_c)

        t_c = jnp.where(ptype >= 0.0, t_c, -1.0)

        closest_t = closest.reshape(n_tiles, TILE)
        if any_hit:
            valid = (t_c > accept_t[:, :, None]) & (t_c < closest_t[:, :, None])
            valid &= work_tile[:, None, None]
            hit_now = jnp.any(valid, axis=2).reshape(-1)
            found = found | hit_now
            closest = jnp.where(found, -INF, closest)
        else:
            valid = (t_c > 0.0) & (t_c < closest_t[:, :, None])
            valid &= work_tile[:, None, None]
            t_masked = jnp.where(valid, t_c, INF)
            j = jnp.argmin(t_masked, axis=2)
            t_best = jnp.min(t_masked, axis=2)
            upd = (t_best < closest_t).reshape(-1)
            row_id = (jnp.where(work_tile, knext, 0)[:, None] * c + j).reshape(-1)
            closest = jnp.where(upd, t_best.reshape(-1), closest)
            best_row = jnp.where(upd, row_id, best_row)

        tile_entry = tile_entry.at[tiles, knext].set(INF)
        tile_cost = tile_cost + work_tile.astype(jnp.int32) * (c + 1)
        return it + 1, tile_entry, closest, best_row, found, tile_cost

    init = (
        jnp.zeros((), jnp.int32),
        tile_entry,
        closest0,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), bool),
        jnp.zeros((n_tiles,), jnp.int32),
    )
    _, _, closest, best_row, found, tile_cost = jax.lax.while_loop(
        cond, body, init)

    # Per-ray traversal-cost channel (vis mode 2): every ray in a tile paid
    # for each cluster block the tile tested.
    cost = jnp.repeat(tile_cost, TILE)

    if any_hit:
        if active is not None:
            found = found & active
        return found
    return _finalize_hit(scene, o3, d3, t_min, clip, closest, best_row,
                         cost=cost)


def _dense_trace(scene, o3, d3, t_min, clip, any_hit, accept_min,
                 t_max, active):
    """Gather-free brute sweep: fori over cluster blocks, each block
    dense-intersected against every ray. Optimal when K is small — all
    irregularity disappears and XLA sees pure streaming VPU work."""
    n = o3[0].shape[0]
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

    def body(kk, carry):
        closest, best_row, found = carry
        soa = jax.lax.dynamic_index_in_dim(scene.cluster_soa, kk, 0, keepdims=False)
        t_c = intersect_soa_t(scene, soa, o3, d3, t_min, clip)
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
    return _finalize_hit(scene, o3, d3, t_min, clip, closest, best_row,
                         cost=jnp.full((n,), k * scene.cluster_size, jnp.int32))


def _finalize_hit(scene, o3, d3, t_min, clip, closest, best_row, cost,
                  refine_sphere_t=False, row=None):
    """Recover hit attributes for the winning primitive per ray: one [B,12]
    row gather + component-form ([B]-shaped) re-derivation of barycentrics /
    cylinder cap type — keeps the hot loop free of [B,C,*] attribute
    selection and avoids padded small-minor-axis ops here too.

    refine_sphere_t (the Pallas path): recompute sphere winners' t with
    the quadratic in GLOBAL coordinates, removing the kernel's scene-
    centered rounding so hit positions match the XLA path to f32 ulps.
    Done here to reuse this function's row gather — per-ray gathers are
    the TPU slow path, and a second [B,12] gather measured ~26 ms/frame
    at 1080p.

    row: optional precomputed [B, 12] winner rows (the attrs kernel's
    one-hot MXU extraction, pallas_trace.trace_closest_attrs) — skips the
    gather entirely; values are bit-identical to the gathered rows."""
    if row is None:
        flat = scene.cluster_prims.reshape(-1, 12)
        row = flat[jnp.maximum(best_row, 0)]
    ox, oy, oz = o3
    dx, dy, dz = d3
    ptype = row[:, 11].astype(jnp.int32)
    plocal = row[:, 7].astype(jnp.int32)

    if refine_sphere_t and scene.sphere_count:
        sx = ox - row[:, 0]
        sy = oy - row[:, 1]
        sz = oz - row[:, 2]
        b = sx * dx + sy * dy + sz * dz
        cterm = sx * sx + sy * sy + sz * sz - row[:, 3] * row[:, 3]
        disc = b * b - cterm
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        ts = jnp.where(t0 > t_min, t0, t1)
        ok = ((best_row >= 0) & (ptype == PRIM_SPHERE)
              & (disc >= 0.0) & (ts > t_min))
        closest = jnp.where(ok, ts, closest)

    e0 = jnp.zeros_like(closest)
    e1 = jnp.zeros_like(closest)

    if scene.cylinder_count:
        # hit_type from the winning t: cap when the hit height falls outside
        # the finite body (webgl.js:527-541 classification logic).
        p1x, p1y, p1z = row[:, 0], row[:, 1], row[:, 2]
        p2x, p2y, p2z = row[:, 4], row[:, 5], row[:, 6]
        avx, avy, avz = p2x - p1x, p2y - p1y, p2z - p1z
        height = jnp.sqrt(avx * avx + avy * avy + avz * avz)
        degen = height < 1e-6
        inv_h = 1.0 / jnp.where(degen, 1.0, height)
        ax_, ay_, az_ = avx * inv_h, avy * inv_h, avz * inv_h
        hx = ox + dx * closest - p1x
        hy = oy + dy * closest - p1y
        hz = oz + dz * closest - p1z
        h = hx * ax_ + hy * ay_ + hz * az_
        htype = jnp.where(h < 0.0, 1.0, jnp.where(h > height, 2.0, 0.0))
        htype = jnp.where(degen, 0.0, htype)
        e0 = jnp.where(ptype == PRIM_CYLINDER, htype, e0)

    if scene.tri_count:
        v0x, v0y, v0z = row[:, 0], row[:, 1], row[:, 2]
        e1x, e1y, e1z = row[:, 4] - v0x, row[:, 5] - v0y, row[:, 6] - v0z
        e2x, e2y, e2z = row[:, 8] - v0x, row[:, 9] - v0y, row[:, 10] - v0z
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / jnp.where(jnp.abs(det) >= 1e-6, det, 1.0)
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        uu = (tvx * px + tvy * py + tvz * pz) * inv
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        vv = (dx * qx + dy * qy + dz * qz) * inv
        is_tri = ptype == PRIM_TRIANGLE
        e0 = jnp.where(is_tri, uu, e0)
        e1 = jnp.where(is_tri, vv, e1)

    hit = best_row >= 0
    extra = jnp.stack([
        jnp.where(hit, e0, 0.0),
        jnp.where(hit, e1, 0.0),
        jnp.zeros_like(e0),
    ], axis=-1)
    return HitRecord(
        t=jnp.where(hit, closest, BIG),
        prim_type=jnp.where(hit, ptype, -1),
        prim_local=jnp.where(hit, plocal, -1),
        prim_slot=best_row,
        extra=extra,
        cost=cost,
    )


def gather_attr_rows(scene, rec):
    """[B, 32] winner attribute rows in pallas_trace._attr_operand's
    layout, built by gather from a finalized HitRecord — the functional
    fallback for with_attrs on non-kernel paths (CPU tests, distributed
    frames, big scenes). Values match the kernel's one-hot extraction
    bit-for-bit (same source tables)."""
    n = rec.t.shape[0]
    slot = jnp.maximum(rec.prim_slot, 0)
    local = jnp.maximum(rec.prim_local, 0)
    hit = rec.prim_slot >= 0
    row = scene.cluster_prims.reshape(-1, 12)[slot]
    color = scene.cluster_color[slot]                       # [B, 3]
    parts = [row, color]
    if scene.tri_count:
        tn = scene.tri_normals[local].reshape(n, 9)         # [B, 9]
        is_tri = (rec.prim_type == PRIM_TRIANGLE)[:, None]
        parts.append(jnp.where(is_tri, tn, 0.0))
        tf = scene.tri_flags[local]
        parts.append(jnp.where(is_tri[:, 0], tf, 0.0)[:, None])
    else:
        parts.append(jnp.zeros((n, 10), jnp.float32))
    parts.append(jnp.zeros((n, 1), jnp.float32))            # col 25 pad
    parts.append(jnp.zeros((n, 2), jnp.float32))            # cols 26-27
    parts.append(slot.astype(jnp.float32)[:, None])         # col 28
    parts.append(jnp.zeros((n, 3), jnp.float32))
    out = jnp.concatenate(parts, axis=1)
    out = jnp.where(hit[:, None], out, 0.0)
    return out.at[:, 11].set(jnp.where(hit, out[:, 11], -1.0))


def _wf_trace_flat(scene, o3, d3, t_min, clip, any_hit, accept_min,
                   t_max, active, max_iters):
    n = o3[0].shape[0]
    k = scene.num_clusters
    c = scene.cluster_size
    rows = jnp.arange(n)

    entry = cluster_entry_t(scene.cluster_bmin, scene.cluster_bmax, o3, d3)
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

    def cond(s):
        it, entry, closest, *_ = s
        return (it < max_iters) & jnp.any(jnp.min(entry, axis=1) < closest)

    def body(s):
        it, entry, closest, best_row, found, cost = s
        knext = jnp.argmin(entry, axis=1)
        tnext = entry[rows, knext]
        work = tnext < closest

        soa = scene.cluster_soa[jnp.where(work, knext, 0)]
        t_c = intersect_soa_t(scene, soa, o3, d3, t_min, clip)
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
    return _finalize_hit(scene, o3, d3, t_min, clip, closest,
                         best_row, cost=cost)


def pallas_forced_interpret() -> bool:
    """WRT_PALLAS_INTERPRET=1 routes eligible traces through the Pallas
    kernels in interpreter mode on non-TPU backends — how dryrun_multichip
    exercises the kernel code path on the virtual CPU mesh."""
    import os

    return bool(os.environ.get("WRT_PALLAS_INTERPRET"))


def _pallas_auto(scene, clip, use_pallas):
    """Route eligible scenes through the fused Pallas traversal kernel on
    TPU (ops/pallas_trace.py). jax.default_backend() is resolved at trace
    time, so CPU tests and the virtual-device mesh keep the XLA path."""
    if not use_pallas:
        return False
    from . import pallas_trace as PS

    return PS.supports(scene, clip) and (jax.default_backend() == "tpu"
                                         or pallas_forced_interpret())


def wf_trace_closest_v3(scene, o3, d3, t_min, clip=None, active=None,
                        max_iters: int = 4096, use_pallas: bool = True,
                        force_dense: bool = False,
                        full_record: bool = True,
                        with_attrs: bool = False,
                        secondary: bool = False):
    """Closest hit via the cluster wavefront; rays as component triples.
    prim_slot indexes the padded cluster table ([K*C, 12]). force_dense
    sweeps every cluster with no worklist/kernel — the reference's
    useBvh=false brute-force mode (webgl.js:1).

    full_record=False (Pallas branch only): skip _finalize_hit — the
    [B,12] row gather plus attribute math over the FULL ray batch costs
    ~26 ms/frame at 1080p, and the compacting integrator rebuilds the
    record per chunk anyway. The minimal record carries the kernel's
    UNREFINED t (scene-centered rounding), valid prim_slot, and
    prim_type as a 0/-1 hit flag; callers must finalize with
    refine_sphere_t=True before shading.

    with_attrs (Pallas branch only): returns (HitRecord, attrs [B, 32])
    — the winner's attribute row extracted IN-KERNEL by one-hot MXU
    matmuls (pallas_trace.trace_closest_attrs), so neither this call nor
    any downstream shading needs a per-lane gather. The record is fully
    finalized (refined t, barycentrics) from the carried rows; attrs
    cols 12-14 are the primitive color, 15-23 the tri vertex normals,
    24 the tri flag (see pallas_trace._attr_operand).

    secondary: hint that this batch is divergent bounce rays — routes
    the Pallas branch to the per-ray worklist kernels on cluster-rich
    scenes (pallas_trace.perray_auto_secondary)."""
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), o3[0].shape)
    n = o3[0].shape[0]
    k = scene.num_clusters
    if force_dense:
        return _dense_trace(scene, o3, d3, t_min, clip, any_hit=False,
                            accept_min=None, t_max=None, active=active)
    if _pallas_auto(scene, clip, use_pallas):
        from . import pallas_trace as PS

        cost = jnp.full((n,), k * scene.cluster_size, jnp.int32)
        if with_attrs and PS.supports_attrs(scene):
            t, attrs = PS.trace_closest_attrs(
                scene, o3, d3, t_min, clip=clip, active=active,
                interpret=pallas_forced_interpret())
            hit = attrs[:, 11] >= 0.0
            slot = jnp.where(hit, attrs[:, 28].astype(jnp.int32), -1)
            rec = _finalize_hit(scene, o3, d3, t_min, clip, t, slot,
                                cost=cost, refine_sphere_t=True,
                                row=attrs[:, :12])
            return rec, attrs
        # Secondary bounce rays are divergent: each ray's own front-to-back
        # chain is much shorter than its block's cluster union, and on
        # cluster-rich scenes the per-ray worklist kernels win 2x+
        # (see pallas_trace.PERRAY_MIN_CLUSTERS). Primaries stay on the
        # block kernels (coherent frustums; measured faster there).
        perray = True if (secondary
                          and PS.perray_auto_secondary(scene)) else None
        closest, best_row = PS.trace_closest(scene, o3, d3, t_min, clip=clip,
                                             active=active, perray=perray,
                                             interpret=pallas_forced_interpret())
        if not full_record:
            hit = best_row >= 0
            return HitRecord(
                t=jnp.where(hit, closest, BIG),
                prim_type=jnp.where(hit, 0, -1),
                prim_local=jnp.full((n,), -1, jnp.int32),
                prim_slot=best_row,
                extra=jnp.zeros((n, 3), jnp.float32),
                cost=cost,
            )
        return _finalize_hit(scene, o3, d3, t_min, clip, closest, best_row,
                             cost=cost, refine_sphere_t=True)
    if with_attrs:
        # Non-kernel paths: finalize normally and synthesize the attr
        # row by gather (functional parity for CPU tests / big scenes).
        rec = wf_trace_closest_v3(scene, o3, d3, t_min, clip=clip,
                                  active=active, max_iters=max_iters,
                                  use_pallas=use_pallas,
                                  force_dense=force_dense)
        return rec, gather_attr_rows(scene, rec)
    if k <= DENSE_MAX_CLUSTERS or n % TILE != 0 or n < TILE:
        if k <= TILE_MAX_CLUSTERS:
            return _dense_trace(scene, o3, d3, t_min, clip,
                                any_hit=False, accept_min=None, t_max=None,
                                active=active)
    elif k <= TILE_MAX_CLUSTERS:
        return _tile_trace(scene, o3, d3, t_min, clip,
                           any_hit=False, accept_min=None, t_max=None,
                           active=active, max_iters=min(max_iters, k))
    return _wf_trace_flat(scene, o3, d3, t_min, clip,
                          any_hit=False, accept_min=None, t_max=None,
                          active=active, max_iters=max_iters)


def wf_trace_any_v3(scene, o3, d3, t_min, t_max=BIG, accept_min=None,
                    clip=None, active=None, max_iters: int = 4096,
                    use_pallas: bool = True, force_dense: bool = False,
                    divergent: bool = False):
    """divergent=True marks batches whose directions scatter over the
    sphere (env-NEE occlusion) rather than fanning toward a light; on
    cluster-rich scenes those route to the per-ray worklist kernels
    (measured 2.14x on 10k spheres) while co-directional shadow fans stay
    on the block kernels (per-ray measured 0.76-0.80x there) — see
    pallas_trace.perray_auto_any for the full measurements."""
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), o3[0].shape)
    n = o3[0].shape[0]
    k = scene.num_clusters
    if force_dense:
        return _dense_trace(scene, o3, d3, t_min, clip, any_hit=True,
                            accept_min=accept_min, t_max=t_max, active=active)
    if _pallas_auto(scene, clip, use_pallas):
        from . import pallas_trace as PS

        perray = True if PS.perray_auto_any(scene, divergent) else None
        return PS.trace_any(scene, o3, d3, t_min, t_max=t_max,
                            accept_min=accept_min, clip=clip, active=active,
                            perray=perray,
                            interpret=pallas_forced_interpret())
    if k <= DENSE_MAX_CLUSTERS or n % TILE != 0 or n < TILE:
        if k <= TILE_MAX_CLUSTERS:
            return _dense_trace(scene, o3, d3, t_min, clip,
                                any_hit=True, accept_min=accept_min, t_max=t_max,
                                active=active)
    elif k <= TILE_MAX_CLUSTERS:
        return _tile_trace(scene, o3, d3, t_min, clip,
                           any_hit=True, accept_min=accept_min, t_max=t_max,
                           active=active, max_iters=min(max_iters, k))
    return _wf_trace_flat(scene, o3, d3, t_min, clip,
                          any_hit=True, accept_min=accept_min, t_max=t_max,
                          active=active, max_iters=max_iters)


def wf_trace_any3_v3(scene, o3, d3s, t_min, accept_min=None, clip=None,
                     actives=(None, None, None), use_pallas: bool = True,
                     force_dense: bool = False):
    """Occlusion of THREE rays per lane sharing one origin (the 3-light
    shadow fan, webgl.js:1094-1145). On the Pallas path this is ONE fused
    launch with a shared worklist (pallas_trace.trace_any3 — 3x fewer
    blocks than the concatenated [3N] batch, bit-identical results); on
    other paths it falls back to three wf_trace_any_v3 calls (whose
    per-ray results are independent of batching). Returns three bool [N]
    arrays."""
    if not force_dense and _pallas_auto(scene, clip, use_pallas):
        from . import pallas_trace as PS

        return PS.trace_any3(scene, o3, d3s, t_min, accept_min=accept_min,
                             clip=clip, actives=actives,
                             interpret=pallas_forced_interpret())
    return tuple(
        wf_trace_any_v3(scene, o3, d3s[j], t_min, accept_min=accept_min,
                        clip=clip, active=actives[j],
                        use_pallas=use_pallas, force_dense=force_dense)
        for j in range(3))


def _split(a):
    return (a[..., 0], a[..., 1], a[..., 2])


def wf_trace_closest(scene, origin, direction, t_min, clip=None, active=None,
                     max_iters: int = 256) -> HitRecord:
    """Array-API wrapper over wf_trace_closest_v3 ([B,3] rays)."""
    return wf_trace_closest_v3(scene, _split(origin), _split(direction), t_min,
                               clip=clip, active=active, max_iters=max_iters)


def wf_trace_any(scene, origin, direction, t_min, t_max=BIG, accept_min=None,
                 clip=None, active=None, max_iters: int = 256):
    """Array-API wrapper over wf_trace_any_v3 ([B,3] rays)."""
    return wf_trace_any_v3(scene, _split(origin), _split(direction), t_min,
                           t_max=t_max, accept_min=accept_min, clip=clip,
                           active=active, max_iters=max_iters)
