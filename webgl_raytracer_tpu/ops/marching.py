"""Marching cubes on device.

The reference runs scalar marching cubes on the CPU per cell
(surface_webgl.js:683-854); SURVEY §2.12 flags its inner loop as one of
the host hot spots worth devicing. This is the jitted XLA formulation:

  * cube indices, edge crossings, vertex interpolation and gradient
    normals are dense grid ops;
  * variable-size outputs use the fixed-capacity compaction pattern —
    a first jitted pass counts crossings/triangles, the host reads two
    scalars and calls the extraction pass with static capacities
    (bucketed to powers of two so recompiles stay rare).

Vertices on shared edges are emitted exactly once (global edge identity).
Output matches models/surface.marching_cubes (the numpy fallback) up to
float32 rounding.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_TABLES = np.load(os.path.join(os.path.dirname(__file__), "..", "assets",
                               "marching_cubes.npz"))
EDGE_TABLE = _TABLES["edge_table"]
TRI_TABLE = _TABLES["tri_table"]
TRI_COUNT = np.array([int((row >= 0).sum() // 3) for row in TRI_TABLE], np.int32)

EDGE_CORNERS = np.array([
    [0, 1], [1, 2], [2, 3], [3, 0],
    [4, 5], [5, 6], [6, 7], [7, 4],
    [0, 4], [1, 5], [2, 6], [3, 7],
], np.int32)
CORNER_OFFSETS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], np.int32)

# For each of the 12 cell edges: (axis, offset) of its global edge.
_EDGE_AXIS = []
_EDGE_OFF = []
for _e in range(12):
    _c0, _c1 = EDGE_CORNERS[_e]
    _o0, _o1 = CORNER_OFFSETS[_c0], CORNER_OFFSETS[_c1]
    _axis = int(np.nonzero(_o0 != _o1)[0][0])
    _EDGE_AXIS.append(_axis)
    _EDGE_OFF.append(np.minimum(_o0, _o1))
_EDGE_AXIS = np.array(_EDGE_AXIS, np.int32)
_EDGE_OFF = np.array(_EDGE_OFF, np.int32)


def _crossing_masks(data, iso):
    inside = data < iso
    cross = []
    for axis in range(3):
        if axis == 0:
            c = inside[:, :, :-1] != inside[:, :, 1:]
        elif axis == 1:
            c = inside[:, :-1, :] != inside[:, 1:, :]
        else:
            c = inside[:-1, :, :] != inside[1:, :, :]
        cross.append(c)
    return inside, cross


def _cube_indices(inside):
    nz, ny, nx = inside.shape
    ci = jnp.zeros((nz - 1, ny - 1, nx - 1), jnp.int32)
    for corner in range(8):
        ox, oy, oz = (int(v) for v in CORNER_OFFSETS[corner])
        ci |= inside[oz:nz - 1 + oz, oy:ny - 1 + oy, ox:nx - 1 + ox].astype(jnp.int32) << corner
    return ci


@jax.jit
def _mc_count(data, iso):
    inside, cross = _crossing_masks(data, iso)
    ci = _cube_indices(inside)
    tri_count = jnp.asarray(TRI_COUNT)[ci]
    n_verts = sum(jnp.sum(c) for c in cross)
    return n_verts, jnp.sum(tri_count)


@partial(jax.jit, static_argnames=("vert_cap", "tri_cap", "tri_out_cap",
                                   "verts_only"))
def _mc_extract(data, iso, gx, gy, gz, resolution, max_dist, vert_cap,
                tri_cap, tri_out_cap, verts_only):
    """Extraction pass, component form throughout: every per-vertex /
    per-triangle array is a flat 1-D vector (no [N,3]/[N,12] minor axes —
    TPU tiles pad those 8-128x, see ops/vec3.py)."""
    inside, cross = _crossing_masks(data, iso)

    # Global vertex ids: ordered x-edges, then y-edges, then z-edges, in
    # flat scan order (matching the numpy implementation).
    ids = []
    counts = []
    base = jnp.int32(0)
    for c in cross:
        flat = c.reshape(-1)
        local = jnp.cumsum(flat.astype(jnp.int32)) - 1
        ids.append((local + base).reshape(c.shape))
        count = jnp.sum(flat.astype(jnp.int32))
        base = base + count
        counts.append(count)

    # --- vertex positions (one per crossing edge) -------------------------
    vx = jnp.zeros(vert_cap, jnp.float32)
    vy = jnp.zeros(vert_cap, jnp.float32)
    vz = jnp.zeros(vert_cap, jnp.float32)
    offset = jnp.int32(0)
    for axis, c in enumerate(cross):
        if axis == 0:
            a = data[:, :, :-1]
            b = data[:, :, 1:]
        elif axis == 1:
            a = data[:, :-1, :]
            b = data[:, 1:, :]
        else:
            a = data[:-1, :, :]
            b = data[1:, :, :]
        zz, yy, xx = jnp.nonzero(c, size=vert_cap, fill_value=0)
        valid = jnp.arange(vert_cap) < counts[axis]
        v1 = a[zz, yy, xx]
        v2 = b[zz, yy, xx]
        denom = v2 - v1
        t = jnp.where(jnp.abs(denom) < 1e-5, 0.0, (iso - v1) / jnp.where(denom == 0, 1, denom))
        t = jnp.where(jnp.abs(iso - v1) < 1e-5, 0.0, t)
        t = jnp.where(jnp.abs(iso - v2) < 1e-5, 1.0, t)
        p = [xx.astype(jnp.float32), yy.astype(jnp.float32), zz.astype(jnp.float32)]
        p[axis] = p[axis] + t
        px = gx + p[0] * resolution
        py = gy + p[1] * resolution
        pz = gz + p[2] * resolution
        # Invalid rows scatter out of bounds and are dropped.
        dst = jnp.where(valid, offset + jnp.arange(vert_cap), vert_cap)
        vx = vx.at[dst].set(px, mode="drop")
        vy = vy.at[dst].set(py, mode="drop")
        vz = vz.at[dst].set(pz, mode="drop")
        offset = offset + counts[axis]

    if verts_only:
        # SAS probe-respray pass: only vertex positions are consumed
        # (surface_webgl.js:1051 uses SAS vertices as probe centers), so
        # skip triangles and normals — and their tunnel download.
        return vx, vy, vz, base

    # --- triangles ---------------------------------------------------------
    ci = _cube_indices(inside)
    active = jnp.asarray(EDGE_TABLE)[ci] != 0
    cz, cy, cx = jnp.nonzero(active, size=tri_cap, fill_value=0)
    n_active = jnp.sum(active.astype(jnp.int32))
    cell_valid = jnp.arange(tri_cap) < n_active
    cell_ci = ci[cz, cy, cx]                           # flat [cap]

    # Edge->vertex table as 12 flat [cap] vectors concatenated: slot e of
    # cell i lives at e*cap + i (1-D gather, no [cap,12] minor axis).
    cell_edge_vert = jnp.concatenate([
        ids[int(_EDGE_AXIS[e])][cz + int(_EDGE_OFF[e][2]),
                                cy + int(_EDGE_OFF[e][1]),
                                cx + int(_EDGE_OFF[e][0])]
        for e in range(12)
    ])                                                  # flat [12*cap]

    # Triangles are emitted k-slot-major (all cells' first triangles, then
    # all second triangles, ...) and compacted on the host — a different
    # order than the scalar reference, same triangle set.
    lane = jnp.arange(tri_cap)
    t0_pieces, t1_pieces, t2_pieces, piece_valid = [], [], [], []
    for k in range(0, 15, 3):
        # Per-slot TRI_TABLE column gathered flat from a [256] constant.
        e = [jnp.asarray(TRI_TABLE[:, k + i])[cell_ci] for i in range(3)]
        ok = cell_valid & (e[0] >= 0)
        t0_pieces.append(cell_edge_vert[jnp.maximum(e[0], 0) * tri_cap + lane])
        t1_pieces.append(cell_edge_vert[jnp.maximum(e[1], 0) * tri_cap + lane])
        t2_pieces.append(cell_edge_vert[jnp.maximum(e[2], 0) * tri_cap + lane])
        piece_valid.append(ok)
    t0 = jnp.concatenate(t0_pieces)
    t1 = jnp.concatenate(t1_pieces)
    t2 = jnp.concatenate(t2_pieces)
    tri_valid = jnp.concatenate(piece_valid)

    # Compact valid triangles on device: download exactly tri_out_cap slots
    # instead of 5*tri_cap slots + a mask (the tunnel is the bottleneck).
    dst = jnp.where(tri_valid, jnp.cumsum(tri_valid.astype(jnp.int32)) - 1,
                    tri_out_cap)
    t0 = jnp.zeros(tri_out_cap, jnp.int32).at[dst].set(t0, mode="drop")
    t1 = jnp.zeros(tri_out_cap, jnp.int32).at[dst].set(t1, mode="drop")
    t2 = jnp.zeros(tri_out_cap, jnp.int32).at[dst].set(t2, mode="drop")

    # --- gradient normals ----------------------------------------------------
    nx_, ny_, nz_ = _gradient_normals_device(
        data, gx, gy, gz, resolution, max_dist, vx, vy, vz)

    return vx, vy, vz, nx_, ny_, nz_, t0, t1, t2, base


def _sample_device(data, gx, gy, gz, resolution, max_dist, px, py, pz):
    """Trilinear sample, component form (flat [N] coordinate vectors)."""
    nzd, nyd, nxd = data.shape
    fx = (px - gx) / resolution
    fy = (py - gy) / resolution
    fz = (pz - gz) / resolution
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    iz = jnp.floor(fz).astype(jnp.int32)
    tx = fx - ix
    ty = fy - iy
    tz = fz - iz

    def val(jx, jy, jz):
        ok = ((jx >= 0) & (jx < nxd) & (jy >= 0) & (jy < nyd)
              & (jz >= 0) & (jz < nzd))
        v = data[jnp.clip(jz, 0, nzd - 1), jnp.clip(jy, 0, nyd - 1),
                 jnp.clip(jx, 0, nxd - 1)]
        return jnp.where(ok, v, max_dist)

    c000 = val(ix, iy, iz)
    c100 = val(ix + 1, iy, iz)
    c010 = val(ix, iy + 1, iz)
    c110 = val(ix + 1, iy + 1, iz)
    c001 = val(ix, iy, iz + 1)
    c101 = val(ix + 1, iy, iz + 1)
    c011 = val(ix, iy + 1, iz + 1)
    c111 = val(ix + 1, iy + 1, iz + 1)
    c00 = c000 * (1 - tx) + c100 * tx
    c10 = c010 * (1 - tx) + c110 * tx
    c01 = c001 * (1 - tx) + c101 * tx
    c11 = c011 * (1 - tx) + c111 * tx
    c0 = c00 * (1 - ty) + c10 * ty
    c1 = c01 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz


def _gradient_normals_device(data, gx, gy, gz, resolution, max_dist,
                             vx, vy, vz):
    h = resolution

    def samp(px, py, pz):
        return _sample_device(data, gx, gy, gz, resolution, max_dist,
                              px, py, pz)

    dx = samp(vx + h, vy, vz) - samp(vx - h, vy, vz)
    dy = samp(vx, vy + h, vz) - samp(vx, vy - h, vz)
    dz = samp(vx, vy, vz + h) - samp(vx, vy, vz - h)
    lens = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    ok = lens > 1e-4
    inv = 1.0 / jnp.where(lens > 0, lens, 1)
    return (jnp.where(ok, dx * inv, 0.0),
            jnp.where(ok, dy * inv, 1.0),
            jnp.where(ok, dz * inv, 0.0))


def _bucket(n: int) -> int:
    cap = 1024
    while cap < n:
        cap *= 2
    return cap


# Geometric grid-size ladder (~1.25x steps, all 64-multiples): a new
# molecule/resolution that lands within ~25% of a previous one reuses its
# compiled kernels instead of paying a fresh multi-minute remote compile.
_DIM_LADDER = (64, 128, 192, 256, 320, 384, 448, 576, 704, 896, 1088, 1344)


def _ladder(n: int) -> int:
    for v in _DIM_LADDER:
        if n <= v:
            return v
    return -(-n // 64) * 64


def marching_cubes_device(data, grid_min, resolution, max_dist, isovalue=0.0,
                          verts_only=False):
    """Device marching cubes. data: f32[nz,ny,nx] (numpy or jax array).
    Returns numpy (vertices f32[V,3], normals f32[V,3], indices u32[T,3]);
    with verts_only=True, just vertices (normals/indices empty).

    Compile-shape bucketing: axes are sorted into canonical (descending)
    order — MC runs on the transposed grid and vertex/normal components are
    permuted back — and each dim pads up the geometric _DIM_LADDER with the
    +max_dist background (no new crossings). Both steps collapse the space
    of compiled shapes so new scenes/sizes mostly hit the kernel cache."""
    data = np.asarray(data, np.float32)
    gmin3 = np.asarray(grid_min, np.float32)

    # data axes are (z, y, x) = world components (2, 1, 0): axis i of the
    # array corresponds to world component 2 - i.
    order = tuple(np.argsort([-s for s in data.shape], kind="stable"))
    if order != (0, 1, 2):
        data = np.ascontiguousarray(np.transpose(data, order))
        # world component handled by transposed axis i is comp[i]:
        comp = [2 - order[i] for i in range(3)]
        # The kernel emits vertex coords for its (x, y, z) = axes (2, 1, 0)
        # of the transposed grid, i.e. world components comp[2], comp[1],
        # comp[0]; out_world[c] is kernel column where comp[2 - col] == c.
        col_for_world = [0, 0, 0]
        for col in range(3):
            col_for_world[comp[2 - col]] = col
        gmin_k = np.array([gmin3[comp[2]], gmin3[comp[1]], gmin3[comp[0]]],
                          np.float32)
    else:
        col_for_world = [0, 1, 2]
        gmin_k = gmin3

    pad = [(0, _ladder(s) - s) for s in data.shape]
    if any(p[1] for p in pad):
        data = np.pad(data, pad, constant_values=max_dist)
    data = jnp.asarray(data, jnp.float32)
    iso = jnp.float32(isovalue)

    n_verts, n_tris = _mc_count(data, iso)
    n_verts = int(n_verts)
    n_tris = int(n_tris)
    if n_verts == 0 or n_tris == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                np.zeros((0, 3), np.uint32))

    vert_cap = _bucket(n_verts)
    # Active cells <= n_tris (each active cell emits >= 1 triangle).
    tri_cap = _bucket(n_tris)
    tri_out_cap = tri_cap

    out = _mc_extract(
        data, iso, jnp.float32(gmin_k[0]), jnp.float32(gmin_k[1]),
        jnp.float32(gmin_k[2]), jnp.float32(resolution), jnp.float32(max_dist),
        vert_cap, tri_cap, tri_out_cap, verts_only,
    )

    def world_stack(cols):
        cols = [np.asarray(c) for c in cols]
        return np.stack([cols[col_for_world[0]], cols[col_for_world[1]],
                         cols[col_for_world[2]]], axis=1)

    if verts_only:
        vx, vy, vz, total = out
        verts = world_stack((vx, vy, vz))[:n_verts]
        return (verts, np.zeros((0, 3), np.float32),
                np.zeros((0, 3), np.uint32))
    vx, vy, vz, nx_, ny_, nz_, t0, t1, t2, total = out
    verts = world_stack((vx, vy, vz))[:n_verts]
    normals = world_stack((nx_, ny_, nz_))[:n_verts]
    # An ODD axis permutation (det = -1) mirrors the mesh: vertex coords
    # and gradient normals are permuted component-wise (sign-preserving),
    # but geometric normals from cross(e1, e2) would flip — which inverts
    # the front-face test and glass eta selection downstream
    # (render/integrator.py). Swap two index columns to restore winding.
    odd = order in ((0, 2, 1), (1, 0, 2), (2, 1, 0))
    if odd:
        t1, t2 = t2, t1
    tris = np.stack([np.asarray(t0), np.asarray(t1), np.asarray(t2)],
                    axis=1)[:n_tris]
    return verts, normals, tris.astype(np.uint32)
