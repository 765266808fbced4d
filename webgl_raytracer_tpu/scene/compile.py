"""Scene compile: geometry + BVH -> flat device-ready SoA buffers.

Replaces the reference's texel packers (/root/reference/src/packing.js): on
TPU there is no texture indirection — the flattened BVH and primitive data
are plain HBM arrays indexed by integers.

The unified primitive table is stored in *leaf order* (the order prims
appear in BVH leaves), so a leaf's primitives are contiguous rows and the
traversal kernel does a single contiguous gather per candidate:

    prim_a[i], prim_b[i], prim_c[i]   three f32x4 rows whose meaning
                                      depends on prim_type[i]:
      triangle: v0.xyz | v1.xyz | v2.xyz
      sphere:   center.xyz, radius | 0 | 0
      cylinder: p1.xyz, radius | p2.xyz | 0

    prim_type[i]  0/1/2, prim_local[i] original per-type index,
    prim_color[i] base color row.

Per-type side tables (tri_normals, tri_flags) remain indexed by the local
triangle index for shading-time gathers.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields

import jax
import numpy as np

from ..models.molecular import Geometry
from .bvh import BVH, PRIM_CYLINDER, PRIM_SPHERE, PRIM_TRIANGLE, build_bvh


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    """Pad axis 0 to length n with zeros (keeps at least one row)."""
    if a.shape[0] >= n:
        return a
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


@jax.tree_util.register_dataclass
@dataclass
class SceneBuffers:
    """Flat scene arrays; a pytree whose leaves go straight to the device.

    Counts are static (python ints) so jit specializes per scene shape.
    """

    # BVH
    node_bmin: np.ndarray        # f32[Nn,3]
    node_bmax: np.ndarray        # f32[Nn,3]
    node_meta: np.ndarray        # i32[Nn,3] (leftFirst, primCount, rightChild)

    # Unified leaf-ordered primitive table
    prim_a: np.ndarray           # f32[Np,4]
    prim_b: np.ndarray           # f32[Np,4]
    prim_c: np.ndarray           # f32[Np,4]
    prim_type: np.ndarray        # i32[Np]
    prim_local: np.ndarray       # i32[Np]
    prim_color: np.ndarray       # f32[Np,3]

    # Per-type shading side tables
    tri_verts: np.ndarray        # f32[Nt,3,3]
    tri_normals: np.ndarray      # f32[Nt,3,3]
    tri_colors: np.ndarray       # f32[Nt,3]
    tri_flags: np.ndarray        # f32[Nt]
    sphere_centers: np.ndarray   # f32[Ns,3]
    sphere_radii: np.ndarray     # f32[Ns]
    sphere_colors: np.ndarray    # f32[Ns,3]
    cyl_p1: np.ndarray           # f32[Nc,3]
    cyl_p2: np.ndarray           # f32[Nc,3]
    cyl_radii: np.ndarray        # f32[Nc]
    cyl_colors: np.ndarray       # f32[Nc,3]

    # Cluster layout for the wavefront tracer (ops/wavefront.py): clusters
    # are SAH leaves of up to cluster_size prims, padded with type=-1 rows.
    # cluster_prims row: [a.xyz, radius | b.xyz, local | c.xyz, type].
    cluster_prims: np.ndarray = None    # f32[K,C,12]
    # SoA transpose [K,12,C]: the C axis is the TPU lane axis, so the dense
    # intersection sweep runs 128-wide with no sub-lane padding waste.
    cluster_soa: np.ndarray = None      # f32[K,12,C]
    cluster_color: np.ndarray = None    # f32[K*C,3]
    cluster_bmin: np.ndarray = None     # f32[K,3]
    cluster_bmax: np.ndarray = None     # f32[K,3]
    # Shading-attribute SoA for the attrs traversal kernels
    # (ops/pallas_trace.py _attr_operand): per cluster, rows =
    # color rgb | tri vertex normals | tri flag.
    cluster_attr: np.ndarray = None     # f32[K,16,C]

    tri_count: int = field(metadata=dict(static=True), default=0)
    sphere_count: int = field(metadata=dict(static=True), default=0)
    cylinder_count: int = field(metadata=dict(static=True), default=0)
    node_count: int = field(metadata=dict(static=True), default=0)
    prim_count: int = field(metadata=dict(static=True), default=0)
    max_depth: int = field(metadata=dict(static=True), default=32)
    num_clusters: int = field(metadata=dict(static=True), default=1)
    cluster_size: int = field(metadata=dict(static=True), default=128)

    def device_put(self, device=None) -> "SceneBuffers":
        import jax.numpy as jnp

        arrays = {
            f.name: jax.device_put(jnp.asarray(getattr(self, f.name)), device)
            for f in fields(self)
            if not f.metadata.get("static", False)
        }
        statics = {
            f.name: getattr(self, f.name)
            for f in fields(self)
            if f.metadata.get("static", False)
        }
        return SceneBuffers(**arrays, **statics)


def compile_scene(
    geometry: Geometry | None = None,
    tri_verts: np.ndarray | None = None,
    tri_normals: np.ndarray | None = None,
    tri_colors: np.ndarray | None = None,
    tri_flags: np.ndarray | None = None,
    max_leaf_size: int = 4,
    max_depth: int = 32,
    cluster_size: int = 128,
    bvh: BVH | None = None,
) -> SceneBuffers:
    """Compile spheres/cylinders (from Geometry) + an optional triangle mesh
    into flat SoA buffers, building the unified BVH unless one is supplied.

    tri_verts: f32[Nt,3,3]; tri_normals: f32[Nt,3,3] (per-vertex, defaults to
    face normals); tri_colors: f32[Nt,3]; tri_flags: f32[Nt].
    """
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    if geometry is None:
        geometry = Geometry(z3, z1, z3, z3, z3, z1, z3)

    tv = np.zeros((0, 3, 3), np.float32) if tri_verts is None else np.asarray(tri_verts, np.float32).reshape(-1, 3, 3)
    nt = tv.shape[0]

    if tri_normals is None:
        if nt:
            e1 = tv[:, 1] - tv[:, 0]
            e2 = tv[:, 2] - tv[:, 0]
            fn = np.cross(e1, e2)
            norm = np.linalg.norm(fn, axis=1, keepdims=True)
            fn = fn / np.where(norm > 0, norm, 1.0)
            tn = np.repeat(fn[:, None, :], 3, axis=1).astype(np.float32)
        else:
            tn = np.zeros((0, 3, 3), np.float32)
    else:
        tn = np.asarray(tri_normals, np.float32).reshape(-1, 3, 3)

    tc = np.full((nt, 3), 0.8, np.float32) if tri_colors is None else np.asarray(tri_colors, np.float32).reshape(-1, 3)
    tf = np.zeros(nt, np.float32) if tri_flags is None else np.asarray(tri_flags, np.float32).reshape(-1)

    if bvh is None:
        bvh = build_bvh(
            tri_verts=tv,
            sphere_centers=geometry.sphere_centers,
            sphere_radii=geometry.sphere_radii,
            cyl_p1=geometry.cyl_p1,
            cyl_p2=geometry.cyl_p2,
            cyl_radii=geometry.cyl_radii,
            max_leaf_size=max_leaf_size,
            max_depth=max_depth,
        )

    ns = geometry.num_spheres
    nc = geometry.num_cylinders
    np_total = max(1, bvh.prim_count)

    # Build the unified leaf-ordered primitive table.
    prim_a = np.zeros((np_total, 4), np.float32)
    prim_b = np.zeros((np_total, 4), np.float32)
    prim_c = np.zeros((np_total, 4), np.float32)
    prim_type = np.zeros(np_total, np.int32)
    prim_local = np.zeros(np_total, np.int32)
    prim_color = np.zeros((np_total, 3), np.float32)

    if bvh.prim_count:
        gid = bvh.prim_order
        ptype = np.where(gid < nt, PRIM_TRIANGLE, np.where(gid < nt + ns, PRIM_SPHERE, PRIM_CYLINDER))
        local = np.where(gid < nt, gid, np.where(gid < nt + ns, gid - nt, gid - nt - ns))
        prim_type[:] = ptype
        prim_local[:] = local

        tri_m = ptype == PRIM_TRIANGLE
        sph_m = ptype == PRIM_SPHERE
        cyl_m = ptype == PRIM_CYLINDER

        if tri_m.any():
            li = local[tri_m]
            prim_a[tri_m, :3] = tv[li, 0]
            prim_b[tri_m, :3] = tv[li, 1]
            prim_c[tri_m, :3] = tv[li, 2]
            prim_color[tri_m] = tc[li]
        if sph_m.any():
            li = local[sph_m]
            prim_a[sph_m, :3] = geometry.sphere_centers[li]
            prim_a[sph_m, 3] = geometry.sphere_radii[li]
            prim_color[sph_m] = geometry.sphere_colors[li]
        if cyl_m.any():
            li = local[cyl_m]
            prim_a[cyl_m, :3] = geometry.cyl_p1[li]
            prim_a[cyl_m, 3] = geometry.cyl_radii[li]
            prim_b[cyl_m, :3] = geometry.cyl_p2[li]
            prim_color[cyl_m] = geometry.cyl_colors[li]

    def at_least_one(a: np.ndarray) -> np.ndarray:
        return a if a.shape[0] > 0 else _pad_rows(a, 1)

    cl = _build_clusters(geometry, tv, tc, cluster_size, nt, ns)

    from ..ops.pallas_trace import build_attr_soa

    cluster_attr = build_attr_soa(cl[0].shape[0], cluster_size, cl[0], cl[1],
                                  tn, tf, nt)

    return SceneBuffers(
        cluster_prims=cl[0],
        cluster_soa=np.ascontiguousarray(cl[0].transpose(0, 2, 1)),
        cluster_color=cl[1],
        cluster_bmin=cl[2],
        cluster_bmax=cl[3],
        cluster_attr=cluster_attr,
        num_clusters=cl[0].shape[0],
        cluster_size=cluster_size,
        node_bmin=bvh.node_bmin,
        node_bmax=bvh.node_bmax,
        node_meta=bvh.node_meta,
        prim_a=prim_a,
        prim_b=prim_b,
        prim_c=prim_c,
        prim_type=prim_type,
        prim_local=prim_local,
        prim_color=prim_color,
        tri_verts=at_least_one(tv),
        tri_normals=at_least_one(tn),
        tri_colors=at_least_one(tc),
        tri_flags=at_least_one(tf),
        sphere_centers=at_least_one(geometry.sphere_centers),
        sphere_radii=at_least_one(geometry.sphere_radii),
        sphere_colors=at_least_one(geometry.sphere_colors),
        cyl_p1=at_least_one(geometry.cyl_p1),
        cyl_p2=at_least_one(geometry.cyl_p2),
        cyl_radii=at_least_one(geometry.cyl_radii),
        cyl_colors=at_least_one(geometry.cyl_colors),
        tri_count=nt,
        sphere_count=ns,
        cylinder_count=nc,
        node_count=bvh.node_count,
        prim_count=bvh.prim_count,
        max_depth=max_depth,
    )


def _pack_type_clusters(bvh, c, ptype_code, fill):
    """Pack one type's SAH leaves as [k, c, 12] cluster rows. `fill` writes
    the type's geometry columns given (prims, k_idx, slot_idx, local)."""
    leaf_mask = bvh.node_meta[:, 1] > 0
    leaf_meta = bvh.node_meta[leaf_mask]
    k = int(leaf_mask.sum())
    prims = np.zeros((k, c, 12), np.float32)
    prims[..., 11] = -1.0
    colors = np.zeros((k, c, 3), np.float32)
    counts = leaf_meta[:, 1]
    k_idx = np.repeat(np.arange(k), counts)
    slot_idx = (np.concatenate([np.arange(n) for n in counts])
                if k else np.zeros(0, int))
    local = np.concatenate([
        bvh.prim_order[lf:lf + n] for lf, n in zip(leaf_meta[:, 0], counts)
    ]) if k else np.zeros(0, int)
    prims[k_idx, slot_idx, 7] = local.astype(np.float32)
    prims[k_idx, slot_idx, 11] = ptype_code
    fill(prims, k_idx, slot_idx, local, colors)
    return prims, colors, bvh.node_bmin[leaf_mask], bvh.node_bmax[leaf_mask]


def _build_clusters(geometry: Geometry, tv: np.ndarray, tc: np.ndarray,
                    cluster_size: int, nt: int, ns: int):
    """Group primitives into spatially coherent clusters (SAH leaves of up
    to cluster_size prims) and pack each as padded [C,12] rows for the
    wavefront tracer. Returns (prims f32[K,C,12], colors f32[K*C,3],
    bmin f32[K,3], bmax f32[K,3]).

    Clusters are TYPE-HOMOGENEOUS: one SAH cluster set per primitive type,
    concatenated. A traversal sweep then runs only the visited cluster's
    intersector (the Pallas kernel branches on the cluster type), instead
    of paying sphere+cylinder+triangle math on every [B, C] visit — on
    ball-and-stick molecules the cylinder test alone is ~4x the sphere
    test. Per-type trees overlap spatially, so blocks visit somewhat more
    clusters, but each visit costs a fraction of the mixed sweep."""
    c = cluster_size
    parts = []

    if nt:
        def fill_tri(prims, k_idx, slot_idx, local, colors):
            prims[k_idx, slot_idx, 0:3] = tv[local, 0]
            prims[k_idx, slot_idx, 4:7] = tv[local, 1]
            prims[k_idx, slot_idx, 8:11] = tv[local, 2]
            colors[k_idx, slot_idx] = tc[local]

        parts.append(_pack_type_clusters(
            build_bvh(tri_verts=tv, max_leaf_size=c, max_depth=48),
            c, PRIM_TRIANGLE, fill_tri))
    if ns:
        def fill_sph(prims, k_idx, slot_idx, local, colors):
            prims[k_idx, slot_idx, 0:3] = geometry.sphere_centers[local]
            prims[k_idx, slot_idx, 3] = geometry.sphere_radii[local]
            colors[k_idx, slot_idx] = geometry.sphere_colors[local]

        parts.append(_pack_type_clusters(
            build_bvh(sphere_centers=geometry.sphere_centers,
                      sphere_radii=geometry.sphere_radii,
                      max_leaf_size=c, max_depth=48),
            c, PRIM_SPHERE, fill_sph))
    if geometry.num_cylinders:
        def fill_cyl(prims, k_idx, slot_idx, local, colors):
            prims[k_idx, slot_idx, 0:3] = geometry.cyl_p1[local]
            prims[k_idx, slot_idx, 3] = geometry.cyl_radii[local]
            prims[k_idx, slot_idx, 4:7] = geometry.cyl_p2[local]
            colors[k_idx, slot_idx] = geometry.cyl_colors[local]

        parts.append(_pack_type_clusters(
            build_bvh(cyl_p1=geometry.cyl_p1, cyl_p2=geometry.cyl_p2,
                      cyl_radii=geometry.cyl_radii,
                      max_leaf_size=c, max_depth=48),
            c, PRIM_CYLINDER, fill_cyl))

    if not parts:
        prims = np.zeros((1, c, 12), np.float32)
        prims[..., 11] = -1.0
        return (prims, np.zeros((c, 3), np.float32),
                np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32))

    prims = np.concatenate([p[0] for p in parts])
    colors = np.concatenate([p[1] for p in parts])
    bmin = np.concatenate([p[2] for p in parts])
    bmax = np.concatenate([p[3] for p in parts])
    k = prims.shape[0]
    return prims, colors.reshape(k * c, 3), bmin, bmax


def scene_bounds(scene: SceneBuffers) -> tuple[np.ndarray, np.ndarray]:
    """World AABB of the scene (root BVH node bounds)."""
    return np.asarray(scene.node_bmin[0]), np.asarray(scene.node_bmax[0])


def scene_scale(scene: SceneBuffers) -> float:
    """Half-diagonal of the scene bounds, min 1e-3 (main.js:324-328)."""
    lo, hi = scene_bounds(scene)
    return float(max(1e-3, 0.5 * np.linalg.norm(hi - lo)))
