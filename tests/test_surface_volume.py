"""SES surface + density volume tests (reference: volume.test.mjs + the
surface path that the reference leaves untested)."""

import numpy as np
import pytest

from webgl_raytracer_tpu.models.density import build_nitrogen_density_volume
from webgl_raytracer_tpu.models.molecular import parse_pdb
from webgl_raytracer_tpu.models.surface import (
    compute_distance_field,
    compute_ses,
    marching_cubes,
    ses_to_mesh,
)
from webgl_raytracer_tpu.models import get_builtin_molecule


def single_n_pdb():
    return parse_pdb(
        "HETATM    1  N   LIG A   1       1.000   2.000   3.000  1.00  0.00           N"
    )


class TestDensityVolume:
    def test_center_voxel_near_max(self):
        vol = build_nitrogen_density_volume(single_n_pdb(), spacing=0.5)
        nx, ny, nz = vol.dims
        # Voxel nearest the atom should be ~max.
        ix = int(round((1.0 - vol.origin[0]) / 0.5))
        iy = int(round((2.0 - vol.origin[1]) / 0.5))
        iz = int(round((3.0 - vol.origin[2]) / 0.5))
        assert vol.data[iz, iy, ix] >= 0.9 * vol.max_value
        assert vol.nitrogen_count == 1
        assert vol.max_value <= 1.0 + 1e-6

    def test_caffeine_volume(self):
        mol = get_builtin_molecule("caffeine")
        vol = build_nitrogen_density_volume(mol, spacing=0.8)
        assert vol.nitrogen_count == 4
        assert vol.max_value > 1.0  # overlapping gaussians accumulate
        assert np.isfinite(vol.data).all()

    def test_no_nitrogen_raises(self):
        mol = parse_pdb(
            "ATOM      1  CA  ALA A   1       0.000   0.000   0.000  1.00  0.00           C"
        )
        with pytest.raises(ValueError, match="nitrogen"):
            build_nitrogen_density_volume(mol)

    def test_voxel_guard(self):
        with pytest.raises(ValueError, match="too large"):
            build_nitrogen_density_volume(single_n_pdb(), spacing=0.01)

    def test_bad_options(self):
        with pytest.raises(ValueError):
            build_nitrogen_density_volume(single_n_pdb(), spacing=-1)
        with pytest.raises(ValueError):
            build_nitrogen_density_volume(single_n_pdb(), gaussian_scale=0)


class TestDistanceField:
    def test_field_values_single_sphere(self):
        grid = compute_distance_field(
            np.array([[0.0, 0, 0]]), np.array([1.0]),
            [-1, -1, -1], [1, 1, 1], resolution=0.25, probe_radius=0.0,
            max_dist=0.5,
        )
        nz, ny, nx = grid.data.shape
        # Center voxel: distance = -1 clamped to -0.5.
        cx = int(round((0 - grid.grid_min[0]) / 0.25))
        cy = int(round((0 - grid.grid_min[1]) / 0.25))
        cz = int(round((0 - grid.grid_min[2]) / 0.25))
        assert grid.data[cz, cy, cx] == pytest.approx(-0.5)
        # Corner voxel: far away -> +max_dist.
        assert grid.data[0, 0, 0] == pytest.approx(0.5)


class TestMarchingCubes:
    def test_sphere_surface(self):
        r = 1.0
        grid = compute_distance_field(
            np.array([[0.0, 0, 0]]), np.array([r]),
            [-1, -1, -1], [1, 1, 1], resolution=0.2, probe_radius=0.0,
            max_dist=0.4,
        )
        v, n, idx = marching_cubes(grid, 0.0)
        assert v.shape[0] > 100
        assert idx.shape[0] > 100
        # All vertices on the sphere of radius 1 (within a voxel).
        d = np.linalg.norm(v, axis=1)
        assert np.abs(d - r).max() < 0.2
        # Gradient normals point outward.
        outward = np.sum(n * (v / d[:, None]), axis=1)
        assert outward.mean() > 0.9
        # Index sharing: vertex count much smaller than 3*tris.
        assert v.shape[0] < idx.shape[0] * 1.5
        # Closed surface: Euler characteristic of a sphere V - E + F = 2.
        edges = set()
        for tri in idx:
            for a, b in ((0, 1), (1, 2), (2, 0)):
                e = (min(tri[a], tri[b]), max(tri[a], tri[b]))
                edges.add(e)
        assert v.shape[0] - len(edges) + idx.shape[0] == 2

    def test_empty_field(self):
        grid = compute_distance_field(
            np.zeros((0, 3)), np.zeros(0), [0, 0, 0], [1, 1, 1],
            resolution=0.5, probe_radius=0.0, max_dist=1.0,
        )
        v, n, idx = marching_cubes(grid, 0.0)
        assert v.shape[0] == 0 and idx.shape[0] == 0


class TestSES:
    def test_two_sphere_ses(self):
        centers = np.array([[0.0, 0, 0], [2.2, 0, 0]])
        radii = np.array([1.2, 1.2])
        v, n, idx = compute_ses(centers, radii, probe_radius=1.0, resolution=0.35)
        assert v.shape[0] > 50
        assert idx.shape[0] > 50
        assert np.isfinite(v).all() and np.isfinite(n).all()
        # SES normals flipped -> point outward from the union.
        center = centers.mean(axis=0)
        rel = v - center
        rel /= np.maximum(np.linalg.norm(rel, axis=1, keepdims=True), 1e-9)
        assert np.sum(n * rel, axis=1).mean() > 0.3
        # SES hugs the atoms: all vertices within r_atom + small epsilon.
        d0 = np.linalg.norm(v - centers[0], axis=1)
        d1 = np.linalg.norm(v - centers[1], axis=1)
        assert (np.minimum(d0, d1) < 1.2 + 0.75).all()

    def test_sas_mode_is_inflated(self):
        centers = np.array([[0.0, 0, 0]])
        radii = np.array([1.0])
        sas_v, _, _ = compute_ses(centers, radii, probe_radius=1.0,
                                  resolution=0.3, sas=True)
        d = np.linalg.norm(sas_v, axis=1)
        assert abs(d.mean() - 2.0) < 0.2  # radius + probe

    def test_ses_mesh_flags(self):
        centers = np.array([[0.0, 0, 0]])
        radii = np.array([1.0])
        v, n, idx = compute_ses(centers, radii, probe_radius=0.8, resolution=0.4)
        mesh = ses_to_mesh(v, n, idx)
        assert mesh.has_surface_flags()
        assert mesh.tri_colors.shape == (idx.shape[0], 3)


def test_marching_cubes_device_matches_numpy():
    """ops/marching.py (jitted MC, fixed-capacity compaction) must produce
    the same vertex set / triangle set as the numpy path."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(25, 3)) * 3
    radii = rng.uniform(1.2, 1.9, 25)
    grid = compute_distance_field(
        centers, radii, centers.min(0) - 2, centers.max(0) + 2,
        0.5, 1.4, 1.0)
    v0, n0, i0 = marching_cubes(grid, 0.0, backend="numpy")

    from webgl_raytracer_tpu.ops.marching import marching_cubes_device

    v1, n1, i1 = marching_cubes_device(
        grid.data, grid.grid_min, grid.resolution, grid.max_dist)
    assert v0.shape == v1.shape and i0.shape == i1.shape

    # The device path canonicalizes axis order for compile-shape bucketing,
    # so vertex/triangle EMISSION order may differ (and positions by f32
    # ulps); the geometry must not.
    def aligned(a, b):
        oa = np.lexsort(np.round(a, 3).T)
        ob = np.lexsort(np.round(b, 3).T)
        return a[oa], b[ob]

    a, b = aligned(v0, v1)
    assert np.abs(a - b).max() < 1e-3

    def tri_set(v, i):
        tris = np.round(v[i], 2)          # [T,3,3]
        return {tuple(sorted(map(tuple, t.tolist()))) for t in tris}

    assert tri_set(v0, i0) == tri_set(v1, i1)

    # Normals agree per-position (match vertices through a coordinate map).
    oa = np.lexsort(np.round(v0, 3).T)
    ob = np.lexsort(np.round(v1, 3).T)
    assert np.abs(n0[oa] - n1[ob]).max() < 1e-3

    v2, _, _ = marching_cubes_device(
        grid.data, grid.grid_min, grid.resolution, grid.max_dist,
        verts_only=True)
    a, b = aligned(v0, v2)
    assert np.abs(a - b).max() < 1e-3


def test_native_distance_field_matches_numpy():
    """native/distance_field.cpp must reproduce the numpy splat exactly
    (same bounded-box min of clamp(|p-c|-r, +-max_dist))."""
    import webgl_raytracer_tpu.native as N

    if N.load_distance_field() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(2)
    centers = rng.normal(size=(120, 3)) * 5
    for radii in (rng.uniform(1.2, 1.9, 120), np.full(120, 1.5)):
        g_native = compute_distance_field(
            centers, radii, centers.min(0) - 2, centers.max(0) + 2,
            0.5, 1.4, 1.0)
        saved = N._df_lib, N._df_failed
        N._df_lib, N._df_failed = None, True
        try:
            g_numpy = compute_distance_field(
                centers, radii, centers.min(0) - 2, centers.max(0) + 2,
                0.5, 1.4, 1.0)
        finally:
            N._df_lib, N._df_failed = saved
        assert np.abs(g_native.data - g_numpy.data).max() < 1e-4


def test_marching_cubes_device_winding_odd_permutation():
    """Axis canonicalization on an ODD-permutation grid shape (det = -1)
    must preserve triangle winding. The project's MC convention (numpy
    backend and identity-order device grids alike) emits cross(e1, e2)
    OPPOSITE the gradient vertex normals; an odd permutation used to
    mirror it, silently inverting front-face and glass-eta decisions
    downstream (render/integrator.py) for those grid shapes only."""
    from webgl_raytracer_tpu.ops.marching import marching_cubes_device

    def winding_agreement(shape_zyx, center):
        nz, ny, nx = shape_zyx
        zs = np.arange(nz) * 0.5
        ys = np.arange(ny) * 0.5
        xs = np.arange(nx) * 0.5
        zz, yy, xx = np.meshgrid(zs, ys, xs, indexing="ij")
        # Signed distance to a sphere: gradient points outward.
        d = np.sqrt((xx - center[0]) ** 2 + (yy - center[1]) ** 2
                    + (zz - center[2]) ** 2) - 2.0
        v, n, t = marching_cubes_device(
            d.astype(np.float32), np.zeros(3, np.float32), 0.5, 10.0)
        assert len(t) > 0
        e1 = v[t[:, 1]] - v[t[:, 0]]
        e2 = v[t[:, 2]] - v[t[:, 0]]
        geo = np.cross(e1, e2)
        vn = n[t[:, 0]] + n[t[:, 1]] + n[t[:, 2]]
        dots = np.sum(geo * vn, axis=1)
        return (dots > 0).mean()

    # Identity-order shape (sizes already descending: nz>=ny>=nx).
    assert winding_agreement((24, 20, 16), (4.0, 5.0, 6.0)) < 0.01
    # Single-swap (odd) permutation: shape (16, 20, 24) -> order
    # (2, 1, 0), det = -1 — the case the fix covers.
    assert winding_agreement((16, 20, 24), (6.0, 5.0, 4.0)) < 0.01
    # Cyclic (even) permutation: shape (20, 16, 24) -> order (2, 0, 1).
    assert winding_agreement((20, 16, 24), (6.0, 4.0, 5.0)) < 0.01
