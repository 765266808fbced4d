"""BVH build/flatten + CPU oracle tests.

Mirrors reference tests/bvh.test.mjs + ray_pick.test.mjs, and adds the
BVH-vs-brute-force agreement sweep the reference lacks.
"""

import numpy as np
import pytest

from webgl_raytracer_tpu.models.molecular import Geometry
from webgl_raytracer_tpu.scene import (
    PRIM_CYLINDER,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
    build_bvh,
    compile_scene,
    trace_scene_ray,
)
from webgl_raytracer_tpu.scene.compile import scene_scale
from webgl_raytracer_tpu.scene.pick import brute_force_closest


def make_geometry(spheres=None, cylinders=None):
    spheres = spheres or []
    cylinders = cylinders or []
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    if spheres:
        sc = np.array([s[0] for s in spheres], np.float32)
        sr = np.array([s[1] for s in spheres], np.float32)
        scol = np.array([s[2] for s in spheres], np.float32)
    else:
        sc, sr, scol = z3, z1, z3
    if cylinders:
        p1 = np.array([c[0] for c in cylinders], np.float32)
        p2 = np.array([c[1] for c in cylinders], np.float32)
        cr = np.array([c[2] for c in cylinders], np.float32)
        ccol = np.array([c[3] for c in cylinders], np.float32)
    else:
        p1, p2, cr, ccol = z3, z3, z1, z3
    return Geometry(sc, sr, scol, p1, p2, cr, ccol)


def random_scene(seed=0, n_spheres=60, n_cyl=25, n_tri=40, extent=6.0):
    rng = np.random.default_rng(seed)
    spheres = [
        (rng.uniform(-extent, extent, 3), rng.uniform(0.1, 0.5), rng.uniform(0, 1, 3))
        for _ in range(n_spheres)
    ]
    cylinders = []
    for _ in range(n_cyl):
        p1 = rng.uniform(-extent, extent, 3)
        p2 = p1 + rng.uniform(-1.5, 1.5, 3)
        cylinders.append((p1, p2, rng.uniform(0.05, 0.3), rng.uniform(0, 1, 3)))
    tv = rng.uniform(-extent, extent, (n_tri, 1, 3)) + rng.uniform(-1, 1, (n_tri, 3, 3))
    geo = make_geometry(spheres, cylinders)
    return compile_scene(geo, tri_verts=tv.astype(np.float32))


class TestBVHBuild:
    def test_single_sphere(self):
        geo = make_geometry([(np.zeros(3), 1.0, np.ones(3))])
        scene = compile_scene(geo)
        assert scene.node_count == 1
        assert scene.prim_count == 1
        assert scene.prim_type[0] == PRIM_SPHERE
        np.testing.assert_allclose(scene.node_bmin[0], [-1, -1, -1])
        np.testing.assert_allclose(scene.node_bmax[0], [1, 1, 1])

    def test_empty_scene(self):
        scene = compile_scene(make_geometry())
        assert scene.node_count == 1
        assert scene.prim_count == 0

    def test_counts_and_coverage(self):
        scene = random_scene()
        assert scene.prim_count == 60 + 25 + 40
        # Every primitive appears exactly once across the leaves.
        bvh = build_bvh(
            tri_verts=np.asarray(scene.tri_verts),
            sphere_centers=np.asarray(scene.sphere_centers),
            sphere_radii=np.asarray(scene.sphere_radii),
            cyl_p1=np.asarray(scene.cyl_p1),
            cyl_p2=np.asarray(scene.cyl_p2),
            cyl_radii=np.asarray(scene.cyl_radii),
        )
        assert sorted(bvh.prim_order.tolist()) == list(range(125))
        # Leaf sizes respect the limit (up to max_depth overflow).
        leaf = bvh.node_meta[:, 1]
        assert leaf.max() <= 4 or bvh.node_count == 1

    def test_nodes_contain_children(self):
        scene = random_scene(seed=3)
        meta = scene.node_meta
        for i in range(scene.node_count):
            lf, pc, rc = meta[i]
            if pc == 0 and rc >= 0:
                for child in (lf, rc):
                    assert np.all(scene.node_bmin[i] <= scene.node_bmin[child] + 1e-5)
                    assert np.all(scene.node_bmax[i] >= scene.node_bmax[child] - 1e-5)

    def test_encoded_prim_indices(self):
        scene = random_scene(seed=1)
        bvh = build_bvh(
            tri_verts=np.asarray(scene.tri_verts),
            sphere_centers=np.asarray(scene.sphere_centers),
            sphere_radii=np.asarray(scene.sphere_radii),
            cyl_p1=np.asarray(scene.cyl_p1),
            cyl_p2=np.asarray(scene.cyl_p2),
            cyl_radii=np.asarray(scene.cyl_radii),
        )
        types = (bvh.prim_encoded >> 30) & 0x3
        idx = bvh.prim_encoded & 0x3FFFFFFF
        assert set(np.unique(types)) <= {PRIM_TRIANGLE, PRIM_SPHERE, PRIM_CYLINDER}
        assert idx[types == PRIM_TRIANGLE].max() < 40
        assert idx[types == PRIM_SPHERE].max() < 60
        assert idx[types == PRIM_CYLINDER].max() < 25


class TestRayPick:
    def test_sphere_hit_exact(self):
        # Ray from z=-5 at a unit sphere at origin: t = 4 exactly.
        geo = make_geometry([(np.zeros(3), 1.0, np.ones(3))])
        scene = compile_scene(geo)
        hit = trace_scene_ray(scene, [0, 0, -5], [0, 0, 1])
        assert hit is not None
        assert hit.prim_type == PRIM_SPHERE
        assert hit.t == pytest.approx(4.0, abs=1e-6)

    def test_miss_returns_none(self):
        geo = make_geometry([(np.zeros(3), 1.0, np.ones(3))])
        scene = compile_scene(geo)
        assert trace_scene_ray(scene, [0, 5, -5], [0, 0, 1]) is None

    def test_clip_plane_rejection(self):
        geo = make_geometry([(np.zeros(3), 1.0, np.ones(3))])
        scene = compile_scene(geo)
        # Clip plane z = 0, keep side where (n.p - offset)*side <= 0.
        clip = (np.array([0.0, 0.0, 1.0]), 0.0, 1.0)
        hit = trace_scene_ray(scene, [0, 0, -5], [0, 0, 1], clip=clip)
        assert hit is not None  # front hemisphere at z=-1 survives
        clip = (np.array([0.0, 0.0, 1.0]), 0.0, -1.0)
        hit = trace_scene_ray(scene, [0, 0, -5], [0, 0, 1], clip=clip)
        # The near hit (z=-1) is clipped; like the reference picker, the far
        # root is not retried, so the sphere is not hit at all.
        assert hit is None

    def test_cylinder_cap_types(self):
        geo = make_geometry(cylinders=[(np.array([0.0, 0, 0]), np.array([2.0, 0, 0]), 0.5, np.ones(3))])
        scene = compile_scene(geo)
        # Side hit.
        hit = trace_scene_ray(scene, [1.0, 0, -5], [0, 0, 1])
        assert hit.prim_type == PRIM_CYLINDER and hit.extra[0] == 0.0
        assert hit.t == pytest.approx(4.5, abs=1e-6)
        # Cap 1 (hemisphere beyond p1).
        hit = trace_scene_ray(scene, [-5.0, 0, 0], [1, 0, 0])
        assert hit.extra[0] == 1.0
        assert hit.t == pytest.approx(4.5, abs=1e-6)
        # Cap 2.
        hit = trace_scene_ray(scene, [7.0, 0, 0], [-1, 0, 0])
        assert hit.extra[0] == 2.0
        assert hit.t == pytest.approx(4.5, abs=1e-6)

    def test_triangle_hit_barycentrics(self):
        tv = np.array([[[0, 0, 0], [2, 0, 0], [0, 2, 0]]], np.float32)
        scene = compile_scene(make_geometry(), tri_verts=tv)
        hit = trace_scene_ray(scene, [0.5, 0.5, -3], [0, 0, 1])
        assert hit.prim_type == PRIM_TRIANGLE
        assert hit.t == pytest.approx(3.0, abs=1e-6)
        assert hit.extra[0] == pytest.approx(0.25, abs=1e-6)  # u
        assert hit.extra[1] == pytest.approx(0.25, abs=1e-6)  # v

    def test_bvh_matches_brute_force(self):
        scene = random_scene(seed=7)
        rng = np.random.default_rng(11)
        origins = rng.uniform(-12, 12, (128, 3))
        dirs = rng.normal(size=(128, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        oracle = brute_force_closest(scene, origins, dirs, t_min=1e-5)
        for r in range(origins.shape[0]):
            hit = trace_scene_ray(scene, origins[r], dirs[r], t_min=1e-5)
            if oracle["prim_type"][r] < 0:
                assert hit is None
            else:
                assert hit is not None
                assert hit.t == pytest.approx(oracle["t"][r], rel=1e-5, abs=1e-6)
                assert hit.prim_type == oracle["prim_type"][r]
                assert hit.prim_index == oracle["prim_index"][r]

    def test_scene_scale(self):
        geo = make_geometry([(np.zeros(3), 1.0, np.ones(3))])
        scene = compile_scene(geo)
        assert scene_scale(scene) == pytest.approx(np.sqrt(12) / 2, rel=1e-5)


class TestNativeBuilder:
    def test_native_matches_oracle_and_invariants(self):
        """The C++ SAH builder produces a valid tree: full primitive
        coverage, parent-child containment, and stack-walk results that
        match brute force (trees may differ from the Python builder by
        f32-vs-f64 SAH tie-breaks; both are valid)."""
        from webgl_raytracer_tpu.scene.bvh import build_bvh
        try:
            from webgl_raytracer_tpu.native import load_bvh_builder
            if load_bvh_builder() is None:
                pytest.skip("no native toolchain")
        except Exception:
            pytest.skip("no native toolchain")

        rng = np.random.default_rng(3)
        n = 400
        centers = ((rng.random((n, 3)) - 0.5) * 12).astype(np.float32)
        radii = (0.1 + rng.random(n) * 0.3).astype(np.float32)
        bvh = build_bvh(sphere_centers=centers, sphere_radii=radii,
                        backend="native")
        assert sorted(bvh.prim_order.tolist()) == list(range(n))
        for i in range(bvh.node_count):
            lf, pc, rc = bvh.node_meta[i]
            if pc == 0 and rc >= 0:
                for ch in (lf, rc):
                    assert (bvh.node_bmin[i] <= bvh.node_bmin[ch] + 1e-5).all()
                    assert (bvh.node_bmax[i] >= bvh.node_bmax[ch] - 1e-5).all()

        colors = rng.random((n, 3)).astype(np.float32)
        z3 = np.zeros((0, 3), np.float32)
        z1 = np.zeros((0,), np.float32)
        scene = compile_scene(Geometry(centers, radii, colors, z3, z3, z1, z3))
        origins = rng.uniform(-18, 18, (64, 3))
        dirs = rng.normal(size=(64, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        oracle = brute_force_closest(scene, origins, dirs, t_min=1e-5)
        for r in range(64):
            hit = trace_scene_ray(scene, origins[r], dirs[r], t_min=1e-5)
            if oracle["prim_type"][r] < 0:
                assert hit is None
            else:
                assert hit is not None
                assert hit.prim_index == oracle["prim_index"][r]
