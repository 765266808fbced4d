"""Device kernel tests: RNG stream parity, intersectors, and the wavefront
BVH traversal validated against the CPU brute-force oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from webgl_raytracer_tpu.ops import init_seed, pcg_hash, rand, trace_any, trace_closest
from webgl_raytracer_tpu.ops import intersect as ix
from webgl_raytracer_tpu.ops import sampling
from webgl_raytracer_tpu.scene import compile_scene
from webgl_raytracer_tpu.scene.pick import brute_force_closest

from test_bvh_pick import make_geometry, random_scene

M32 = 0xFFFFFFFF


def ref_rand(state):
    """Reference rand() in python ints (webgl.js:896-900)."""
    state = (state * 747796405 + 2891336453) & M32
    word = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & M32
    return state, ((word >> 22) ^ word) & M32


def ref_pcg(v):
    _, out = ref_rand(v)
    return out


class TestRNG:
    def test_pcg_hash_matches_scalar_reference(self):
        vals = [0, 1, 12345, 0xDEADBEEF, 0xFFFFFFFF]
        got = np.asarray(pcg_hash(jnp.array(vals, jnp.uint32)))
        want = np.array([ref_pcg(v) for v in vals], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_rand_stream_matches_scalar_reference(self):
        state = jnp.array([7, 123456789], jnp.uint32)
        py_state = [7, 123456789]
        for _ in range(5):
            state, u = rand(state)
            outs = []
            for i in range(2):
                py_state[i], bits = ref_rand(py_state[i])
                outs.append(np.float32(bits) * np.float32(1.0 / 4294967295.0))
            np.testing.assert_array_equal(np.asarray(state), np.array(py_state, np.uint32))
            np.testing.assert_allclose(np.asarray(u), outs, rtol=1e-7)

    def test_init_seed_formula(self):
        px, py, frame = 100, 50, 3
        want = ref_pcg((px + py * 65536 + frame * 15485863) & M32)
        got = int(np.asarray(init_seed(jnp.uint32(px), jnp.uint32(py), frame)))
        assert got == want

    def test_uniformity(self):
        state = init_seed(jnp.arange(10000, dtype=jnp.uint32), jnp.uint32(0), 0)
        _, u = rand(state)
        u = np.asarray(u)
        assert 0.0 <= u.min() and u.max() <= 1.0
        assert abs(u.mean() - 0.5) < 0.01


class TestIntersectors:
    def test_sphere(self):
        o = jnp.array([[0.0, 0, -5], [0, 5, -5]])
        d = jnp.array([[0.0, 0, 1], [0, 0, 1]])
        c = jnp.array([[0.0, 0, 0], [0, 0, 0]])
        t = ix.intersect_sphere(o, d, c, jnp.array([1.0, 1.0]), 1e-5)
        np.testing.assert_allclose(np.asarray(t), [4.0, -1.0], atol=1e-6)

    def test_sphere_inside_far_root(self):
        # Origin inside the sphere: near root is negative, take far root.
        t = ix.intersect_sphere(
            jnp.array([0.0, 0, 0]), jnp.array([0.0, 0, 1]),
            jnp.array([0.0, 0, 0]), jnp.asarray(2.0), 1e-5)
        assert float(t) == pytest.approx(2.0, abs=1e-6)

    def test_aabb(self):
        hit = ix.intersect_aabb(
            jnp.array([[-1.0, -1, -1], [-1, -1, -1]]),
            jnp.array([[1.0, 1, 1], [1, 1, 1]]),
            jnp.array([[0.0, 0, -5], [0, 3, -5]]),
            jnp.array([[0.0, 0, 1], [0, 0, 1]]),
            jnp.asarray(1e20),
        )
        assert np.asarray(hit).tolist() == [True, False]

    def test_aabb_parallel_axis(self):
        # Ray parallel to x slab: inside passes, outside fails.
        bmin = jnp.array([[-1.0, -1, -1]] * 2)
        bmax = jnp.array([[1.0, 1, 1]] * 2)
        o = jnp.array([[0.0, 0, -5], [2.0, 0, -5]])
        d = jnp.array([[0.0, 0, 1]] * 2)
        hit = ix.intersect_aabb(bmin, bmax, o, d, jnp.asarray(1e20))
        assert np.asarray(hit).tolist() == [True, False]

    def test_triangle(self):
        t, u, v = ix.intersect_triangle(
            jnp.array([0.5, 0.5, -3.0]), jnp.array([0.0, 0, 1]),
            jnp.array([0.0, 0, 0]), jnp.array([2.0, 0, 0]), jnp.array([0.0, 2, 0]),
            1e-5)
        assert float(t) == pytest.approx(3.0, abs=1e-6)
        assert float(u) == pytest.approx(0.25, abs=1e-6)
        assert float(v) == pytest.approx(0.25, abs=1e-6)

    def test_cylinder_parity_with_oracle(self):
        from webgl_raytracer_tpu.scene.pick import cylinder_hit
        rng = np.random.default_rng(5)
        p1 = rng.uniform(-2, 2, (50, 3))
        p2 = p1 + rng.uniform(-2, 2, (50, 3))
        r = rng.uniform(0.05, 0.8, 50)
        o = np.array([0.0, 0.0, -6.0])
        d = np.array([0.0, 0.0, 1.0])
        t_np, ht_np = cylinder_hit(o, d, p1, p2, r, 1e-5)
        t_j, ht_j = ix.intersect_cylinder(
            jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
            jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32),
            jnp.asarray(r, jnp.float32), 1e-5)
        np.testing.assert_allclose(np.asarray(t_j), t_np, rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(ht_j), ht_np)


class TestSampling:
    def test_cosine_hemisphere_in_upper_half(self):
        n = jnp.broadcast_to(jnp.array([0.0, 0, 1]), (512, 3))
        state = init_seed(jnp.arange(512, dtype=jnp.uint32), jnp.uint32(1), 0)
        _, d = sampling.cosine_sample_hemisphere(n, state)
        d = np.asarray(d)
        assert (d[:, 2] > 0).all()
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
        # Cosine-weighted mean z = 2/3.
        assert abs(d[:, 2].mean() - 2 / 3) < 0.05

    def test_cone_within_angle(self):
        axis = jnp.broadcast_to(jnp.array([0.0, 1, 0]), (256, 3))
        state = init_seed(jnp.arange(256, dtype=jnp.uint32), jnp.uint32(2), 0)
        _, d, pdf = sampling.sample_cone(axis, jnp.asarray(0.3), state)
        cos_t = np.asarray(d)[:, 1]
        assert (cos_t >= np.cos(0.3) - 1e-5).all()
        assert float(np.asarray(pdf)[0] if np.ndim(pdf) else pdf) == pytest.approx(
            1.0 / (2 * np.pi * (1 - np.cos(0.3))), rel=1e-4)

    def test_power_heuristic(self):
        assert float(sampling.power_heuristic(jnp.asarray(1.0), jnp.asarray(1.0))) == pytest.approx(0.5)
        assert float(sampling.power_heuristic(jnp.asarray(10.0), jnp.asarray(0.1))) > 0.99


class TestTraversal:
    def test_matches_brute_force_oracle(self):
        scene = random_scene(seed=21)
        dev = scene.device_put()
        rng = np.random.default_rng(33)
        origins = rng.uniform(-12, 12, (256, 3)).astype(np.float32)
        dirs = rng.normal(size=(256, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

        rec = trace_closest(dev, jnp.asarray(origins), jnp.asarray(dirs), 1e-4)
        oracle = brute_force_closest(scene, origins, dirs, t_min=1e-4)

        got_type = np.asarray(rec.prim_type)
        want_type = oracle["prim_type"]
        got_t = np.asarray(rec.t)
        want_t = oracle["t"]

        # f32 vs f64 can flip razor-thin closest-hit ties; require 99%+ exact
        # agreement and t agreement everywhere both hit.
        same = got_type == want_type
        assert same.mean() > 0.99, f"type mismatch rate {1 - same.mean():.3f}"
        both_hit = (got_type >= 0) & (want_type >= 0) & same
        np.testing.assert_allclose(got_t[both_hit], want_t[both_hit], rtol=2e-3, atol=2e-3)
        miss = want_type < 0
        assert (got_t[miss & same] >= 1e19).all()

    def test_sphere_only_scene_specialization(self):
        geo = make_geometry([(np.array([0.0, 0, 0]), 1.0, np.ones(3))])
        scene = compile_scene(geo).device_put()
        rec = trace_closest(scene, jnp.array([[0.0, 0, -5]]), jnp.array([[0.0, 0, 1]]), 1e-5)
        assert float(rec.t[0]) == pytest.approx(4.0, abs=1e-5)
        assert int(rec.prim_type[0]) == 1
        assert int(rec.cost[0]) >= 2

    def test_any_hit_window(self):
        geo = make_geometry([(np.array([0.0, 0, 0]), 1.0, np.ones(3))])
        scene = compile_scene(geo).device_put()
        o = jnp.array([[0.0, 0, -5]])
        d = jnp.array([[0.0, 0, 1]])
        assert bool(trace_any(scene, o, d, 1e-5)[0])
        # tMax before the sphere -> no occlusion.
        assert not bool(trace_any(scene, o, d, 1e-5, t_max=3.0)[0])
        # accept_min beyond the near hit -> no occlusion (like the GLSL, the
        # sphere intersector only reports its nearest root above uTMin, so a
        # window that excludes t=4 never sees the far root at t=6).
        assert not bool(trace_any(scene, o, d, 1e-5, accept_min=5.0)[0])
        # Window including the near hit.
        assert bool(trace_any(scene, o, d, 1e-5, accept_min=3.0)[0])

    def test_miss_reports_no_hit(self):
        scene = random_scene(seed=2).device_put()
        rec = trace_closest(
            scene,
            jnp.array([[100.0, 100, 100]]),
            jnp.array([[1.0, 0, 0]]),
            1e-5,
        )
        assert int(rec.prim_type[0]) == -1
        assert float(rec.t[0]) >= 1e19
