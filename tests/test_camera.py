"""Orbit camera tests — mirrors reference tests/camera_orbit.test.mjs."""

import numpy as np
import pytest

from webgl_raytracer_tpu.scene import (
    OrbitCamera,
    apply_orbit_drag,
    camera_basis,
    camera_ray_from_pixel,
    fit_camera_to_bounds,
    quat_rotate_vec,
    resolve_rotation_lock,
)


def forward_of(q):
    return quat_rotate_vec(q, [0.0, 0.0, 1.0])


class TestOrbit:
    def test_yaw_keeps_forward_y(self):
        q = np.array([0.0, 0.0, 0.0, 1.0])
        q2 = apply_orbit_drag(q, dx=50, dy=0)
        assert forward_of(q2)[1] == pytest.approx(forward_of(q)[1], abs=1e-9)

    def test_pitch_has_no_yaw(self):
        q = np.array([0.0, 0.0, 0.0, 1.0])
        q2 = apply_orbit_drag(q, dx=0, dy=30)
        f = forward_of(q2)
        # Forward stays in the y-z plane.
        assert f[0] == pytest.approx(0.0, abs=1e-9)
        assert f[1] != pytest.approx(0.0, abs=1e-6)

    def test_pole_clamp(self):
        q = np.array([0.0, 0.0, 0.0, 1.0])
        for _ in range(200):
            q = apply_orbit_drag(q, dx=0, dy=80)
        assert abs(forward_of(q)[1]) < 0.995 + 1e-9

    def test_basis_orthogonality(self):
        q = apply_orbit_drag(np.array([0.0, 0.0, 0.0, 1.0]), dx=35, dy=-20)
        basis = camera_basis([0, 0, 0], 4.0, q, np.pi / 3, 200, 100)
        f = basis.forward
        r = basis.right / np.linalg.norm(basis.right)
        u = basis.up / np.linalg.norm(basis.up)
        assert abs(np.dot(f, r)) < 1e-9
        assert abs(np.dot(f, u)) < 1e-9
        assert abs(np.dot(r, u)) < 1e-9

    def test_basis_scaling(self):
        basis = camera_basis([0, 0, 0], 4.0, [0, 0, 0, 1], np.pi / 2, 200, 100)
        assert np.linalg.norm(basis.right) == pytest.approx(2.0, abs=1e-9)  # tan(45)*aspect2
        assert np.linalg.norm(basis.up) == pytest.approx(1.0, abs=1e-9)

    def test_axis_lock_state_machine(self):
        assert resolve_rotation_lock(None, 1, 1) is None
        assert resolve_rotation_lock(None, 5, 1) == "yaw"
        assert resolve_rotation_lock(None, 1, 5) == "pitch"
        assert resolve_rotation_lock("yaw", 0, 100) == "yaw"
        assert resolve_rotation_lock("pitch", 100, 0) == "pitch"


class TestRays:
    def test_center_pixel_is_forward(self):
        cam = OrbitCamera(width=200, height=100)
        d = camera_ray_from_pixel(cam.basis(), 100, 50)
        np.testing.assert_allclose(d, [0, 0, 1], atol=1e-9)

    def test_corner_rays_diverge(self):
        cam = OrbitCamera(width=200, height=100)
        tl = camera_ray_from_pixel(cam.basis(), 0, 0)
        br = camera_ray_from_pixel(cam.basis(), 200, 100)
        # Identity rotation: right = forward x up = -x (reference convention),
        # so the left edge of the canvas maps to +x.
        assert tl[0] > 0 and tl[1] > 0
        assert br[0] < 0 and br[1] < 0

    def test_fit_to_bounds(self):
        target, dist, rot = fit_camera_to_bounds([-1, -1, -1], [1, 1, 1], np.pi / 3)
        np.testing.assert_allclose(target, [0, 0, 0])
        radius = np.sqrt(12) / 2
        assert dist == pytest.approx(radius / np.tan(np.pi / 6) * 1.4, rel=1e-9)
        np.testing.assert_allclose(rot, [0, 0, 0, 1])
