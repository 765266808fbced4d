"""End-to-end renderer tests: first-light sanity, the white-furnace energy
test (the rendering-correctness oracle the reference lacks, per SURVEY §4),
and accumulation semantics."""

import numpy as np
import pytest

from webgl_raytracer_tpu.env import constant_env
from webgl_raytracer_tpu.models import get_builtin_molecule, molecule_to_geometry
from webgl_raytracer_tpu.render import Renderer, RenderSettings
from webgl_raytracer_tpu.render.config import default_lights
from webgl_raytracer_tpu.scene import compile_scene

from test_bvh_pick import make_geometry


def simple_sphere_scene():
    return compile_scene(make_geometry([(np.zeros(3), 1.0, (1.0, 1.0, 1.0))]))


class TestFirstLight:
    def test_molecule_renders(self):
        geo = molecule_to_geometry(get_builtin_molecule("ethanol"))
        r = Renderer(compile_scene(geo), width=24, height=24)
        r.settings.tone_map = "linear"
        img = r.render(frames=2)
        assert img.shape == (24, 24, 3)
        assert np.isfinite(img).all()
        assert img.max() > 0.05  # something lit
        # Corners are empty space with no env -> near black (ambient off).
        assert img[0, 0].max() < 1e-3

    def test_accumulation_reduces_variance(self):
        geo = molecule_to_geometry(get_builtin_molecule("ethanol"))
        r = Renderer(compile_scene(geo), width=16, height=16)
        r.settings.tone_map = "linear"
        r.render_frame()
        f1 = r.accumulated()
        for _ in range(15):
            r.render_frame()
        f16 = r.accumulated()
        r2 = Renderer(compile_scene(geo), width=16, height=16)
        r2.settings.tone_map = "linear"
        r2.render_frame()
        g1 = r2.accumulated()
        # Same scene/camera/frame0 -> deterministic equality.
        np.testing.assert_allclose(f1, g1, atol=1e-6)
        # Accumulated frame differs from frame 0 (new sample streams).
        assert np.abs(f16 - f1).max() > 1e-4

    def test_max_frames_pause(self):
        geo = molecule_to_geometry(get_builtin_molecule("ethanol"))
        r = Renderer(compile_scene(geo), width=8, height=8)
        r.settings.max_frames = 2
        assert r.render_frame() and r.render_frame()
        assert not r.render_frame()
        assert r.frame_index == 2
        r.reset_accumulation()
        assert r.render_frame()


class TestFurnace:
    def test_white_furnace_energy_conservation(self):
        """A white Lambertian sphere inside a uniform unit environment must
        render to ~1.0 everywhere (energy conservation through the whole
        integrator: BRDF sampling, env NEE, MIS weights, RR)."""
        scene = simple_sphere_scene()
        settings = RenderSettings(
            material_mode="matte",
            matte_specular=0.0,
            matte_roughness=0.0,
            matte_diffuse_roughness=0.0,
            wrap_diffuse=0.0,
            use_imported_color=True,   # sphere color is white
            env_intensity=1.0,
            env_max_luminance=0.0,     # no clamp
            rim_boost=0.0,
            max_bounces=8,
            max_frames=10000,
            exposure=1.0,
            tone_map="linear",
            ambient_intensity=0.0,
            lights=[type(l)(False, l.azimuth, l.elevation, l.intensity, l.angle, l.color)
                    for l in default_lights()],
        )
        r = Renderer(scene, settings=settings, env=constant_env(1.0), width=24, height=24)
        for _ in range(48):
            r.render_frame()
        img = r.accumulated()
        # Background pixels see the env exactly.
        assert img[0, 0, 0] == pytest.approx(1.0, abs=1e-3)
        # Sphere pixels: Monte-Carlo mean near 1 (RR + bounce-8 truncation
        # lose a little energy; tolerate a few percent).
        center = img[8:16, 8:16]
        assert abs(center.mean() - 1.0) < 0.05, f"furnace mean {center.mean():.4f}"
        assert np.isfinite(img).all()


class TestVisualization:
    def test_normal_and_cost_modes(self):
        scene = simple_sphere_scene()
        r = Renderer(scene, width=16, height=16)
        r.settings.vis_mode = 1
        img = r.render(frames=1)
        # Center pixel: normal points toward camera (-z) -> mapped z ~ 0,
        # y ~ 0.5.
        c = img[8, 8]
        assert abs(c[2]) < 0.1 and abs(c[1] - 0.5) < 0.15
        r.settings.vis_mode = 2
        r.reset_accumulation()
        img = r.render(frames=1)
        assert np.isfinite(img).all()
        r.settings.vis_mode = 3
        r.reset_accumulation()
        img = r.render(frames=1)
        assert img[8, 8, 0] > 0  # depth channel nonzero at hit


def test_use_bvh_false_matches_bvh(primitives_scene_or_none=None):
    """useBvh=false (brute-force sweep, main.js:154 / webgl.js:1) must
    produce the identical image."""
    import jax
    import numpy as np

    from webgl_raytracer_tpu.app.pipeline import load_test_primitives
    from webgl_raytracer_tpu.render import Renderer

    loaded = load_test_primitives()
    imgs = []
    for use_bvh in (True, False):
        r = Renderer(loaded.scene, width=64, height=48)
        r.settings.max_frames = 10 ** 9
        r.settings.tone_map = "linear"
        r.settings.use_bvh = use_bvh
        r.render_frames(2)
        imgs.append(np.asarray(r.image()))
    assert np.array_equal(imgs[0], imgs[1])
