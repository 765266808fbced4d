"""Reference-oracle parity: the device integrator must reproduce the
reference transport (render/reference_oracle.py transliterates
/root/reference/src/webgl.js:1173-1441) sample-exactly for the non-glass
material modes — same PCG stream, same decisions — so single-frame images
agree to float32 arithmetic noise."""

import jax
import numpy as np
import pytest

from webgl_raytracer_tpu.app.pipeline import load_molecule_scene
from webgl_raytracer_tpu.env.controller import EnvironmentController
from webgl_raytracer_tpu.models import get_builtin_molecule
from webgl_raytracer_tpu.render import Renderer
from webgl_raytracer_tpu.render.config import split_settings
from webgl_raytracer_tpu.render.integrator import render_batch
from webgl_raytracer_tpu.render.lights import light_dirs_for_camera
from webgl_raytracer_tpu.render.reference_oracle import render_batch_oracle


def _compare(loaded, env, overrides, size=32, frames=2):
    r = Renderer(loaded.scene, width=size, height=size, env=env)
    r.settings.tone_map = "linear"
    for k, v in overrides.items():
        setattr(r.settings, k, v)
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=env is not None, has_volume=False, clip=None)
    px, py = r._pixel_grids()
    u_np = jax.tree_util.tree_map(np.asarray, u)
    acc_d = acc_o = None
    for f in range(frames):
        cd = np.asarray(render_batch(r.scene, r.env, None, flags, u, px, py,
                                     np.uint32(f)))
        co = render_batch_oracle(loaded.scene, env, None, flags, u_np,
                                 np.asarray(px), np.asarray(py), f)
        if acc_d is None:
            acc_d, acc_o = cd, co
        else:
            acc_d = (acc_d * f + cd) / (f + 1)
            acc_o = (acc_o * f + co) / (f + 1)
    return float(np.sqrt(np.mean((acc_d - acc_o) ** 2)))


@pytest.fixture(scope="module")
def caffeine():
    return load_molecule_scene(get_builtin_molecule("caffeine"))


def test_oracle_metallic_sample_exact(caffeine):
    rmse = _compare(caffeine, None, dict(material_mode="metallic",
                                         metallic=0.85, roughness=0.35))
    assert rmse < 5e-4, rmse


def test_oracle_matte_sample_exact(caffeine):
    rmse = _compare(caffeine, None, dict(material_mode="matte"))
    assert rmse < 5e-4, rmse


def test_oracle_env_nee_sample_exact(caffeine):
    sky = EnvironmentController().load_analytic_sky(width=64, height=32)
    rmse = _compare(caffeine, sky, dict(material_mode="metallic",
                                        env_intensity=0.4))
    assert rmse < 1e-3, rmse


def test_oracle_dof_sample_exact(caffeine):
    rmse = _compare(caffeine, None, dict(material_mode="metallic",
                                         dof_enabled=True, dof_aperture=0.05))
    assert rmse < 5e-4, rmse
