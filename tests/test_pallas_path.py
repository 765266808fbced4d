"""Path-megakernel equivalence: ops/pallas_path.py must reproduce the XLA
integrator (render/integrator.trace_paths) sample-for-sample — both consume
the same PCG stream at the same sites. Interpret mode on the CPU mesh; the
on-TPU compiled check lives in tools/tpu_smoke.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webgl_raytracer_tpu.app.pipeline import (load_molecule_scene,
                                              load_random_spheres,
                                              load_test_primitives)
from webgl_raytracer_tpu.models import get_builtin_molecule
from webgl_raytracer_tpu.ops import pallas_path as PP
from webgl_raytracer_tpu.render import Renderer
from webgl_raytracer_tpu.render.config import split_settings
from webgl_raytracer_tpu.render.integrator import _sample_radiance
from webgl_raytracer_tpu.render.lights import light_dirs_for_camera


def _run_both(loaded, overrides, size=24, clip=None, frame=0):
    r = Renderer(loaded.scene, width=size, height=size)
    r.settings.tone_map = "linear"
    for k, v in overrides.items():
        setattr(r.settings, k, v)
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=clip)
    px, py = r._pixel_grids()
    rad_x, _ = _sample_radiance(r.scene, None, None, flags, u, px, py,
                                jnp.uint32(frame), 0)
    assert PP.supports(r.scene, flags, None, None)
    rad_m, nrays = PP.render_sample(r.scene, flags, u, px, py,
                                    jnp.uint32(frame), 0, with_stats=True,
                                    interpret=True)
    a = np.stack([np.asarray(c) for c in rad_x], -1)
    b = np.stack([np.asarray(c) for c in rad_m], -1)
    return a, b, int(nrays[0]) + int(nrays[1])


def _assert_close(a, b, tol=1e-5):
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    assert rmse < tol, (rmse, np.abs(a - b).max())


@pytest.fixture(scope="module")
def caffeine():
    return load_molecule_scene(get_builtin_molecule("caffeine"))


def test_megakernel_metallic(caffeine):
    a, b, nrays = _run_both(caffeine, dict(material_mode="metallic",
                                           metallic=0.7, roughness=0.3))
    _assert_close(a, b)
    assert nrays > a.shape[0]          # primaries + shadow candidates


def test_megakernel_matte(caffeine):
    a, b, _ = _run_both(caffeine, dict(material_mode="matte"))
    _assert_close(a, b)


def test_megakernel_spheres_scene():
    a, b, _ = _run_both(load_random_spheres(150), dict(material_mode="metallic"))
    _assert_close(a, b)


def test_megakernel_triangles_glass():
    """Triangle scene + surface-glass transmission (mode 2)."""
    loaded = load_test_primitives()
    a, b, _ = _run_both(loaded, dict(material_mode="surface-glass",
                                     surface_opacity=0.4))
    _assert_close(a, b)


def test_megakernel_translucent(caffeine):
    a, b, _ = _run_both(caffeine, dict(material_mode="translucent-plastic",
                                       surface_opacity=0.2, roughness=0.3))
    _assert_close(a, b)


def test_megakernel_dof(caffeine):
    a, b, _ = _run_both(caffeine, dict(material_mode="metallic",
                                       dof_enabled=True, dof_aperture=0.06))
    _assert_close(a, b)


def test_megakernel_clip_plane():
    """Clip plane (triangle rejection, webgl.js:384-390) in-kernel."""
    loaded = load_test_primitives()
    clip = (np.array([0.0, 0.0, 1.0], np.float32), 0.1, 1.0)
    a, b, _ = _run_both(loaded, dict(material_mode="metallic",
                                     clip_enabled=True), clip=clip)
    _assert_close(a, b)


def test_megakernel_no_shadows_no_rim(caffeine):
    a, b, _ = _run_both(caffeine, dict(material_mode="metallic",
                                       cast_shadows=False, rim_boost=0.0))
    _assert_close(a, b)


def test_megakernel_later_frame_and_bounces(caffeine):
    a, b, _ = _run_both(caffeine, dict(material_mode="metallic",
                                       max_bounces=2), frame=7)
    _assert_close(a, b)


def test_supports_gates():
    """Env/volume/vis/distributed configs must fall back to XLA. Fresh
    settings per case — a leaked vis_mode from an earlier case would make
    the later gate assertions vacuous."""
    loaded = load_test_primitives()
    r = Renderer(loaded.scene, width=16, height=16)
    basis = r.camera.basis()
    base = r.settings

    def flags_for(env_flag=False, **kw):
        s = base.replace(**kw) if kw else base
        f, _ = split_settings(
            s, basis, light_dirs_for_camera(s.lights, basis),
            has_env=env_flag, has_volume=False, clip=None)
        return f

    assert PP.supports(r.scene, flags_for(), None, None)
    assert not PP.supports(r.scene, flags_for(vis_mode=1), None, None)
    assert not PP.supports(r.scene, flags_for(env_flag=True), None, None)
    assert not PP.supports(r.scene, flags_for(use_bvh=False), None, None)
    assert not PP.supports(r.scene, flags_for(tracer="stack"), None, None)
