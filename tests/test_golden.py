"""Golden-image regression tests: deterministic frame-0 renders compared
against stored goldens (the rendering-correctness coverage the reference
lacks — SURVEY §4). Any physics/sampling change shows up here; regenerate
with `python tests/test_golden.py regen` after an INTENDED change."""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = {}


def case(fn):
    CASES[fn.__name__] = fn
    return fn


def _render(renderer, frames=1):
    renderer.settings.tone_map = "linear"
    for _ in range(frames):
        renderer.render_frame()
    return renderer.accumulated()


@case
def molecule_lights():
    """Caffeine ball-and-stick under the 3 studio lights (no env)."""
    from webgl_raytracer_tpu.app.pipeline import load_molecule_scene
    from webgl_raytracer_tpu.models import get_builtin_molecule
    from webgl_raytracer_tpu.render import Renderer

    loaded = load_molecule_scene(get_builtin_molecule("caffeine"))
    return _render(Renderer(loaded.scene, width=48, height=48))


@case
def sphere_sky_env():
    """Test primitives under a small analytic sky (env NEE + MIS path)."""
    from webgl_raytracer_tpu.app.pipeline import load_test_primitives
    from webgl_raytracer_tpu.env import EnvironmentController
    from webgl_raytracer_tpu.render import Renderer

    env = EnvironmentController().load_analytic_sky(width=64, height=32)
    r = Renderer(load_test_primitives().scene, env=env, width=48, height=48)
    r.settings.env_intensity = 0.3
    return _render(r)


@case
def glass_mode():
    """Translucent-plastic material over a triangle+sphere scene."""
    import numpy as np

    from webgl_raytracer_tpu.models.molecular import Geometry
    from webgl_raytracer_tpu.render import Renderer, RenderSettings
    from webgl_raytracer_tpu.scene import compile_scene

    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    geo = Geometry(np.array([[0.0, 0, 0]], np.float32), np.array([0.8], np.float32),
                   np.array([[0.9, 0.3, 0.3]], np.float32), z3, z3, z1, z3)
    tv = np.array([[[-2, -1.0, -1.5], [2, -1.0, -1.5], [0, -1.0, 2.5]]], np.float32)
    scene = compile_scene(geo, tri_verts=tv)
    settings = RenderSettings(material_mode="translucent-plastic",
                              surface_opacity=0.3, roughness=0.2)
    return _render(Renderer(scene, settings=settings, width=48, height=48), frames=2)


@case
def volume_march():
    """Nitrogen density volume emission over caffeine (stick style)."""
    from webgl_raytracer_tpu.app.pipeline import load_molecule_scene
    from webgl_raytracer_tpu.models import get_builtin_molecule
    from webgl_raytracer_tpu.render import Renderer

    loaded = load_molecule_scene(get_builtin_molecule("caffeine"),
                                 display_style="stick", volume_enabled=True,
                                 volume_options=dict(spacing=0.8))
    r = Renderer(loaded.scene, volume=loaded.volume.to_device_buffers(),
                 width=32, height=32)
    r.settings.volume_enabled = True
    return _render(r)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden missing; run `python {__file__} regen`")
    got = CASES[name]()
    want = np.load(path)["image"]
    assert got.shape == want.shape
    diff = np.abs(got - want)
    assert diff.max() < 2e-4, (
        f"{name}: max diff {diff.max():.2e} at {np.unravel_index(diff.argmax(), diff.shape)}"
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, fn in sorted(CASES.items()):
            img = fn()
            np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"),
                                image=img.astype(np.float32))
            print(f"regenerated {name}: shape {img.shape} mean {img.mean():.5f}")
