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


@case
def cartoon_helix():
    """Cartoon ribbon over a synthetic 10-residue HELIX-marked backbone
    (DSSP ranges + ribbon sweep + arrow/tube geometry through the full
    triangle path)."""
    import numpy as np

    from webgl_raytracer_tpu.app.pipeline import load_molecule_scene
    from webgl_raytracer_tpu.models.molecular import parse_pdb
    from webgl_raytracer_tpu.render import Renderer

    lines = []
    hl = list(" " * 80)
    hl[0:5] = "HELIX"
    hl[19] = "A"
    hl[21:25] = f"{1:>4}"
    hl[31] = "A"
    hl[33:37] = f"{10:>4}"
    lines.append("".join(hl))
    serial = 1
    for i in range(10):
        ang = np.deg2rad(i * 100.0)
        rise = i * 1.5
        ca = np.array([2.3 * np.cos(ang), 2.3 * np.sin(ang), rise])
        n_ = ca + np.array([-0.8 * np.sin(ang), 0.8 * np.cos(ang), -0.7])
        c_ = ca + np.array([0.8 * np.sin(ang), -0.8 * np.cos(ang), 0.7])
        o_ = c_ + np.array([0.4 * np.cos(ang), 0.4 * np.sin(ang), 0.6])
        for name, pos, elem in (("N", n_, "N"), ("CA", ca, "C"),
                                ("C", c_, "C"), ("O", o_, "O")):
            lines.append(
                f"ATOM  {serial:>5} {name:<4}ALA A{i+1:>4}    "
                f"{pos[0]:8.3f}{pos[1]:8.3f}{pos[2]:8.3f}{1.0:6.2f}{0.0:6.2f}"
                f"          {elem:>2}")
            serial += 1
    lines.append("END")
    loaded = load_molecule_scene(parse_pdb("\n".join(lines)),
                                 display_style="cartoon")
    return _render(Renderer(loaded.scene, width=48, height=48))


@case
def ses_glass():
    """Ethanol SES surface (coarse) as surface-glass under a small sky —
    the distance-field + marching-cubes + glass-refraction path."""
    from webgl_raytracer_tpu.app.pipeline import load_molecule_scene
    from webgl_raytracer_tpu.env import EnvironmentController
    from webgl_raytracer_tpu.models import get_builtin_molecule
    from webgl_raytracer_tpu.render import Renderer, RenderSettings

    loaded = load_molecule_scene(get_builtin_molecule("ethanol"),
                                 show_surface=True, surface_resolution=0.6)
    env = EnvironmentController().load_analytic_sky(width=64, height=32)
    settings = RenderSettings(material_mode="surface-glass",
                              surface_opacity=0.2, env_intensity=0.4)
    r = Renderer(loaded.scene, settings=settings, env=env,
                 width=48, height=48)
    return _render(r, frames=2)


@case
def dof_clip():
    """Thin-lens DoF + camera clip plane over the primitives scene."""
    from webgl_raytracer_tpu.app.pipeline import load_test_primitives
    from webgl_raytracer_tpu.render import Renderer, RenderSettings

    settings = RenderSettings(dof_enabled=True, dof_aperture=0.12,
                              dof_focus_distance=5.0, clip_enabled=True,
                              clip_distance=4.0)
    return _render(Renderer(load_test_primitives().scene, settings=settings,
                            width=48, height=48))


@case
def hdr_env():
    """Bundled sky_floor HDR through the RGBE decode + CDF build + env
    NEE path."""
    import os as _os

    from webgl_raytracer_tpu.app.pipeline import load_test_primitives
    from webgl_raytracer_tpu.env import EnvironmentController
    from webgl_raytracer_tpu.render import Renderer

    hdr = _os.path.join(_os.path.dirname(__file__), "..", "assets", "env",
                        "sky_floor_64x32.hdr")
    env = EnvironmentController().load_hdr_file(hdr)
    r = Renderer(load_test_primitives().scene, env=env, width=48, height=48)
    r.settings.env_intensity = 0.5
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
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, fn in sorted(CASES.items()):
            img = fn()
            np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"),
                                image=img.astype(np.float32))
            print(f"regenerated {name}: shape {img.shape} mean {img.mean():.5f}")
