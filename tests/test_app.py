"""App-layer tests: pipeline, picking, overlay, fly camera, clip lock,
checkpoint/resume, server state, formatting, logger."""

import json
import numpy as np
import pytest

from webgl_raytracer_tpu.app.pipeline import (
    get_display_options,
    load_molecule_scene,
    load_random_spheres,
    load_test_primitives,
    mulberry32,
)
from webgl_raytracer_tpu.models import get_builtin_molecule
from webgl_raytracer_tpu.render import Renderer
from webgl_raytracer_tpu.render.picking import autofocus_at_pixel, hover_at_pixel, pick_at_pixel
from webgl_raytracer_tpu.scene.overlay import (
    compute_primitive_world_bounds,
    project_aabb_to_canvas_rect,
)
from webgl_raytracer_tpu.scene.camera import OrbitCamera, camera_basis
from webgl_raytracer_tpu.utils import create_logger, format_poly_count


class TestPipeline:
    def test_display_option_table(self):
        assert get_display_options("vdw")["radius_scale"] == 1.0
        assert get_display_options("vdw")["show_bonds"] is False
        assert get_display_options("stick")["radius_scale"] == 0.15
        assert get_display_options("cartoon")["bond_radius"] == 0.0
        assert get_display_options("ball-and-stick", atom_scale=0.4)["radius_scale"] == 0.4

    def test_test_primitives_scene(self):
        loaded = load_test_primitives()
        assert loaded.stats["spheres"] == 5
        assert loaded.stats["cylinders"] == 4
        assert loaded.scene.prim_count == 9

    def test_mulberry32_reference_stream(self):
        # Deterministic seeded stream; first draws are stable and in [0,1).
        rand = mulberry32(12345)
        vals = [rand() for _ in range(4)]
        assert all(0.0 <= v < 1.0 for v in vals)
        rand2 = mulberry32(12345)
        assert [rand2() for _ in range(4)] == vals

    def test_random_spheres_deterministic(self):
        a = load_random_spheres(50)
        b = load_random_spheres(50)
        np.testing.assert_array_equal(a.geometry.sphere_centers, b.geometry.sphere_centers)
        assert a.geometry.sphere_radii.min() >= 0.15
        assert a.geometry.sphere_radii.max() <= 0.4

    def test_vdw_style_molecule(self):
        mol = get_builtin_molecule("benzene")
        loaded = load_molecule_scene(mol, display_style="vdw")
        assert loaded.stats["cylinders"] == 0
        assert loaded.stats["spheres"] == 12


class TestPicking:
    def test_pick_and_hover(self):
        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=100, height=100)
        hit = pick_at_pixel(r, 50, 50)
        assert hit is not None and hit.prim_type == 1  # central sphere
        hover = hover_at_pixel(r, 50, 50)
        assert hover is not None
        assert "sphere" in hover.label
        assert hover.rect is not None and hover.rect["width"] > 1

    def test_autofocus(self):
        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=100, height=100)
        r.frame_index = 5
        focus = autofocus_at_pixel(r, 50, 50)
        assert focus is not None and focus > 0
        assert r.settings.dof_focus_distance == focus
        assert r.frame_index == 0  # accumulation reset

    def test_miss_returns_none(self):
        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=100, height=100)
        assert pick_at_pixel(r, 2, 2) is None


class TestOverlay:
    def test_projected_rect_reference_case(self):
        # Mirrors overlay_bbox.test.mjs: unit box at z=4 from origin camera.
        class Basis:
            origin = np.zeros(3)
            forward = np.array([0.0, 0.0, 1.0])
            right = np.array([1.0, 0.0, 0.0])
            up = np.array([0.0, 1.0, 0.0])

        rect = project_aabb_to_canvas_rect([-1, -1, 3], [1, 1, 5], Basis, 200, 100)
        assert rect is not None
        # Near face corners at z=3: ndc +-1/3 -> x in [66.7, 133.3].
        assert rect["min_x"] == pytest.approx(200 * (0.5 - 1 / 6), abs=0.1)
        assert rect["max_x"] == pytest.approx(200 * (0.5 + 1 / 6), abs=0.1)

    def test_behind_camera_none(self):
        class Basis:
            origin = np.zeros(3)
            forward = np.array([0.0, 0.0, 1.0])
            right = np.array([1.0, 0.0, 0.0])
            up = np.array([0.0, 1.0, 0.0])

        assert project_aabb_to_canvas_rect([-1, -1, -5], [1, 1, -3], Basis, 200, 100) is None

    def test_primitive_bounds(self):
        loaded = load_test_primitives()
        lo, hi = compute_primitive_world_bounds(loaded.scene, 1, 0)
        np.testing.assert_allclose(lo, [-0.5, -0.5, -0.5])
        np.testing.assert_allclose(hi, [0.5, 0.5, 0.5])


class TestCameraFly:
    def test_fly_moves_target(self):
        cam = OrbitCamera(width=100, height=100, distance=10.0)
        t0 = np.asarray(cam.target).copy()
        assert cam.fly({"w"}, 0.1)
        assert np.linalg.norm(np.asarray(cam.target) - t0) == pytest.approx(0.6, rel=1e-6)
        assert cam.fly({"q"}, 0.1)
        assert cam.target[1] > 0
        assert not cam.fly({"x"}, 0.1)


class TestClipLock:
    def test_lock_freezes_plane(self):
        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=64, height=64)
        r.settings.clip_enabled = True
        r.settings.clip_distance = 2.0
        plane_before = r.active_clip_plane(r.camera.basis())
        r.lock_clip_plane()
        r.camera.drag(200, 100)  # move the camera
        plane_locked = r.active_clip_plane(r.camera.basis())
        np.testing.assert_allclose(plane_locked[0], plane_before[0], atol=1e-6)
        assert plane_locked[1] == pytest.approx(plane_before[1])
        r.unlock_clip_plane()
        plane_after = r.active_clip_plane(r.camera.basis())
        assert not np.allclose(plane_after[0], plane_before[0], atol=1e-3)


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=16, height=16)
        r.settings.tone_map = "linear"
        r.render_frame()
        r.render_frame()
        path = str(tmp_path / "ckpt.npz")
        r.save_checkpoint(path)

        r2 = Renderer(loaded.scene, width=16, height=16)
        r2.settings.tone_map = "linear"
        r2.load_checkpoint(path)
        assert r2.frame_index == 2
        np.testing.assert_allclose(r2.accumulated(), r.accumulated(), atol=1e-7)
        # Continues accumulating.
        assert r2.render_frame()
        assert r2.frame_index == 3

    def test_resolution_mismatch_raises(self, tmp_path):
        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=16, height=16)
        r.render_frame()
        path = str(tmp_path / "ckpt.npz")
        r.save_checkpoint(path)
        r2 = Renderer(loaded.scene, width=32, height=32)
        with pytest.raises(ValueError, match="resolution"):
            r2.load_checkpoint(path)


class TestServer:
    def test_viewer_state_endpoints(self):
        from webgl_raytracer_tpu.app.server import ViewerState

        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=16, height=16)
        state = ViewerState(r)
        png = state.frame_png()
        assert png[:4] == b"\x89PNG"
        st = state.state()
        assert st["frame_index"] == 1
        state.orbit(10, 5)
        assert state.state()["frame_index"] == 0
        state.update_settings({"vis_mode": 2})
        assert r.settings.vis_mode == 2

    def test_viewer_light_updates(self):
        """Per-light route (the reference's light sliders): validated
        coercion, out-of-range index and bad values ignored."""
        from webgl_raytracer_tpu.app.server import ViewerState

        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=16, height=16)
        state = ViewerState(r)
        state.update_light(0, {"azimuth": -10, "intensity": 2, "enabled": 0})
        assert r.settings.lights[0].azimuth == -10.0
        assert r.settings.lights[0].intensity == 2.0
        assert r.settings.lights[0].enabled is False
        before = r.settings.lights[1].angle
        state.update_light(1, {"angle": "bogus"})
        state.update_light(9, {"azimuth": 0.0})
        assert r.settings.lights[1].angle == before
        # A light change resets progressive accumulation.
        state.frame_png()
        state.update_light(2, {"intensity": 1.0})
        assert state.state()["frame_index"] == 0

    def test_viewer_sky_route(self):
        """The /sky update path (environment_controller.js:167-192): a
        parameter change regenerates the env + resets accumulation; bad
        values are rejected with the env untouched; enabled:false tears
        down to lights-only."""
        from webgl_raytracer_tpu.app.server import ViewerState

        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=16, height=16)
        state = ViewerState(r)
        out = state.update_sky({"turbidity": 4.0, "sun_elevation_deg": 10.0,
                                "width": 64, "height": 32})
        # width/height are ignored live controls; params still apply.
        assert out["ok"] and r.env is not None
        assert state._sky["turbidity"] == 4.0
        env_before = r.env
        out = state.update_sky({"turbidity": 99.0})   # out of range 1..20
        assert not out["ok"] and r.env is env_before
        state.frame_png()
        assert state.update_sky({"sun_azimuth_deg": -40.0})["ok"]
        assert state.state()["frame_index"] == 0
        assert state.update_sky({"enabled": False})["ok"]
        assert r.env is None

    def test_viewer_env_route(self):
        """HDR-environment selection in-session (the reference's env
        dropdown, environment_controller.js:194-209): the manifest lists
        the bundled assets, /env swaps between sky / hdr / off, file names
        resolve only through the manifest, and a sky-slider touch while an
        HDR env is active switches back to the analytic sky."""
        from webgl_raytracer_tpu.app.server import ViewerState

        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=16, height=16)
        state = ViewerState(r)
        m = state.env_manifest()
        files = [e["file"] for e in m["environments"]]
        assert "sky_floor_64x32.hdr" in files
        assert m["mode"] == "sky"

        out = state.update_env({"mode": "hdr", "file": "sky_floor_64x32.hdr"})
        assert out["ok"] and out["mode"] == "hdr"
        assert r.env is not None
        assert state.env_manifest()["file"] == "sky_floor_64x32.hdr"
        env_hdr = r.env
        # Manifest names resolve too; traversal attempts do not.
        assert state.update_env({"mode": "hdr",
                                 "file": m["environments"][0]["name"]})["ok"]
        out = state.update_env({"mode": "hdr", "file": "../../secrets.hdr"})
        assert not out["ok"] and "manifest" in out["error"]
        out = state.update_env({"mode": "bogus"})
        assert not out["ok"]

        out = state.update_env({"mode": "off"})
        assert out["ok"] and r.env is None
        out = state.update_env({"mode": "sky"})
        assert out["ok"] and r.env is not None
        # HDR active + sky slider touch -> back to the analytic sky.
        state.update_env({"mode": "hdr", "file": "sky_floor_64x32.hdr"})
        assert state.update_sky({"turbidity": 3.0})["ok"]
        assert state.env_manifest()["mode"] == "sky"
        assert r.env is not env_hdr

    def test_viewer_load_volume_options(self):
        """Volume-import controls on /load (index.html:653-674): grid
        spacing and gaussian radius scale reach the density builder and
        out-of-range values are rejected before any rebuild."""
        from webgl_raytracer_tpu.app.server import ViewerState

        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=16, height=16)
        state = ViewerState(r)
        out = state.load_scene({"scene": "caffeine", "volume": True,
                                "grid_spacing": 0.8, "gaussian_scale": 2.0})
        assert out["ok"] and r.settings.volume_enabled
        cells_coarse = r.volume.nx * r.volume.ny * r.volume.nz
        out = state.load_scene({"scene": "caffeine", "volume": True,
                                "grid_spacing": 0.4, "gaussian_scale": 2.0})
        assert out["ok"]
        cells_fine = r.volume.nx * r.volume.ny * r.volume.nz
        assert cells_fine > cells_coarse
        out = state.load_scene({"scene": "caffeine", "volume": True,
                                "grid_spacing": 0.05})
        assert not out["ok"] and "out of range" in out["error"]
        out = state.load_scene({"scene": "caffeine", "volume": True,
                                "gaussian_scale": 9.0})
        assert not out["ok"] and "out of range" in out["error"]

    def test_viewer_load_route(self):
        """In-session scene switching (main.js:1900-1934): known scenes
        swap the compiled scene + refit the camera; unknown names and bad
        styles surface errors without touching the renderer."""
        from webgl_raytracer_tpu.app.server import ViewerState

        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=16, height=16)
        state = ViewerState(r)
        prims0 = r.scene.prim_count
        out = state.load_scene({"scene": "caffeine"})
        assert out["ok"] and out["prims"] == r.scene.prim_count
        assert r.scene.prim_count != prims0
        assert state.state()["frame_index"] == 0
        dist_caffeine = float(r.camera.distance)
        out = state.load_scene({"scene": "spheres200"})
        assert out["ok"]
        assert float(r.camera.distance) != dist_caffeine   # camera refit
        out = state.load_scene({"scene": "nope"})
        assert not out["ok"] and "unknown scene" in out["error"]
        out = state.load_scene({"scene": "caffeine", "style": "bogus"})
        assert not out["ok"]
        # Bundled protein asset loads through the same route.
        out = state.load_scene({"scene": "protein:TSTP", "style": "cartoon"})
        assert out["ok"] and r.scene.tri_count > 0
        # SES probe/resolution reach the surface builder; out-of-range
        # values are rejected before any rebuild (a 0.01 resolution would
        # be a ~1e9-cell grid on a live server).
        out = state.load_scene({"scene": "ethanol", "surface": True,
                                "probe_radius": 1.2,
                                "surface_resolution": 0.8})
        assert out["ok"] and r.scene.tri_count > 0
        tris_coarse = r.scene.tri_count
        out = state.load_scene({"scene": "ethanol", "surface": True,
                                "probe_radius": 1.2,
                                "surface_resolution": 0.5})
        assert out["ok"] and r.scene.tri_count > tris_coarse
        out = state.load_scene({"scene": "ethanol", "surface": True,
                                "surface_resolution": 0.01})
        assert not out["ok"] and "out of range" in out["error"]
        out = state.load_scene({"scene": "ethanol", "surface": True,
                                "probe_radius": 99})
        assert not out["ok"] and "out of range" in out["error"]


class TestUtils:
    def test_format_poly_count(self):
        assert format_poly_count(999) == "999"
        assert format_poly_count(1500) == "1.5K"
        assert format_poly_count(1_000_000) == "1M"
        assert format_poly_count(2_340_000) == "2.3M"
        assert format_poly_count(float("nan")) == "0"

    def test_ring_logger(self):
        log = create_logger(max_lines=3, echo=False)
        for i in range(5):
            log.info(f"line {i}")
        log.warn("careful")
        log.error("bad")
        lines = log.text().split("\n")
        assert len(lines) == 3
        assert "ERROR: bad" in lines[-1]
        assert "WARN: careful" in lines[-2]


class TestDistributed:
    def test_mesh_sharded_renderer_matches_single_device(self):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        from webgl_raytracer_tpu.env import constant_env
        from webgl_raytracer_tpu.parallel import make_mesh

        mesh = make_mesh()
        loaded = load_test_primitives()
        rm = Renderer(loaded.scene, env=constant_env(0.5), width=32, height=32,
                      mesh=mesh)
        rm.settings.tone_map = "linear"
        rm.render_frames(4)
        r1 = Renderer(load_test_primitives().scene, env=constant_env(0.5),
                      width=32, height=32)
        r1.settings.tone_map = "linear"
        r1.render_frames(4)
        np.testing.assert_allclose(rm.accumulated(), r1.accumulated(), atol=1e-5)

    def test_cli_devices_flag_matches_single_device(self, tmp_path):
        """`render --devices N` reaches parallel/mesh.py from the app
        surface (the reference app actually runs its parallelism; the
        CLI must too) and reproduces the single-device image."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        from PIL import Image

        from webgl_raytracer_tpu.app.cli import main

        outs = {}
        for n, name in ((len(jax.devices()), "mesh.png"), (1, "single.png")):
            out = str(tmp_path / name)
            assert main(["render", "--scene", "spheres50", "--no-env",
                         "--width", "64", "--height", "48", "--frames", "2",
                         "--tone-map", "linear", "--devices", str(n),
                         "--out", out]) == 0
            outs[name] = np.asarray(Image.open(out), dtype=np.int32)
        assert np.abs(outs["mesh.png"] - outs["single.png"]).max() <= 1


class TestMaterialModes:
    def test_material_mode_mapping(self):
        """String -> int mapping parity (webgl_material.test.mjs)."""
        from webgl_raytracer_tpu.render.config import MATERIAL_MODES

        assert MATERIAL_MODES["metallic"] == 0
        assert MATERIAL_MODES["matte"] == 1
        assert MATERIAL_MODES["surface-glass"] == 2
        assert MATERIAL_MODES["translucent-plastic"] == 3


def test_render_scale_interactive():
    """renderScale + the 0.25 interactive preview (main.js:149-151): inputs
    drop the internal resolution; frames settle back to full scale."""
    from webgl_raytracer_tpu.app.server import ViewerState
    from webgl_raytracer_tpu.app.pipeline import load_random_spheres
    from webgl_raytracer_tpu.render import Renderer

    loaded = load_random_spheres(30)
    r = Renderer(loaded.scene, width=128, height=96)
    r.settings.max_frames = 10 ** 9
    state = ViewerState(r)
    state.SETTLE_SECONDS = 0.0

    r.set_scale(0.5)
    assert (r.width, r.height) == (64, 48)
    r.set_scale(1.0)
    assert (r.width, r.height) == (128, 96)

    state.orbit(5.0, 0.0)
    assert r.width < 128  # dropped to fast_scale
    png = state.frame_png()  # settle back (SETTLE_SECONDS=0) + upsample
    assert png[:4] == b"\x89PNG"
    assert (r.width, r.height) == (128, 96)


def test_server_hover_and_focus():
    """/hover returns the primitive + overlay rect; /focus sets the DoF
    focus distance (handleAutofocus + updateHoverBoxOverlay parity)."""
    from webgl_raytracer_tpu.app.server import ViewerState
    from webgl_raytracer_tpu.app.pipeline import load_test_primitives
    from webgl_raytracer_tpu.render import Renderer

    loaded = load_test_primitives()
    r = Renderer(loaded.scene, width=160, height=120)
    state = ViewerState(r)

    h = state.hover(80, 60)  # center of frame: the primitives scene hits
    assert h is not None and h["t"] > 0 and h["rect"] is not None
    assert h["label"].split()[0] in ("sphere", "cylinder", "triangle")

    d = state.focus(80, 60)
    assert d is not None and abs(d - h["t"]) < 1.0
    assert abs(r.settings.dof_focus_distance - d) < 1e-6

    assert state.hover(1, 1) is None  # corner: background


class TestSppSharded:
    @pytest.mark.parametrize("spp", [8, 5, 3])
    def test_spp_sharded_matches_single_device(self, spp):
        """The psum spp-sharding mode (parallel/mesh.py) must reproduce the
        single-device render for divisible AND non-divisible spp — every
        global sample index is traced exactly once across shards."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        import jax.numpy as jnp

        from webgl_raytracer_tpu.parallel import make_mesh
        from webgl_raytracer_tpu.parallel.mesh import render_spp_sharded
        from webgl_raytracer_tpu.render.config import split_settings
        from webgl_raytracer_tpu.render.integrator import render_batch
        from webgl_raytracer_tpu.render.lights import light_dirs_for_camera

        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=16, height=16)
        r.settings.tone_map = "linear"
        r.settings.samples_per_bounce = spp
        basis = r.camera.basis()
        flags, u = split_settings(
            r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
            has_env=False, has_volume=False, clip=None,
            distributed=True)
        px, py = r._pixel_grids()
        single = np.asarray(render_batch(r.scene, None, None, flags, u,
                                         px, py, jnp.uint32(0)))
        mesh = make_mesh()
        sharded = np.asarray(render_spp_sharded(
            mesh, loaded.scene, None, None, flags, u,
            np.asarray(px), np.asarray(py), jnp.uint32(0)))
        np.testing.assert_allclose(sharded, single, atol=2e-5)


class TestUiSemantics:
    def test_material_preset_translucent(self):
        """applyMaterialPreset (main.js:1088-1098): only translucent-plastic
        loads its dielectric defaults."""
        from webgl_raytracer_tpu.render.config import (RenderSettings,
                                                       apply_material_preset)

        s = RenderSettings()
        assert not apply_material_preset(s, "metallic")
        assert s.roughness == RenderSettings().roughness
        assert apply_material_preset(s, "translucent-plastic")
        assert (s.metallic, s.roughness, s.rim_boost) == (0.0, 0.22, 0.0)
        assert (s.surface_ior, s.surface_transmission, s.surface_opacity) == \
            (1.46, 0.55, 0.15)

    def test_max_frames_and_clip_clamps(self):
        """maxFrames 0..2000 clamp + clip range from sceneScale
        (ui_controller.js:52-68) via the settings route."""
        from webgl_raytracer_tpu.app.server import ViewerState
        from webgl_raytracer_tpu.render.config import clip_distance_max

        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=16, height=16)
        state = ViewerState(r)
        state.update_settings({"max_frames": 99999, "clip_distance": 1e6})
        assert r.settings.max_frames == 2000
        lim = clip_distance_max(r.scene_scale)
        assert r.settings.clip_distance == pytest.approx(lim)
        state.update_settings({"max_frames": -5, "clip_distance": -1e6})
        assert r.settings.max_frames == 0
        assert r.settings.clip_distance == pytest.approx(-lim)

    def test_settings_route_applies_preset(self):
        from webgl_raytracer_tpu.app.server import ViewerState

        loaded = load_test_primitives()
        r = Renderer(loaded.scene, width=16, height=16)
        state = ViewerState(r)
        state.update_settings({"material_mode": "translucent-plastic"})
        assert r.settings.surface_ior == 1.46
