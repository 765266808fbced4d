"""Render configuration: the framework's flag registry.

`RenderSettings` mirrors the reference's renderState defaults object — the
de-facto flag registry of ~60 parameters (main.js:148-207) — as a typed
dataclass. For the jitted integrator it splits into:

  * StaticFlags — structural booleans/enums that specialize the compiled
    kernel (material mode, feature toggles, bounce/spp counts);
  * Uniforms    — a pytree of device scalars/vectors that can change every
    frame without recompiling (the analog of GL uniforms).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

MATERIAL_MODES = {"metallic": 0, "matte": 1, "surface-glass": 2, "translucent-plastic": 3}
TONE_MAPS = ("linear", "aces", "reinhard")


@dataclass
class LightSettings:
    """One camera-relative cone light (main.js:194-199)."""
    enabled: bool = True
    azimuth: float = 0.0
    elevation: float = 0.0
    intensity: float = 1.0
    angle: float = 20.0          # cone half-angle in degrees
    color: tuple[float, float, float] = (1.0, 1.0, 1.0)


def default_lights() -> list[LightSettings]:
    """Key / fill / rim studio defaults (main.js:194-199)."""
    return [
        LightSettings(True, -40.0, -30.0, 5.0, 22.0, (1.0, 1.0, 1.0)),
        LightSettings(True, 40.0, 0.0, 0.6, 50.0, (1.0, 1.0, 1.0)),
        LightSettings(True, 170.0, 10.0, 0.35, 6.0, (1.0, 1.0, 1.0)),
    ]


@dataclass
class RenderSettings:
    """Full render state (defaults match main.js:148-207)."""
    render_scale: float = 1.0
    fast_scale: float = 0.25
    use_bvh: bool = True
    use_imported_color: bool = True
    base_color: tuple[float, float, float] = (0.8, 0.8, 0.8)
    material_mode: str = "metallic"
    metallic: float = 0.0
    roughness: float = 0.4
    rim_boost: float = 0.2
    matte_specular: float = 0.03
    matte_roughness: float = 0.5
    matte_diffuse_roughness: float = 0.5
    wrap_diffuse: float = 0.2
    surface_show_atoms: bool = True
    surface_ior: float = 1.33
    surface_transmission: float = 0.35
    surface_opacity: float = 0.0
    surface_flag_mode: int = 0
    max_bounces: int = 4
    max_frames: int = 100
    exposure: float = 1.0
    dof_enabled: bool = False
    dof_aperture: float = 0.03
    dof_focus_distance: float = 4.0
    tone_map: str = "aces"
    ambient_intensity: float = 0.0
    ambient_color: tuple[float, float, float] = (1.0, 1.0, 1.0)
    env_intensity: float = 0.1
    env_max_luminance: float = 200.0
    ray_bias: float = 1e-5
    t_min: float = 1e-5
    samples_per_bounce: int = 1     # spp per progressive frame, clamped 1..8
    cast_shadows: bool = True
    volume_enabled: bool = False
    volume_color: tuple[float, float, float] = (0.435, 0.643, 1.0)
    volume_density: float = 1.0
    volume_opacity: float = 1.0
    volume_step: float = 0.5
    volume_max_steps: int = 256
    volume_threshold: float = 0.0
    lights: list[LightSettings] = field(default_factory=default_lights)
    clip_enabled: bool = False
    clip_distance: float = 0.0
    clip_locked: bool = False
    clip_locked_normal: tuple | None = None
    clip_locked_offset: float | None = None
    clip_locked_side: float | None = None
    vis_mode: int = 0               # 0 render, 1 normals, 2 cost, 3 depth
    tracer: str = "wavefront"       # device tracer: "wavefront" or "stack"

    def replace(self, **kw) -> "RenderSettings":
        return replace(self, **kw)


def apply_material_preset(settings: RenderSettings, mode: str) -> bool:
    """Material-mode preset application (main.js:1088-1098): selecting
    translucent-plastic loads its dielectric defaults; other modes leave
    the sliders untouched. Returns True when a preset was applied."""
    if mode != "translucent-plastic":
        return False
    settings.metallic = 0.0
    settings.roughness = 0.22
    settings.rim_boost = 0.0
    settings.surface_ior = 1.46
    settings.surface_transmission = 0.55
    settings.surface_opacity = 0.15
    return True


def clip_distance_max(scene_scale: float) -> float:
    """Clip-plane distance range derived from the scene scale
    (ui_controller.js:58-68): max(1, sceneScale * 4)."""
    return max(1.0, float(scene_scale) * 4.0)


@dataclass(frozen=True)
class StaticFlags:
    """Kernel-specializing switches (hashable; a jit static argument)."""
    material_mode: int = 0
    use_imported_color: bool = True
    use_env: bool = False
    volume_enabled: bool = False
    volume_max_steps: int = 0
    dof_enabled: bool = False
    clip_enabled: bool = False
    cast_shadows: bool = True
    max_bounces: int = 4
    spp: int = 1
    surface_flag_mode: int = 0
    light_enabled: tuple[bool, bool, bool] = (True, True, True)
    vis_mode: int = 0
    rim_enabled: bool = True
    tracer: str = "wavefront"   # "wavefront" (dense cluster) or "stack"
    # useBvh=false (main.js:154): brute-force every primitive per ray with
    # no acceleration-structure culling (the reference's BRUTE_FORCE mode).
    use_bvh: bool = True
    # Multi-chip mode: skip the host-order compaction/chunk scan so the ray
    # axis shards cleanly under GSPMD (no cross-shard permutation).
    distributed: bool = False


@jax.tree_util.register_dataclass
@dataclass
class Uniforms:
    """Per-frame device values (the GL-uniform analog; all f32 leaves)."""
    base_color: Any
    metallic: Any
    roughness: Any
    rim_boost: Any
    matte_specular: Any
    matte_roughness: Any
    matte_diffuse_roughness: Any
    wrap_diffuse: Any
    surface_ior: Any
    surface_transmission: Any
    surface_opacity: Any
    exposure: Any
    dof_aperture: Any
    dof_focus_distance: Any
    ambient_intensity: Any
    ambient_color: Any
    env_intensity: Any
    env_max_luminance: Any
    ray_bias: Any
    t_min: Any
    light_dir: Any          # f32[3,3] — per light, the "from" direction
    light_color: Any        # f32[3,3]
    light_intensity: Any    # f32[3]
    light_angle: Any        # f32[3] radians, clamped [0.001, pi]
    clip_normal: Any
    clip_offset: Any
    clip_side: Any
    volume_color: Any
    volume_density: Any
    volume_opacity: Any
    volume_step: Any
    volume_threshold: Any
    # Camera basis (prescaled right/up) + origin.
    cam_origin: Any
    cam_forward: Any
    cam_right: Any
    cam_up: Any
    resolution: Any         # f32[2] (width, height)


def split_settings(
    settings: RenderSettings,
    camera_basis,
    light_dirs,
    has_env: bool,
    has_volume: bool,
    clip=None,
    distributed: bool = False,
) -> tuple[StaticFlags, Uniforms]:
    """Build the (static, dynamic) pair for the jitted integrator.

    light_dirs: f32[3,3] world-space light directions (camera-relative,
    computed per frame by render.lights.camera_relative_light_dir).
    clip: optional (normal, offset, side).
    """
    s = settings
    flags = StaticFlags(
        material_mode=MATERIAL_MODES[s.material_mode] if isinstance(s.material_mode, str) else int(s.material_mode),
        use_imported_color=bool(s.use_imported_color),
        use_env=bool(has_env),
        volume_enabled=bool(s.volume_enabled and has_volume),
        volume_max_steps=int(min(s.volume_max_steps, 1024)) if (s.volume_enabled and has_volume) else 0,
        dof_enabled=bool(s.dof_enabled and s.dof_aperture > 1e-6),
        clip_enabled=bool(clip is not None),
        cast_shadows=bool(s.cast_shadows),
        max_bounces=int(min(max(s.max_bounces, 0), 8)),
        spp=int(min(max(s.samples_per_bounce, 1), 8)),
        surface_flag_mode=int(s.surface_flag_mode),
        light_enabled=tuple(bool(l.enabled) for l in s.lights[:3]),
        vis_mode=int(s.vis_mode),
        rim_enabled=bool(s.rim_boost > 0.0),
        tracer=str(s.tracer),
        use_bvh=bool(s.use_bvh),
        distributed=bool(distributed),
    )

    if clip is None:
        clip_normal, clip_offset, clip_side = np.array([0.0, 0.0, 1.0]), 0.0, 1.0
    else:
        clip_normal, clip_offset, clip_side = clip

    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    uniforms = Uniforms(
        base_color=f32(s.base_color),
        metallic=f32(s.metallic),
        roughness=f32(s.roughness),
        rim_boost=f32(s.rim_boost),
        matte_specular=f32(s.matte_specular),
        matte_roughness=f32(s.matte_roughness),
        matte_diffuse_roughness=f32(s.matte_diffuse_roughness),
        wrap_diffuse=f32(s.wrap_diffuse),
        surface_ior=f32(s.surface_ior),
        surface_transmission=f32(s.surface_transmission),
        surface_opacity=f32(s.surface_opacity),
        exposure=f32(s.exposure),
        dof_aperture=f32(s.dof_aperture),
        dof_focus_distance=f32(s.dof_focus_distance),
        ambient_intensity=f32(s.ambient_intensity),
        ambient_color=f32(s.ambient_color),
        env_intensity=f32(s.env_intensity),
        env_max_luminance=f32(s.env_max_luminance),
        ray_bias=f32(s.ray_bias),
        t_min=f32(s.t_min),
        light_dir=f32(np.asarray(light_dirs, np.float32).reshape(3, 3)),
        light_color=f32(np.stack([np.asarray(l.color, np.float32) for l in s.lights[:3]])),
        light_intensity=f32([l.intensity for l in s.lights[:3]]),
        light_angle=f32([
            float(np.clip(math.radians(l.angle), 0.001, math.pi)) for l in s.lights[:3]
        ]),
        clip_normal=f32(clip_normal),
        clip_offset=f32(clip_offset),
        clip_side=f32(clip_side),
        volume_color=f32(s.volume_color),
        volume_density=f32(s.volume_density),
        volume_opacity=f32(s.volume_opacity),
        volume_step=f32(s.volume_step),
        volume_threshold=f32(s.volume_threshold),
        cam_origin=f32(camera_basis.origin),
        cam_forward=f32(camera_basis.forward),
        cam_right=f32(camera_basis.right),
        cam_up=f32(camera_basis.up),
        resolution=f32([camera_basis.width, camera_basis.height]),
    )
    return flags, uniforms
