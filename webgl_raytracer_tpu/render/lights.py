"""Camera-relative studio lighting (renderer_controller.js:8-20)."""

from __future__ import annotations

import math

import numpy as np


def camera_relative_light_dir(azimuth_deg, elevation_deg, forward, right, up):
    """Direction from azimuth/elevation expressed in the camera basis.

    The returned vector is the light's *pointing* direction (the shader cone
    axis is its negation, webgl.js:1109)."""
    az = math.radians(azimuth_deg)
    el = math.radians(elevation_deg)
    f = np.asarray(forward, np.float64)
    r = np.asarray(right, np.float64)
    u = np.asarray(up, np.float64)
    d = (
        r * (math.cos(el) * math.sin(az))
        + u * math.sin(el)
        + f * (math.cos(el) * math.cos(az))
    )
    n = np.linalg.norm(d) or 1.0
    return d / n


def light_dirs_for_camera(lights, basis) -> np.ndarray:
    """f32[3,3] of world-space light directions for the current camera.

    Uses *normalized* camera vectors (main.js:1694-1696 passes the
    normalized basis vectors to cameraRelativeLightDir)."""
    f = np.asarray(basis.forward, np.float64)
    r = np.asarray(basis.right, np.float64)
    u = np.asarray(basis.up, np.float64)
    f = f / (np.linalg.norm(f) or 1.0)
    r = r / (np.linalg.norm(r) or 1.0)
    u = u / (np.linalg.norm(u) or 1.0)
    out = np.zeros((3, 3), np.float32)
    for i, light in enumerate(lights[:3]):
        out[i] = camera_relative_light_dir(light.azimuth, light.elevation, f, r, u)
    return out
