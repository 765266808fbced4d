"""Scene compile layer: BVH build/flatten, device scene buffers, CPU oracle.

Mirrors the reference's L2 scene-compile layer (/root/reference/src/bvh.js,
packing.js) — except that on TPU the "texture layout" becomes plain HBM array
layout, so the texel packers are replaced by SoA device arrays directly.
"""

from .bvh import (
    PRIM_TRIANGLE,
    PRIM_SPHERE,
    PRIM_CYLINDER,
    BVH,
    build_bvh,
    primitive_bounds,
)
from .compile import SceneBuffers, compile_scene, scene_bounds
from .pick import trace_scene_ray, PickHit, prim_type_label
from .camera import (
    OrbitCamera,
    CameraBasis,
    camera_basis,
    apply_orbit_drag,
    resolve_rotation_lock,
    quat_multiply,
    quat_from_axis_angle,
    quat_rotate_vec,
    normalize_quat,
    camera_ray_from_pixel,
    fit_camera_to_bounds,
)
