"""Progressive frame rendering and accumulation.

The accumulation protocol matches the reference (webgl.js:1551-1558,
main.js:1602-1844): each frame traces spp new samples per pixel and folds
them into a running fp32 mean `(prev*N + x)/(N+1)`; any camera/material/env
change resets N to 0. On TPU the ping-pong FBO pair becomes a single HBM
array updated functionally inside jit.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.tonemap import apply_tonemap
from ..scene.camera import OrbitCamera
from ..scene.compile import SceneBuffers, scene_bounds, scene_scale
from .config import RenderSettings, split_settings
from .integrator import render_batch, render_visualization
from .lights import light_dirs_for_camera


@jax.jit
def _accumulate(prev, color, frame_index):
    fi = frame_index.astype(jnp.float32)
    return jnp.where(frame_index == 0, color, (prev * fi + color) / (fi + 1.0))


@partial(jax.jit, static_argnames=("flags", "count", "pool"))
def _render_frames_fused(scene, env, vol, flags, u, px, py, start_frame, prev,
                         count, pool=1):
    """`count` progressive frames folded into one device program (a scan
    over the frame index) — amortizes per-launch overhead, which dominates
    when the chip sits behind a high-latency tunnel. The accumulator runs
    in component form (three [B] carries): a [B, 3] carry's 3-wide minor
    axis tiles to 128 lanes on TPU, turning every accumulate into ~42x
    the necessary HBM traffic.

    pool > 1: CROSS-FRAME LANE POOLING — each scan step traces `pool`
    consecutive frames' rays as ONE [pool*B] batch (per-lane frame
    indices; every sample keeps its sequential-render seed). Progressive
    frames are independent, so pooling them packs the late-bounce
    live-lane tails of several frames into shared traversal blocks and
    halves (at pool=2) the per-frame share of every fixed per-launch
    cost: chunk machinery, dead-block floors, the low-occupancy tail the
    32-lane block permutation can't compact. The accumulator folds each
    sub-frame sequentially, so the running mean's arithmetic matches the
    unpooled path exactly for identical per-frame colors (batch-shape
    knife-edge flips aside — the familiar formulation-switch noise,
    STATUS 'Measured perf truths'). Requires count % pool == 0."""
    from .integrator import render_batch_v3

    assert count % pool == 0
    n = px.shape[0]
    if pool > 1:
        px_p = jnp.concatenate([px] * pool)
        py_p = jnp.concatenate([py] * pool)
        off = jnp.concatenate([jnp.full((n,), j, jnp.int32)
                               for j in range(pool)])
    else:
        px_p, py_p = px, py

    def step(accum, k):
        base = start_frame + k * pool
        if pool == 1:
            fidx = base.astype(jnp.uint32)
        else:
            fidx = (base + off).astype(jnp.uint32)
        color = render_batch_v3(scene, env, vol, flags, u, px_p, py_p, fidx)
        for j in range(pool):
            fj = base + j
            cj = (color if pool == 1
                  else tuple(c[j * n:(j + 1) * n] for c in color))
            fi = fj.astype(jnp.float32)
            accum = tuple(
                jnp.where(fj == 0, cj[c],
                          (accum[c] * fi + cj[c]) / (fi + 1.0))
                for c in range(3))
        return accum, None

    prev3 = (prev[:, 0], prev[:, 1], prev[:, 2])
    accum, _ = jax.lax.scan(step, prev3,
                            jnp.arange(count // pool, dtype=jnp.int32))
    return jnp.stack(accum, axis=-1)


def _frame_pool(flags, count: int, n: int) -> int:
    """Frames pooled per scan step (WRT_POOL, default 1 pending the
    on-chip race — tools/bench_pool.py). Pooling is restricted to the
    single-chip wavefront path; count must split evenly."""
    import os

    pool = int(os.environ.get("WRT_POOL", "1"))
    if (pool <= 1 or count % pool or flags.vis_mode > 0
            or flags.tracer != "wavefront" or flags.distributed):
        return 1
    return pool


class Renderer:
    """Owns the compiled scene, render settings, camera, and the progressive
    accumulation state — the equivalent of the reference's render loop state
    (glState + renderState + cameraState)."""

    def __init__(
        self,
        scene: SceneBuffers,
        settings: RenderSettings | None = None,
        env=None,
        volume=None,
        width: int = 800,
        height: int = 600,
        device=None,
        mesh=None,
        auto_fit: bool = True,
    ):
        """With `mesh` (a jax.sharding.Mesh) the scene/env/volume replicate
        to every device and the flat ray batch shards over the mesh's first
        axis — pure tile data parallelism, collectives only at readout."""
        self.settings = settings or RenderSettings()
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import replicate_scene

            self.scene = replicate_scene(scene, mesh)
            self.env = replicate_scene(env, mesh) if env is not None else None
            self.volume = replicate_scene(volume, mesh) if volume is not None else None
        else:
            self.scene = scene.device_put(device) if isinstance(scene.node_bmin, np.ndarray) else scene
            self.env = env
            self.volume = volume
        self.width = int(width)
        self.height = int(height)
        self.base_width = self.width
        self.base_height = self.height
        self.scale = 1.0
        self.camera = OrbitCamera(width=self.width, height=self.height)
        self.frame_index = 0
        self._accum = None
        self._px = None
        self._py = None

        lo, hi = scene_bounds(self.scene)
        self.bounds = (np.asarray(lo), np.asarray(hi))
        self.scene_scale = scene_scale(self.scene)
        # Scale-derived ray bias (main.js:328-330).
        suggested = max(1e-5, self.scene_scale * 1e-5)
        self.settings.ray_bias = suggested
        self.settings.t_min = suggested
        if auto_fit:
            self.camera.fit_to_bounds(*self.bounds)

    # -- state management ---------------------------------------------------

    def reset_accumulation(self) -> None:
        self.frame_index = 0

    def set_env(self, env) -> None:
        """Swap the environment (or None) and restart accumulation — the
        environment_controller.js:167-192 update path: regenerate, upload,
        resetAccumulation."""
        if self.mesh is not None and env is not None:
            from ..parallel import replicate_scene

            env = replicate_scene(env, self.mesh)
        self.env = env
        self.reset_accumulation()

    def set_scene(self, scene: SceneBuffers, volume=None,
                  auto_fit: bool = True) -> None:
        """Swap the compiled scene in-session (the reference's example-scene
        switcher, main.js:1900-1934): bounds, scene scale, ray bias, and the
        camera fit are recomputed; accumulation restarts."""
        if self.mesh is not None:
            from ..parallel import replicate_scene

            self.scene = replicate_scene(scene, self.mesh)
            self.volume = (replicate_scene(volume, self.mesh)
                           if volume is not None else None)
        else:
            self.scene = (scene.device_put(None)
                          if isinstance(scene.node_bmin, np.ndarray) else scene)
            self.volume = volume
        lo, hi = scene_bounds(self.scene)
        self.bounds = (np.asarray(lo), np.asarray(hi))
        self.scene_scale = scene_scale(self.scene)
        suggested = max(1e-5, self.scene_scale * 1e-5)
        self.settings.ray_bias = suggested
        self.settings.t_min = suggested
        if auto_fit:
            self.camera.fit_to_bounds(*self.bounds)
        self.reset_accumulation()

    def resize(self, width: int, height: int) -> None:
        if width != self.width or height != self.height:
            self.width, self.height = int(width), int(height)
            self.camera.width, self.camera.height = self.width, self.height
            self._accum = None
            self._px = None
            self.reset_accumulation()
        self.camera.width, self.camera.height = self.width, self.height

    def set_scale(self, scale: float) -> None:
        """Internal render-resolution scale (renderState.renderScale and the
        0.25 interactive scale, main.js:149-151): the path tracer renders at
        base x scale and the viewer upsamples for display. Dimensions snap to
        16-pixel tiles (the renderer's screen-tile granularity); accumulation
        resets on change."""
        scale = float(min(2.0, max(0.05, scale)))
        w = max(16, int(round(self.base_width * scale / 16.0)) * 16)
        h = max(16, int(round(self.base_height * scale / 16.0)) * 16)
        self.scale = scale
        self.resize(w, h)

    def _pixel_grids(self):
        """Flat pixel index arrays in Morton-ordered 16x16 screen tiles.

        Tile order makes each consecutive block of 256 rays screen-
        coherent, which is what the tile-wavefront tracer exploits
        (ops/wavefront.py TILE). Tiles themselves follow a Morton (Z-order)
        curve so any power-of-two run of consecutive tiles covers a
        compact square — a traversal kernel block of 4 tiles is a 32x32
        pixel frustum instead of a 64x16 strip, overlapping fewer
        clusters. `_unperm` maps ray order back to row-major image order
        at readout."""
        if self._px is None:
            w, h = self.width, self.height
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            tile_y = yy // 16
            tile_x = xx // 16
            # Interleave tile-coordinate bits (16-bit coords are plenty).
            def _spread(v):
                v = v.astype(np.uint64)
                v = (v | (v << 8)) & np.uint64(0x00FF00FF)
                v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
                v = (v | (v << 2)) & np.uint64(0x33333333)
                v = (v | (v << 1)) & np.uint64(0x55555555)
                return v

            morton = _spread(tile_x) | (_spread(tile_y) << np.uint64(1))
            order = np.lexsort((xx.ravel(), yy.ravel() % 16,
                                morton.ravel()))
            xs = xx.ravel()[order].astype(np.uint32)
            ys_img = yy.ravel()[order]
            inverse = np.empty(w * h, np.int64)
            inverse[order] = np.arange(w * h)
            self._unperm = jnp.asarray(inverse)
            # gl_FragCoord convention: y = 0 is the bottom row.
            px = jnp.asarray(xs)
            py = jnp.asarray((h - 1 - ys_img).astype(np.uint32))
            if self.mesh is not None:
                from ..parallel import shard_rays

                px = shard_rays(px, self.mesh)[: w * h]
                py = shard_rays(py, self.mesh)[: w * h]
            self._px = px
            self._py = py
        return self._px, self._py

    def active_clip_plane(self, basis):
        """Camera-forward clip plane with optional locking (main.js
        getActiveClipPlane :1384-1416). Returns None or
        (normal, offset, side)."""
        s = self.settings
        if not s.clip_enabled:
            return None
        if s.clip_locked and s.clip_locked_normal is not None:
            normal = np.asarray(s.clip_locked_normal, np.float64)
            normal = normal / (np.linalg.norm(normal) or 1.0)
        else:
            normal = np.asarray(basis.forward, np.float64)
            normal = normal / (np.linalg.norm(normal) or 1.0)

        locked_offset = s.clip_locked and s.clip_locked_offset is not None
        if locked_offset:
            offset = float(s.clip_locked_offset)
        else:
            plane_point = np.asarray(basis.origin) + normal * s.clip_distance
            offset = float(normal @ plane_point)

        if s.clip_locked and s.clip_locked_side is not None:
            side = float(s.clip_locked_side)
        else:
            cam_side = float(normal @ np.asarray(basis.origin)) - offset
            side = 1.0 if cam_side >= 0 else -1.0
        return (normal.astype(np.float32), offset, side)

    def lock_clip_plane(self) -> None:
        """Freeze the current camera-derived clip plane in world space
        (main.js clip-lock toggle)."""
        basis = self.camera.basis()
        plane = self.active_clip_plane(basis)
        if plane is None:
            return
        normal, offset, side = plane
        self.settings.clip_locked = True
        self.settings.clip_locked_normal = tuple(float(v) for v in normal)
        self.settings.clip_locked_offset = offset
        self.settings.clip_locked_side = side

    def unlock_clip_plane(self) -> None:
        self.settings.clip_locked = False
        self.settings.clip_locked_normal = None
        self.settings.clip_locked_offset = None
        self.settings.clip_locked_side = None

    # -- rendering ----------------------------------------------------------

    def render_frame(self) -> bool:
        """Trace one progressive frame into the accumulator. Returns False
        when max_frames has been reached (accumulation is kept)."""
        s = self.settings
        if s.max_frames > 0 and self.frame_index >= s.max_frames:
            return False

        basis = self.camera.basis()
        light_dirs = light_dirs_for_camera(s.lights, basis)
        clip = self.active_clip_plane(basis)
        flags, uniforms = split_settings(
            s, basis, light_dirs,
            has_env=self.env is not None,
            has_volume=self.volume is not None,
            clip=clip,
            distributed=self.mesh is not None,
        )
        px, py = self._pixel_grids()

        if flags.vis_mode > 0:
            color = render_visualization(
                self.scene, self.env, self.volume, flags, uniforms, px, py,
                jnp.uint32(self.frame_index),
            )
            self._accum = color
            self.frame_index = 1
            return True

        if self._use_tile_shard_map():
            self._render_tiles(flags, uniforms, px, py, 1)
            return True

        color = render_batch(
            self.scene, self.env, self.volume, flags, uniforms, px, py,
            jnp.uint32(self.frame_index),
        )
        if self._accum is None or self.frame_index == 0:
            self._accum = color
        else:
            self._accum = _accumulate(self._accum, color, jnp.uint32(self.frame_index))
        self.frame_index += 1
        return True

    def _use_tile_shard_map(self) -> bool:
        """Multi-chip frames run the full single-chip integrator per device
        under shard_map (parallel/mesh.py render_frames_tiles), keeping the
        Pallas kernel rate; requires the ray count to split evenly."""
        return (self.mesh is not None
                and (self.width * self.height) % self.mesh.devices.size == 0)

    def _render_tiles(self, flags, uniforms, px, py, count: int) -> None:
        from ..parallel.mesh import render_frames_tiles

        prev = (self._accum if self._accum is not None and self.frame_index > 0
                else jnp.zeros((self.width * self.height, 3), jnp.float32))
        self._accum = render_frames_tiles(
            self.mesh, self.scene, self.env, self.volume, flags, uniforms,
            px, py, self.frame_index, prev, count,
        )
        self.frame_index += count

    def render_frames(self, count: int) -> bool:
        """Trace `count` progressive frames in ONE device program (fused
        scan). Semantically identical to count render_frame() calls for the
        path-traced mode; falls back to the per-frame path for vis modes.
        Returns False when max_frames was already reached."""
        s = self.settings
        if s.max_frames > 0:
            count = min(count, max(0, s.max_frames - self.frame_index))
        if count <= 0:
            return False
        if s.vis_mode > 0 or count == 1:
            for _ in range(count):
                if not self.render_frame():
                    return False
            return True

        basis = self.camera.basis()
        light_dirs = light_dirs_for_camera(s.lights, basis)
        clip = self.active_clip_plane(basis)
        flags, uniforms = split_settings(
            s, basis, light_dirs,
            has_env=self.env is not None,
            has_volume=self.volume is not None,
            clip=clip,
            distributed=self.mesh is not None,
        )
        px, py = self._pixel_grids()
        if self._use_tile_shard_map():
            self._render_tiles(flags, uniforms, px, py, count)
            return True
        prev = (self._accum if self._accum is not None and self.frame_index > 0
                else jnp.zeros((self.width * self.height, 3), jnp.float32))
        self._accum = _render_frames_fused(
            self.scene, self.env, self.volume, flags, uniforms, px, py,
            jnp.int32(self.frame_index), prev, count,
            pool=_frame_pool(flags, count, px.shape[0]),
        )
        self.frame_index += count
        return True

    def render(self, frames: int | None = None) -> np.ndarray:
        """Render `frames` progressive frames (default: settings.max_frames)
        and return the tone-mapped image u8[H,W,3]."""
        n = frames if frames is not None else max(1, self.settings.max_frames)
        self.render_frames(n)
        return self.image()

    # -- output -------------------------------------------------------------

    def accumulated(self) -> np.ndarray:
        """Linear accumulated radiance f32[H,W,3] (top row first)."""
        if self._accum is None:
            return np.zeros((self.height, self.width, 3), np.float32)
        flat = self._accum[self._unperm]  # ray order -> row-major image order
        return np.asarray(flat).reshape(self.height, self.width, 3)

    def image(self) -> np.ndarray:
        """Tone-mapped display image f32[H,W,3] in [0,1]."""
        linear = self.accumulated()
        mode = self.settings.tone_map if self.settings.vis_mode == 0 else "linear"
        return np.asarray(apply_tonemap(jnp.asarray(linear), mode))

    def image_u8(self) -> np.ndarray:
        return (np.clip(self.image(), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)

    # -- checkpoint / resume --------------------------------------------------

    def save_checkpoint(self, path: str) -> None:
        """Persist the progressive accumulation state + camera to disk.

        The accumulator IS the resumable state (SURVEY §5): the running
        mean plus its sample count; the reference keeps it only in GPU
        memory, here it round-trips to .npz."""
        accum = (np.asarray(self._accum) if self._accum is not None
                 else np.zeros((self.width * self.height, 3), np.float32))
        np.savez_compressed(
            path,
            accum=accum,
            frame_index=self.frame_index,
            width=self.width,
            height=self.height,
            cam_target=np.asarray(self.camera.target, np.float64),
            cam_distance=self.camera.distance,
            cam_rotation=np.asarray(self.camera.rotation, np.float64),
            cam_fov=self.camera.fov,
        )

    def load_checkpoint(self, path: str) -> None:
        """Resume accumulation from a checkpoint (must match resolution)."""
        data = np.load(path)
        w, h = int(data["width"]), int(data["height"])
        if (w, h) != (self.width, self.height):
            raise ValueError(
                f"Checkpoint resolution {w}x{h} != renderer {self.width}x{self.height}"
            )
        self._pixel_grids()  # ensure the permutation exists
        self._accum = jnp.asarray(data["accum"])
        self.frame_index = int(data["frame_index"])
        self.camera.target = data["cam_target"]
        self.camera.distance = float(data["cam_distance"])
        self.camera.rotation = data["cam_rotation"]
        self.camera.fov = float(data["cam_fov"])
