"""Device-mesh utilities for tile-parallel rendering.

Layout strategy (the renderer analog of pure data parallelism):

  * scene / env / volume buffers -> replicated (every chip traces against
    the full scene; molecular scenes are tiny next to HBM);
  * the flat pixel batch (px, py, and all per-ray state created inside the
    integrator) -> sharded over the 1-D 'tiles' mesh axis;
  * the compiled integrator is ordinary jit: GSPMD propagates the ray
    sharding through ray-gen, the traversal loops, and shading without any
    collectives, because no op mixes rays;
  * the accumulated image stays sharded in HBM across chips; fetching it
    for display performs the only gather (over ICI, at readout rate).

An spp-sharded mode (samples split over chips, psum-reduced) is provided
for very small images where pixel parallelism runs out.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "tiles") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_scene(tree, mesh: Mesh):
    """Place every array leaf of a scene/env/volume pytree replicated on
    the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), tree
    )


def shard_rays(arr, mesh: Mesh, axis_name: str = "tiles"):
    """Shard a per-ray array over the mesh's tile axis (axis 0). Pads to a
    multiple of the mesh size; callers slice the result back."""
    n_dev = mesh.devices.size
    arr = jnp.asarray(arr)
    n = arr.shape[0]
    rem = (-n) % n_dev
    if rem:
        pad = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
        arr = jnp.pad(arr, pad)
    return jax.device_put(arr, NamedSharding(mesh, P(axis_name)))


def render_tiles_sharded(render_fn, mesh: Mesh, scene, env, vol, flags, uniforms,
                         px, py, frame_index):
    """Run a render_batch-style function with rays sharded over the mesh.

    Returns the color array (sharded over 'tiles'); np.asarray on it
    performs the readout gather.
    """
    n = px.shape[0]
    scene_r = replicate_scene(scene, mesh)
    env_r = replicate_scene(env, mesh) if env is not None else None
    vol_r = replicate_scene(vol, mesh) if vol is not None else None
    uni_r = replicate_scene(uniforms, mesh)
    px_s = shard_rays(px, mesh)
    py_s = shard_rays(py, mesh)
    out = render_fn(scene_r, env_r, vol_r, flags, uni_r, px_s, py_s, frame_index)
    return out[:n]


@partial(jax.jit, static_argnames=("flags", "mesh", "axis_name", "count"))
def _render_frames_tiles(scene, env, vol, flags, uniforms, px, py, start_frame,
                         prev, mesh, axis_name, count):
    """`count` progressive frames with rays sharded over the mesh and the
    FULL single-chip integrator running on every device via shard_map —
    including the Pallas traversal/path kernels. GSPMD cannot partition a
    pallas_call, so the plain-jit distributed mode forces the XLA path;
    inside shard_map each device sees an ordinary local ray batch and keeps
    the kernel rate. Scene/env/volume are closed over (replicated); only
    the ray axis is split. No collectives — the accumulator stays sharded
    until readout, exactly like the GSPMD tile mode."""
    import dataclasses

    from jax.experimental.shard_map import shard_map

    from ..render.integrator import render_batch_v3

    local_flags = dataclasses.replace(flags, distributed=False)

    def body(px_l, py_l, prev_l):
        def step(accum, k):
            frame_index = start_frame + k
            color = render_batch_v3(scene, env, vol, local_flags, uniforms,
                                    px_l, py_l,
                                    frame_index.astype(jnp.uint32))
            fi = frame_index.astype(jnp.float32)
            accum = tuple(
                jnp.where(frame_index == 0, color[c],
                          (accum[c] * fi + color[c]) / (fi + 1.0))
                for c in range(3))
            return accum, None

        prev3 = (prev_l[:, 0], prev_l[:, 1], prev_l[:, 2])
        accum, _ = jax.lax.scan(step, prev3,
                                jnp.arange(count, dtype=jnp.int32))
        return jnp.stack(accum, axis=-1)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_rep=False,
    )
    return fn(px, py, prev)


def render_frames_tiles(mesh, scene, env, vol, flags, uniforms, px, py,
                        start_frame, prev, count, axis_name: str = "tiles"):
    """Public wrapper: pads nothing — callers guarantee the ray count is
    divisible by the mesh size (Renderer's 16-px tile snapping does)."""
    return _render_frames_tiles(scene, env, vol, flags, uniforms, px, py,
                                jnp.int32(start_frame), prev, mesh, axis_name,
                                int(count))


@partial(jax.jit, static_argnames=("flags", "mesh", "axis_name"))
def _render_spp_sharded(scene, env, vol, flags, uniforms, px, py, frame_index,
                        mesh, axis_name):
    """spp sharded over chips: each chip traces spp/n_dev samples for every
    pixel, partial sums reduced with psum over ICI."""
    from jax.experimental.shard_map import shard_map

    from ..render.integrator import generate_camera_rays, trace_paths

    n_dev = mesh.devices.size
    # Exactly flags.spp samples total: the first (spp % n_dev) shards take
    # one extra, so non-divisible spp neither over- nor under-samples.
    base = flags.spp // n_dev
    rem = flags.spp % n_dev
    max_per = base + (1 if rem else 0)

    def shard_body(px_l, py_l):
        from ..ops import vec3 as V

        idx = jax.lax.axis_index(axis_name)
        count = base + jnp.where(idx < rem, 1, 0)
        start = idx * base + jnp.minimum(idx, rem)
        total = jnp.zeros(px_l.shape + (3,), jnp.float32)
        for s in range(max_per):
            sample = start + s
            seed, origin, direction = generate_camera_rays(
                uniforms, flags, px_l, py_l, frame_index, sample
            )
            radiance, _ = trace_paths(scene, env, vol, flags, uniforms,
                                      origin, direction, seed)
            keep = (s < count).astype(jnp.float32)
            total = total + V.to_array(radiance) * keep
        total = jax.lax.psum(total, axis_name)
        return total / flags.spp * uniforms.exposure

    fn = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    return fn(px, py)


def render_spp_sharded(mesh, scene, env, vol, flags, uniforms, px, py, frame_index,
                       axis_name: str = "tiles"):
    scene_r = replicate_scene(scene, mesh)
    env_r = replicate_scene(env, mesh) if env is not None else None
    vol_r = replicate_scene(vol, mesh) if vol is not None else None
    return _render_spp_sharded(scene_r, env_r, vol_r, flags,
                               replicate_scene(uniforms, mesh),
                               jax.device_put(px, NamedSharding(mesh, P())),
                               jax.device_put(py, NamedSharding(mesh, P())),
                               frame_index, mesh, axis_name)
