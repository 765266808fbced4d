"""Wavefront BVH traversal on device: closest-hit and any-hit queries for a
whole ray batch.

TPU formulation of the reference's per-pixel stack walk (webgl.js:556-880):
there is no per-lane control flow, so every ray keeps its own small stack in
a [B, S] register file and one `lax.while_loop` advances all rays together —
each iteration pops one node per *active* ray (masked), tests the node AABB,
intersects up to `max_leaf` primitives from the unified leaf-ordered table,
and pushes children. Rays whose stack empties go idle (masked off); the loop
ends when every stack is empty or after `max_steps` iterations (the
reference caps at 2048 steps / 128 stack entries; our stack only needs
max_depth+1 slots).

Type specialization is static: scenes without triangles or cylinders compile
traversal kernels that never evaluate those intersectors (the common
molecular case is sphere+cylinder only, and VdW style is spheres only).

Cost counters mirror the reference's traversal-cost visualization channel
(node visits + primitive tests, webgl.js:616,635).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.bvh import PRIM_CYLINDER, PRIM_SPHERE, PRIM_TRIANGLE
from .intersect import (
    clip_reject,
    intersect_aabb,
    intersect_cylinder,
    intersect_sphere,
    intersect_triangle,
)

BIG = np.float32(1e20)
DEFAULT_MAX_STEPS = 2048


class HitRecord(NamedTuple):
    """Closest-hit result for each ray.

    t: f32[B] (1e20 on miss); prim_type: i32[B] (-1 on miss);
    prim_local: per-type index; prim_slot: row in the unified leaf-ordered
    table; extra: (u, v, 0) for triangles / (hit_type, 0, 0) for cylinders;
    cost: traversal cost counter (node visits + prim tests).
    """
    t: jnp.ndarray
    prim_type: jnp.ndarray
    prim_local: jnp.ndarray
    prim_slot: jnp.ndarray
    extra: jnp.ndarray
    cost: jnp.ndarray

    @property
    def hit(self):
        return self.prim_type >= 0


def _leaf_intersect(scene, origin, direction, slot, t_min, clip):
    """Intersect one gathered unified-table row per ray; returns (t, extra).

    Evaluates only the intersectors for primitive types that exist in the
    scene (static), selecting by the row's type tag.
    """
    pa = scene.prim_a[slot]
    ptype = scene.prim_type[slot]

    t = jnp.full(slot.shape, -1.0, jnp.float32)
    extra = jnp.zeros(slot.shape + (3,), jnp.float32)

    if scene.sphere_count:
        t_sph = intersect_sphere(origin, direction, pa[..., :3], pa[..., 3], t_min)
        sel = ptype == PRIM_SPHERE
        t = jnp.where(sel, t_sph, t)

    if scene.tri_count or scene.cylinder_count:
        pb = scene.prim_b[slot]

    if scene.cylinder_count:
        t_cyl, ht = intersect_cylinder(
            origin, direction, pa[..., :3], pb[..., :3], pa[..., 3], t_min
        )
        sel = ptype == PRIM_CYLINDER
        t = jnp.where(sel, t_cyl, t)
        extra = jnp.where(
            sel[..., None],
            jnp.stack([ht, jnp.zeros_like(ht), jnp.zeros_like(ht)], axis=-1),
            extra,
        )

    if scene.tri_count:
        pc = scene.prim_c[slot]
        t_tri, u, v = intersect_triangle(
            origin, direction, pa[..., :3], pb[..., :3], pc[..., :3], t_min
        )
        if clip is not None:
            # The reference clips inside the triangle intersector only
            # (webgl.js:384-390); sphere/cylinder hits are not clipped in
            # the GPU kernel.
            normal, offset, side = clip
            rejected = clip_reject(origin, direction, t_tri, normal, offset, side)
            t_tri = jnp.where(rejected, -1.0, t_tri)
        sel = ptype == PRIM_TRIANGLE
        t = jnp.where(sel, t_tri, t)
        extra = jnp.where(
            sel[..., None],
            jnp.stack([u, v, jnp.zeros_like(u)], axis=-1),
            extra,
        )

    return t, extra


class _LoopState(NamedTuple):
    step: jnp.ndarray
    stack: jnp.ndarray
    sp: jnp.ndarray
    closest: jnp.ndarray
    best_slot: jnp.ndarray
    extra: jnp.ndarray
    cost: jnp.ndarray
    found: jnp.ndarray


def _traverse(
    scene,
    origin,
    direction,
    t_min,
    clip,
    *,
    any_hit: bool,
    accept_min,
    t_max,
    max_steps: int,
    max_leaf: int,
    active=None,
):
    """Shared masked-stack loop for closest-hit and any-hit queries.

    `active`: optional bool[batch] — inactive rays never traverse (their
    stacks start empty), which is how the integrator masks dead paths.
    """
    batch_shape = origin.shape[:-1]
    flat_origin = origin.reshape(-1, 3)
    flat_dir = direction.reshape(-1, 3)
    n = flat_origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), batch_shape).reshape(-1)
    if accept_min is None:
        accept_min = jnp.zeros((), jnp.float32)
    accept_min = jnp.broadcast_to(jnp.asarray(accept_min, jnp.float32), (n,))

    stack_depth = scene.max_depth + 2
    dummy = stack_depth  # writes land in the scratch column, never popped

    init_closest = (
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        if t_max is not None
        else jnp.full((n,), BIG)
    )

    if active is None:
        init_sp = jnp.ones((n,), jnp.int32)
    else:
        init_sp = jnp.asarray(active).reshape(-1).astype(jnp.int32)

    state = _LoopState(
        step=jnp.zeros((), jnp.int32),
        stack=jnp.zeros((n, stack_depth + 1), jnp.int32),
        sp=init_sp,
        closest=init_closest,
        best_slot=jnp.full((n,), -1, jnp.int32),
        extra=jnp.zeros((n, 3), jnp.float32),
        cost=jnp.zeros((n,), jnp.int32),
        found=jnp.zeros((n,), bool),
    )

    rows = jnp.arange(n)
    clip_flat = None
    if clip is not None:
        normal, offset, side = clip
        clip_flat = (
            jnp.broadcast_to(jnp.asarray(normal, jnp.float32), (n, 3)),
            jnp.asarray(offset, jnp.float32),
            jnp.asarray(side, jnp.float32),
        )

    def cond(s: _LoopState):
        return (s.step < max_steps) & jnp.any(s.sp > 0)

    def body(s: _LoopState) -> _LoopState:
        active = s.sp > 0
        sp_pop = jnp.where(active, s.sp - 1, 0)
        node = jnp.where(active, s.stack[rows, sp_pop], 0)

        bmin = scene.node_bmin[node]
        bmax = scene.node_bmax[node]
        meta = scene.node_meta[node]
        left_first = meta[:, 0]
        prim_count = meta[:, 1]
        right_child = meta[:, 2]

        box_hit = intersect_aabb(bmin, bmax, flat_origin, flat_dir, s.closest) & active
        is_leaf = prim_count > 0
        leaf_work = box_hit & is_leaf

        closest = s.closest
        best_slot = s.best_slot
        extra = s.extra
        found = s.found
        tests = jnp.zeros((n,), jnp.int32)

        for k in range(max_leaf):
            valid = leaf_work & (k < prim_count)
            slot = jnp.where(valid, left_first + k, 0)
            t, ex = _leaf_intersect(scene, flat_origin, flat_dir, slot, t_min, clip_flat)
            if any_hit:
                accept = valid & (t > accept_min) & (t < closest)
                found = found | accept
            else:
                accept = valid & (t > 0.0) & (t < closest)
                closest = jnp.where(accept, t, closest)
                best_slot = jnp.where(accept, slot, best_slot)
                extra = jnp.where(accept[:, None], ex, extra)
            tests = tests + valid.astype(jnp.int32)

        push = box_hit & ~is_leaf & (sp_pop <= stack_depth - 2)
        if any_hit:
            push = push & ~found
        idx_right = jnp.where(push, sp_pop, dummy)
        idx_left = jnp.where(push, sp_pop + 1, dummy)
        stack = s.stack.at[rows, idx_right].set(jnp.where(push, right_child, 0))
        stack = stack.at[rows, idx_left].set(jnp.where(push, left_first, 0))
        sp = jnp.where(push, sp_pop + 2, sp_pop)
        if any_hit:
            sp = jnp.where(found, 0, sp)

        cost = s.cost + active.astype(jnp.int32) + tests
        return _LoopState(s.step + 1, stack, sp, closest, best_slot, extra, cost, found)

    final = jax.lax.while_loop(cond, body, state)

    if any_hit:
        return final.found.reshape(batch_shape)

    hit = final.best_slot >= 0
    slot = jnp.maximum(final.best_slot, 0)
    prim_type = jnp.where(hit, scene.prim_type[slot], -1)
    prim_local = jnp.where(hit, scene.prim_local[slot], -1)
    return HitRecord(
        t=final.closest.reshape(batch_shape),
        prim_type=prim_type.reshape(batch_shape),
        prim_local=prim_local.reshape(batch_shape),
        prim_slot=final.best_slot.reshape(batch_shape),
        extra=final.extra.reshape(batch_shape + (3,)),
        cost=final.cost.reshape(batch_shape),
    )


@partial(jax.jit, static_argnames=("max_steps", "max_leaf", "has_clip"))
def _trace_closest_jit(scene, origin, direction, t_min, clip, max_steps, max_leaf, has_clip):
    return _traverse(
        scene, origin, direction, t_min, clip if has_clip else None,
        any_hit=False, accept_min=None, t_max=None,
        max_steps=max_steps, max_leaf=max_leaf,
    )


@partial(jax.jit, static_argnames=("max_steps", "max_leaf", "has_clip", "has_accept_min"))
def _trace_any_jit(scene, origin, direction, t_min, t_max, accept_min, clip,
                   max_steps, max_leaf, has_clip, has_accept_min):
    return _traverse(
        scene, origin, direction, t_min, clip if has_clip else None,
        any_hit=True,
        accept_min=accept_min if has_accept_min else None,
        t_max=t_max,
        max_steps=max_steps, max_leaf=max_leaf,
    )


def _dummy_clip():
    return (jnp.zeros(3, jnp.float32), jnp.float32(0.0), jnp.float32(1.0))


def trace_closest(
    scene,
    origin,
    direction,
    t_min,
    clip=None,
    max_steps: int = DEFAULT_MAX_STEPS,
    max_leaf: int = 4,
) -> HitRecord:
    """Closest hit per ray (traceClosest, webgl.js:556-695). Jitted; scalar
    args are passed as device values so changing them does not recompile."""
    return _trace_closest_jit(
        scene, jnp.asarray(origin, jnp.float32), jnp.asarray(direction, jnp.float32),
        jnp.asarray(t_min, jnp.float32),
        clip if clip is not None else _dummy_clip(),
        max_steps, max_leaf, clip is not None,
    )


def trace_any(
    scene,
    origin,
    direction,
    t_min,
    t_max=BIG,
    accept_min=None,
    clip=None,
    max_steps: int = DEFAULT_MAX_STEPS,
    max_leaf: int = 4,
):
    """Boolean occlusion query per ray.

    accept_min=None reproduces traceAny (accepts t > 0, webgl.js:697-785);
    passing a value reproduces traceAnyMin's window t in (accept_min, t_max)
    (webgl.js:787-880). Rays stop traversing the moment they find any hit.
    """
    has_accept = accept_min is not None
    return _trace_any_jit(
        scene, jnp.asarray(origin, jnp.float32), jnp.asarray(direction, jnp.float32),
        jnp.asarray(t_min, jnp.float32), jnp.asarray(t_max, jnp.float32),
        jnp.asarray(accept_min if has_accept else 0.0, jnp.float32),
        clip if clip is not None else _dummy_clip(),
        max_steps, max_leaf, clip is not None, has_accept,
    )
