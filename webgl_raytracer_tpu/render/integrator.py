"""The wavefront path-tracing integrator.

TPU re-formulation of the reference's per-pixel megakernel
(webgl.js:1173-1559 tracePath/shadeDirect/main): the whole ray batch steps
through the bounce loop together (lax.fori_loop), with dead paths masked
out of traversal and shading. Per bounce:

  closest-hit traversal -> optional volume march -> environment miss with
  MIS -> surface reconstruction by primitive type -> glass/translucent
  stochastic transmission -> 3 cone lights with shadow rays + MIS -> env NEE
  with MIS (CDF importance sampled) -> GGX/cosine BRDF sample -> Russian
  roulette.

All per-ray vectors are component triples of [B] arrays (ops/vec3.py):
[B,3] arrays put the 3-axis in the TPU lane dimension and waste ~40x of
the VPU; component form keeps every elementwise op 128 lanes wide
(measured ~16x faster on shading-sized op chains at 2M rays).

RNG draws are kept in the same order as the GLSL for uniform control flow,
so converged images match; per-lane-divergent draw counts (the glass branch)
are consumed unconditionally and masked, which changes individual sample
streams but not the estimator.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import brdf as B
from ..ops import sampling as S
from ..ops import vec3 as V
from ..ops.envmap import env_pdf_v3, sample_env_direction_v3, sample_env_radiance_v3
from ..ops.rng import init_seed, rand, rand2
from ..ops.traversal import _traverse
from ..ops.volume import march_volume
from ..ops.wavefront import wf_trace_any_v3, wf_trace_closest_v3
from ..scene.bvh import PRIM_CYLINDER, PRIM_SPHERE, PRIM_TRIANGLE

BIG = np.float32(1e20)
RADIANCE_CLAMP = np.float32(100.0)
NEE_CLAMP = np.float32(20.0)
THROUGHPUT_CLAMP = np.float32(10.0)


def _clip_tuple(flags, u):
    if not flags.clip_enabled:
        return None
    return (u.clip_normal, u.clip_offset, u.clip_side)


def _use_attrs(scene, flags) -> bool:
    """Shade from in-kernel extracted attribute rows instead of post-trace
    per-lane gathers (pallas_trace.trace_closest_attrs). EXPERIMENT KNOB,
    off by default: measured on TPU v5e (1000-sphere 1080p, round 3) the
    attrs frame runs 0.70x the gather frame — the per-sweep winner
    reduction + one-hot MXU extraction in the traversal hot loop costs
    more than the [B,12]/color/normal gathers it removes, and the [B,32]
    attr rows add permutation traffic. Enable with WRT_ATTRS=1; results
    are bit-identical either way (test_frame_attrs_vs_gather_bit_identical
    + Precision.HIGHEST in the extraction matmul)."""
    import os

    from ..ops.pallas_trace import supports_attrs
    from ..ops.wavefront import _pallas_auto

    if os.environ.get("WRT_ATTRS") != "1":
        return False
    return (flags.tracer == "wavefront" and flags.use_bvh
            and not flags.distributed and supports_attrs(scene)
            and _pallas_auto(scene, None, True))


def _closest_hit(scene, flags, o3, d3, t_min, clip, active=None,
                 full_record=True, with_attrs=False, secondary=False):
    """Tracer dispatch: the dense cluster wavefront (default, TPU-native) or
    the reference-shaped masked BVH stack walk. When an activity mask is
    given, the whole traversal is skipped via a scalar-predicate cond if no
    lane in this (chunked, screen-coherent) batch is live.
    full_record=False: the caller only needs (t, prim_slot) — skips the
    full-batch finalize gather on the Pallas branch (the compaction path
    rebuilds records per chunk).
    with_attrs=True: returns (record, attrs [B, 32]) with the winner's
    attribute row (no per-lane gathers anywhere on the Pallas branch)."""
    def run(_):
        if flags.tracer == "wavefront":
            # Distributed renders keep the pure-XLA path: pallas_call does
            # not GSPMD-partition across a mesh. use_bvh=False is the
            # reference's brute-force mode: an unculled dense sweep.
            return wf_trace_closest_v3(scene, o3, d3, t_min, clip,
                                       active=active,
                                       use_pallas=not flags.distributed,
                                       force_dense=not flags.use_bvh,
                                       full_record=full_record,
                                       with_attrs=with_attrs,
                                       secondary=secondary)
        return _traverse(
            scene, jnp.stack(o3, -1), jnp.stack(d3, -1), t_min, clip,
            any_hit=False, accept_min=None, t_max=None,
            max_steps=2048, max_leaf=4, active=active,
        )

    if active is None:
        return run(None)

    n = o3[0].shape[0]

    def skip(_):
        from ..ops.traversal import HitRecord
        rec = HitRecord(
            t=jnp.full((n,), BIG),
            prim_type=jnp.full((n,), -1, jnp.int32),
            prim_local=jnp.full((n,), -1, jnp.int32),
            prim_slot=jnp.full((n,), -1, jnp.int32),
            extra=jnp.zeros((n, 3), jnp.float32),
            cost=jnp.zeros((n,), jnp.int32),
        )
        if with_attrs:
            attrs = jnp.zeros((n, 32), jnp.float32).at[:, 11].set(-1.0)
            return rec, attrs
        return rec

    return jax.lax.cond(jnp.any(active), run, skip, None)


def _any_hit(scene, flags, o3, d3, t_min, clip, accept_min=None,
             t_max=BIG, active=None, divergent=False):
    def run(_):
        if flags.tracer == "wavefront":
            return wf_trace_any_v3(scene, o3, d3, t_min, t_max=t_max,
                                   accept_min=accept_min, clip=clip,
                                   active=active,
                                   use_pallas=not flags.distributed,
                                   force_dense=not flags.use_bvh,
                                   divergent=divergent)
        return _traverse(
            scene, jnp.stack(o3, -1), jnp.stack(d3, -1), t_min, clip,
            any_hit=True, accept_min=accept_min, t_max=t_max,
            max_steps=2048, max_leaf=4, active=active,
        )

    if active is None:
        return run(None)
    return jax.lax.cond(
        jnp.any(active), run,
        lambda _: jnp.zeros(o3[0].shape, bool), None)


def _use_any3_fan(scene, flags, clip) -> bool:
    """Route the 3-light shadow fan through the fused 3-rays-per-lane
    occlusion kernel (pallas_trace.trace_any3): one worklist/sweep front
    serves all three co-origin cone rays, so the per-block fixed costs the
    concatenated [3N] launch pays three times are paid once. Results are
    bit-identical (occlusion is an order-independent OR; see the kernel
    docstring and tests/test_any3.py). WRT_ANY3=0 forces the concatenated
    batch (A/B), =1 forces the fused path even off-TPU (interpret-mode
    tests); auto = whenever the Pallas kernels are live."""
    import os

    from ..ops.wavefront import _pallas_auto

    env = os.environ.get("WRT_ANY3")
    if env == "0":
        return False
    if flags.tracer != "wavefront" or not flags.use_bvh:
        return False
    if env == "1":
        return True
    return _pallas_auto(scene, clip, not flags.distributed)


def _any_hit3(scene, flags, o3, d3s, t_min, clip, accept_min, actives):
    """Fused 3-direction occlusion gated on any candidate being live."""
    from ..ops.wavefront import wf_trace_any3_v3

    def run(_):
        return wf_trace_any3_v3(scene, o3, d3s, t_min,
                                accept_min=accept_min, clip=clip,
                                actives=actives,
                                use_pallas=not flags.distributed,
                                force_dense=not flags.use_bvh)

    def skip(_):
        z = jnp.zeros(o3[0].shape, bool)
        return (z, z.copy(), z.copy())

    live = actives[0] | actives[1] | actives[2]
    return jax.lax.cond(jnp.any(live), run, skip, None)


def _trace_or_skip(scene, flags, origin, direction, t_min, clip, active,
                   with_attrs=False):
    """Closest hit gated on `active` (used by the compaction path, where
    bounce 0 reuses a precomputed record and only later bounces trace —
    every live trace through here is a secondary bounce).

    Note on formulation switches (measured, round 3): routing these
    traces to the per-ray kernels changes SOME pixels vs the block
    kernels even though both formulations are bit-identical on identical
    inputs — changing any kernel boundary changes XLA's fusion of the
    bounce-origin arithmetic by last-place ulps, which flips marginal
    self-intersection hits at t ~ ray_bias (3.8e-4 scene units). The
    same flips occur between chunk-count choices and are exactly the
    decision-boundary flips PARITY_RMSE's flip-excluded metric was built
    for; no formulation is "wrong"."""
    return _closest_hit(scene, flags, origin, direction, t_min, clip,
                        active=active, with_attrs=with_attrs,
                        secondary=True)


def _fetch_hit_rows(scene, flags, slot):
    """Hit-row fetch -> component data: (pa (x,y,z), ra, pb, pc, color).
    One [B,12] gather (wavefront table) or three [B,4] gathers (stack)."""
    if flags.tracer == "wavefront":
        flat = scene.cluster_prims.reshape(-1, 12)
        row = flat[slot]
        pa = (row[:, 0], row[:, 1], row[:, 2])
        ra = row[:, 3]
        pb = (row[:, 4], row[:, 5], row[:, 6])
        pc = (row[:, 8], row[:, 9], row[:, 10])
        color = V.from_array(scene.cluster_color[slot])
        return pa, ra, pb, pc, color
    a = scene.prim_a[slot]
    b = scene.prim_b[slot]
    c = scene.prim_c[slot]
    return ((a[:, 0], a[:, 1], a[:, 2]), a[:, 3],
            (b[:, 0], b[:, 1], b[:, 2]), (c[:, 0], c[:, 1], c[:, 2]),
            V.from_array(scene.prim_color[slot]))


def _cylinder_normal_v3(pos, p1, p2, hit_type):
    axis = V.sub(p2, p1)
    axis = V.scale(axis, 1.0 / jnp.maximum(V.length(axis), 1e-12))
    h = V.dot(V.sub(pos, p1), axis)
    side = V.sub(pos, V.add(p1, V.scale(axis, h)))
    n = V.where(hit_type == 1.0, V.sub(pos, p1),
                V.where(hit_type == 2.0, V.sub(pos, p2), side))
    return V.normalize(n)


def _surface_attributes(scene, flags, rec, pos, direction, u, attrs=None):
    """Geometric/shading normals + base color at the hit
    (webgl.js:1244-1272), by primitive type, in component form.

    attrs: optional [B, 32] winner attribute rows from the in-kernel
    one-hot extraction (pallas_trace._attr_operand layout) — replaces
    every per-lane gather here (hit row, color, tri vertex normals) with
    bit-identical carried values."""
    slot = jnp.maximum(rec.prim_slot, 0)
    local = jnp.maximum(rec.prim_local, 0)
    ptype = rec.prim_type
    if attrs is not None:
        pa = (attrs[:, 0], attrs[:, 1], attrs[:, 2])
        pb = (attrs[:, 4], attrs[:, 5], attrs[:, 6])
        pc = (attrs[:, 8], attrs[:, 9], attrs[:, 10])
        imported_color = (attrs[:, 12], attrs[:, 13], attrs[:, 14])
    else:
        pa, _, pb, pc, imported_color = _fetch_hit_rows(scene, flags, slot)

    zero = jnp.zeros_like(pos[0])
    n_raw = (zero, zero, zero)

    if scene.sphere_count:
        n_sph = V.normalize(V.sub(pos, pa))
        n_raw = V.where(ptype == PRIM_SPHERE, n_sph, n_raw)

    if scene.cylinder_count:
        n_cyl = _cylinder_normal_v3(pos, pa, pb, rec.extra[..., 0])
        n_raw = V.where(ptype == PRIM_CYLINDER, n_cyl, n_raw)

    tri_shading = None
    if scene.tri_count:
        n_tri = V.normalize(V.cross(V.sub(pb, pa), V.sub(pc, pa)))
        n_raw = V.where(ptype == PRIM_TRIANGLE, n_tri, n_raw)
        if attrs is not None:
            tn0 = (attrs[:, 15], attrs[:, 16], attrs[:, 17])
            tn1 = (attrs[:, 18], attrs[:, 19], attrs[:, 20])
            tn2 = (attrs[:, 21], attrs[:, 22], attrs[:, 23])
        else:
            tn = scene.tri_normals[local]        # [B,3,3] gather
            tn0 = (tn[:, 0, 0], tn[:, 0, 1], tn[:, 0, 2])
            tn1 = (tn[:, 1, 0], tn[:, 1, 1], tn[:, 1, 2])
            tn2 = (tn[:, 2, 0], tn[:, 2, 1], tn[:, 2, 2])
        bu = rec.extra[..., 0]
        bv = rec.extra[..., 1]
        b0 = 1.0 - bu - bv
        tri_shading = V.normalize((
            b0 * tn0[0] + bu * tn1[0] + bv * tn2[0],
            b0 * tn0[1] + bu * tn1[1] + bv * tn2[1],
            b0 * tn0[2] + bu * tn1[2] + bv * tn2[2],
        ))

    front = V.dot(n_raw, direction) < 0.0
    n_geom = V.where(front, n_raw, V.neg(n_raw))

    shading = n_geom
    if scene.tri_count:
        flip = V.dot(tri_shading, n_geom) < 0.0
        tri_sn = V.where(flip, V.neg(tri_shading), tri_shading)
        shading = V.where(ptype == PRIM_TRIANGLE, tri_sn, shading)

    if flags.use_imported_color:
        base_color = imported_color
    else:
        base_color = V.splat(u.base_color, like=pos[0])
    return n_geom, shading, base_color, front


def _material_params(flags, u, base_color):
    """Material-mode parameter selection (webgl.js:1097-1102)."""
    use_matte = flags.material_mode == 1
    metallic = u.metallic if flags.material_mode == 0 else jnp.float32(0.0)
    rough = u.matte_roughness if use_matte else u.roughness
    diff_rough = u.matte_diffuse_roughness if use_matte else jnp.float32(0.0)
    wrap = u.wrap_diffuse if use_matte else jnp.float32(0.0)
    if use_matte:
        f0 = (u.matte_specular + 0 * base_color[0],) * 3
        f0 = (f0[0], f0[0], f0[0])
    else:
        f0 = (
            (1.0 - metallic) * 0.04 + base_color[0] * metallic,
            (1.0 - metallic) * 0.04 + base_color[1] * metallic,
            (1.0 - metallic) * 0.04 + base_color[2] * metallic,
        )
    return metallic, rough, diff_rough, wrap, f0


def _ggx_eval(sn, v, l, rough, f0):
    """GGX specular D*G*F / (4 NdotV NdotL) (webgl.js:1122-1129)."""
    h = V.normalize(V.add(v, l))
    ndv = jnp.maximum(V.dot(sn, v), 0.001)
    ndl = jnp.maximum(V.dot(sn, l), 0.0)
    ndh = jnp.maximum(V.dot(sn, h), 0.001)
    vdh = jnp.maximum(V.dot(v, h), 0.001)
    d = B.distribution_ggx(ndh, rough)
    g = B.geometry_smith(ndv, ndl, rough)
    f = B.fresnel_schlick_v3(vdh, f0)
    k = (d * g) / jnp.maximum(4.0 * ndv * ndl, 0.001)
    return V.scale(f, k), f


def _make_bounce_step(scene, env, vol, flags, u, n, capture_shadow=False):
    """Factory for ONE path-trace bounce over a flat [n] ray batch.

    Returns bounce_body(bounce, carry, static_bounce=0, first_rec=None,
    first_attrs=None, use_attrs=False) -> carry. trace_paths unrolls it
    over flags.max_bounces (the chunk-scan transports); the dense
    wavefront transport calls it one bounce at a time, re-compacting the
    live rays between calls. Carry layout (17 elements):
    (seed, ox, oy, oz, dx, dy, dz, tpx, tpy, tpz, rx, ry, rz, last_pdf,
    alive, nrays, noccl).

    capture_shadow=True (tools/shadow_cost.py only): bounce_body returns
    (carry, batch) where batch = (o0,o1,o2,d0,d1,d2,act,smin) is this
    bounce's batched 3-light shadow-trace input — the exact arrays the
    production _any_hit launch receives — so the tool can replay the
    launch standalone. (The axon PJRT rejects host callbacks, so the
    batches leave the jit as outputs instead.)"""
    bias = jnp.maximum(u.ray_bias, 1e-4)
    clip = _clip_tuple(flags, u)
    ambient = V.splat(u.ambient_color)
    volume_color = V.splat(u.volume_color)

    def bounce_body(bounce, carry, static_bounce=0, first_rec=None,
                    first_attrs=None, use_attrs=False):
        (seed, ox, oy, oz, dx, dy, dz, tpx, tpy, tpz,
         rx, ry, rz, last_pdf, alive, nrays, noccl) = carry
        origin = (ox, oy, oz)
        direction = (dx, dy, dz)
        throughput = (tpx, tpy, tpz)
        radiance = (rx, ry, rz)

        attrs = None
        if first_rec is not None:
            nrays = nrays + jnp.sum(alive.astype(jnp.int32))
            traced = _trace_or_skip(scene, flags, origin, direction, u.t_min,
                                    clip, alive & (bounce > 0),
                                    with_attrs=use_attrs)
            if use_attrs:
                traced, t_attrs = traced
                attrs = jax.lax.select_n((bounce == 0).astype(jnp.int32),
                                         t_attrs, first_attrs)
            rec = jax.tree_util.tree_map(
                lambda pre, live: jax.lax.select_n(
                    (bounce == 0).astype(jnp.int32), live, pre),
                first_rec, traced,
            )
        else:
            nrays = nrays + jnp.sum(alive.astype(jnp.int32))
            rec = _closest_hit(scene, flags, origin, direction, u.t_min, clip,
                               active=alive, with_attrs=use_attrs,
                               secondary=static_bounce > 0)
            if use_attrs:
                rec, attrs = rec
        hit = rec.prim_type >= 0
        t_surface = jnp.where(hit, rec.t, BIG)

        if flags.volume_enabled:
            vol_rad, new_tp = march_volume(
                vol, jnp.stack(origin, -1), jnp.stack(direction, -1), t_surface,
                u.t_min, u.volume_color, u.volume_density, u.volume_opacity,
                u.volume_step, u.volume_threshold, jnp.stack(throughput, -1),
                alive, flags.volume_max_steps,
            )
            radiance = V.add(radiance, V.from_array(vol_rad))
            throughput = V.from_array(new_tp)

        # --- environment / ambient on miss (webgl.js:1223-1235) ---
        env_contrib = V.scale(ambient, u.ambient_intensity)
        env_contrib = (jnp.broadcast_to(env_contrib[0], (n,)),
                       jnp.broadcast_to(env_contrib[1], (n,)),
                       jnp.broadcast_to(env_contrib[2], (n,)))
        if flags.use_env:
            env_contrib = V.add(env_contrib, sample_env_radiance_v3(
                env, direction, u.env_intensity, u.env_max_luminance))
            mis_w = jnp.where(
                (bounce > 0) & (last_pdf > 0.0),
                S.power_heuristic(last_pdf, env_pdf_v3(env, direction)),
                1.0,
            )
        else:
            mis_w = 1.0
        miss = alive & ~hit
        add = V.scale(V.mul(throughput, env_contrib), mis_w)
        radiance = V.add(radiance, V.where(miss, add, V.zeros_like(add[0])))
        alive = alive & hit

        carry_mid = (seed, origin[0], origin[1], origin[2],
                     direction[0], direction[1], direction[2],
                     throughput[0], throughput[1], throughput[2],
                     radiance[0], radiance[1], radiance[2],
                     last_pdf, alive, nrays, noccl)

        # Everything below runs only when some lane in this chunk hit —
        # all-miss (pure background) chunks return here.
        if capture_shadow:
            return jax.lax.cond(jnp.any(alive),
                                lambda c: shade_tail(bounce, rec, attrs, c),
                                lambda c: (c, _zero_shadow_batch()),
                                carry_mid)
        return jax.lax.cond(jnp.any(alive),
                            lambda c: shade_tail(bounce, rec, attrs, c),
                            lambda c: c, carry_mid)

    def _zero_shadow_batch():
        m = max(sum(1 for i in range(3) if flags.light_enabled[i]), 1)
        z = jnp.zeros((m * n,), jnp.float32)
        return (z, z.copy(), z.copy(), z.copy(), z.copy(), z.copy(),
                jnp.zeros((m * n,), bool), jnp.zeros((m * n,), jnp.float32))

    def shade_tail(bounce, rec, attrs, carry):
        (seed, ox, oy, oz, dx, dy, dz, tpx, tpy, tpz,
         rx, ry, rz, last_pdf, alive, nrays, noccl) = carry
        origin = (ox, oy, oz)
        direction = (dx, dy, dz)
        throughput = (tpx, tpy, tpz)
        radiance = (rx, ry, rz)
        hit = rec.prim_type >= 0

        # --- surface reconstruction ---
        pos = V.add(origin, V.scale(direction, rec.t))
        n_geom, sn, base_color, front = _surface_attributes(
            scene, flags, rec, pos, direction, u, attrs=attrs)
        v = V.neg(direction)

        # --- glass / translucent transmission (webgl.js:1276-1313) ---
        shade_lane = alive
        transmit = jnp.zeros((n,), bool)
        if flags.material_mode in (2, 3):
            seed, r_op = rand(seed)
            if flags.material_mode == 2:
                glass_lane = rec.prim_type == PRIM_TRIANGLE
                if flags.surface_flag_mode != 0 and scene.tri_count:
                    if attrs is not None:
                        tflag = attrs[:, 24]
                    else:
                        tflag = scene.tri_flags[jnp.maximum(rec.prim_local, 0)]
                    glass_lane = glass_lane & (tflag > 0.5)
            else:
                glass_lane = jnp.ones((n,), bool)
            transmit = alive & glass_lane & (r_op >= u.surface_opacity)

            cosi = jnp.clip(-V.dot(direction, n_geom), 0.0, 1.0)
            f0s = ((u.surface_ior - 1.0) / (u.surface_ior + 1.0)) ** 2
            fres = B.fresnel_schlick(cosi, f0s)
            ior = jnp.maximum(u.surface_ior, 1e-3)
            eta = jnp.where(front, 1.0 / ior, ior)
            can_refract, refr = B.refract_dir_v3(direction, n_geom, eta)
            reflect_prob = jnp.where(can_refract, fres, 1.0)

            seed, r_ref = rand(seed)
            seed, b1, b2 = rand2(seed)
            do_reflect = r_ref < reflect_prob
            if flags.material_mode == 3:
                trans_rough = jnp.clip(u.roughness, 0.02, 1.0)
                refl_dir = S.reflect_from_uv_v3(direction, n_geom, trans_rough, b1, b2)
                refr_dir = S.around_direction_from_uv_v3(refr, trans_rough, b1, b2)
            else:
                refl_dir = V.normalize(V.reflect(direction, n_geom))
                refr_dir = V.normalize(refr)

            new_dir = V.where(do_reflect, refl_dir, refr_dir)
            new_origin = V.where(
                do_reflect,
                V.add(pos, V.scale(n_geom, bias)),
                V.sub(pos, V.scale(n_geom, bias)),
            )
            tint = V.blend((jnp.ones(n), jnp.ones(n), jnp.ones(n)),
                           base_color, u.surface_transmission)
            trans_mask = transmit & ~do_reflect
            throughput = V.where(trans_mask, V.mul(throughput, tint), throughput)
            origin = V.where(transmit, new_origin, origin)
            direction = V.where(transmit, new_dir, direction)
            last_pdf = jnp.where(transmit, 0.0, last_pdf)
            shade_lane = alive & ~transmit

        metallic, rough, diff_rough, wrap, f0 = _material_params(flags, u, base_color)

        # --- direct lighting: 3 cone lights + shadows + MIS (:1094-1145) ---
        # RNG draws stay in the reference's per-light order, but the shadow
        # occlusion queries for all enabled lights run as ONE batched
        # any-hit trace (origins tiled) — one traversal launch per bounce
        # instead of three, with bit-identical results.
        direct = V.zeros_like(pos[0])
        shadow_min = jnp.maximum(bias, u.t_min)
        shadow_origin = V.add(pos, V.scale(n_geom, bias))
        enabled = [i for i in range(3) if flags.light_enabled[i]]
        light_samples = []
        for i in enabled:
            seed, l1, l2 = rand2(seed)
            axis_const = -u.light_dir[i] / jnp.linalg.norm(u.light_dir[i])
            axis = (jnp.broadcast_to(axis_const[0], (n,)),
                    jnp.broadcast_to(axis_const[1], (n,)),
                    jnp.broadcast_to(axis_const[2], (n,)))
            ldir, l_pdf = S.cone_from_uv_v3(axis, u.light_angle[i], l1, l2)
            ndl = jnp.maximum(V.dot(sn, ldir), 0.0)
            candidate = shade_lane & (ndl > 0.0)
            light_samples.append((i, ldir, l_pdf, ndl, candidate))

        occluded_by_light = {}
        shadow_batch = _zero_shadow_batch() if capture_shadow else None
        if (flags.cast_shadows and light_samples and not capture_shadow
                and _use_any3_fan(scene, flags, clip)):
            # Fused fan: up to three co-origin rays per LANE, one
            # traversal launch, one worklist (bit-identical to the
            # concatenated batch below; see _use_any3_fan).
            for s in light_samples:
                noccl = noccl + jnp.sum(s[4].astype(jnp.int32))
            dpad = (jnp.ones((n,), jnp.float32),
                    jnp.zeros((n,), jnp.float32),
                    jnp.zeros((n,), jnp.float32))
            apad = jnp.zeros((n,), bool)
            d3s = tuple(light_samples[j][1] if j < len(light_samples)
                        else dpad for j in range(3))
            acts = tuple(light_samples[j][4] if j < len(light_samples)
                         else apad for j in range(3))
            smin = jnp.broadcast_to(shadow_min, (n,))
            occ3 = _any_hit3(scene, flags, shadow_origin, d3s, u.t_min,
                             clip, smin, acts)
            for j, s in enumerate(light_samples):
                occluded_by_light[s[0]] = occ3[j]
        elif flags.cast_shadows and light_samples:
            m = len(light_samples)
            cat = lambda parts: jnp.concatenate(parts)
            o_cat = tuple(cat([shadow_origin[c]] * m) for c in range(3))
            d_cat = tuple(cat([s[1][c] for s in light_samples])
                          for c in range(3))
            act_cat = cat([s[4] for s in light_samples])
            noccl = noccl + jnp.sum(act_cat.astype(jnp.int32))
            smin = jnp.broadcast_to(shadow_min, (n,))
            smin_cat = cat([smin] * m)
            if capture_shadow:
                shadow_batch = o_cat + d_cat + (act_cat, smin_cat)
            occ_cat = _any_hit(
                scene, flags, o_cat, d_cat, u.t_min, clip,
                accept_min=smin_cat, active=act_cat,
            )
            for j, s in enumerate(light_samples):
                occluded_by_light[s[0]] = occ_cat[j * n:(j + 1) * n]

        for i, ldir, l_pdf, ndl, candidate in light_samples:
            if flags.cast_shadows:
                lit = candidate & ~occluded_by_light[i]
            else:
                lit = candidate
            spec, f = _ggx_eval(sn, v, ldir, rough, f0)
            diff = B.eval_diffuse_brdf_v3(sn, v, ldir, base_color, diff_rough, wrap)
            diff = V.scale(diff, 1.0 - metallic)
            one_minus_f = (1.0 - f[0], 1.0 - f[1], 1.0 - f[2])
            brdf_val = V.add(spec, V.mul(diff, one_minus_f))
            spec_prob = B.spec_probability_v3(f0, base_color, metallic)
            pdf_b = B.brdf_pdf_v3(sn, v, ldir, rough, spec_prob)
            mis = S.power_heuristic(l_pdf, pdf_b)
            w = ndl * mis / jnp.maximum(l_pdf, 1e-6) * u.light_intensity[i]
            contrib = (brdf_val[0] * u.light_color[i][0] * w,
                       brdf_val[1] * u.light_color[i][1] * w,
                       brdf_val[2] * u.light_color[i][2] * w)
            direct = V.add(direct, V.where(lit, contrib, V.zeros_like(contrib[0])))
        shaded = V.mul(throughput, direct)
        radiance = V.add(radiance, V.where(shade_lane, shaded, V.zeros_like(shaded[0])))

        # --- rim boost at the primary hit (webgl.js:1326-1331) ---
        if flags.rim_enabled and flags.material_mode == 0:
            ndv = jnp.maximum(V.dot(sn, v), 0.0)
            rim = jnp.power(1.0 - ndv, 3.0) * u.rim_boost
            rim_on = shade_lane & (bounce == 0)
            rim_add = V.scale(V.mul(throughput, base_color), rim)
            radiance = V.add(radiance, V.where(rim_on, rim_add, V.zeros_like(rim)))

        # --- env NEE with MIS (webgl.js:1334-1385) ---
        if flags.use_env:
            seed, env_dir, env_spdf = sample_env_direction_v3(env, seed)
            ndl_e = V.dot(sn, env_dir)
            candidate = shade_lane & (ndl_e > 0.0)
            noccl = noccl + jnp.sum(candidate.astype(jnp.int32))
            occluded = _any_hit(
                scene, flags, shadow_origin, env_dir, u.t_min, clip,
                active=candidate, divergent=True,
            )
            open_sky = candidate & ~occluded
            spec, f = _ggx_eval(sn, v, env_dir, rough, f0)
            diff = B.eval_diffuse_brdf_v3(sn, v, env_dir, base_color, diff_rough, wrap)
            diff = V.scale(diff, 1.0 - metallic)
            one_minus_f = (1.0 - f[0], 1.0 - f[1], 1.0 - f[2])
            brdf_val = V.add(spec, V.mul(diff, one_minus_f))
            env_rad = sample_env_radiance_v3(env, env_dir, u.env_intensity,
                                             u.env_max_luminance)
            spec_prob = B.spec_probability_v3(f0, base_color, metallic)
            pdf_b = B.brdf_pdf_v3(sn, v, env_dir, rough, spec_prob)
            mis = S.power_heuristic(env_spdf, pdf_b)
            w = jnp.maximum(ndl_e, 0.0) * mis / jnp.maximum(env_spdf, 1e-6)
            contrib = V.scale(V.mul(V.mul(throughput, brdf_val), env_rad), w)
            mx = V.max_component(contrib)
            cscale = jnp.where(mx > NEE_CLAMP, NEE_CLAMP / jnp.maximum(mx, 1e-12), 1.0)
            contrib = V.scale(contrib, cscale)
            radiance = V.add(radiance,
                             V.where(open_sky, contrib, V.zeros_like(contrib[0])))

        # --- BRDF sampling (webgl.js:1387-1429) ---
        spec_w = V.max_component(f0)
        diff_w = (1.0 - metallic) * V.max_component(base_color)
        wsum = spec_w + diff_w
        spec_prob = jnp.clip(
            jnp.where(wsum > 0.0, spec_w / jnp.maximum(wsum, 1e-12), 1.0), 0.0, 1.0)

        seed, r_lobe = rand(seed)
        seed, s1, s2 = rand2(seed)
        choose_spec = r_lobe < spec_prob

        h = S.ggx_half_vector_from_uv_v3(sn, rough, s1, s2)
        spec_dir = V.normalize(V.reflect(direction, h))
        ndl_s = jnp.maximum(V.dot(sn, spec_dir), 0.0)
        ndv = jnp.maximum(V.dot(sn, v), 0.001)
        ndh = jnp.maximum(V.dot(sn, h), 0.001)
        vdh = jnp.maximum(V.dot(v, h), 0.001)
        g = B.geometry_smith(ndv, ndl_s, rough)
        f = B.fresnel_schlick_v3(vdh, f0)
        spec_weight = V.scale(f, g * vdh / (ndv * ndh * jnp.maximum(spec_prob, 0.01)))
        d_ggx = B.distribution_ggx(ndh, rough)
        spec_last_pdf = spec_prob * d_ggx * ndh / (4.0 * vdh)

        diff_dir = S.cosine_hemisphere_from_uv_v3(sn, s1, s2)
        ndl_d = jnp.maximum(V.dot(sn, diff_dir), 0.0)
        diff_brdf = B.eval_diffuse_brdf_v3(sn, v, diff_dir, base_color, diff_rough, wrap)
        diff_weight = V.scale(diff_brdf,
                              (1.0 - metallic) * S.PI / jnp.maximum(1.0 - spec_prob, 0.01))
        diff_last_pdf = (1.0 - spec_prob) * ndl_d / S.PI

        new_dir = V.where(choose_spec, spec_dir, diff_dir)
        weight = V.where(choose_spec, spec_weight, diff_weight)
        dead_spec = choose_spec & (ndl_s <= 0.0)

        throughput = V.where(shade_lane, V.mul(throughput, weight), throughput)
        mx = V.max_component(throughput)
        tscale = jnp.where(mx > THROUGHPUT_CLAMP,
                           THROUGHPUT_CLAMP / jnp.maximum(mx, 1e-12), 1.0)
        throughput = V.scale(throughput, tscale)

        origin = V.where(shade_lane, V.add(pos, V.scale(n_geom, bias)), origin)
        direction = V.where(shade_lane, new_dir, direction)
        last_pdf = jnp.where(
            shade_lane, jnp.where(choose_spec, spec_last_pdf, diff_last_pdf), last_pdf)

        # --- Russian roulette from bounce 1 (webgl.js:1434-1441) ---
        seed2, rr = rand(seed)
        rr_active = bounce >= 1
        seed = jnp.where(rr_active, seed2, seed)
        p = jnp.clip(V.max_component(throughput), 0.05, 0.95)
        rr_kill = rr_active & shade_lane & (rr > p)
        rr_boost = jnp.where(rr_active & shade_lane, 1.0 / p, 1.0)
        throughput = V.scale(throughput, rr_boost)

        alive = transmit | (shade_lane & ~dead_spec & ~rr_kill)
        out = (seed, origin[0], origin[1], origin[2],
               direction[0], direction[1], direction[2],
               throughput[0], throughput[1], throughput[2],
               radiance[0], radiance[1], radiance[2],
               last_pdf, alive, nrays, noccl)
        if capture_shadow:
            return out, shadow_batch
        return out

    return bounce_body


def trace_paths(scene, env, vol, flags, u, origin0, dir0, seed0, with_stats=False,
                first_rec=None, first_attrs=None, alive0=None,
                capture_shadow=False):
    """Full path trace for a flat ray batch (component-form rays).

    origin0/dir0: component triples of [B]. `first_rec` optionally supplies
    a precomputed bounce-0 closest-hit record (the compaction path traces
    primaries for the full frame, partitions rays hit-first, then runs the
    rest of the transport on the compacted order); `first_attrs` its
    in-kernel attribute rows when the attrs path is live; `alive0` an
    initial liveness mask (the per-lane compaction path marks its padding
    lanes dead so they neither shade nor count in the ray stats). Returns
    (radiance triple, seed) or with stats (radiance, seed, (path_rays,
    occl_rays)): path_rays counts closest-hit extension segments (camera +
    bounces), occl_rays counts any-hit shadow/env-NEE candidate rays."""
    n = origin0[0].shape[0]
    use_attrs = (first_attrs is not None if first_rec is not None
                 else _use_attrs(scene, flags))
    bounce_body = _make_bounce_step(scene, env, vol, flags, u, n,
                                    capture_shadow=capture_shadow)

    ones = jnp.ones((n,), jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)
    carry = (
        seed0,
        origin0[0], origin0[1], origin0[2],
        dir0[0], dir0[1], dir0[2],
        ones, ones.copy(), ones.copy(),
        zeros, zeros.copy(), zeros.copy(),
        jnp.zeros((n,), jnp.float32),
        jnp.ones((n,), bool) if alive0 is None else alive0,
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    # Unrolled bounce loop; bounces past the first run under a whole-body
    # cond so a (screen-coherent) chunk whose rays all died skips them
    # entirely.
    batches = []
    for bounce in range(flags.max_bounces):
        if bounce == 0:
            carry = bounce_body(jnp.int32(0), carry, first_rec=first_rec,
                                first_attrs=first_attrs, use_attrs=use_attrs)
        else:
            zero_batch = (jax.tree_util.tree_map(jnp.zeros_like, batches[0])
                          if capture_shadow else None)
            dead = ((lambda c: (c, zero_batch)) if capture_shadow
                    else (lambda c: c))
            carry = jax.lax.cond(
                jnp.any(carry[14]),
                lambda c, b=bounce: bounce_body(
                    jnp.int32(b), c, static_bounce=b, first_rec=first_rec,
                    first_attrs=first_attrs, use_attrs=use_attrs),
                dead,
                carry,
            )
        if capture_shadow:
            carry, batch = carry
            batches.append(batch)
    radiance = V.min_with((carry[10], carry[11], carry[12]), RADIANCE_CLAMP)
    if capture_shadow:
        return radiance, carry[0], batches
    if with_stats:
        return radiance, carry[0], (carry[15], carry[16])
    return radiance, carry[0]


def generate_camera_rays(u, flags, px, py, frame_index, sample_index):
    """Pixel indices -> jittered primary rays + thin-lens DoF
    (webgl.js:1508-1544). Returns (seed, origin triple, dir triple)."""
    seed = init_seed(px, py, frame_index, sample_index)
    seed, jx = rand(seed)
    seed, jy = rand(seed)
    pixel_x = px.astype(jnp.float32) + 0.5 + (jx - 0.5)
    pixel_y = py.astype(jnp.float32) + 0.5 + (jy - 0.5)
    uvx = (pixel_x + 0.5) / u.resolution[0] * 2.0 - 1.0
    uvy = (pixel_y + 0.5) / u.resolution[1] * 2.0 - 1.0

    fwd = u.cam_forward
    right = u.cam_right
    up = u.cam_up
    direction = V.normalize((
        fwd[0] + uvx * right[0] + uvy * up[0],
        fwd[1] + uvx * right[1] + uvy * up[1],
        fwd[2] + uvx * right[2] + uvy * up[2],
    ))
    origin = (jnp.broadcast_to(u.cam_origin[0], px.shape),
              jnp.broadcast_to(u.cam_origin[1], px.shape),
              jnp.broadcast_to(u.cam_origin[2], px.shape))

    if flags.dof_enabled:
        fwd_n = u.cam_forward / jnp.linalg.norm(u.cam_forward)
        right_n = u.cam_right / jnp.linalg.norm(u.cam_right)
        up_n = u.cam_up / jnp.linalg.norm(u.cam_up)
        denom = jnp.maximum(
            direction[0] * fwd_n[0] + direction[1] * fwd_n[1] + direction[2] * fwd_n[2],
            1e-4)
        t_focus = u.dof_focus_distance / denom
        focus = V.add(origin, V.scale(direction, t_focus))
        seed, lens = S.sample_disk(seed)
        lx = lens[..., 0] * u.dof_aperture
        ly = lens[..., 1] * u.dof_aperture
        origin = (origin[0] + right_n[0] * lx + up_n[0] * ly,
                  origin[1] + right_n[1] * lx + up_n[1] * ly,
                  origin[2] + right_n[2] * lx + up_n[2] * ly)
        direction = V.normalize(V.sub(focus, origin))

    return seed, origin, direction


# Target rays per scan chunk. Each chunk runs cond-guarded bounces and
# traversals, so screen regions whose rays all die (pure background) cost
# one primary traversal and nothing else. Chunks follow the Renderer's
# 16x16-tile pixel order, so they are screen-coherent.
CHUNK_TARGET = 1 << 17


def _chunk_count(n: int) -> int:
    """Largest chunk count that keeps chunks >= CHUNK_TARGET rays, divides
    the batch exactly, and keeps each chunk a multiple of the tracer tile.
    WRT_CHUNKS overrides for tuning experiments."""
    import os

    from ..ops.wavefront import TILE

    force = os.environ.get("WRT_CHUNKS")
    if force:
        c = int(force)
        if c == 1 or (c > 1 and n % c == 0 and (n // c) % TILE == 0):
            return c
    if n < 2 * CHUNK_TARGET:
        return 1
    best = 1
    for chunks in range(2, 64):
        if n % chunks:
            continue
        size = n // chunks
        if size < CHUNK_TARGET or size % TILE:
            continue
        best = chunks
    return best


def _run_chunked(fn, n, *arrays):
    """Scan `fn` over equal chunks of the flat ray axis (identity when the
    batch is small or not divisible)."""
    chunks = _chunk_count(n)
    if chunks == 1:
        return fn(*arrays)
    size = n // chunks
    reshaped = [a.reshape((chunks, size) + a.shape[1:]) for a in arrays]
    out = jax.lax.map(lambda xs: fn(*xs), tuple(reshaped))
    return jax.tree_util.tree_map(
        lambda a: a.reshape((chunks * size,) + a.shape[2:]), out)


def _hit_first_permutation(hit):
    """O(n) stable partition permutation: hit lanes first, misses after.
    Returns (perm, inv_perm) index arrays."""
    n = hit.shape[0]
    hit_i = hit.astype(jnp.int32)
    n_hit = jnp.sum(hit_i)
    pos_hit = jnp.cumsum(hit_i) - 1
    pos_miss = n_hit + jnp.cumsum(1 - hit_i) - 1
    inv = jnp.where(hit, pos_hit, pos_miss)          # ray i -> sorted slot
    perm = jnp.zeros(n, jnp.int32).at[inv].set(jnp.arange(n, dtype=jnp.int32))
    return perm, inv


# Block-permutation granularity: rays move in contiguous blocks of this
# size (per-lane permutation gathers are the TPU's slow path). Raced on
# TPU v5e round 3 (tools/tune_knobs.py, 1000-sphere 1080p): 256 -> 129.3,
# 128 -> 123.4, 64 -> 121.3, 32 -> 116.5, 16 -> 118.4, 8 -> 123.5 ms/frame
# — finer blocks pack live lanes denser and the shorter gather rows stay
# cheap down to 32 lanes, below which sub-vreg row moves eat the gain.
_PERM_BLOCK = 32


def _tile_permutation(hit, g):
    """Block-granular stable partition: g-ray blocks containing any hit come
    first, all-miss blocks after. Returns ([T] perm, [T] inv) over blocks."""
    t = hit.shape[0] // g
    block_hit = jnp.any(hit.reshape(t, g), axis=1)
    hit_i = block_hit.astype(jnp.int32)
    n_hit = jnp.sum(hit_i)
    pos_hit = jnp.cumsum(hit_i) - 1
    pos_miss = n_hit + jnp.cumsum(1 - hit_i) - 1
    inv = jnp.where(block_hit, pos_hit, pos_miss)
    perm = jnp.zeros(t, jnp.int32).at[inv].set(jnp.arange(t, dtype=jnp.int32))
    return perm, inv


# Cluster count from which the compacted transport beats the block
# permutation. Raced on TPU v5e (tools/bench_compact.py, 1080p, round 3):
# at K=10 (1000 spheres) compact LOSES everywhere (best 117.2 vs 112.7 ms
# permuted at _PERM_BLOCK=32 — with cheap sweeps the pack/expand moves
# exceed the occupancy win); at K=127 (10000 spheres) it wins 1.15x
# (389.6 vs 447.9 ms) because each dense block replaces several
# quarter-occupied expensive union sweeps. Same shape as the per-ray
# routing threshold (pallas_trace.PERRAY_MIN_CLUSTERS) and for the same
# reason: the payoff scales with per-sweep cost.
COMPACT_MIN_CLUSTERS = 64


def _use_compact(scene, flags, n) -> bool:
    """Route the post-primary transport through per-lane live-ray
    compaction (render/compact.py): pack the primary-hit lanes densely
    into a capped buffer so secondary traces, the 3-light shadow batch,
    env NEE, and shading all run at ~100% lane occupancy instead of the
    block permutation's 10-25%. Auto-enabled on cluster-rich scenes
    (>= COMPACT_MIN_CLUSTERS, where sweeps are expensive enough to pay
    for the pack/expand moves). WRT_COMPACT=1 forces on, =0 forces off
    (A/B against the block-permutation path); WRT_COMPACT_CAP_DIV tunes
    the cap (n/div). Volume frames keep the permuted path: the bounce-0
    march must run on miss lanes too, which the compact buffer excludes
    by design."""
    import os

    env = os.environ.get("WRT_COMPACT")
    if env == "0":
        return False
    if flags.distributed or flags.volume_enabled:
        return False
    if flags.tracer != "wavefront" or not flags.use_bvh:
        return False
    if n % 1024 != 0:
        return False
    return env == "1" or scene.num_clusters >= COMPACT_MIN_CLUSTERS


def _compacted_transport(scene, env, vol, flags, u, seed, origin, direction,
                         rec0, clip, with_stats, fallback_fn):
    """Dense post-primary transport: bounce-0 miss radiance is computed
    full-width in pixel order (throughput = 1, MIS weight 1 — exactly
    webgl.js:1223-1235 at bounce 0), the hit lanes are packed into a
    [cap] buffer (one [cap, 16] row gather), the bounce loop runs as a
    chunk scan over the dense buffer (all-dead padding chunks skip via
    cond), and the accumulated radiance is expanded back to pixel order
    with the window-gather + one-hot-MXU move. Falls back to the
    block-permutation transport via lax.cond when the frame's live count
    exceeds the cap (close-up scenes covering > 1/div of the screen) —
    both branches compile, one executes."""
    import os

    from ..ops.wavefront import _finalize_hit
    from . import compact as CP

    n = origin[0].shape[0]
    hit = rec0.prim_slot >= 0
    n_live = jnp.sum(hit.astype(jnp.int32))
    div = int(os.environ.get("WRT_COMPACT_CAP_DIV") or 8)
    cap, csize = CP.compact_cap(n, div)

    def dense(_):
        amb = V.splat(u.ambient_color)
        env_contrib = V.scale(amb, u.ambient_intensity)
        env_contrib = tuple(jnp.broadcast_to(c, (n,)) for c in env_contrib)
        if flags.use_env:
            env_contrib = V.add(env_contrib, sample_env_radiance_v3(
                env, direction, u.env_intensity, u.env_max_luminance))
        miss_rad = V.where(~hit, env_contrib, V.zeros_like(env_contrib[0]))
        miss_rad = V.min_with(miss_rad, RADIANCE_CLAMP)

        idx = CP.live_first_index(hit, cap)
        packed = CP.pack_rows([seed] + list(origin) + list(direction)
                              + [rec0.t, rec0.prim_slot])
        rows = CP.gather_rows(packed, idx)
        alive0 = jnp.arange(cap, dtype=jnp.int32) < n_live

        def chunk_fn(args):
            rows_k, alive_k = args

            def body(_):
                seed_k = jax.lax.bitcast_convert_type(rows_k[:, 0],
                                                      jnp.uint32)
                o3k = (rows_k[:, 1], rows_k[:, 2], rows_k[:, 3])
                d3k = (rows_k[:, 4], rows_k[:, 5], rows_k[:, 6])
                t_k = rows_k[:, 7]
                slot_k = jax.lax.bitcast_convert_type(rows_k[:, 8],
                                                      jnp.int32)
                slot_k = jnp.where(alive_k, slot_k, -1)
                tmin_k = jnp.broadcast_to(u.t_min, (csize,)).astype(
                    jnp.float32)
                rec_k = _finalize_hit(scene, o3k, d3k, tmin_k, clip, t_k,
                                      slot_k, cost=jnp.zeros_like(slot_k),
                                      refine_sphere_t=True)
                out = trace_paths(scene, env, vol, flags, u, o3k, d3k,
                                  seed_k, with_stats=with_stats,
                                  first_rec=rec_k, alive0=alive_k)
                if with_stats:
                    return V.to_array(out[0]), out[2]
                return V.to_array(out[0])

            def dead(_):
                zc = jnp.zeros((csize, 3), jnp.float32)
                if with_stats:
                    z = jnp.zeros((), jnp.int32)
                    return zc, (z, z.copy())
                return zc

            return jax.lax.cond(jnp.any(alive_k), body, dead, None)

        out = jax.lax.map(chunk_fn, (rows.reshape(cap // csize, csize, 16),
                                     alive0.reshape(cap // csize, csize)))
        colors = out[0] if with_stats else out
        rad_c = V.from_array(colors.reshape(cap, 3))
        exp = CP.expand_triple(rad_c, hit)
        radiance = V.add(miss_rad, exp)
        if with_stats:
            npath, noccl = jax.tree_util.tree_map(jnp.sum, out[1])
            # trace_paths counted n_live camera rays (its alive0 lanes);
            # the miss lanes' camera rays happened in the full-width
            # primary trace.
            return radiance, (npath + (n - n_live), noccl)
        return radiance

    def fallback(_):
        out = fallback_fn()
        if with_stats:
            return out[0], out[2]
        return out[0]

    out = jax.lax.cond(n_live <= cap, dense, fallback, None)
    if with_stats:
        return out[0], seed, out[1]
    return out, seed


def _use_wavefront(scene, flags, n) -> bool:
    """Route the post-primary transport through the bounce-major dense
    wavefront (_wavefront_transport): per-bounce live-ray re-compaction
    keeps every traversal/shading launch at ~100% lane occupancy for the
    WHOLE bounce loop, not just bounce 0. WRT_WAVEFRONT=1 forces on,
    =0 forces off (A/B against the compact/permuted paths). Same
    structural exclusions as _use_compact.

    Auto-routing (measured, TPU v5e 1080p, tools/bench_wavefront.py
    subprocess race): same cluster-count criterion as the single-pack
    compact path, and it beats that path where both qualify — 10k
    spheres (K=127): permuted 447.3, compact 393.2, wavefront 363.4
    ms/frame (repacks=all bounces; repacks=1 regresses to 426-430).
    1k spheres (K=10): wavefront 154-167 vs permuted 111.3 — cheap
    [1024,128] union sweeps don't repay per-bounce repacking, so low-K
    scenes keep the block permutation."""
    import os

    env = os.environ.get("WRT_WAVEFRONT")
    if env == "0":
        return False
    if flags.distributed or flags.volume_enabled:
        return False
    if flags.tracer != "wavefront" or not flags.use_bvh:
        return False
    if n % 1024 != 0 or flags.max_bounces < 1:
        return False
    return env == "1" or scene.num_clusters >= COMPACT_MIN_CLUSTERS


def _wavefront_transport(scene, env, vol, flags, u, seed, origin, direction,
                         rec0, clip, with_stats, fallback_fn):
    """Bounce-major dense transport with PER-BOUNCE live-ray re-compaction.

    The compacted transport (_compacted_transport) packs hit lanes once
    and then runs the whole unrolled bounce loop over the dense buffer —
    occupancy decays back to 10-25% by bounce 2 as rays die in place.
    This transport instead runs ONE bounce at a time over a dense buffer
    and re-packs the survivors between bounces, so every closest trace,
    3-light shadow batch, env-NEE trace, and shading stage runs at ~100%
    lane occupancy (the work-proportional counterpart of the reference's
    per-pixel loop termination, webgl.js:1173-1186 — on a lock-step
    vector machine, re-compaction replaces per-lane exit).

    Movement plan (all primitives measured on TPU v5e,
    tools/compact_cost.py):
      - bounce-0 pack: argsort live-first + ONE [cap, 16] row gather
        (shared with the compact path);
      - radiance never moves or scatters: each bounce's delta (radiance
        starts at zero per bounce) is DEPOSITED into a fixed buffer held
        in bounce-0 packed order via the monotone window + one-hot MXU
        expand (compact.expand_cols) — valid because stable re-packs
        preserve the relative (= packed-0) order of surviving lanes;
      - the packed-0 alive mask updates by expanding the survivor flags
        (one bool column) through the same move;
      - survivor rows (seed, o, d, throughput, pdf — 11 columns) re-pack
        with argsort + one [cap, 16] row gather per bounce.

    Reassociating the radiance sum (per-bounce deposits instead of one
    running carry) changes results by f32 ulps only — RNG decisions
    never read radiance, so no decision flips; tests compare at 1e-5."""
    import os

    from ..ops.wavefront import _finalize_hit
    from . import compact as CP

    n = origin[0].shape[0]
    hit = rec0.prim_slot >= 0
    n_live = jnp.sum(hit.astype(jnp.int32))
    div = int(os.environ.get("WRT_WF_CAP_DIV") or 8)
    cap, _ = CP.compact_cap(n, div)
    # Re-pack at bounce ends < this bound (tuning knob; repacking costs
    # one row gather ~4 ms at cap=n/8, so late near-empty bounces may
    # not repay it).
    repack_below = int(os.environ.get("WRT_WF_REPACKS", str(flags.max_bounces)))

    def dense(_):
        amb = V.splat(u.ambient_color)
        env_contrib = V.scale(amb, u.ambient_intensity)
        env_contrib = tuple(jnp.broadcast_to(c, (n,)) for c in env_contrib)
        if flags.use_env:
            env_contrib = V.add(env_contrib, sample_env_radiance_v3(
                env, direction, u.env_intensity, u.env_max_luminance))
        miss_rad = V.where(~hit, env_contrib, V.zeros_like(env_contrib[0]))
        miss_rad = V.min_with(miss_rad, RADIANCE_CLAMP)

        idx = CP.live_first_index(hit, cap)
        packed = CP.pack_rows([seed] + list(origin) + list(direction)
                              + [rec0.t, rec0.prim_slot])
        rows = CP.gather_rows(packed, idx)
        lanes = jnp.arange(cap, dtype=jnp.int32)
        alive_prefix = lanes < n_live

        seed_k = jax.lax.bitcast_convert_type(rows[:, 0], jnp.uint32)
        o3k = (rows[:, 1], rows[:, 2], rows[:, 3])
        d3k = (rows[:, 4], rows[:, 5], rows[:, 6])
        t_k = rows[:, 7]
        slot_k = jnp.where(alive_prefix,
                           jax.lax.bitcast_convert_type(rows[:, 8], jnp.int32),
                           -1)
        tmin_k = jnp.broadcast_to(u.t_min, (cap,)).astype(jnp.float32)
        rec_k = _finalize_hit(scene, o3k, d3k, tmin_k, clip, t_k, slot_k,
                              cost=jnp.zeros_like(slot_k),
                              refine_sphere_t=True)

        step = _make_bounce_step(scene, env, vol, flags, u, cap)
        ones_c = jnp.ones((cap,), jnp.float32)
        zeros_c = jnp.zeros((cap,), jnp.float32)
        carry = (seed_k, o3k[0], o3k[1], o3k[2], d3k[0], d3k[1], d3k[2],
                 ones_c, ones_c.copy(), ones_c.copy(),
                 zeros_c, zeros_c.copy(), zeros_c.copy(),
                 jnp.zeros((cap,), jnp.float32), alive_prefix,
                 jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

        grave = (zeros_c.copy(), zeros_c.copy(), zeros_c.copy())
        alive0 = alive_prefix          # [cap] bool, bounce-0 packed order

        for b in range(flags.max_bounces):
            if b == 0:
                carry = step(jnp.int32(0), carry, first_rec=rec_k)
            else:
                carry = jax.lax.cond(
                    jnp.any(carry[14]),
                    lambda c, b=b: step(jnp.int32(b), c, static_bounce=b),
                    lambda c: c, carry)
            # Deposit this bounce's radiance delta (entry-live lanes are
            # the dense prefix, in packed-0 relative order).
            dep = CP.expand_cols((carry[10], carry[11], carry[12]), alive0)
            grave = V.add(grave, dep)
            if b < flags.max_bounces - 1:
                alive_cur = carry[14]
                if b < repack_below:
                    # alive0 maps buffer rows -> grave rows and is only
                    # valid to update when the buffer is re-packed; when
                    # we stop re-packing, dead lanes stay in place with
                    # zero radiance deltas, so the stale (superset) map
                    # keeps depositing correctly.
                    surv = CP.expand_cols(
                        (alive_cur.astype(jnp.float32),), alive0)[0]
                    alive0 = alive0 & (surv > 0.5)
                    ridx = CP.live_first_index(alive_cur, cap)
                    packed_b = CP.pack_rows([
                        carry[0], carry[1], carry[2], carry[3],
                        carry[4], carry[5], carry[6],
                        carry[7], carry[8], carry[9], carry[13]])
                    rows_b = CP.gather_rows(packed_b, ridx)
                    n_live_b = jnp.sum(alive_cur.astype(jnp.int32))
                    carry = (
                        jax.lax.bitcast_convert_type(rows_b[:, 0],
                                                     jnp.uint32),
                        rows_b[:, 1], rows_b[:, 2], rows_b[:, 3],
                        rows_b[:, 4], rows_b[:, 5], rows_b[:, 6],
                        rows_b[:, 7], rows_b[:, 8], rows_b[:, 9],
                        zeros_c, zeros_c.copy(), zeros_c.copy(),
                        rows_b[:, 10], lanes < n_live_b,
                        carry[15], carry[16])
                else:
                    carry = carry[:10] + (zeros_c, zeros_c.copy(),
                                          zeros_c.copy()) + carry[13:]

        grave_clamped = V.min_with(grave, RADIANCE_CLAMP)
        radiance = V.add(miss_rad, CP.expand_cols(grave_clamped, hit))
        if with_stats:
            return radiance, (carry[15] + (n - n_live), carry[16])
        return radiance

    def fallback(_):
        out = fallback_fn()
        if with_stats:
            return out[0], out[2]
        return out[0]

    out = jax.lax.cond(n_live <= cap, dense, fallback, None)
    if with_stats:
        return out[0], seed, out[1]
    return out, seed


def _use_binned(scene, flags, n) -> bool:
    """Route the post-primary transport through the BINNED wavefront
    (_binned_transport): per-bounce re-packs ordered by a coherence key
    (origin Morton cell x direction octant, compact.bin_key) instead of
    bare live-first order. Rays sharing a key traverse near-identical
    cluster sets, so every 1024-ray trace block's front-to-back cluster
    union shrinks toward the per-ray chain length — the frame-level
    fix for the block kernels' 8-70x tests/ray overshoot on secondary
    and shadow rays (PROFILE_r03.json; VERDICT r04 item 1b).
    WRT_BINNED=1 forces on, =0 forces off; auto = ON wherever the Pallas
    wavefront runs — raced on TPU v5e round 5 (tools/race_frame.py,
    RACE_binned_*.json): 1k spheres 51.0 vs 101.4 ms permuted (2.0x, the
    transport the round-4 build shipped), 10k spheres vs the wavefront
    transport in RACE_binned_10k.json."""
    import os

    env = os.environ.get("WRT_BINNED")
    if env == "0":
        return False
    if flags.distributed or flags.volume_enabled:
        return False
    if flags.tracer != "wavefront" or not flags.use_bvh:
        return False
    if n % 1024 != 0 or flags.max_bounces < 1:
        return False
    if env == "1":
        return True
    from ..ops.wavefront import _pallas_auto

    return _pallas_auto(scene, None, True)


def _binned_transport(scene, env, vol, flags, u, seed, origin, direction,
                      rec0, clip, with_stats, fallback_fn):
    """Coherence-binned dense transport (VERDICT r04 item 1b).

    Differences from _wavefront_transport, each removing a cost or adding
    coherence:

      - Re-packs PERMUTE THE WHOLE CAP BUFFER (live rows sorted by
        compact.bin_key to the front, dead rows ride in the suffix)
        instead of gathering live rows only. Nothing is dropped, so
        radiance needs no per-bounce deposit/expand: it rides in the
        buffer (columns 11-13) through every re-pack.
      - A `home` column (14) carries each row's bounce-0 packed slot;
        after the last bounce ONE inverse-permutation gather returns the
        radiance to packed-0 (monotone live-first) order, and the same
        windowed MXU expand as the other dense paths returns it to pixel
        order. Per-bounce expand_cols deposits (2 moves x bounces) are
        replaced by one argsort + one [cap, 4] gather total.
      - Secondary traces AND the per-bounce 3-light shadow fan + env-NEE
        launches all run in binned order: blocks see rays from one
        spatial cell (and, for secondaries, one direction octant), so the
        block-union sweep count approaches the per-ray chain length that
        the per-ray kernels measure (169 vs 1278 tests/ray at 1k spheres).

    The estimator is unchanged: re-packing permutes lanes between
    bounces, and every per-lane quantity (RNG seed, throughput, pdf,
    radiance) moves with its lane. Results match the unbinned paths to
    fp reassociation of the radiance sum (tests/test_binned.py).

    Knobs: WRT_BIN_CELLS (log2 cells/axis, default 3), WRT_BIN_KEY
    (cell_oct | oct_cell | cell | oct), WRT_BIN_REPACKS (re-packs happen
    at bounce ends < this; default all), WRT_WF_CAP_DIV (cap = n/div,
    shared with the wavefront path), WRT_BIN_CHUNK (bounce-scan chunk
    over the cap buffer; all-dead suffix chunks skip the bounce)."""
    import os

    from ..ops.wavefront import _finalize_hit
    from . import compact as CP

    n = origin[0].shape[0]
    hit = rec0.prim_slot >= 0
    n_live = jnp.sum(hit.astype(jnp.int32))
    # Raced defaults (TPU v5e round 5, RACE_binned_div_1k.json /
    # RACE_binned_fine_1k.json): cap = n/16 raced best at 1k spheres
    # (n/8 measured 113 vs 64 ms; bigger caps widen every dense stage),
    # but the PRODUCTION default is n/12 — the 10k scene's 8.2% hit
    # fraction (~170k live at 1080p) overflows an n/16 cap and would
    # route every frame through the fallback. Scenes with a known hit
    # fraction (bench legs) pin WRT_BIN_CAP_DIV per scene. The lax.cond
    # fallback keeps high-hit-fraction frames correct either way.
    div = int(os.environ.get("WRT_BIN_CAP_DIV")
              or os.environ.get("WRT_WF_CAP_DIV") or 12)
    cap, _ = CP.compact_cap(n, div)
    repack_below = int(os.environ.get("WRT_BIN_REPACKS",
                                      str(flags.max_bounces)))
    cells_log2 = int(os.environ.get("WRT_BIN_CELLS") or 3)
    key_mode = os.environ.get("WRT_BIN_KEY") or "oct_cell"

    def dense(_):
        amb = V.splat(u.ambient_color)
        env_contrib = V.scale(amb, u.ambient_intensity)
        env_contrib = tuple(jnp.broadcast_to(c, (n,)) for c in env_contrib)
        if flags.use_env:
            env_contrib = V.add(env_contrib, sample_env_radiance_v3(
                env, direction, u.env_intensity, u.env_max_luminance))
        miss_rad = V.where(~hit, env_contrib, V.zeros_like(env_contrib[0]))
        miss_rad = V.min_with(miss_rad, RADIANCE_CLAMP)

        # Scene AABB for the spatial key (cluster padding AABBs are
        # inverted — +BIG/-BIG — so the min/max reductions ignore them).
        lo = jnp.min(scene.cluster_bmin, axis=0)
        hi = jnp.max(scene.cluster_bmax, axis=0)
        inv_extent = 1.0 / jnp.maximum(hi - lo, 1e-6)

        # Bounce-0 pack: stable live-first (monotone — the final expand
        # to pixel order relies on it). Primary hits are screen-coherent
        # already; binning starts at the first re-pack, where directions
        # are BRDF samples.
        idx = CP.live_first_index(hit, cap)
        packed = CP.pack_rows([seed] + list(origin) + list(direction)
                              + [rec0.t, rec0.prim_slot])
        rows = CP.gather_rows(packed, idx)
        lanes = jnp.arange(cap, dtype=jnp.int32)
        alive = lanes < n_live

        seed_k = jax.lax.bitcast_convert_type(rows[:, 0], jnp.uint32)
        o3k = (rows[:, 1], rows[:, 2], rows[:, 3])
        d3k = (rows[:, 4], rows[:, 5], rows[:, 6])
        t_k = rows[:, 7]
        slot_k = jnp.where(alive,
                           jax.lax.bitcast_convert_type(rows[:, 8], jnp.int32),
                           -1)
        tmin_k = jnp.broadcast_to(u.t_min, (cap,)).astype(jnp.float32)
        rec_k = _finalize_hit(scene, o3k, d3k, tmin_k, clip, t_k, slot_k,
                              cost=jnp.zeros_like(slot_k),
                              refine_sphere_t=True)

        # Bounce steps run as a CHUNKED scan over the cap buffer: live
        # lanes are a dense prefix after every re-pack, so all-dead
        # suffix chunks skip the whole bounce (trace AND shading) via the
        # step's own any(alive) conds — localized per chunk instead of
        # evaluated over the full cap. WRT_BIN_CHUNK tunes the chunk; it
        # divides cap by construction (compact_cap rounds to chunks).
        csize = min(int(os.environ.get("WRT_BIN_CHUNK")
                        or os.environ.get("WRT_COMPACT_CHUNK") or 32768),
                    cap)
        nchunks = cap // csize if cap % csize == 0 else 1
        csize = cap // nchunks
        step = _make_bounce_step(scene, env, vol, flags, u, csize)

        ones_c = jnp.ones((cap,), jnp.float32)
        zeros_c = jnp.zeros((cap,), jnp.float32)
        carry = (seed_k, o3k[0], o3k[1], o3k[2], d3k[0], d3k[1], d3k[2],
                 ones_c, ones_c.copy(), ones_c.copy(),
                 zeros_c, zeros_c.copy(), zeros_c.copy(),
                 jnp.zeros((cap,), jnp.float32), alive,
                 jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        home = lanes

        def run_bounce(b, carry, rec=None):
            arrays, nr, no = carry[:15], carry[15], carry[16]
            resh = tuple(a.reshape(nchunks, csize) for a in arrays)
            xs = resh if rec is None else (
                resh, jax.tree_util.tree_map(
                    lambda a: a.reshape((nchunks, csize) + a.shape[1:]),
                    rec))

            def chunk_fn(args):
                ar, rec_c = (args, None) if rec is None else args
                c = tuple(ar) + (jnp.zeros((), jnp.int32),
                                 jnp.zeros((), jnp.int32))
                out = step(jnp.int32(b), c, static_bounce=b,
                           first_rec=rec_c)
                return out[:15], (out[15], out[16])

            outs, deltas = jax.lax.map(chunk_fn, xs)
            arrays = tuple(a.reshape(cap) for a in outs)
            return arrays + (nr + jnp.sum(deltas[0]),
                             no + jnp.sum(deltas[1]))

        for b in range(flags.max_bounces):
            if b == 0:
                carry = run_bounce(0, carry, rec=rec_k)
            else:
                carry = jax.lax.cond(
                    jnp.any(carry[14]),
                    lambda c, b=b: run_bounce(b, c),
                    lambda c: c, carry)
            if b < flags.max_bounces - 1 and b < repack_below:
                alive_cur = carry[14]
                key = CP.bin_key((carry[1], carry[2], carry[3]),
                                 (carry[4], carry[5], carry[6]),
                                 lo, inv_extent, cells_log2, key_mode)
                key = jnp.where(alive_cur, key, jnp.int32(1) << 28)
                order = jnp.argsort(key, stable=True)
                packed_b = CP.pack_rows([
                    carry[0], carry[1], carry[2], carry[3],
                    carry[4], carry[5], carry[6],
                    carry[7], carry[8], carry[9], carry[13],
                    carry[10], carry[11], carry[12], home])
                rows_b = CP.gather_rows_perm(packed_b, order)
                n_live_b = jnp.sum(alive_cur.astype(jnp.int32))
                carry = (
                    jax.lax.bitcast_convert_type(rows_b[:, 0], jnp.uint32),
                    rows_b[:, 1], rows_b[:, 2], rows_b[:, 3],
                    rows_b[:, 4], rows_b[:, 5], rows_b[:, 6],
                    rows_b[:, 7], rows_b[:, 8], rows_b[:, 9],
                    rows_b[:, 11], rows_b[:, 12], rows_b[:, 13],
                    rows_b[:, 10], lanes < n_live_b,
                    carry[15], carry[16])
                home = jax.lax.bitcast_convert_type(rows_b[:, 14], jnp.int32)

        # ONE inverse move: binned order -> packed-0 order, then the
        # monotone window expand to pixel order.
        back = jnp.argsort(home, stable=True)
        rad_rows = jnp.stack([carry[10], carry[11], carry[12],
                              jnp.zeros_like(carry[10])], axis=1)
        rad0 = CP.gather_rows_perm(rad_rows, back)
        rad_c = V.min_with((rad0[:, 0], rad0[:, 1], rad0[:, 2]),
                           RADIANCE_CLAMP)
        radiance = V.add(miss_rad, CP.expand_cols(rad_c, hit))
        if with_stats:
            return radiance, (carry[15] + (n - n_live), carry[16])
        return radiance

    def fallback(_):
        out = fallback_fn()
        if with_stats:
            return out[0], out[2]
        return out[0]

    out = jax.lax.cond(n_live <= cap, dense, fallback, None)
    if with_stats:
        return out[0], seed, out[1]
    return out, seed


def _binned_b0perm_transport(scene, env, vol, flags, u, seed, origin,
                             direction, rec0, clip, with_stats, fallback_fn):
    """Binned transport, bounce-0-permuted variant (WRT_BIN_B0=permuted;
    raced against the all-dense variant and LOST — RACE_binned_b0_1k.json,
    80.6 vs 62.7 ms at 1k spheres — kept as an A/B knob).

    The all-dense _binned_transport pays ~13 ms of pack/finalize/expand
    movement before bounce 0 ever shades, yet bounce 0 needs no
    coherence help: primary hits are screen-coherent and the proven
    block-permutation chunk scan shades them for ~12 ms. So this variant
    runs bounce 0 EXACTLY like the permuted path (one bounce of the
    chunk scan), then packs only the bounce-0 SURVIVORS — whose next
    rays are the divergent ones — straight from permuted order into the
    binned buffer (key = origin cell x direction octant of the sampled
    bounce-1 ray) and runs bounces 1+ dense and re-binned per bounce.

    Radiance: bounce-0 radiance stays full-width (un-permuted with the
    3-array block gather the permuted path already pays); the binned
    buffer's radiance starts at ZERO and accumulates bounces 1+ in-lane,
    coming back to pixel order through one argsort(home)+row-gather plus
    the monotone window expand against the bounce-0 survivor mask.
    Per-lane streams are untouched — frames are bit-identical to the
    permuted path (tests/test_compact.py)."""
    import os

    from ..ops.wavefront import _finalize_hit
    from . import compact as CP

    n = origin[0].shape[0]
    div = int(os.environ.get("WRT_BIN_CAP_DIV")
              or os.environ.get("WRT_WF_CAP_DIV") or 16)
    cap, _ = CP.compact_cap(n, div)
    repack_below = int(os.environ.get("WRT_BIN_REPACKS",
                                      str(flags.max_bounces)))
    cells_log2 = int(os.environ.get("WRT_BIN_CELLS") or 3)
    key_mode = os.environ.get("WRT_BIN_KEY") or "oct_cell"
    csize = min(int(os.environ.get("WRT_BIN_CHUNK") or 32768), cap)
    nchunks = cap // csize if cap % csize == 0 else 1
    csize = cap // nchunks

    # --- bounce 0: the permuted path's machinery, one bounce only ---
    hit = rec0.prim_slot >= 0
    blk = int(os.environ.get("WRT_PERM_G") or _PERM_BLOCK)
    chunks = _chunk_count(n)
    size = n // chunks
    g = blk if (n % blk == 0 and size % blk == 0) else 1
    if g > 1:
        perm, inv = _tile_permutation(hit, g)
        gatherb = lambda a: a.reshape(n // g, g)[perm].reshape(n)
        unpermb = lambda a: a.reshape(n // g, g)[inv].reshape(n)
    else:
        perm, inv = _hit_first_permutation(hit)
        gatherb = lambda a: a[perm]
        unpermb = lambda a: a[inv]

    lane_ids = jnp.arange(n, dtype=jnp.int32)
    state = tuple(gatherb(a) for a in
                  (seed,) + origin + direction + (rec0.t, rec0.prim_slot,
                                                  lane_ids))
    state = tuple(a.reshape(chunks, size) for a in state)
    step0 = _make_bounce_step(scene, env, vol, flags, u, size)

    def b0_chunk(args):
        seed_c = args[0]
        o3c, d3c = args[1:4], args[4:7]
        t_c, slot_c = args[7], args[8]
        tmin_c = jnp.broadcast_to(u.t_min, (size,)).astype(jnp.float32)
        rec_c = _finalize_hit(scene, o3c, d3c, tmin_c, clip, t_c, slot_c,
                              cost=jnp.zeros_like(slot_c),
                              refine_sphere_t=True)
        ones_s = jnp.ones((size,), jnp.float32)
        zeros_s = jnp.zeros((size,), jnp.float32)
        carry0 = (seed_c, o3c[0], o3c[1], o3c[2], d3c[0], d3c[1], d3c[2],
                  ones_s, ones_s.copy(), ones_s.copy(),
                  zeros_s, zeros_s.copy(), zeros_s.copy(),
                  jnp.zeros((size,), jnp.float32),
                  jnp.ones((size,), bool),
                  jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        out = step0(jnp.int32(0), carry0, first_rec=rec_c)
        return out[:15] + (args[9],), (out[15], out[16])

    outs, scal = jax.lax.map(b0_chunk, state)
    outs = tuple(a.reshape(n) for a in outs)
    nrays = jnp.sum(scal[0])
    noccl = jnp.sum(scal[1])
    alive_p = outs[14]                        # [n] bool, permuted order
    home_p = outs[15]                         # [n] i32 pixel lane ids
    rad_b0 = tuple(unpermb(outs[c]) for c in (10, 11, 12))
    alive_pix = unpermb(alive_p)              # survivor mask, pixel order
    n_live = jnp.sum(alive_p.astype(jnp.int32))

    if flags.max_bounces == 1:
        radiance = V.min_with(rad_b0, RADIANCE_CLAMP)
        if with_stats:
            return radiance, seed, (nrays, noccl)
        return radiance, seed

    # Survivors' radiance CONTINUES in-lane inside the binned buffer (their
    # bounce-0 partials ride in the pack), so the per-lane accumulation
    # order is exactly the permuted path's — bit-identical frames. The
    # full-width rad_b0 contributes only lanes that died at bounce 0.
    rad_b0 = V.where(alive_pix, V.zeros_like(rad_b0[0]), rad_b0)

    def dense(_):
        # Scene AABB for the spatial key (padding AABBs are inverted).
        lo = jnp.min(scene.cluster_bmin, axis=0)
        hi = jnp.max(scene.cluster_bmax, axis=0)
        inv_extent = 1.0 / jnp.maximum(hi - lo, 1e-6)

        key = CP.bin_key((outs[1], outs[2], outs[3]),
                         (outs[4], outs[5], outs[6]),
                         lo, inv_extent, cells_log2, key_mode)
        key = jnp.where(alive_p, key, jnp.int32(1) << 28)
        idxk = jnp.argsort(key, stable=True)[:cap]
        home_col = jnp.where(alive_p, home_p, n)   # sentinel: sort-last
        packed = CP.pack_rows([outs[0], outs[1], outs[2], outs[3],
                               outs[4], outs[5], outs[6],
                               outs[7], outs[8], outs[9], outs[13],
                               outs[10], outs[11], outs[12],
                               home_col])
        rows = CP.gather_rows_perm(packed, idxk)
        lanes = jnp.arange(cap, dtype=jnp.int32)
        alive0c = lanes < n_live
        zmask = alive0c.astype(jnp.float32)    # padding rows: zero radiance
        carry = (jax.lax.bitcast_convert_type(rows[:, 0], jnp.uint32),
                 rows[:, 1], rows[:, 2], rows[:, 3],
                 rows[:, 4], rows[:, 5], rows[:, 6],
                 rows[:, 7], rows[:, 8], rows[:, 9],
                 rows[:, 11] * zmask, rows[:, 12] * zmask,
                 rows[:, 13] * zmask,
                 rows[:, 10], alive0c,
                 jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        home = jax.lax.bitcast_convert_type(rows[:, 14], jnp.int32)

        step = _make_bounce_step(scene, env, vol, flags, u, csize)

        def run_bounce(b, carry):
            arrays, nr, no = carry[:15], carry[15], carry[16]
            resh = tuple(a.reshape(nchunks, csize) for a in arrays)

            def chunk_fn(ar):
                c = tuple(ar) + (jnp.zeros((), jnp.int32),
                                 jnp.zeros((), jnp.int32))
                out = step(jnp.int32(b), c, static_bounce=b)
                return out[:15], (out[15], out[16])

            chk, deltas = jax.lax.map(chunk_fn, resh)
            arrays = tuple(a.reshape(cap) for a in chk)
            return arrays + (nr + jnp.sum(deltas[0]),
                             no + jnp.sum(deltas[1]))

        hm = home
        for b in range(1, flags.max_bounces):
            carry = jax.lax.cond(
                jnp.any(carry[14]),
                lambda c, b=b: run_bounce(b, c),
                lambda c: c, carry)
            if b < flags.max_bounces - 1 and b < repack_below:
                alive_cur = carry[14]
                k2 = CP.bin_key((carry[1], carry[2], carry[3]),
                                (carry[4], carry[5], carry[6]),
                                lo, inv_extent, cells_log2, key_mode)
                k2 = jnp.where(alive_cur, k2, jnp.int32(1) << 28)
                order = jnp.argsort(k2, stable=True)
                packed_b = CP.pack_rows([
                    carry[0], carry[1], carry[2], carry[3],
                    carry[4], carry[5], carry[6],
                    carry[7], carry[8], carry[9], carry[13],
                    carry[10], carry[11], carry[12], hm])
                rows_b = CP.gather_rows_perm(packed_b, order)
                n_live_b = jnp.sum(alive_cur.astype(jnp.int32))
                carry = (
                    jax.lax.bitcast_convert_type(rows_b[:, 0], jnp.uint32),
                    rows_b[:, 1], rows_b[:, 2], rows_b[:, 3],
                    rows_b[:, 4], rows_b[:, 5], rows_b[:, 6],
                    rows_b[:, 7], rows_b[:, 8], rows_b[:, 9],
                    rows_b[:, 11], rows_b[:, 12], rows_b[:, 13],
                    rows_b[:, 10], lanes < n_live_b,
                    carry[15], carry[16])
                hm = jax.lax.bitcast_convert_type(rows_b[:, 14], jnp.int32)

        back = jnp.argsort(hm, stable=True)
        rad_rows = jnp.stack([carry[10], carry[11], carry[12],
                              jnp.zeros_like(carry[10])], axis=1)
        rad0 = CP.gather_rows_perm(rad_rows, back)
        tail = CP.expand_cols((rad0[:, 0], rad0[:, 1], rad0[:, 2]),
                              alive_pix)
        radiance = V.min_with(V.add(rad_b0, tail), RADIANCE_CLAMP)
        if with_stats:
            return radiance, (carry[15], carry[16])
        return radiance

    def fallback(_):
        out = fallback_fn()
        if with_stats:
            return out[0], out[2]
        return out[0]

    out = jax.lax.cond(n_live <= cap, dense, fallback, None)
    if with_stats:
        rad, (nr2, no2) = out
        return rad, seed, (nrays + nr2, noccl + no2)
    return out, seed


def _sample_radiance(scene, env, vol, flags, u, px, py, frame_index, s,
                     with_stats=False):
    """One full path-traced sample for every pixel.

    Production path: full-width primary trace, then the coherence-binned
    dense transport (_binned_transport) wherever the Pallas kernels run.
    Fallbacks (distributed/volume/small-frame/over-cap): the hit-first
    block-permutation chunk scan (_run_permuted). A single-launch path
    MEGAKERNEL (whole transport per 1024-ray block, one Pallas program)
    was built in round 2, frozen in round 3, and DELETED in round 5 after
    losing its final race 5.1x (RACE_knobs_final_1k.json: 269.0 vs 53.0
    ms at 1k spheres 1080p) — the post-mortem survives in
    docs/ARCHITECTURE.md."""
    seed, origin, direction = generate_camera_rays(u, flags, px, py, frame_index, s)
    n = px.shape[0]
    chunks = 1 if flags.distributed else _chunk_count(n)
    clip = _clip_tuple(flags, u)

    if chunks == 1:
        return trace_paths(scene, env, vol, flags, u, origin, direction, seed,
                           with_stats=with_stats)

    # The compaction path only consumes (t, prim_slot) from the primary
    # record — full attributes are rebuilt per chunk after permutation, so
    # skip the full-batch finalize gather (~26 ms/frame at 1080p). On the
    # attrs path the kernel extracts the winner's attribute row in-kernel
    # (one-hot MXU matmuls), so the per-chunk rebuild needs no gather
    # either — (t, attrs) moves through the permutation instead of
    # (t, slot).
    use_attrs = _use_attrs(scene, flags)
    attrs0 = None
    slim0 = flags.tracer == "wavefront"
    if use_attrs:
        rec0, attrs0 = _closest_hit(scene, flags, origin, direction, u.t_min,
                                    clip, with_attrs=True)
    else:
        rec0 = _closest_hit(scene, flags, origin, direction, u.t_min, clip,
                            full_record=not slim0)

    def _permuted_transport():
        return _run_permuted(scene, env, vol, flags, u, seed, origin,
                             direction, rec0, attrs0, use_attrs, slim0,
                             clip, chunks, with_stats)

    if slim0 and not use_attrs and _use_binned(scene, flags, n):
        import os as _os

        # WRT_BIN_B0=permuted routes bounce 0 through the block-permuted
        # chunk scan instead of the dense buffer. RACED AND LOST on TPU
        # v5e (RACE_binned_b0_1k.json: 80.6 vs dense 62.7 ms) — the dense
        # bounce 0 is already cheap and the permuted machinery adds a
        # full-width carry materialization; kept as an A/B knob.
        if _os.environ.get("WRT_BIN_B0", "dense") == "permuted":
            return _binned_b0perm_transport(scene, env, vol, flags, u, seed,
                                            origin, direction, rec0, clip,
                                            with_stats, _permuted_transport)
        return _binned_transport(scene, env, vol, flags, u, seed, origin,
                                 direction, rec0, clip, with_stats,
                                 _permuted_transport)

    if slim0 and not use_attrs and _use_wavefront(scene, flags, n):
        return _wavefront_transport(scene, env, vol, flags, u, seed, origin,
                                    direction, rec0, clip, with_stats,
                                    _permuted_transport)

    if slim0 and not use_attrs and _use_compact(scene, flags, n):
        return _compacted_transport(scene, env, vol, flags, u, seed, origin,
                                    direction, rec0, clip, with_stats,
                                    _permuted_transport)

    return _permuted_transport()


def _run_permuted(scene, env, vol, flags, u, seed, origin, direction,
                  rec0, attrs0, use_attrs, slim0, clip, chunks, with_stats):
    """The block-permutation + chunk-scan transport (the pre-compaction
    path, still used for distributed/volume frames and as the lax.cond
    fallback when a frame's live count exceeds the compaction cap)."""
    n = origin[0].shape[0]
    size = n // chunks
    import os
    if os.environ.get("WRT_NO_PERM"):
        # Experiment knob: rely on the Morton tile order's natural screen
        # coherence alone — all-miss chunks still skip, but hits are not
        # packed to the front (tools/profile_frame.py A/Bs this).
        g = 0
        gather = lambda a: a
    elif os.environ.get("WRT_PERM_MODE") == "lane":
        # PER-LANE hit-first compaction (experiment knob, NOT the
        # default): it would pack hit lanes densely and maximize all-dead
        # chunk skips, but the per-lane random-access gather of the
        # 9-array transport state costs ~173 ms/frame at 1080p on TPU
        # v5e (tools/profile_stages.py permute_lane_gather, measured
        # round 3) — the TPU has no fast per-lane gather, so the
        # 256-lane-block permutation below stays the production path.
        g = 1
        perm, inv = _hit_first_permutation(rec0.prim_type >= 0)
        gather = lambda a: a[perm]
    else:
        # WRT_PERM_G tunes the block-compaction granularity (finer blocks
        # pack live lanes denser but gather shorter DMA rows). NOTE for
        # benchmarks: read at trace time — build a fresh jit per variant.
        blk = int(os.environ.get("WRT_PERM_G") or _PERM_BLOCK)
        g = blk if (n % blk == 0 and size % blk == 0) else 1
        if g > 1:
            perm, inv = _tile_permutation(rec0.prim_type >= 0, g)
            gather = lambda a: a.reshape((n // g, g) + a.shape[1:])[perm].reshape(a.shape)
        else:
            perm, inv = _hit_first_permutation(rec0.prim_type >= 0)
            gather = lambda a: a[perm]

    # Wavefront records reconstruct exactly from (t, prim_slot) via
    # _finalize_hit, so only 9 scalar lanes move through the permutation
    # instead of 15; the stack tracer's slots index a different table, so
    # it keeps the full record.
    slim = flags.tracer == "wavefront"
    if use_attrs:
        state = (seed,) + origin + direction + (rec0.t, attrs0)
    elif slim:
        state = (seed,) + origin + direction + (rec0.t, rec0.prim_slot)
    else:
        state = (seed,) + origin + direction + tuple(rec0)
    state = tuple(gather(a) for a in state)
    state = tuple(a.reshape((chunks, size) + a.shape[1:]) for a in state)

    from ..ops.traversal import HitRecord
    from ..ops.wavefront import _finalize_hit

    def chunk_fn(args):
        seed_c = args[0]
        origin_c = args[1:4]
        direction_c = args[4:7]
        attrs_c = None
        if use_attrs:
            t_c, attrs_c = args[7], args[8]
            hit_c = attrs_c[:, 11] >= 0.0
            slot_c = jnp.where(hit_c, attrs_c[:, 28].astype(jnp.int32), -1)
            tmin_c = jnp.broadcast_to(u.t_min, t_c.shape).astype(jnp.float32)
            # No gather: the carried attr rows ARE the winner rows; the
            # barycentric/cap re-derivation and (idempotent) sphere-t
            # refinement are elementwise.
            rec_c = _finalize_hit(scene, origin_c, direction_c, tmin_c, clip,
                                  t_c, slot_c, cost=jnp.zeros_like(slot_c),
                                  refine_sphere_t=True, row=attrs_c[:, :12])
        elif slim:
            t_c, slot_c = args[7], args[8]
            tmin_c = jnp.broadcast_to(u.t_min, t_c.shape).astype(jnp.float32)
            # refine_sphere_t: the lean Pallas record carries the kernel's
            # scene-centered t; refine to global rounding here (idempotent
            # when the XLA path produced the t).
            rec_c = _finalize_hit(scene, origin_c, direction_c, tmin_c, clip,
                                  t_c, slot_c, cost=jnp.zeros_like(slot_c),
                                  refine_sphere_t=True)
        else:
            rec_c = HitRecord(*args[7:])
        out = trace_paths(scene, env, vol, flags, u, origin_c, direction_c,
                          seed_c, with_stats=with_stats, first_rec=rec_c,
                          first_attrs=attrs_c)
        if with_stats:
            radiance, seed_o, nrays = out
            return V.to_array(radiance), nrays
        radiance, seed_o = out
        return V.to_array(radiance)

    if g == 0:
        unperm = lambda c: c
    elif g > 1:
        unperm = lambda c: c.reshape(n // g, g, 3)[inv].reshape(n, 3)
    else:
        unperm = lambda c: c[inv]

    out = jax.lax.map(chunk_fn, state)
    if with_stats:
        colors, nrays = out
        total_rays = jax.tree_util.tree_map(jnp.sum, nrays)
        colors = unperm(colors.reshape(n, 3))
        return V.from_array(colors), seed, total_rays
    colors = unperm(out.reshape(n, 3))
    return V.from_array(colors), seed


def render_batch_v3(scene, env, vol, flags, u, px, py, frame_index):
    """One progressive sample per pixel -> color triple of f32[B]
    (exposure applied pre-accumulation, webgl.js:1520-1549). Component
    form so fused callers can accumulate without materializing [B, 3]
    arrays — the 3-wide minor axis tiles to 128 lanes on TPU."""
    total = V.full(px.shape, 0.0)
    for s in range(flags.spp):
        radiance, _ = _sample_radiance(scene, env, vol, flags, u, px, py,
                                       frame_index, s)
        total = V.add(total, radiance)
    return V.scale(total, u.exposure / flags.spp)


@partial(jax.jit, static_argnames=("flags",))
def render_batch(scene, env, vol, flags, u, px, py, frame_index):
    """One progressive sample per pixel -> color f32[B,3]."""
    return V.to_array(render_batch_v3(scene, env, vol, flags, u, px, py,
                                      frame_index))


@partial(jax.jit, static_argnames=("flags",))
def render_batch_stats(scene, env, vol, flags, u, px, py, frame_index):
    """render_batch + traced-ray counts (the Mrays/s denominator).

    Returns (color [B,3], (path_rays, occl_rays)): path_rays = closest-hit
    extension segments (camera rays + surviving bounce rays); occl_rays =
    any-hit occlusion candidates (3-light shadow rays + env-NEE rays).
    Together they are every traversal the frame pays for — BASELINE.md's
    10-25 Mray frame estimate counts both kinds."""
    total = V.full(px.shape, 0.0)
    rays = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    for s in range(flags.spp):
        out = _sample_radiance(scene, env, vol, flags, u, px, py,
                               frame_index, s, with_stats=True)
        radiance, _, nrays = out
        total = V.add(total, radiance)
        rays = (rays[0] + nrays[0], rays[1] + nrays[1])
    return V.to_array(V.scale(total, u.exposure / flags.spp)), rays


@partial(jax.jit, static_argnames=("flags",))
def render_visualization(scene, env, vol, flags, u, px, py, frame_index):
    """Debug channels (webgl.js:1467-1506): 1 normals, 2 traversal-cost
    heatmap (0-200), 3 depth."""
    fragx = px.astype(jnp.float32) + 0.5
    fragy = py.astype(jnp.float32) + 0.5
    uvx = (fragx + 0.5) / u.resolution[0] * 2.0 - 1.0
    uvy = (fragy + 0.5) / u.resolution[1] * 2.0 - 1.0
    fwd = u.cam_forward
    right = u.cam_right
    up = u.cam_up
    direction = V.normalize((
        fwd[0] + uvx * right[0] + uvy * up[0],
        fwd[1] + uvx * right[1] + uvy * up[1],
        fwd[2] + uvx * right[2] + uvy * up[2],
    ))
    origin = (jnp.broadcast_to(u.cam_origin[0], px.shape),
              jnp.broadcast_to(u.cam_origin[1], px.shape),
              jnp.broadcast_to(u.cam_origin[2], px.shape))
    clip = _clip_tuple(flags, u)
    rec = _closest_hit(scene, flags, origin, direction, u.t_min, clip)
    hit = rec.prim_type >= 0
    pos = V.add(origin, V.scale(direction, rec.t))

    if flags.vis_mode == 1:
        _, sn, _, _ = _surface_attributes(scene, flags, rec, pos, direction, u)
        color = V.scale(V.add(sn, (1.0, 1.0, 1.0)), 0.5)
        color = V.where(hit, color, V.zeros_like(color[0]))
        return V.to_array(color)
    if flags.vis_mode == 2:
        t = jnp.clip(rec.cost.astype(jnp.float32) / 200.0, 0.0, 1.0)
        c0 = jnp.array([0.0, 0.0, 1.0])
        c1 = jnp.array([0.0, 1.0, 1.0])
        c2 = jnp.array([0.0, 1.0, 0.0])
        c3 = jnp.array([1.0, 1.0, 0.0])
        c4 = jnp.array([1.0, 0.0, 0.0])
        seg = jnp.clip(t * 4.0, 0.0, 4.0)
        frac = (seg - jnp.floor(seg))[..., None]
        idx = jnp.clip(jnp.floor(seg).astype(jnp.int32), 0, 3)
        lo = jnp.stack([c0, c1, c2, c3])[idx]
        hi = jnp.stack([c1, c2, c3, c4])[idx]
        return lo * (1 - frac) + hi * frac
    if flags.vis_mode == 3:
        depth = 1.0 - jnp.clip(rec.t / 10.0, 0.0, 1.0)
        depth = jnp.where(hit, depth, 0.0)
        return V.to_array((depth, depth, depth))
    return jnp.zeros(px.shape + (3,), jnp.float32)
