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
from ..ops.envmap import env_pdf, sample_env_direction, sample_env_radiance
from ..ops.rng import init_seed, rand, rand2
from ..ops.traversal import _traverse
from ..ops.volume import march_volume
from ..ops.wavefront import wf_trace_any, wf_trace_closest
from ..scene.bvh import PRIM_CYLINDER, PRIM_SPHERE, PRIM_TRIANGLE
from ..ops.intersect import cylinder_normal

BIG = np.float32(1e20)
RADIANCE_CLAMP = np.float32(100.0)
NEE_CLAMP = np.float32(20.0)
THROUGHPUT_CLAMP = np.float32(10.0)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    return v / jnp.maximum(jnp.sqrt(_dot(v, v)), 1e-12)[..., None]


def _clip_tuple(flags, u):
    if not flags.clip_enabled:
        return None
    return (u.clip_normal, u.clip_offset, u.clip_side)


def _closest_hit(scene, flags, origin, direction, t_min, clip, active=None):
    """Tracer dispatch: the dense cluster wavefront (default, TPU-native) or
    the reference-shaped masked BVH stack walk."""
    if flags.tracer == "wavefront":
        return wf_trace_closest(scene, origin, direction, t_min, clip, active=active)
    return _traverse(
        scene, origin, direction, t_min, clip,
        any_hit=False, accept_min=None, t_max=None,
        max_steps=2048, max_leaf=4, active=active,
    )


def _any_hit(scene, flags, origin, direction, t_min, clip, accept_min=None,
             t_max=BIG, active=None):
    if flags.tracer == "wavefront":
        return wf_trace_any(scene, origin, direction, t_min, t_max=t_max,
                            accept_min=accept_min, clip=clip, active=active)
    return _traverse(
        scene, origin, direction, t_min, clip,
        any_hit=True, accept_min=accept_min, t_max=t_max,
        max_steps=2048, max_leaf=4, active=active,
    )


def _fetch_hit_rows(scene, flags, slot):
    """(pa[...,4], pb_xyz, pc_xyz, color) for a hit's table row — the
    wavefront tracer indexes the padded cluster table, the stack tracer the
    leaf-ordered unified table."""
    if flags.tracer == "wavefront":
        flat = scene.cluster_prims.reshape(-1, 12)
        row = flat[slot]
        return row[..., 0:4], row[..., 4:7], row[..., 8:11], scene.cluster_color[slot]
    return (
        scene.prim_a[slot],
        scene.prim_b[slot][..., :3],
        scene.prim_c[slot][..., :3],
        scene.prim_color[slot],
    )


def _surface_attributes(scene, rec, pos, direction, u, flags):
    """Reconstruct geometric/shading normals + base color at the hit
    (webgl.js:1244-1272), selecting per primitive type."""
    slot = jnp.maximum(rec.prim_slot, 0)
    local = jnp.maximum(rec.prim_local, 0)
    ptype = rec.prim_type
    pa, pb, pc, imported_color = _fetch_hit_rows(scene, flags, slot)

    n_geom_raw = jnp.zeros_like(pos)
    shading = jnp.zeros_like(pos)

    if scene.sphere_count:
        n_sph = _normalize(pos - pa[..., :3])
        sel = (ptype == PRIM_SPHERE)[..., None]
        n_geom_raw = jnp.where(sel, n_sph, n_geom_raw)

    if scene.cylinder_count:
        n_cyl = cylinder_normal(pos, pa[..., :3], pb[..., :3], rec.extra[..., 0])
        sel = (ptype == PRIM_CYLINDER)[..., None]
        n_geom_raw = jnp.where(sel, n_cyl, n_geom_raw)

    tri_shading = None
    if scene.tri_count:
        n_tri = _normalize(jnp.cross(pb[..., :3] - pa[..., :3], pc[..., :3] - pa[..., :3]))
        sel = (ptype == PRIM_TRIANGLE)[..., None]
        n_geom_raw = jnp.where(sel, n_tri, n_geom_raw)
        # Interpolated vertex normals.
        tn = scene.tri_normals[local]            # [B,3,3]
        bu = rec.extra[..., 0]
        bv = rec.extra[..., 1]
        bary = jnp.stack([1.0 - bu - bv, bu, bv], axis=-1)
        tri_shading = _normalize(jnp.sum(tn * bary[..., None], axis=-2))

    front = _dot(n_geom_raw, direction) < 0.0
    n_geom = jnp.where(front[..., None], n_geom_raw, -n_geom_raw)

    shading = n_geom
    if scene.tri_count:
        flip = _dot(tri_shading, n_geom) < 0.0
        tri_sn = jnp.where(flip[..., None], -tri_shading, tri_shading)
        shading = jnp.where((ptype == PRIM_TRIANGLE)[..., None], tri_sn, shading)

    if flags.use_imported_color:
        base_color = imported_color
    else:
        base_color = jnp.broadcast_to(u.base_color, pos.shape)
    return n_geom, shading, base_color, front


def _material_params(flags, u, base_color):
    """Shared material-mode parameter selection (webgl.js:1097-1102)."""
    use_matte = flags.material_mode == 1
    metallic = u.metallic if flags.material_mode == 0 else jnp.float32(0.0)
    rough = u.matte_roughness if use_matte else u.roughness
    diff_rough = u.matte_diffuse_roughness if use_matte else jnp.float32(0.0)
    wrap = u.wrap_diffuse if use_matte else jnp.float32(0.0)
    if use_matte:
        f0 = jnp.broadcast_to(u.matte_specular, base_color.shape)
    else:
        f0 = (1.0 - metallic) * 0.04 + base_color * metallic
    return metallic, rough, diff_rough, wrap, f0


def _ggx_eval(sn, v, l, rough, f0):
    """GGX specular term D*G*F / (4 NdotV NdotL) (webgl.js:1122-1129)."""
    h = _normalize(v + l)
    ndv = jnp.maximum(_dot(sn, v), 0.001)
    ndl = jnp.maximum(_dot(sn, l), 0.0)
    ndh = jnp.maximum(_dot(sn, h), 0.001)
    vdh = jnp.maximum(_dot(v, h), 0.001)
    d = B.distribution_ggx(ndh, rough)
    g = B.geometry_smith(ndv, ndl, rough)
    f = B.fresnel_schlick(vdh, f0)
    spec = (d * g)[..., None] * f / jnp.maximum(4.0 * ndv * ndl, 0.001)[..., None]
    return spec, f


def trace_paths(scene, env, vol, flags, u, origin0, dir0, seed0, with_stats=False):
    """Full path trace for a flat ray batch. Returns (radiance f32[B,3], seed)
    or, with_stats=True, (radiance, seed, rays_traced scalar) where
    rays_traced counts every traversal query issued (closest + shadow + NEE),
    the Mrays metric denominator."""
    n = origin0.shape[0]
    bias = jnp.maximum(u.ray_bias, 1e-4)
    clip = _clip_tuple(flags, u)

    def bounce_body(bounce, carry):
        seed, origin, direction, throughput, radiance, last_pdf, alive, nrays = carry

        nrays = nrays + jnp.sum(alive.astype(jnp.int32))
        rec = _closest_hit(scene, flags, origin, direction, u.t_min, clip, active=alive)
        hit = rec.prim_type >= 0
        t_surface = jnp.where(hit, rec.t, BIG)

        if flags.volume_enabled:
            vol_rad, throughput = march_volume(
                vol, origin, direction, t_surface, u.t_min,
                u.volume_color, u.volume_density, u.volume_opacity,
                u.volume_step, u.volume_threshold, throughput, alive,
                flags.volume_max_steps,
            )
            radiance = radiance + vol_rad

        # --- environment / ambient on miss (webgl.js:1223-1235) ---
        env_contrib = u.ambient_color * u.ambient_intensity
        if flags.use_env:
            env_contrib = env_contrib + sample_env_radiance(
                env, direction, u.env_intensity, u.env_max_luminance
            )
            mis_w = jnp.where(
                (bounce > 0) & (last_pdf > 0.0),
                S.power_heuristic(last_pdf, env_pdf(env, direction)),
                1.0,
            )
        else:
            mis_w = jnp.ones((n,), jnp.float32)
        miss = alive & ~hit
        radiance = radiance + jnp.where(
            miss[..., None], throughput * env_contrib * mis_w[..., None], 0.0
        )
        alive = alive & hit

        # --- surface reconstruction ---
        pos = origin + direction * rec.t[..., None]
        n_geom, sn, base_color, front = _surface_attributes(scene, rec, pos, direction, u, flags)
        v = -direction

        # --- glass / translucent-plastic transmission (webgl.js:1276-1313) ---
        shade_lane = alive
        if flags.material_mode in (2, 3):
            seed, r_op = rand(seed)
            if flags.material_mode == 2:
                glass_lane = rec.prim_type == PRIM_TRIANGLE
                if flags.surface_flag_mode != 0 and scene.tri_count:
                    tflag = scene.tri_flags[jnp.maximum(rec.prim_local, 0)]
                    glass_lane = glass_lane & (tflag > 0.5)
            else:
                glass_lane = jnp.ones((n,), bool)
            transmit = alive & glass_lane & (r_op >= u.surface_opacity)

            cosi = jnp.clip(_dot(-direction, n_geom), 0.0, 1.0)
            f0s = ((u.surface_ior - 1.0) / (u.surface_ior + 1.0)) ** 2
            fres = B.fresnel_schlick(cosi, f0s)
            ior = jnp.maximum(u.surface_ior, 1e-3)
            eta = jnp.where(front, 1.0 / ior, ior)
            can_refract, refr = B.refract_dir(direction, n_geom, eta)
            reflect_prob = jnp.where(can_refract, fres, 1.0)

            seed, r_ref = rand(seed)
            seed, b1, b2 = rand2(seed)
            do_reflect = r_ref < reflect_prob
            if flags.material_mode == 3:
                trans_rough = jnp.clip(u.roughness, 0.02, 1.0)
                refl_dir = S.reflect_from_uv(direction, n_geom, trans_rough, b1, b2)
                refr_dir = S.around_direction_from_uv(refr, trans_rough, b1, b2)
            else:
                refl_dir = _normalize(S.reflect(direction, n_geom))
                refr_dir = _normalize(refr)

            new_dir = jnp.where(do_reflect[..., None], refl_dir, refr_dir)
            new_origin = jnp.where(
                do_reflect[..., None], pos + n_geom * bias, pos - n_geom * bias
            )
            tint = (1.0 - u.surface_transmission) + base_color * u.surface_transmission
            trans_mask = transmit & ~do_reflect
            throughput = jnp.where(trans_mask[..., None], throughput * tint, throughput)
            origin = jnp.where(transmit[..., None], new_origin, origin)
            direction = jnp.where(transmit[..., None], new_dir, direction)
            last_pdf = jnp.where(transmit, 0.0, last_pdf)
            shade_lane = alive & ~transmit
        else:
            transmit = jnp.zeros((n,), bool)

        metallic, rough, diff_rough, wrap, f0 = _material_params(flags, u, base_color)

        # --- direct lighting: 3 cone lights with MIS (webgl.js:1094-1145) ---
        direct = jnp.zeros((n, 3), jnp.float32)
        shadow_min = jnp.maximum(bias, u.t_min)
        for i in range(3):
            if not flags.light_enabled[i]:
                continue
            seed, l1, l2 = rand2(seed)
            axis = jnp.broadcast_to(_normalize(-u.light_dir[i][None, :]), (n, 3))
            ldir, l_pdf = S.cone_from_uv(axis, u.light_angle[i], l1, l2)
            ndl = jnp.maximum(_dot(sn, ldir), 0.0)
            candidate = shade_lane & (ndl > 0.0)
            if flags.cast_shadows:
                nrays = nrays + jnp.sum(candidate.astype(jnp.int32))
                occluded = _any_hit(
                    scene, flags, pos + n_geom * bias, ldir, u.t_min, clip,
                    accept_min=shadow_min, active=candidate,
                )
                lit = candidate & ~occluded
            else:
                lit = candidate
            spec, f = _ggx_eval(sn, v, ldir, rough, f0)
            diff = B.eval_diffuse_brdf(sn, v, ldir, base_color, diff_rough, wrap) * (1.0 - metallic)
            brdf_val = spec + diff * (1.0 - f)
            spec_prob = B.spec_probability(f0, base_color, metallic)
            pdf_b = B.brdf_pdf(sn, v, ldir, rough, spec_prob)
            mis = S.power_heuristic(l_pdf, pdf_b)
            radiance_l = u.light_color[i] * u.light_intensity[i]
            contrib = brdf_val * radiance_l * (ndl * mis / jnp.maximum(l_pdf, 1e-6))[..., None]
            direct = direct + jnp.where(lit[..., None], contrib, 0.0)
        radiance = radiance + jnp.where(shade_lane[..., None], throughput * direct, 0.0)

        # --- rim boost at the primary hit (webgl.js:1326-1331) ---
        if flags.rim_enabled and flags.material_mode == 0:
            ndv = jnp.maximum(_dot(sn, v), 0.0)
            rim = jnp.power(1.0 - ndv, 3.0)
            rim_on = shade_lane & (bounce == 0)
            radiance = radiance + jnp.where(
                rim_on[..., None], throughput * base_color * (u.rim_boost * rim)[..., None], 0.0
            )

        # --- env NEE with MIS (webgl.js:1334-1385) ---
        if flags.use_env:
            seed, env_dir, env_spdf = sample_env_direction(env, seed)
            ndl_e = _dot(sn, env_dir)
            candidate = shade_lane & (ndl_e > 0.0)
            nrays = nrays + jnp.sum(candidate.astype(jnp.int32))
            occluded = _any_hit(
                scene, flags, pos + n_geom * bias, env_dir, u.t_min, clip,
                active=candidate,
            )
            open_sky = candidate & ~occluded
            spec, f = _ggx_eval(sn, v, env_dir, rough, f0)
            diff = B.eval_diffuse_brdf(sn, v, env_dir, base_color, diff_rough, wrap) * (1.0 - metallic)
            brdf_val = spec + diff * (1.0 - f)
            env_rad = sample_env_radiance(env, env_dir, u.env_intensity, u.env_max_luminance)
            spec_prob = B.spec_probability(f0, base_color, metallic)
            pdf_b = B.brdf_pdf(sn, v, env_dir, rough, spec_prob)
            mis = S.power_heuristic(env_spdf, pdf_b)
            contrib = throughput * brdf_val * env_rad * (
                jnp.maximum(ndl_e, 0.0) * mis / jnp.maximum(env_spdf, 1e-6)
            )[..., None]
            mx = jnp.max(contrib, axis=-1)
            scale = jnp.where(mx > NEE_CLAMP, NEE_CLAMP / jnp.maximum(mx, 1e-12), 1.0)
            radiance = radiance + jnp.where(open_sky[..., None], contrib * scale[..., None], 0.0)

        # --- BRDF sampling (webgl.js:1387-1429) ---
        spec_w = B.max_component(f0)
        diff_w = (1.0 - metallic) * B.max_component(base_color)
        wsum = spec_w + diff_w
        spec_prob = jnp.clip(jnp.where(wsum > 0.0, spec_w / jnp.maximum(wsum, 1e-12), 1.0), 0.0, 1.0)

        seed, r_lobe = rand(seed)
        seed, s1, s2 = rand2(seed)
        choose_spec = r_lobe < spec_prob

        h = S.ggx_half_vector_from_uv(sn, rough, s1, s2)
        spec_dir = _normalize(S.reflect(-v, h))
        ndl_s = jnp.maximum(_dot(sn, spec_dir), 0.0)
        ndv = jnp.maximum(_dot(sn, v), 0.001)
        ndh = jnp.maximum(_dot(sn, h), 0.001)
        vdh = jnp.maximum(_dot(v, h), 0.001)
        g = B.geometry_smith(ndv, ndl_s, rough)
        f = B.fresnel_schlick(vdh, f0)
        spec_weight = f * (g * vdh / (ndv * ndh * jnp.maximum(spec_prob, 0.01)))[..., None]
        d_ggx = B.distribution_ggx(ndh, rough)
        spec_last_pdf = spec_prob * d_ggx * ndh / (4.0 * vdh)

        diff_dir = S.cosine_hemisphere_from_uv(sn, s1, s2)
        ndl_d = jnp.maximum(_dot(sn, diff_dir), 0.0)
        diff_brdf = B.eval_diffuse_brdf(sn, v, diff_dir, base_color, diff_rough, wrap) * (1.0 - metallic)
        diff_weight = diff_brdf * (S.PI / jnp.maximum(1.0 - spec_prob, 0.01))[..., None]
        diff_last_pdf = (1.0 - spec_prob) * ndl_d / S.PI

        new_dir = jnp.where(choose_spec[..., None], spec_dir, diff_dir)
        weight = jnp.where(choose_spec[..., None], spec_weight, diff_weight)
        dead_spec = choose_spec & (ndl_s <= 0.0)

        throughput = jnp.where(shade_lane[..., None], throughput * weight, throughput)
        mx = jnp.max(throughput, axis=-1)
        tscale = jnp.where(mx > THROUGHPUT_CLAMP, THROUGHPUT_CLAMP / jnp.maximum(mx, 1e-12), 1.0)
        throughput = throughput * tscale[..., None]

        origin = jnp.where(shade_lane[..., None], pos + n_geom * bias, origin)
        direction = jnp.where(shade_lane[..., None], new_dir, direction)
        last_pdf = jnp.where(
            shade_lane, jnp.where(choose_spec, spec_last_pdf, diff_last_pdf), last_pdf
        )

        # --- Russian roulette from bounce 1 (webgl.js:1434-1441) ---
        seed2, rr = rand(seed)
        rr_active = bounce >= 1
        seed = jnp.where(rr_active, seed2, seed)
        p = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 0.95)
        rr_kill = rr_active & shade_lane & (rr > p)
        throughput = jnp.where(
            (rr_active & shade_lane)[..., None], throughput / p[..., None], throughput
        )

        alive = transmit | (shade_lane & ~dead_spec & ~rr_kill)
        return seed, origin, direction, throughput, radiance, last_pdf, alive, nrays

    carry = (
        seed0,
        origin0,
        dir0,
        jnp.ones((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.ones((n,), bool),
        jnp.zeros((), jnp.int32),
    )
    carry = jax.lax.fori_loop(0, flags.max_bounces, bounce_body, carry)
    radiance = jnp.minimum(carry[4], RADIANCE_CLAMP)
    if with_stats:
        return radiance, carry[0], carry[7]
    return radiance, carry[0]


def generate_camera_rays(u, flags, px, py, frame_index, sample_index):
    """Pixel indices -> jittered primary rays with optional thin-lens DoF
    (webgl.js:1508-1544). px/py are integer pixel coords with y measured
    from the bottom (gl_FragCoord convention). Returns (seed, origin, dir)."""
    seed = init_seed(px, py, frame_index, sample_index)
    seed, jx = rand(seed)
    seed, jy = rand(seed)
    fragx = px.astype(jnp.float32) + 0.5
    fragy = py.astype(jnp.float32) + 0.5
    pixel_x = fragx + (jx - 0.5)
    pixel_y = fragy + (jy - 0.5)
    uvx = (pixel_x + 0.5) / u.resolution[0] * 2.0 - 1.0
    uvy = (pixel_y + 0.5) / u.resolution[1] * 2.0 - 1.0
    direction = _normalize(
        u.cam_forward + uvx[..., None] * u.cam_right + uvy[..., None] * u.cam_up
    )
    origin = jnp.broadcast_to(u.cam_origin, direction.shape)

    if flags.dof_enabled:
        fwd_n = _normalize(u.cam_forward[None, :])[0]
        right_n = _normalize(u.cam_right[None, :])[0]
        up_n = _normalize(u.cam_up[None, :])[0]
        denom = jnp.maximum(_dot(direction, fwd_n), 1e-4)
        t_focus = u.dof_focus_distance / denom
        focus_point = origin + direction * t_focus[..., None]
        seed, lens = S.sample_disk(seed)
        lens = lens * u.dof_aperture
        origin = origin + right_n * lens[..., 0:1] + up_n * lens[..., 1:2]
        direction = _normalize(focus_point - origin)

    return seed, origin, direction


@partial(jax.jit, static_argnames=("flags",))
def render_batch(scene, env, vol, flags, u, px, py, frame_index):
    """One progressive sample for a batch of pixels -> color f32[B,3]
    (exposure applied; pre-accumulation, webgl.js:1520-1549)."""
    total = jnp.zeros(px.shape + (3,), jnp.float32)
    for s in range(flags.spp):
        seed, origin, direction = generate_camera_rays(u, flags, px, py, frame_index, s)
        radiance, seed = trace_paths(scene, env, vol, flags, u, origin, direction, seed)
        total = total + radiance
    return total / flags.spp * u.exposure


@partial(jax.jit, static_argnames=("flags",))
def render_batch_stats(scene, env, vol, flags, u, px, py, frame_index):
    """render_batch + traced-ray count (for Mrays/s benchmarking)."""
    total = jnp.zeros(px.shape + (3,), jnp.float32)
    rays = jnp.zeros((), jnp.int32)
    for s in range(flags.spp):
        seed, origin, direction = generate_camera_rays(u, flags, px, py, frame_index, s)
        radiance, seed, nrays = trace_paths(
            scene, env, vol, flags, u, origin, direction, seed, with_stats=True
        )
        total = total + radiance
        rays = rays + nrays
    return total / flags.spp * u.exposure, rays


@partial(jax.jit, static_argnames=("flags",))
def render_visualization(scene, env, vol, flags, u, px, py, frame_index):
    """Debug channels (webgl.js:1467-1506): 1 normals, 2 traversal-cost
    heatmap (0-200), 3 depth (scene scale ~10)."""
    fragx = px.astype(jnp.float32) + 0.5
    fragy = py.astype(jnp.float32) + 0.5
    uvx = (fragx + 0.5) / u.resolution[0] * 2.0 - 1.0
    uvy = (fragy + 0.5) / u.resolution[1] * 2.0 - 1.0
    direction = _normalize(
        u.cam_forward + uvx[..., None] * u.cam_right + uvy[..., None] * u.cam_up
    )
    origin = jnp.broadcast_to(u.cam_origin, direction.shape)
    clip = _clip_tuple(flags, u)
    rec = _closest_hit(scene, flags, origin, direction, u.t_min, clip)
    hit = rec.prim_type >= 0
    pos = origin + direction * rec.t[..., None]

    if flags.vis_mode == 1:
        n_geom, sn, _, _ = _surface_attributes(scene, rec, pos, direction, u, flags)
        # The reference shows the raw (unflipped) interpolated/surface normal.
        return jnp.where(hit[..., None], sn * 0.5 + 0.5, 0.0)
    if flags.vis_mode == 2:
        t = jnp.clip(rec.cost.astype(jnp.float32) / 200.0, 0.0, 1.0)
        c0 = jnp.array([0.0, 0.0, 1.0])
        c1 = jnp.array([0.0, 1.0, 1.0])
        c2 = jnp.array([0.0, 1.0, 0.0])
        c3 = jnp.array([1.0, 1.0, 0.0])
        c4 = jnp.array([1.0, 0.0, 0.0])
        seg = jnp.clip(t * 4.0, 0.0, 4.0)
        f = (seg - jnp.floor(seg))[..., None]
        idx = jnp.clip(jnp.floor(seg).astype(jnp.int32), 0, 3)
        lo = jnp.stack([c0, c1, c2, c3])[idx]
        hi = jnp.stack([c1, c2, c3, c4])[idx]
        return lo * (1 - f) + hi * f
    if flags.vis_mode == 3:
        depth = 1.0 - jnp.clip(rec.t / 10.0, 0.0, 1.0)
        return jnp.where(hit[..., None], depth[..., None] * jnp.ones(3), 0.0)
    return jnp.zeros(px.shape + (3,), jnp.float32)
