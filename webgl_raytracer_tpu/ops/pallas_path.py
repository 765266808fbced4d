"""Pallas TPU path-tracing megakernel: the whole transport in one launch.

The round-1 architecture traced each bounce and shadow batch as a separate
device program with XLA-side compaction between them; per frame that is
~10 traversal launches plus a hit-first permutation, and every launch pays
for dead lanes and HBM round-trips of the ray state. This kernel is the
TPU answer to the reference's megakernel fragment shader (TRACE_FS,
/root/reference/src/webgl.js:1508-1559): one Pallas program per 1024-ray
screen block runs camera ray generation, the full bounce loop (closest-hit
traversal, cone-light shading with in-kernel shadow rays, GGX/cosine BRDF
sampling, Russian roulette), and returns the accumulated radiance — ray
state never leaves VMEM. Blocks whose rays all die (pure background) exit
the bounce loop in one scalar branch, which replaces the block-compaction
permutation entirely.

Traversal reuses the cluster-worklist formulation of ops/pallas_trace.py
(entries pass -> front-to-back sweeps), but the closest-hit loop extracts
the winning primitive's 32 shading attributes *during* the sweep with a
one-hot [B,128]x[128,32] MXU matmul — Mosaic has no per-lane gather, and
this turns "fetch the hit row" into dense matrix work the systolic array
does for free.

RNG is the reference's PCG stream (webgl.js:883-900) computed in int32
(Mosaic lacks uint32->f32 casts); the 16-bit-split conversion keeps the
uniform floats bit-identical to ops/rng.py, so images match the XLA
integrator and the CPU reference oracle sample-for-sample in the non-glass
material modes.

Coverage: material modes 0-3, DoF, clip planes, ambient lighting, up to
MAX_CLUSTERS_PATH clusters (SoA + attribute tables resident in VMEM).
Environment maps and volumes need per-lane table gathers and stay on the
XLA integrator path (render/integrator.py), as do distributed renders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.bvh import PRIM_CYLINDER, PRIM_SPHERE, PRIM_TRIANGLE
from .pallas_trace import (ROWS, _block_entries, _kpad, _pop_nearest,
                           _sweep_cluster)

BIG = np.float32(1e20)
INF = np.float32(np.inf)
BLOCK = 1024
PI = np.float32(np.pi)
TWO_PI = np.float32(2.0 * np.pi)

# Per-prim attribute table columns: 12 traversal cols (cluster_prims row:
# pa.xyz, r | pb.xyz, local | pc.xyz, type) ++ 16 shading cols, padded to 32.
AROWS = 16
_A_COLOR = 12          # shading attr 0 -> column 12
_A_N0 = 15
_A_N1 = 18
_A_N2 = 21
_A_FLAG = 24

# VMEM budget: traversal SoA 16x128x4 B + one-hot table 128x32x4 B
# = 24 KB per cluster; 384 clusters ~ 9 MB, leaving room for scratch.
MAX_CLUSTERS_PATH = 384

_MUL = np.int32(747796405)
_INC = np.int32(np.uint32(2891336453).astype(np.int32))
_OUT = np.int32(277803737)
_INV_U32 = np.float32(1.0 / 4294967295.0)


# --------------------------------------------------------------------------
# In-kernel PCG (bit-identical to ops/rng.py — see module docstring).

def _pcg_hash(v):
    srl = jax.lax.shift_right_logical
    state = v * _MUL + _INC
    word = (srl(state, srl(state, 28) + 4) ^ state) * _OUT
    return srl(word, 22) ^ word


def _u32_to_f32(bits):
    """Exact uint32 -> float32 (RNE) without the unsupported cast: the two
    16-bit halves are exact in f32, one add does the single rounding."""
    srl = jax.lax.shift_right_logical
    hi = srl(bits, 16).astype(jnp.float32) * np.float32(65536.0)
    lo = (bits & 0xFFFF).astype(jnp.float32)
    return hi + lo


def _rand(state):
    srl = jax.lax.shift_right_logical
    state = state * _MUL + _INC
    word = (srl(state, srl(state, 28) + 4) ^ state) * _OUT
    bits = srl(word, 22) ^ word
    return state, _u32_to_f32(bits) * _INV_U32


def _rand2(state):
    state, u1 = _rand(state)
    state, u2 = _rand(state)
    return state, u1, u2


# --------------------------------------------------------------------------
# Component-triple helpers over [BLOCK] 1-D f32 vectors.

def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _norm3(v, eps=np.float32(1e-12)):
    inv = 1.0 / jnp.maximum(jnp.sqrt(_dot3(v, v)), eps)
    return (v[0] * inv, v[1] * inv, v[2] * inv)


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _where3(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]))


def _scale3(v, s):
    return (v[0] * s, v[1] * s, v[2] * s)


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _max3(v):
    return jnp.maximum(v[0], jnp.maximum(v[1], v[2]))


def _to_world(axis, lx, ly, lz):
    """Shader basis convention (webgl.js:992-994)."""
    use_z = jnp.abs(axis[2]) < 0.999
    up = (jnp.where(use_z, 0.0, 1.0), jnp.zeros_like(axis[0]),
          jnp.where(use_z, 1.0, 0.0))
    t = _norm3(_cross3(up, axis))
    b = _cross3(axis, t)
    return _norm3((t[0] * lx + b[0] * ly + axis[0] * lz,
                   t[1] * lx + b[1] * ly + axis[1] * lz,
                   t[2] * lx + b[2] * ly + axis[2] * lz))


def _reflect3(d, n):
    k = 2.0 * _dot3(d, n)
    return (d[0] - k * n[0], d[1] - k * n[1], d[2] - k * n[2])


# --------------------------------------------------------------------------
# BRDF terms (webgl.js:175-209, 1056-1092, 1155-1171) on [BLOCK] vectors.

def _distribution_ggx(ndoth, rough):
    a = rough * rough
    a2 = a * a
    denom = (ndoth * ndoth) * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom + 1e-6)


def _geometry_schlick(ndotv, rough):
    r = rough + 1.0
    k = (r * r) / 8.0
    return ndotv / (ndotv * (1.0 - k) + k + 0.0001)


def _geometry_smith(ndv, ndl, rough):
    return _geometry_schlick(ndv, rough) * _geometry_schlick(ndl, rough)


def _pow5(x):
    x = jnp.clip(x, 0.0, 1.0)
    x2 = x * x
    return x2 * x2 * x


def _fresnel3(cos_theta, f0):
    w = _pow5(1.0 - cos_theta)
    return (f0[0] + (1.0 - f0[0]) * w, f0[1] + (1.0 - f0[1]) * w,
            f0[2] + (1.0 - f0[2]) * w)


def _wrap_ndotl(ndl, wrap):
    return jnp.clip((ndl + wrap) / (1.0 + wrap), 0.0, 1.0)


def _eval_diffuse(n, v, l, base, diff_rough, wrap, use_matte):
    """webgl.js:200-209. The Oren-Nayar/wrap selections follow the traced
    uniform values exactly like ops/brdf.eval_diffuse_brdf_v3; use_matte is
    the static material-mode gate (modes != 1 pass constant 0 rough/wrap,
    which folds the whole branch away)."""
    if use_matte:
        ndl = jnp.maximum(_dot3(n, l), 0.0)
        ndv = jnp.maximum(_dot3(n, v), 0.0)
        sigma2 = diff_rough * diff_rough
        a = 1.0 - 0.5 * (sigma2 / (sigma2 + 0.33))
        b = 0.45 * (sigma2 / (sigma2 + 0.09))
        sin_l = jnp.sqrt(jnp.maximum(0.0, 1.0 - ndl * ndl))
        sin_v = jnp.sqrt(jnp.maximum(0.0, 1.0 - ndv * ndv))
        tan_l = sin_l / jnp.maximum(ndl, 1e-4)
        tan_v = sin_v / jnp.maximum(ndv, 1e-4)
        sin_alpha = jnp.maximum(sin_l, sin_v)
        tan_beta = jnp.minimum(tan_l, tan_v)
        lp = _norm3((l[0] - n[0] * ndl, l[1] - n[1] * ndl, l[2] - n[2] * ndl))
        vp = _norm3((v[0] - n[0] * ndv, v[1] - n[1] * ndv, v[2] - n[2] * ndv))
        cos_phi = jnp.maximum(0.0, _dot3(lp, vp))
        oren = (a + b * cos_phi * sin_alpha * tan_beta) / PI
        w = jnp.where((ndl > 0.0) & (ndv > 0.0), oren, 0.0)
        on = (base[0] * w, base[1] * w, base[2] * w)
        lam = (base[0] / PI, base[1] / PI, base[2] / PI)
        brdf = _where3(diff_rough > 1e-4, on, lam)
        scale = jnp.where(ndl > 1e-4,
                          _wrap_ndotl(ndl, wrap) / jnp.maximum(ndl, 1e-4), 0.0)
        scale = jnp.where(wrap > 0.0, scale, 1.0)
        return (brdf[0] * scale, brdf[1] * scale, brdf[2] * scale)
    return (base[0] / PI, base[1] / PI, base[2] / PI)


def _brdf_pdf(n, v, l, rough, spec_prob):
    ndl = jnp.maximum(_dot3(n, l), 0.0)
    diff_pdf = ndl / PI
    h = _norm3(_add3(v, l))
    ndoth = jnp.maximum(_dot3(n, h), 0.001)
    vdoth = jnp.maximum(_dot3(v, h), 0.001)
    d = _distribution_ggx(ndoth, rough)
    spec_pdf = d * ndoth / (4.0 * vdoth)
    pdf = spec_prob * spec_pdf + (1.0 - spec_prob) * diff_pdf
    return jnp.where(ndl > 0.0, pdf, 0.0)


def _power_heuristic(pa, pb):
    a2 = pa * pa
    b2 = pb * pb
    return a2 / jnp.maximum(a2 + b2, 1e-8)


# --------------------------------------------------------------------------
# In-kernel traversal over the VMEM cluster SoA (same math/logic as
# ops/pallas_trace.py, with per-sweep one-hot attribute extraction).

def _root_gate_v(od, bgT_ref):
    """Scalar: does any LIVE ray enter the scene root AABB? Root bounds
    come from vector reductions over the GROUP AABBs (padding groups are
    inverted +BIG/-BIG, so min/max recover the real root). Same slab
    algebra as pallas_trace._root_gate; lets pure-sky blocks skip the
    entries pass, column relayouts, and worklist machinery."""
    act = od[6]
    tn = jnp.full((BLOCK,), -BIG)
    tf = jnp.full((BLOCK,), BIG)
    ok = act > 0.0
    for axis in range(3):
        lo = jnp.min(bgT_ref[axis, :])
        hi = jnp.max(bgT_ref[3 + axis, :])
        o = od[3 + axis]
        d = od[axis]
        parallel = jnp.abs(d) < 1e-8
        inv = 1.0 / jnp.where(parallel, 1.0, d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        tn = jnp.maximum(tn, jnp.where(parallel, -BIG, jnp.minimum(t1, t2)))
        tf = jnp.minimum(tf, jnp.where(parallel, BIG, jnp.maximum(t1, t2)))
        ok &= ~parallel | ((o >= lo) & (o <= hi))
    return jnp.any(ok & (tf >= jnp.maximum(tn, 0.0)))


def _trace_closest_attrs(num_k, kpad, soa_ref, attr_ref, bbT_ref, bgT_ref,
                         ct_ref, ev_ref, o3, d3, t_min, active, types, clip,
                         bt_ref, at_ref):
    """Closest hit over active lanes, returning (t [BLOCK] with BIG miss,
    attrs [BLOCK, 32]) where attrs rows = 16 SoA rows ++ 16 shading rows of
    the winning primitive, extracted by per-sweep one-hot MXU matmuls.

    Traversal machinery (two-level vectorized entries, per-cluster type
    dispatch, worklist pops) is SHARED with ops/pallas_trace — this
    function only adds the attribute extraction. `active` is an f32 mask
    (1.0 live). Per-ray state lives in the VMEM scratch refs bt_ref
    [BLOCK,1] / at_ref [BLOCK,32] — Mosaic's layout pass crashes on
    vector-valued while_loop carries, so only the worklist row and scalars
    are loop-carried. Blocks with no live ray into the root AABB (pure
    sky, or every lane dead) skip everything past the miss-initialization
    — the gate plus GATED column relayouts cut the per-dead-block cost
    ~4x (same finding as pallas_trace, measured round 3)."""
    od = [d3[0], d3[1], d3[2], o3[0], o3[1], o3[2], active]
    bt_ref[:] = jnp.where(active > 0.0, BIG, -BIG)[:, None]
    # Padding/never-hit lanes must read ptype < 0: bake -1 into column 11.
    at_ref[:] = -(jax.lax.broadcasted_iota(
        jnp.int32, (BLOCK, 2 * ROWS), 1) == 11).astype(jnp.float32)

    @pl.when(_root_gate_v(od, bgT_ref))
    def _traverse():
        lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 128), 1)
        cols = (d3[0][:, None], d3[1][:, None], d3[2][:, None],
                o3[0][:, None], o3[1][:, None], o3[2][:, None],
                t_min[:, None])
        kio = _block_entries(num_k, kpad, bbT_ref, bgT_ref, od, ev_ref)
        ev0 = ev_ref[:]

        def cond(carry):
            return carry[1] < BIG

        def body(carry):
            ev, _, k = carry

            def apply(ts):
                tsv = jnp.where(ts > 0.0, ts, BIG)
                best = bt_ref[:, 0]
                m = jnp.min(tsv, axis=1)
                improved = m < best
                packed = jnp.where(tsv == m[:, None], lane, jnp.int32(2 ** 30))
                wl = jnp.min(packed, axis=1)
                onehot = ((lane == wl[:, None])
                          & improved[:, None]).astype(jnp.float32)
                table = attr_ref[pl.ds(k * 128, 128), :]             # [C, 32]
                new_attrs = jax.lax.dot_general(
                    onehot, table, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)              # [BLOCK, 32]
                at_ref[:] = jnp.where(improved[:, None], new_attrs, at_ref[:])
                bt_ref[:] = jnp.where(improved, m, best)[:, None]

            _sweep_cluster(cols, soa_ref, k, types, clip, ct_ref, apply)
            ev = jnp.where(kio == k, INF, ev)
            e_next, k_next = _pop_nearest(ev, kio)
            bound = jnp.max(bt_ref[:, 0])
            e_next = jnp.where(e_next < bound, e_next, INF)
            return ev, e_next, k_next

        e0, k0 = _pop_nearest(ev0, kio)
        jax.lax.while_loop(cond, body, (ev0, e0, k0))

    return jnp.where(active > 0.0, bt_ref[:, 0], BIG), at_ref[:]


def _trace_any_1d(num_k, kpad, soa_ref, bbT_ref, bgT_ref, ct_ref, ev_ref,
                  o3, d3, t_min, accept_lo, active, types, clip, fd_ref):
    """Occlusion query over active lanes (f32 mask): [BLOCK] f32 mask of
    occluded lanes. fd_ref is an i32 [BLOCK,1] VMEM scratch; traversal
    machinery shared with ops/pallas_trace."""
    od = [d3[0], d3[1], d3[2], o3[0], o3[1], o3[2], active]
    fd_ref[:] = jnp.zeros((BLOCK, 1), jnp.int32)

    @pl.when(_root_gate_v(od, bgT_ref))
    def _traverse():
        cols = (d3[0][:, None], d3[1][:, None], d3[2][:, None],
                o3[0][:, None], o3[1][:, None], o3[2][:, None],
                t_min[:, None])
        kio = _block_entries(num_k, kpad, bbT_ref, bgT_ref, od, ev_ref)
        ev0 = ev_ref[:]
        lo_col = accept_lo[:, None]
        act_col = active[:, None] > 0.0

        def cond(carry):
            return carry[1] < BIG

        def body(carry):
            ev, _, k = carry

            def apply(ts):
                hit = jnp.any((ts > lo_col) & (ts < BIG) & act_col, axis=1)
                fd_ref[:] = (fd_ref[:, 0] | hit.astype(jnp.int32))[:, None]

            _sweep_cluster(cols, soa_ref, k, types, clip, ct_ref, apply)
            ev = jnp.where(kio == k, INF, ev)
            e_next, k_next = _pop_nearest(ev, kio)
            # Stop when every live lane is occluded.
            open_ = jnp.max(active - fd_ref[:, 0].astype(jnp.float32)) > 0.0
            e_next = jnp.where(open_, e_next, INF)
            return ev, e_next, k_next

        e0, k0 = _pop_nearest(ev0, kio)
        jax.lax.while_loop(cond, body, (ev0, e0, k0))

    return fd_ref[:, 0].astype(jnp.float32) * active


# --------------------------------------------------------------------------
# Parameter vector layout (host <-> kernel contract).

def _pack_params(u, light_order=(0, 1, 2)):
    """f32 parameter vector for SMEM, built with jnp so it traces under jit
    (uniforms are device values). Layout documented inline; indices are the
    kernel-side contract. `light_order` permutes the 3 light blocks so the
    ENABLED lights come first — the kernel's light loop is a fori over the
    first n_enabled blocks with dynamic SMEM offsets, which keeps one copy
    of the shadow/shading code in the program while preserving the XLA
    integrator's RNG draw order (enabled lights in index order)."""
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    ld = f32(u.light_dir).reshape(3, 3)
    la = f32(u.light_angle).reshape(3)
    lc = f32(u.light_color).reshape(3, 3)
    li = f32(u.light_intensity).reshape(3)
    nrm = jnp.maximum(jnp.linalg.norm(ld, axis=1, keepdims=True), 1e-12)
    axis = -ld / nrm
    cos_max = jnp.cos(la)
    l_pdf = 1.0 / jnp.maximum(TWO_PI * (1.0 - cos_max), 1e-6)
    lights = jnp.concatenate(
        [jnp.concatenate([axis[i], lc[i], li[i:i + 1], cos_max[i:i + 1],
                          l_pdf[i:i + 1]]) for i in light_order])  # [27] @14
    scalars = jnp.stack([
        f32(u.ray_bias), f32(u.t_min), f32(u.metallic), f32(u.roughness),
        f32(u.rim_boost), f32(u.matte_specular), f32(u.matte_roughness),
        f32(u.matte_diffuse_roughness), f32(u.wrap_diffuse),
        f32(u.surface_ior), f32(u.surface_transmission),
        f32(u.surface_opacity), f32(u.dof_aperture),
        f32(u.dof_focus_distance)])                              # [14] @44
    return jnp.concatenate([
        f32(u.cam_origin).reshape(3),          # 0
        f32(u.cam_forward).reshape(3),         # 3
        f32(u.cam_right).reshape(3),           # 6
        f32(u.cam_up).reshape(3),              # 9
        f32(u.resolution).reshape(2),          # 12
        lights,                                # 14 + 9i
        f32(u.ambient_color).reshape(3) * f32(u.ambient_intensity),  # 41
        scalars,                               # 44..57
        f32(u.clip_normal).reshape(3),         # 58
        f32(u.clip_offset).reshape(1),         # 61
        f32(u.clip_side).reshape(1),           # 62
        f32(u.base_color).reshape(3),          # 63
    ])


def _make_path_kernel(flags_key, types, kpad):
    """Build the megakernel body. flags_key is the static-config tuple
    (material_mode, use_imported_color, cast_shadows, max_bounces,
    light_enabled, rim_enabled, dof_enabled, clip_enabled,
    surface_flag_mode, with_stats).

    All per-ray state lives in VMEM scratch refs and every conditional is a
    pl.when over a scalar — Mosaic's layout pass cannot handle vector-valued
    lax.cond/while carries, so the bounce loop mutates refs instead of
    threading carries (the proven shape discipline of ops/pallas_trace).

    State-ref row layout (st_ref [16, BLOCK] f32): origin 0-2, direction
    3-5, throughput 6-8, radiance 9-11, last_pdf 12, alive mask 13.
    si_ref [3, BLOCK] i32: PCG state 0, path-segment count 1 (closest-hit
    extensions), occlusion-candidate count 2 (shadow any-hit rays)."""
    (material_mode, use_imported_color, cast_shadows, max_bounces,
     light_enabled, rim_enabled, dof_enabled, clip_enabled,
     surface_flag_mode, with_stats) = flags_key

    def kernel(num_k_ref, ints_ref, params_ref, px_ref, py_ref,
               soa_ref, attr_ref, bbT_ref, bgT_ref, ct_ref, r_out, g_out,
               b_out, n_out, m_out, st_ref, si_ref, bt_ref, at_ref, fd_ref,
               ev_ref):
        num_k = num_k_ref[0]
        frame = ints_ref[0]
        sample = ints_ref[1]
        P = params_ref

        def p3(i):
            return (P[i], P[i + 1], P[i + 2])

        def get3(row):
            return (st_ref[row, :], st_ref[row + 1, :], st_ref[row + 2, :])

        def put3(row, v):
            st_ref[row, :] = v[0]
            st_ref[row + 1, :] = v[1]
            st_ref[row + 2, :] = v[2]

        # --- camera ray generation (webgl.js:1508-1544) -------------------
        px = px_ref[:]
        py = py_ref[:]
        seed = _pcg_hash(px + py * 65536 + frame * np.int32(15485863))
        seed = seed + sample * _MUL
        seed, jx = _rand(seed)
        seed, jy = _rand(seed)
        pixel_x = px.astype(jnp.float32) + 0.5 + (jx - 0.5)
        pixel_y = py.astype(jnp.float32) + 0.5 + (jy - 0.5)
        uvx = (pixel_x + 0.5) / P[12] * 2.0 - 1.0
        uvy = (pixel_y + 0.5) / P[13] * 2.0 - 1.0
        fwd = p3(3)
        right = p3(6)
        up = p3(9)
        d = _norm3((fwd[0] + uvx * right[0] + uvy * up[0],
                    fwd[1] + uvx * right[1] + uvy * up[1],
                    fwd[2] + uvx * right[2] + uvy * up[2]))
        ones = jnp.ones((BLOCK,), jnp.float32)
        zero = jnp.zeros((BLOCK,), jnp.float32)
        o = (P[0] * ones, P[1] * ones, P[2] * ones)

        if dof_enabled:
            fwd_n = _norm3(fwd)
            right_n = _norm3(right)
            up_n = _norm3(up)
            denom = jnp.maximum(_dot3(d, fwd_n), 1e-4)
            t_focus = P[57] / denom
            focus = _add3(o, _scale3(d, t_focus))
            seed, l1, l2 = _rand2(seed)
            r_l = jnp.sqrt(l1)
            phi_l = TWO_PI * l2
            lx = jnp.cos(phi_l) * r_l * P[56]
            ly = jnp.sin(phi_l) * r_l * P[56]
            o = (o[0] + right_n[0] * lx + up_n[0] * ly,
                 o[1] + right_n[1] * lx + up_n[1] * ly,
                 o[2] + right_n[2] * lx + up_n[2] * ly)
            d = _norm3((focus[0] - o[0], focus[1] - o[1], focus[2] - o[2]))

        put3(0, o)
        put3(3, d)
        put3(6, (ones, ones, ones))
        put3(9, (zero, zero, zero))
        st_ref[12, :] = zero            # last_pdf
        st_ref[13, :] = ones            # alive mask
        si_ref[0, :] = seed
        si_ref[1, :] = jnp.zeros((BLOCK,), jnp.int32)
        si_ref[2, :] = jnp.zeros((BLOCK,), jnp.int32)

        bias = jnp.maximum(P[44], 1e-4)
        t_min = P[45] * ones
        clip = ((P[58], P[59], P[60]), P[61], P[62]) if clip_enabled else None
        ambient = p3(41)

        def run_bounce(bounce):
            o = get3(0)
            d = get3(3)
            alive = st_ref[13, :]
            if with_stats:
                si_ref[1, :] = si_ref[1, :] + (alive > 0.0).astype(jnp.int32)
            t, attrs = _trace_closest_attrs(
                num_k, kpad, soa_ref, attr_ref, bbT_ref, bgT_ref, ct_ref,
                ev_ref, o, d, t_min, alive, types, clip, bt_ref, at_ref)
            hit = attrs[:, 11] >= 0.0

            # --- miss -> ambient (no env on this path), then cull ----------
            tp = get3(6)
            miss = (alive > 0.0) & ~hit
            for c in range(3):
                st_ref[9 + c, :] = jnp.where(
                    miss, st_ref[9 + c, :] + tp[c] * ambient[c],
                    st_ref[9 + c, :])
            alive = jnp.where(hit, alive, 0.0)
            st_ref[13, :] = alive

            @pl.when(jnp.max(alive) > 0.0)
            def _shade():
                tp = get3(6)
                seed = si_ref[0, :]
                last_pdf = st_ref[12, :]
                alive_b = st_ref[13, :] > 0.0
                pos = _add3(o, _scale3(d, jnp.where(hit, t, 0.0)))
                ptype = attrs[:, 11]
                pa = (attrs[:, 0], attrs[:, 1], attrs[:, 2])
                pb = (attrs[:, 4], attrs[:, 5], attrs[:, 6])
                pc = (attrs[:, 8], attrs[:, 9], attrs[:, 10])

                # --- normals + color (webgl.js:1244-1272) -----------------
                n_raw = (zero, zero, zero)
                if types[0]:
                    n_sph = _norm3((pos[0] - pa[0], pos[1] - pa[1],
                                    pos[2] - pa[2]))
                    n_raw = _where3(ptype == PRIM_SPHERE, n_sph, n_raw)
                if types[1]:
                    av = (pb[0] - pa[0], pb[1] - pa[1], pb[2] - pa[2])
                    height = jnp.sqrt(_dot3(av, av))
                    degen = height < 1e-6
                    inv_h = 1.0 / jnp.where(degen, 1.0, height)
                    axv = _scale3(av, inv_h)
                    rel = (pos[0] - pa[0], pos[1] - pa[1], pos[2] - pa[2])
                    hh = _dot3(rel, axv)
                    cap1 = (~degen) & (hh < 0.0)
                    cap2 = (~degen) & (hh > height)
                    side = (rel[0] - axv[0] * hh, rel[1] - axv[1] * hh,
                            rel[2] - axv[2] * hh)
                    rel2 = (pos[0] - pb[0], pos[1] - pb[1], pos[2] - pb[2])
                    n_cyl = _where3(cap1 | degen, _norm3(rel),
                                    _where3(cap2, _norm3(rel2), _norm3(side)))
                    n_raw = _where3(ptype == PRIM_CYLINDER, n_cyl, n_raw)
                if types[2]:
                    e1 = (pb[0] - pa[0], pb[1] - pa[1], pb[2] - pa[2])
                    e2 = (pc[0] - pa[0], pc[1] - pa[1], pc[2] - pa[2])
                    n_tri = _norm3(_cross3(e1, e2))
                    n_raw = _where3(ptype == PRIM_TRIANGLE, n_tri, n_raw)

                front = _dot3(n_raw, d) < 0.0
                n_geom = _where3(front, n_raw,
                                 (-n_raw[0], -n_raw[1], -n_raw[2]))
                sn = n_geom
                if types[2]:
                    # Interpolated vertex normals from the attr rows.
                    e1 = (pb[0] - pa[0], pb[1] - pa[1], pb[2] - pa[2])
                    e2 = (pc[0] - pa[0], pc[1] - pa[1], pc[2] - pa[2])
                    pv = _cross3(d, e2)
                    det = _dot3(e1, pv)
                    inv = 1.0 / jnp.where(jnp.abs(det) >= 1e-6, det, 1.0)
                    tv = (o[0] - pa[0], o[1] - pa[1], o[2] - pa[2])
                    bu = _dot3(tv, pv) * inv
                    qv = _cross3(tv, e1)
                    bv = _dot3(d, qv) * inv
                    b0 = 1.0 - bu - bv
                    tn0 = (attrs[:, _A_N0], attrs[:, _A_N0 + 1], attrs[:, _A_N0 + 2])
                    tn1 = (attrs[:, _A_N1], attrs[:, _A_N1 + 1], attrs[:, _A_N1 + 2])
                    tn2 = (attrs[:, _A_N2], attrs[:, _A_N2 + 1], attrs[:, _A_N2 + 2])
                    tsn = _norm3((b0 * tn0[0] + bu * tn1[0] + bv * tn2[0],
                                  b0 * tn0[1] + bu * tn1[1] + bv * tn2[1],
                                  b0 * tn0[2] + bu * tn1[2] + bv * tn2[2]))
                    flip = _dot3(tsn, n_geom) < 0.0
                    tsn = _where3(flip, (-tsn[0], -tsn[1], -tsn[2]), tsn)
                    sn = _where3(ptype == PRIM_TRIANGLE, tsn, sn)

                if use_imported_color:
                    base = (attrs[:, _A_COLOR], attrs[:, _A_COLOR + 1],
                            attrs[:, _A_COLOR + 2])
                else:
                    base = (P[63] * ones, P[64] * ones, P[65] * ones)
                v = (-d[0], -d[1], -d[2])
                o_new = o
                d_new = d

                # --- glass / translucent (webgl.js:1276-1313) --------------
                transmit = jnp.zeros((BLOCK,), bool)
                if material_mode in (2, 3):
                    seed, r_op = _rand(seed)
                    if material_mode == 2:
                        glass_lane = ptype == PRIM_TRIANGLE
                        if surface_flag_mode != 0 and types[2]:
                            glass_lane = glass_lane & (attrs[:, _A_FLAG] > 0.5)
                    else:
                        glass_lane = jnp.ones((BLOCK,), bool)
                    transmit = alive_b & glass_lane & (r_op >= P[55])

                    cosi = jnp.clip(-_dot3(d, n_geom), 0.0, 1.0)
                    ior = jnp.maximum(P[53], 1e-3)
                    f0s = ((P[53] - 1.0) / (P[53] + 1.0)) ** 2
                    fres = f0s + (1.0 - f0s) * _pow5(1.0 - cosi)
                    eta = jnp.where(front, 1.0 / ior, ior)
                    sin2 = eta * eta * (1.0 - cosi * cosi)
                    can_refract = sin2 <= 1.0
                    cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2))
                    kk = eta * cosi - cost
                    refr = (eta * d[0] + kk * n_geom[0],
                            eta * d[1] + kk * n_geom[1],
                            eta * d[2] + kk * n_geom[2])
                    reflect_prob = jnp.where(can_refract, fres, 1.0)
                    seed, r_ref = _rand(seed)
                    seed, b1, b2 = _rand2(seed)
                    do_reflect = r_ref < reflect_prob
                    if material_mode == 3:
                        trans_rough = jnp.clip(P[47], 0.02, 1.0)
                        rr_ = _norm3(_reflect3(d, n_geom))
                        phi = TWO_PI * b1
                        cos_t = jnp.exp(jnp.log(jnp.maximum(1.0 - b2, 1e-20))
                                        / (trans_rough * 4.0 + 1.0))
                        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
                        blurred = _to_world(rr_, jnp.cos(phi) * sin_t,
                                            jnp.sin(phi) * sin_t, cos_t)
                        smooth = P[47] <= 0.02
                        refl_dir = _where3(smooth, rr_, blurred)
                        ra_ = _norm3(refr)
                        cone_angle = jnp.clip(trans_rough * trans_rough * 0.75,
                                              0.0, 1.2)
                        cmx = jnp.cos(cone_angle)
                        cos_tc = cmx + (1.0 - cmx) * b1
                        sin_tc = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_tc * cos_tc))
                        phic = TWO_PI * b2
                        around = _to_world(ra_, jnp.cos(phic) * sin_tc,
                                           jnp.sin(phic) * sin_tc, cos_tc)
                        refr_dir = _where3(smooth, ra_, around)
                    else:
                        refl_dir = _norm3(_reflect3(d, n_geom))
                        refr_dir = _norm3(refr)
                    tdir = _where3(do_reflect, refl_dir, refr_dir)
                    t_o = _where3(do_reflect,
                                  _add3(pos, _scale3(n_geom, bias)),
                                  (pos[0] - n_geom[0] * bias,
                                   pos[1] - n_geom[1] * bias,
                                   pos[2] - n_geom[2] * bias))
                    tint = (1.0 + (base[0] - 1.0) * P[54],
                            1.0 + (base[1] - 1.0) * P[54],
                            1.0 + (base[2] - 1.0) * P[54])
                    tmask = transmit & ~do_reflect
                    tp = tuple(jnp.where(tmask, tp[c] * tint[c], tp[c])
                               for c in range(3))
                    o_new = _where3(transmit, t_o, o_new)
                    d_new = _where3(transmit, tdir, d_new)
                    last_pdf = jnp.where(transmit, 0.0, last_pdf)

                shade_lane = alive_b & ~transmit
                shade_f = shade_lane.astype(jnp.float32)

                # --- material params (webgl.js:1097-1102) -----------------
                use_matte = material_mode == 1
                metallic = P[46] if material_mode == 0 else np.float32(0.0)
                rough = P[50] if use_matte else P[47]
                if use_matte:
                    f0 = (P[49] * ones, P[49] * ones, P[49] * ones)
                else:
                    f0 = ((1.0 - metallic) * 0.04 + base[0] * metallic,
                          (1.0 - metallic) * 0.04 + base[1] * metallic,
                          (1.0 - metallic) * 0.04 + base[2] * metallic)
                diff_rough = P[51] if use_matte else np.float32(0.0)
                wrap = P[52] if use_matte else np.float32(0.0)

                # --- cone lights + shadows + MIS (webgl.js:1094-1145) -----
                # ONE fori over the enabled lights (packed first by
                # _pack_params) with dynamic SMEM offsets: a single copy of
                # the shadow-trace + shading code in the program regardless
                # of light count, which is what keeps Mosaic compile time
                # sane. RNG draws ride si_ref[0] so the loop carries only
                # the index (vector while/fori carries crash Mosaic).
                shadow_min = jnp.maximum(bias, P[45]) * ones
                shadow_o = _add3(pos, _scale3(n_geom, bias))
                spec_w_l = _max3(f0)
                diff_w_l = (1.0 - metallic) * _max3(base)
                sumw_l = spec_w_l + diff_w_l
                spec_prob_l = jnp.where(
                    sumw_l > 0.0, spec_w_l / jnp.maximum(sumw_l, 1e-12), 0.5)
                si_ref[0, :] = seed

                def light_body(j, carry):
                    seed_l = si_ref[0, :]
                    seed_l, l1, l2 = _rand2(seed_l)
                    si_ref[0, :] = seed_l
                    base_i = 14 + 9 * j
                    axis = (P[base_i] * ones, P[base_i + 1] * ones,
                            P[base_i + 2] * ones)
                    cmx = P[base_i + 7]
                    cos_t = cmx + (1.0 - cmx) * l1
                    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
                    phi = TWO_PI * l2
                    ldir = _to_world(axis, jnp.cos(phi) * sin_t,
                                     jnp.sin(phi) * sin_t, cos_t)
                    l_pdf = P[base_i + 8]
                    ndl = jnp.maximum(_dot3(sn, ldir), 0.0)
                    candidate = shade_f * (ndl > 0.0).astype(jnp.float32)
                    if cast_shadows:
                        if with_stats:
                            si_ref[2, :] = (si_ref[2, :]
                                            + candidate.astype(jnp.int32))
                        occ = _trace_any_1d(num_k, kpad, soa_ref,
                                            bbT_ref, bgT_ref, ct_ref,
                                            ev_ref, shadow_o, ldir, t_min,
                                            shadow_min, candidate, types,
                                            clip, fd_ref)
                        lit = (candidate > 0.0) & (occ <= 0.0)
                    else:
                        lit = candidate > 0.0
                    h = _norm3(_add3(v, ldir))
                    ndv = jnp.maximum(_dot3(sn, v), 0.001)
                    ndh = jnp.maximum(_dot3(sn, h), 0.001)
                    vdh = jnp.maximum(_dot3(v, h), 0.001)
                    dd = _distribution_ggx(ndh, rough)
                    g = _geometry_smith(ndv, ndl, rough)
                    fr = _fresnel3(vdh, f0)
                    ks = (dd * g) / jnp.maximum(4.0 * ndv * ndl, 0.001)
                    diff = _eval_diffuse(sn, v, ldir, base, diff_rough, wrap,
                                         material_mode == 1)
                    pdf_b = _brdf_pdf(sn, v, ldir, rough, spec_prob_l)
                    mis = _power_heuristic(l_pdf, pdf_b)
                    w = ndl * mis / jnp.maximum(l_pdf, 1e-6) * P[base_i + 6]
                    # lit implies shade_lane, so gating the radiance add by
                    # lit alone matches the original shade_lane-gated
                    # accumulate of the summed `direct`.
                    for c in range(3):
                        contrib = ((fr[c] * ks + diff[c] * (1.0 - metallic)
                                    * (1.0 - fr[c])) * P[base_i + 3 + c] * w)
                        st_ref[9 + c, :] = jnp.where(
                            lit, st_ref[9 + c, :] + tp[c] * contrib,
                            st_ref[9 + c, :])
                    return carry

                n_lights = sum(1 for e in light_enabled if e)
                if n_lights:
                    jax.lax.fori_loop(0, n_lights, light_body, 0)
                seed = si_ref[0, :]

                # --- rim boost, primary hit only (webgl.js:1326-1331) -----
                if rim_enabled and material_mode == 0:
                    ndv = jnp.maximum(_dot3(sn, v), 0.0)
                    omv = 1.0 - ndv
                    rim = (omv * omv * omv * P[48]
                           * jnp.where(bounce == 0, 1.0, 0.0))
                    for c in range(3):
                        st_ref[9 + c, :] = jnp.where(
                            shade_lane, st_ref[9 + c, :] + tp[c] * base[c] * rim,
                            st_ref[9 + c, :])

                # --- BRDF sampling (webgl.js:1387-1429) -------------------
                spec_w = _max3(f0)
                diff_w = (1.0 - metallic) * _max3(base)
                sumw = spec_w + diff_w
                spec_prob = jnp.clip(
                    jnp.where(sumw > 0.0, spec_w / jnp.maximum(sumw, 1e-12),
                              1.0), 0.0, 1.0)
                seed, r_lobe = _rand(seed)
                seed, s1, s2 = _rand2(seed)
                choose_spec = r_lobe < spec_prob

                a_g = rough * rough
                a2_g = a_g * a_g
                phi = TWO_PI * s1
                cos_t = jnp.sqrt((1.0 - s2) / (1.0 + (a2_g - 1.0) * s2))
                sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
                hv = _to_world(sn, jnp.cos(phi) * sin_t,
                               jnp.sin(phi) * sin_t, cos_t)
                spec_dir = _norm3(_reflect3(d, hv))
                ndl_s = jnp.maximum(_dot3(sn, spec_dir), 0.0)
                ndv = jnp.maximum(_dot3(sn, v), 0.001)
                ndh = jnp.maximum(_dot3(sn, hv), 0.001)
                vdh = jnp.maximum(_dot3(v, hv), 0.001)
                g = _geometry_smith(ndv, ndl_s, rough)
                fr = _fresnel3(vdh, f0)
                kw = g * vdh / (ndv * ndh * jnp.maximum(spec_prob, 0.01))
                spec_weight = (fr[0] * kw, fr[1] * kw, fr[2] * kw)
                d_ggx = _distribution_ggx(ndh, rough)
                spec_last_pdf = spec_prob * d_ggx * ndh / (4.0 * vdh)

                phi_d = TWO_PI * s1
                cos_td = jnp.sqrt(1.0 - s2)
                sin_td = jnp.sqrt(s2)
                diff_dir = _to_world(sn, jnp.cos(phi_d) * sin_td,
                                     jnp.sin(phi_d) * sin_td, cos_td)
                ndl_d = jnp.maximum(_dot3(sn, diff_dir), 0.0)
                diff_brdf = _eval_diffuse(sn, v, diff_dir, base, diff_rough,
                                          wrap, material_mode == 1)
                kd = (1.0 - metallic) * PI / jnp.maximum(1.0 - spec_prob, 0.01)
                diff_weight = (diff_brdf[0] * kd, diff_brdf[1] * kd,
                               diff_brdf[2] * kd)
                diff_last_pdf = (1.0 - spec_prob) * ndl_d / PI

                bounce_dir = _where3(choose_spec, spec_dir, diff_dir)
                weight = _where3(choose_spec, spec_weight, diff_weight)
                dead_spec = choose_spec & (ndl_s <= 0.0)

                tp = tuple(jnp.where(shade_lane, tp[c] * weight[c], tp[c])
                           for c in range(3))
                mx = _max3(tp)
                tscale = jnp.where(mx > 10.0, 10.0 / jnp.maximum(mx, 1e-12),
                                   1.0)
                tp = tuple(tp[c] * tscale for c in range(3))
                o_new = _where3(shade_lane,
                                _add3(pos, _scale3(n_geom, bias)), o_new)
                d_new = _where3(shade_lane, bounce_dir, d_new)
                last_pdf = jnp.where(
                    shade_lane,
                    jnp.where(choose_spec, spec_last_pdf, diff_last_pdf),
                    last_pdf)

                # --- Russian roulette from bounce 1 (webgl.js:1434-1441) --
                # `bounce` is a traced scalar (the bounce loop is a
                # while_loop), so the draw-or-not decision is a scalar
                # select: at bounce 0 the state does NOT advance and no
                # kill/boost applies, matching the XLA integrator's stream.
                seed2, rr = _rand(seed)
                later = bounce >= 1
                seed = jnp.where(later, seed2, seed)
                p = jnp.clip(_max3(tp), 0.05, 0.95)
                rr_kill = shade_lane & (rr > p) & later
                boost = jnp.where(shade_lane & later, 1.0 / p, 1.0)
                tp = tuple(tp[c] * boost for c in range(3))

                alive2 = transmit | (shade_lane & ~dead_spec & ~rr_kill)
                put3(0, o_new)
                put3(3, d_new)
                put3(6, tp)
                st_ref[12, :] = last_pdf
                st_ref[13, :] = alive2.astype(jnp.float32)
                si_ref[0, :] = seed

        # ONE copy of the bounce body in the program: a while_loop over the
        # bounce index with scalar-only carries (all vector state lives in
        # the scratch refs). Early-exits when every lane in the block has
        # died — the in-kernel replacement for the block-compaction pass.
        def bounce_cond(c):
            b, alive_any = c
            return (b < max_bounces) & (alive_any > 0.0)

        def bounce_step(c):
            b, _ = c
            run_bounce(b)
            return b + 1, jnp.max(st_ref[13, :])

        jax.lax.while_loop(bounce_cond, bounce_step,
                           (jnp.int32(0), jnp.float32(1.0)))

        r_out[:] = jnp.minimum(st_ref[9, :], 100.0)
        g_out[:] = jnp.minimum(st_ref[10, :], 100.0)
        b_out[:] = jnp.minimum(st_ref[11, :], 100.0)
        n_out[:] = si_ref[1, :]
        m_out[:] = si_ref[2, :]

    return kernel


# --------------------------------------------------------------------------
# Host-side scene/param staging and dispatch.


def build_attr_soa(num_clusters, cluster_size, cluster_prims, cluster_color,
                   tri_normals, tri_flags, tri_count):
    """[K, C, 16] prim-major shading attributes aligned with cluster_prims:
    color rgb (cols 0-2), tri vertex normals n0/n1/n2 (3-11), tri flag (12).
    Prim-major so the kernel's one-hot [B,128]x[128,32] matmul reads it as
    the right operand directly (Mosaic crashes on transposed contractions).
    Host NumPy; called once by scene.compile.compile_scene."""
    k, c = num_clusters, cluster_size
    prims = np.asarray(cluster_prims)                # [K, C, 12]
    colors = np.asarray(cluster_color).reshape(k, c, 3)
    attr = np.zeros((k, c, AROWS), np.float32)
    attr[:, :, 0:3] = colors
    if tri_count:
        ptype = prims[..., 11]
        local = prims[..., 7].astype(np.int32)
        tri_m = ptype == PRIM_TRIANGLE
        tn = np.asarray(tri_normals)                 # [Nt, 3, 3]
        tf = np.asarray(tri_flags)
        li = np.clip(local, 0, tn.shape[0] - 1)
        kk, cc = np.nonzero(tri_m)
        l2 = li[kk, cc]
        attr[kk, cc, 3:6] = tn[l2, 0]
        attr[kk, cc, 6:9] = tn[l2, 1]
        attr[kk, cc, 9:12] = tn[l2, 2]
        attr[kk, cc, 12] = tf[l2]
    return attr


def supports(scene, flags, env, vol) -> bool:
    """Configurations the megakernel covers; everything else falls back to
    the XLA integrator."""
    return (flags.tracer == "wavefront"
            and flags.use_bvh
            and not flags.distributed
            and flags.vis_mode == 0
            and not flags.use_env
            and not flags.volume_enabled
            and env is None and vol is None
            and getattr(scene, "cluster_attr", None) is not None
            and 1 <= scene.num_clusters <= MAX_CLUSTERS_PATH
            and scene.cluster_size == 128
            and scene.prim_count > 0)


def _flags_key(flags, with_stats):
    return (flags.material_mode, flags.use_imported_color, flags.cast_shadows,
            flags.max_bounces, tuple(flags.light_enabled), flags.rim_enabled,
            flags.dof_enabled, flags.clip_enabled, flags.surface_flag_mode,
            bool(with_stats))


def render_sample(scene, flags, u, px, py, frame_index, sample_index,
                  with_stats=False, interpret=False):
    """One path-traced sample for every pixel via the megakernel.

    Returns (radiance triple of [N], (path_rays, occl_rays) scalar i32 —
    closest-hit extension segments / shadow any-hit candidates, matching
    render/integrator.trace_paths' accounting). Radiance matches
    render/integrator.trace_paths bit-for-bit in RNG stream for the same
    configs (see module docstring)."""
    n = px.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    k = scene.num_clusters
    kpad = _kpad(k)
    types = (scene.sphere_count > 0, scene.cylinder_count > 0,
             scene.tri_count > 0)

    # Scene-side operands. The megakernel works in GLOBAL coordinates (the
    # shading math needs true positions); scenes are molecule/bench scale so
    # f32 conditioning is fine without the centered shift. Padding prims
    # (type < 0) get NaN radii so the shared pallas_trace intersectors'
    # single-type fast paths (no ptype mask) reject them for free.
    soa = jnp.asarray(scene.cluster_soa, jnp.float32)
    soa = soa.at[:, 3, :].set(
        jnp.where(soa[:, 11, :] < 0.0, jnp.float32(np.nan), soa[:, 3, :]))
    pad = jnp.zeros((k, ROWS - 12, scene.cluster_size), jnp.float32)
    soa16 = jnp.concatenate([soa, pad],
                            axis=1).reshape(k * ROWS, scene.cluster_size)
    # Prim-major one-hot table: traversal row ++ shading attrs, pad to 32.
    attr = jnp.concatenate(
        [jnp.asarray(scene.cluster_prims, jnp.float32),
         jnp.asarray(scene.cluster_attr, jnp.float32),
         jnp.zeros((k, scene.cluster_size, 32 - 12 - AROWS), jnp.float32)],
        axis=2).reshape(k * scene.cluster_size, 32)
    # Lane-packed cluster AABBs + 128-cluster group AABBs for the shared
    # two-level entries pass (GLOBAL coordinates; inverted padding).
    bmin = jnp.asarray(scene.cluster_bmin, jnp.float32)
    bmax = jnp.asarray(scene.cluster_bmax, jnp.float32)
    bmin_p = jnp.concatenate(
        [bmin, jnp.full((kpad - k, 3), BIG, jnp.float32)])
    bmax_p = jnp.concatenate(
        [bmax, jnp.full((kpad - k, 3), -BIG, jnp.float32)])
    bbT = jnp.concatenate([bmin_p.T, bmax_p.T,
                           jnp.zeros((2, kpad), jnp.float32)])
    ng = kpad // 128
    gmin = jnp.min(bmin_p.reshape(ng, 128, 3), axis=1)
    gmax = jnp.max(bmax_p.reshape(ng, 128, 3), axis=1)
    gmin = jnp.concatenate(
        [gmin, jnp.full((128 - ng, 3), BIG, jnp.float32)])
    gmax = jnp.concatenate(
        [gmax, jnp.full((128 - ng, 3), -BIG, jnp.float32)])
    bgT = jnp.concatenate([gmin.T, gmax.T,
                           jnp.zeros((2, 128), jnp.float32)])
    # Per-cluster type for the sweep dispatch (-1 = mixed/hand-built).
    prow = jnp.asarray(scene.cluster_soa)[:, 11, :]
    valid = prow >= 0
    tmax = jnp.max(jnp.where(valid, prow, -1.0), axis=1)
    tmn = jnp.min(jnp.where(valid, prow, 99.0), axis=1)
    ct = jnp.where((tmax == tmn) & (tmax >= 0), tmax, -1.0).astype(jnp.int32)

    # Enabled lights packed first so the kernel's light fori only walks
    # them (RNG order preserved: enabled lights in index order).
    order = tuple(i for i in range(3) if flags.light_enabled[i]) + tuple(
        i for i in range(3) if not flags.light_enabled[i])
    params = _pack_params(u, light_order=order)
    ints = jnp.stack(
        [jnp.asarray(frame_index).astype(jnp.int32),
         jnp.asarray(sample_index, jnp.int32)])

    px_i = jnp.asarray(px, jnp.int32)
    py_i = jnp.asarray(py, jnp.int32)
    if n_pad != n:
        px_i = jnp.concatenate([px_i, jnp.zeros(n_pad - n, jnp.int32)])
        py_i = jnp.concatenate([py_i, jnp.zeros(n_pad - n, jnp.int32)])

    kernel = _make_path_kernel(_flags_key(flags, with_stats), types, kpad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # ints
            pl.BlockSpec(memory_space=pltpu.SMEM),           # params
            pl.BlockSpec((BLOCK,), lambda i, s: (i,)),       # px
            pl.BlockSpec((BLOCK,), lambda i, s: (i,)),       # py
            pl.BlockSpec((k * ROWS, 128), lambda i, s: (0, 0)),
            pl.BlockSpec((k * 128, 32), lambda i, s: (0, 0)),
            pl.BlockSpec((8, kpad), lambda i, s: (0, 0)),    # cluster AABBs
            pl.BlockSpec((8, 128), lambda i, s: (0, 0)),     # group AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),           # cluster types
        ],
        out_specs=[pl.BlockSpec((BLOCK,), lambda i, s: (i,))
                   for _ in range(5)],
        scratch_shapes=[
            pltpu.VMEM((16, BLOCK), jnp.float32),   # st: per-ray path state
            pltpu.VMEM((3, BLOCK), jnp.int32),      # si: PCG + ray counters
            pltpu.VMEM((BLOCK, 1), jnp.float32),    # bt: traversal best-t
            pltpu.VMEM((BLOCK, 32), jnp.float32),   # at: winner attributes
            pltpu.VMEM((BLOCK, 1), jnp.int32),      # fd: any-hit found
            pltpu.VMEM((1, kpad), jnp.float32),     # ev: cluster entries
        ],
    )
    r, g, b, npath, noccl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad,), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((n_pad,), jnp.int32)] * 2,
        # The traversal sweeps keep ~30 MB of [BLOCK,128] intermediates
        # live; the default 16 MB scoped-vmem budget rejects the kernel at
        # compile time. v5e VMEM is 128 MB and the explicit operands are
        # ≤10 MB at MAX_CLUSTERS_PATH, so give Mosaic most of the rest.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.array([k], jnp.int32), ints, params, px_i, py_i, soa16, attr,
      bbT, bgT, ct)
    radiance = (r[:n], g[:n], b[:n])
    return radiance, (jnp.sum(npath[:n]), jnp.sum(noccl[:n]))
