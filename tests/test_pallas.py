"""Pallas sphere-traversal kernel vs the XLA dense sweep (interpret mode;
the real-TPU path is exercised by bench.py and the CLI)."""

import jax.numpy as jnp
import numpy as np
import pytest

from webgl_raytracer_tpu.models.molecular import Geometry
from webgl_raytracer_tpu.scene import compile_scene
import webgl_raytracer_tpu.ops.pallas_trace as PS
import webgl_raytracer_tpu.ops.wavefront as W


@pytest.fixture(scope="module")
def sphere_scene():
    rng = np.random.default_rng(11)
    n = 400
    centers = (rng.random((n, 3)).astype(np.float32) - 0.5) * 14
    radii = (0.15 + rng.random(n) * 0.3).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    return compile_scene(Geometry(centers, radii, colors, z3, z3, z1, z3))


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(5)
    n = 1500   # not a BLOCK multiple: exercises padding
    o = rng.normal(size=(3, n)).astype(np.float32) * 3
    o[2] += 12
    d = rng.normal(size=(3, n)).astype(np.float32)
    d[2] -= 1.5
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    o3 = tuple(jnp.asarray(o[i]) for i in range(3))
    d3 = tuple(jnp.asarray(d[i]) for i in range(3))
    return o3, d3, jnp.full((n,), np.float32(1e-3))


def test_supports(sphere_scene):
    assert PS.supports(sphere_scene, None)
    # Clip planes are handled in-kernel since round 2.
    assert PS.supports(sphere_scene, (np.array([0.0, 0.0, 1.0]), 5.0, 1.0))


def test_closest_matches_dense(sphere_scene, rays):
    o3, d3, tmin = rays
    rec = W._dense_trace(sphere_scene, o3, d3, tmin, None, any_hit=False,
                         accept_min=None, t_max=None, active=None)
    ct, cr = PS.trace_closest(sphere_scene, o3, d3, tmin, interpret=True)
    dhit = np.asarray(rec.prim_type >= 0)
    phit = np.asarray(cr) >= 0
    # Tangency rounding may flip isolated rays; require near-total agreement.
    assert (dhit == phit).mean() > 0.999
    both = dhit & phit
    rec_p = W._finalize_hit(sphere_scene, o3, d3, tmin, None,
                            jnp.asarray(ct), jnp.asarray(cr),
                            cost=jnp.zeros(tmin.shape, jnp.int32))
    same = np.asarray(rec_p.prim_local)[both] == np.asarray(rec.prim_local)[both]
    assert same.mean() > 0.999
    t_ref = np.asarray(rec.t)[both][same]
    t_new = np.asarray(ct)[both][same]
    assert np.abs(t_new - t_ref).max() <= 1e-3 * np.maximum(t_ref, 1.0).max()


def test_any_matches_dense(sphere_scene, rays):
    o3, d3, tmin = rays
    lo = jnp.full(tmin.shape, 0.01)
    fd = W._dense_trace(sphere_scene, o3, d3, tmin, None, any_hit=True,
                        accept_min=lo, t_max=30.0, active=None)
    fp = PS.trace_any(sphere_scene, o3, d3, tmin, t_max=30.0, accept_min=lo,
                      interpret=True)
    assert (np.asarray(fd) == np.asarray(fp)).mean() > 0.999


def test_active_mask(sphere_scene, rays):
    o3, d3, tmin = rays
    act = jnp.arange(tmin.shape[0]) % 2 == 0
    ct, cr = PS.trace_closest(sphere_scene, o3, d3, tmin, active=act,
                              interpret=True)
    assert np.all(np.asarray(cr)[~np.asarray(act)] == -1)
    fp = PS.trace_any(sphere_scene, o3, d3, tmin, active=act, interpret=True)
    assert not np.asarray(fp)[~np.asarray(act)].any()


@pytest.fixture(scope="module")
def mixed_scene():
    """Ball-and-stick molecule (spheres + cylinders) + a few triangles."""
    from webgl_raytracer_tpu.models import get_builtin_molecule, molecule_to_geometry

    geo = molecule_to_geometry(get_builtin_molecule("caffeine"))
    tv = np.array([
        [[-4, -3.0, -4], [4, -3.0, -4], [0, -3.0, 4]],
        [[-4, 3.0, -4], [0, 3.0, 4], [4, 3.0, -4]],
    ], np.float32)
    return compile_scene(geo, tri_verts=tv)


def test_mixed_prims_match_dense(mixed_scene, rays):
    """Cylinder-with-caps and Moller-Trumbore paths in the kernel agree
    with the XLA dense sweep (prim ids + t)."""
    o3, d3, tmin = rays
    rec = W._dense_trace(mixed_scene, o3, d3, tmin, None, any_hit=False,
                         accept_min=None, t_max=None, active=None)
    ct, cr = PS.trace_closest(mixed_scene, o3, d3, tmin, interpret=True)
    dhit = np.asarray(rec.prim_type >= 0)
    phit = np.asarray(cr) >= 0
    assert (dhit == phit).mean() > 0.999
    both = dhit & phit
    rec_p = W._finalize_hit(mixed_scene, o3, d3, tmin, None,
                            jnp.asarray(ct), jnp.asarray(cr),
                            cost=jnp.zeros(tmin.shape, jnp.int32))
    same_type = (np.asarray(rec_p.prim_type)[both]
                 == np.asarray(rec.prim_type)[both])
    same_local = (np.asarray(rec_p.prim_local)[both]
                  == np.asarray(rec.prim_local)[both])
    assert (same_type & same_local).mean() > 0.995
    sel = both.copy(); sel[both] = same_type & same_local
    t_ref = np.asarray(rec.t)[sel]
    assert np.abs(np.asarray(ct)[sel] - t_ref).max() <= 1e-3

    fd = W._dense_trace(mixed_scene, o3, d3, tmin, None, any_hit=True,
                        accept_min=jnp.full(tmin.shape, 0.01), t_max=25.0,
                        active=None)
    fp = PS.trace_any(mixed_scene, o3, d3, tmin, t_max=25.0,
                      accept_min=jnp.full(tmin.shape, 0.01), interpret=True)
    assert (np.asarray(fd) == np.asarray(fp)).mean() > 0.999


def test_clip_plane_in_kernel(mixed_scene, rays):
    """Clip rejection (webgl.js:384-390) inside the kernel: triangle hits on
    the clipped side are discarded, matching the XLA sweep with the same
    plane — clip scenes no longer fall off the kernel path."""
    o3, d3, tmin = rays
    clip = (np.array([0.0, 1.0, 0.0], np.float32), 0.0, 1.0)
    rec = W._dense_trace(mixed_scene, o3, d3, tmin,
                         (jnp.asarray(clip[0]), jnp.float32(clip[1]),
                          jnp.float32(clip[2])),
                         any_hit=False, accept_min=None, t_max=None,
                         active=None)
    ct, cr = PS.trace_closest(mixed_scene, o3, d3, tmin, clip=clip,
                              interpret=True)
    dhit = np.asarray(rec.prim_type >= 0)
    phit = np.asarray(cr) >= 0
    assert (dhit == phit).mean() > 0.999
    both = dhit & phit
    assert np.allclose(np.asarray(ct)[both], np.asarray(rec.t)[both],
                       rtol=2e-4, atol=1e-4)

    fd = W._dense_trace(mixed_scene, o3, d3, tmin,
                        (jnp.asarray(clip[0]), jnp.float32(clip[1]),
                         jnp.float32(clip[2])),
                        any_hit=True, accept_min=None, t_max=None,
                        active=None)
    fp = PS.trace_any(mixed_scene, o3, d3, tmin, clip=clip, interpret=True)
    assert (np.asarray(fd) == np.asarray(fp)).mean() > 0.999


@pytest.fixture(scope="module")
def large_scene():
    """~160 clusters: exercises the two-level group entries pass (the
    single-group fast path covers K <= 128)."""
    rng = np.random.default_rng(21)
    n = 20000
    centers = (rng.random((n, 3)).astype(np.float32) - 0.5) * 54
    radii = (0.15 + rng.random(n) * 0.3).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    return compile_scene(Geometry(centers, radii, colors, z3, z3, z1, z3))


def test_large_k_multigroup(large_scene):
    assert large_scene.num_clusters > 128, large_scene.num_clusters
    rng = np.random.default_rng(6)
    n = 1024
    o = rng.normal(size=(3, n)).astype(np.float32) * 10
    o[2] += 45
    d = rng.normal(size=(3, n)).astype(np.float32)
    d[2] -= 1.2
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    o3 = tuple(jnp.asarray(o[i]) for i in range(3))
    d3 = tuple(jnp.asarray(d[i]) for i in range(3))
    tmin = jnp.full((n,), np.float32(1e-3))
    rec = W._dense_trace(large_scene, o3, d3, tmin, None, any_hit=False,
                         accept_min=None, t_max=None, active=None)
    ct, cr = PS.trace_closest(large_scene, o3, d3, tmin, interpret=True)
    dhit = np.asarray(rec.prim_type >= 0)
    phit = np.asarray(cr) >= 0
    assert dhit.mean() > 0.2   # scene actually in view
    assert (dhit == phit).mean() > 0.999
    both = dhit & phit
    assert np.allclose(np.asarray(ct)[both], np.asarray(rec.t)[both],
                       rtol=2e-4, atol=1e-4)

    fd = W._dense_trace(large_scene, o3, d3, tmin, None, any_hit=True,
                        accept_min=jnp.full(tmin.shape, 0.01), t_max=60.0,
                        active=None)
    fp = PS.trace_any(large_scene, o3, d3, tmin, t_max=60.0,
                      accept_min=jnp.full(tmin.shape, 0.01), interpret=True)
    assert (np.asarray(fd) == np.asarray(fp)).mean() > 0.999


def test_masked_traces_match_dense(sphere_scene, rays):
    """Activity-masked traces: the kernel's masked early exits (inactive
    lanes seeded found / -BIG bound) must not change active-lane results,
    and inactive lanes must come back miss/False."""
    o3, d3, tmin = rays
    n = tmin.shape[0]
    active = jnp.asarray((np.arange(n) % 3) != 0)
    rec = W._dense_trace(sphere_scene, o3, d3, tmin, None, any_hit=False,
                         accept_min=None, t_max=None, active=active)
    ct, cr = PS.trace_closest(sphere_scene, o3, d3, tmin, active=active,
                              interpret=True)
    act = np.asarray(active)
    dhit = np.asarray(rec.prim_type >= 0)
    phit = np.asarray(cr) >= 0
    assert not phit[~act].any()
    assert (dhit[act] == phit[act]).mean() > 0.999
    both = dhit & phit & act
    assert np.allclose(np.asarray(ct)[both], np.asarray(rec.t)[both],
                       rtol=2e-4, atol=1e-4)

    fd = W._dense_trace(sphere_scene, o3, d3, tmin, None, any_hit=True,
                        accept_min=jnp.full(tmin.shape, 0.01), t_max=25.0,
                        active=active)
    fp = PS.trace_any(sphere_scene, o3, d3, tmin, t_max=25.0,
                      accept_min=jnp.full(tmin.shape, 0.01), active=active,
                      interpret=True)
    fp = np.asarray(fp)
    assert not fp[~act].any()
    assert (np.asarray(fd)[act] == fp[act]).mean() > 0.999


def test_sweep_group_bit_identical(sphere_scene, mixed_scene, rays,
                                   monkeypatch):
    """WRT_SWEEP_GROUP>1 amortizes the pop/bound machinery over several
    sweeps; extra grouped sweeps are only ever wasted work, so results
    must be BIT-identical to the group=1 kernels on identical inputs."""
    o3, d3, tmin = rays
    lo = jnp.full(tmin.shape, 0.01)
    for scene in (sphere_scene, mixed_scene):
        base_c = PS.trace_closest(scene, o3, d3, tmin, interpret=True)
        base_a = PS.trace_any(scene, o3, d3, tmin, t_max=30.0, accept_min=lo,
                              interpret=True)
        monkeypatch.setenv("WRT_SWEEP_GROUP", "3")
        grp_c = PS.trace_closest(scene, o3, d3, tmin, interpret=True)
        grp_a = PS.trace_any(scene, o3, d3, tmin, t_max=30.0, accept_min=lo,
                             interpret=True)
        monkeypatch.delenv("WRT_SWEEP_GROUP")
        np.testing.assert_array_equal(np.asarray(base_c[0]),
                                      np.asarray(grp_c[0]))
        np.testing.assert_array_equal(np.asarray(base_c[1]),
                                      np.asarray(grp_c[1]))
        np.testing.assert_array_equal(np.asarray(base_a),
                                      np.asarray(grp_a))


def test_closest_attrs_matches_finalize(sphere_scene, rays):
    """The attrs kernel's one-hot extraction must agree with the gather
    path bit-for-bit: same winner t/slot, and attr rows equal to the
    gathered table rows."""
    o3, d3, tmin = rays
    ct, cr = PS.trace_closest(sphere_scene, o3, d3, tmin, interpret=True)
    t_a, attrs = PS.trace_closest_attrs(sphere_scene, o3, d3, tmin,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(ct), np.asarray(t_a))
    hit = np.asarray(cr) >= 0
    slot_a = np.asarray(attrs[:, 28]).astype(np.int64)
    np.testing.assert_array_equal(np.asarray(cr)[hit], slot_a[hit])
    # Attr rows == the gathered rows of the same winners, exactly.
    flat = np.asarray(sphere_scene.cluster_prims).reshape(-1, 12)
    np.testing.assert_array_equal(np.asarray(attrs[:, :12])[hit],
                                  flat[np.asarray(cr)[hit]])
    color = np.asarray(sphere_scene.cluster_color)
    np.testing.assert_array_equal(np.asarray(attrs[:, 12:15])[hit],
                                  color[np.asarray(cr)[hit]])
    # Misses carry ptype -1.
    assert (np.asarray(attrs[:, 11])[~hit] < 0).all()


def test_closest_attrs_record_equivalence(sphere_scene, rays):
    """wf_trace_closest_v3(with_attrs=True) must produce a record
    identical to the default full-record path."""
    o3, d3, tmin = rays
    import webgl_raytracer_tpu.ops.wavefront as WF

    rec_pair = WF.wf_trace_closest_v3(sphere_scene, o3, d3, tmin,
                                      use_pallas=False, with_attrs=True)
    rec_a, attrs = rec_pair
    rec = WF.wf_trace_closest_v3(sphere_scene, o3, d3, tmin,
                                 use_pallas=False)
    for f in ("t", "prim_type", "prim_local", "prim_slot"):
        np.testing.assert_array_equal(np.asarray(getattr(rec_a, f)),
                                      np.asarray(getattr(rec, f)))
    hit = np.asarray(rec.prim_slot) >= 0
    np.testing.assert_array_equal(
        np.asarray(attrs[:, 28]).astype(np.int64)[hit],
        np.asarray(rec.prim_slot)[hit])


def test_closest_attrs_masked_and_clip(sphere_scene, rays):
    o3, d3, tmin = rays
    n = o3[0].shape[0]
    act = jnp.asarray((np.arange(n) % 3) != 0)
    clip = (np.array([0.0, 0.0, 1.0], np.float32), np.float32(1.0),
            np.float32(1.0))
    ct, cr = PS.trace_closest(sphere_scene, o3, d3, tmin, clip=clip,
                              active=act, interpret=True)
    t_a, attrs = PS.trace_closest_attrs(sphere_scene, o3, d3, tmin,
                                        clip=clip, active=act,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(ct), np.asarray(t_a))
    hit = np.asarray(cr) >= 0
    np.testing.assert_array_equal(
        np.asarray(attrs[:, 28]).astype(np.int64)[hit],
        np.asarray(cr)[hit])
    assert (np.asarray(attrs[:, 11])[~hit] < 0).all()


def test_frame_attrs_vs_gather_bit_identical(sphere_scene):
    """Full-frame invariant for the attrs path: a kernel-interpret frame
    shaded from in-kernel attribute rows must equal the same frame shaded
    through the gather path BIT-FOR-BIT (same RNG, same transport; only
    the attribute delivery differs). Fresh local jits per variant — env
    knobs are read at trace time and a shared jit cache would alias them
    (the round-2 WRT_NO_PERM lesson)."""
    import os

    import jax

    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.render.config import split_settings
    from webgl_raytracer_tpu.render.integrator import render_batch_v3
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera

    r = Renderer(sphere_scene, width=64, height=64)
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()

    def frame(knobs):
        os.environ.update(knobs)
        try:
            fn = jax.jit(lambda uu: render_batch_v3(
                r.scene, None, None, flags, uu, px, py, jnp.uint32(0)))
            return np.stack([np.asarray(c) for c in fn(u)], axis=-1)
        finally:
            for k in knobs:
                del os.environ[k]

    img_attrs = frame({"WRT_PALLAS_INTERPRET": "1", "WRT_ATTRS": "1"})
    img_gather = frame({"WRT_PALLAS_INTERPRET": "1"})
    assert np.isfinite(img_attrs).all()
    assert img_attrs.max() > 0.0
    np.testing.assert_array_equal(img_attrs, img_gather)
