"""Per-ray worklist traversal kernels vs the block-worklist kernels
(interpret mode). The per-ray kernels (pallas_trace `_make_*_perray`) give
each ray its own front-to-back cluster chain via one-hot MXU gathers; the
bf16 mantissa-split reconstruction is exact, so results must agree with the
block kernels to the last ulp on supported scenes (single primitive type or
sphere+cylinder mixes; above 128 clusters the two-level group-outer /
per-ray-inner body takes over)."""

import jax.numpy as jnp
import numpy as np
import pytest

from webgl_raytracer_tpu.models.molecular import Geometry
from webgl_raytracer_tpu.scene import compile_scene
import webgl_raytracer_tpu.ops.pallas_trace as PS


def _ray_batch(seed, n, spread=3.0, zoff=12.0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(3, n)).astype(np.float32) * spread
    o[2] += zoff
    d = rng.normal(size=(3, n)).astype(np.float32)
    d[2] -= 1.5
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    o3 = tuple(jnp.asarray(o[i]) for i in range(3))
    d3 = tuple(jnp.asarray(d[i]) for i in range(3))
    return o3, d3, jnp.full((n,), np.float32(1e-3))


@pytest.fixture(scope="module")
def sphere_scene():
    rng = np.random.default_rng(11)
    n = 900
    centers = (rng.random((n, 3)).astype(np.float32) - 0.5) * 14
    radii = (0.15 + rng.random(n) * 0.3).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    return compile_scene(Geometry(centers, radii, colors, z3, z3, z1, z3))


@pytest.fixture(scope="module")
def cyl_scene():
    rng = np.random.default_rng(13)
    m = 300
    p1 = (rng.random((m, 3)).astype(np.float32) - 0.5) * 12
    axis = rng.normal(size=(m, 3)).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    p2 = p1 + axis * (0.5 + rng.random((m, 1)).astype(np.float32))
    radii = (0.08 + rng.random(m) * 0.15).astype(np.float32)
    colors = rng.random((m, 3)).astype(np.float32)
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    return compile_scene(Geometry(z3, z1, z3, p1, p2, radii, colors))


@pytest.fixture(scope="module")
def tri_scene():
    rng = np.random.default_rng(17)
    t = 400
    v0 = (rng.random((t, 3)).astype(np.float32) - 0.5) * 12
    tv = np.stack([v0,
                   v0 + rng.normal(size=(t, 3)).astype(np.float32),
                   v0 + rng.normal(size=(t, 3)).astype(np.float32)], axis=1)
    return compile_scene(tri_verts=tv)


def test_supported_gating(sphere_scene, cyl_scene, tri_scene):
    assert PS.perray_supported(sphere_scene)
    assert PS.perray_supported(cyl_scene)
    assert PS.perray_supported(tri_scene)
    from webgl_raytracer_tpu.models import (get_builtin_molecule,
                                            molecule_to_geometry)
    # Sphere+cylinder mixes (every molecule style except cartoon/SES) use
    # the ptype-masked mixed mode; mixes involving triangles do not.
    mixed = compile_scene(molecule_to_geometry(get_builtin_molecule("caffeine")))
    rows, types = PS._perray_mode(mixed)
    assert 11 in rows and types == (True, True, False)
    assert not PS.perray_supported(mixed)   # below MIN_CLUSTERS, not type
    # Three-type mixes (cartoon/SES scenes with HETATM leftovers) use the
    # full-mix mode: every data row, all three ptype-masked intersectors.
    tv = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    geo = molecule_to_geometry(get_builtin_molecule("caffeine"))
    with_tris = compile_scene(geo, tri_verts=tv)
    rows3, types3 = PS._perray_mode(with_tris)
    assert types3 == (True, True, True) and 11 in rows3 and 7 not in rows3


@pytest.fixture(scope="module")
def mixed_scene():
    """Sphere+cylinder molecule-STYLE scene big enough for the per-ray
    cluster-count gate (builtin molecules compile to <4 clusters)."""
    rng = np.random.default_rng(23)
    ns, nc = 500, 400
    centers = (rng.random((ns, 3)).astype(np.float32) - 0.5) * 14
    radii = (0.15 + rng.random(ns) * 0.3).astype(np.float32)
    colors = rng.random((ns, 3)).astype(np.float32)
    p1 = (rng.random((nc, 3)).astype(np.float32) - 0.5) * 14
    p2 = p1 + rng.normal(size=(nc, 3)).astype(np.float32) * 0.8
    cr = (0.05 + rng.random(nc) * 0.1).astype(np.float32)
    cc = rng.random((nc, 3)).astype(np.float32)
    scene = compile_scene(Geometry(centers, radii, colors, p1, p2, cr, cc))
    assert PS.perray_supported(scene)
    return scene


def test_mixed_closest_matches_block(mixed_scene):
    o3, d3, tmin = _ray_batch(5, 1500, spread=2.0, zoff=8.0)
    tb, rb = PS.trace_closest(mixed_scene, o3, d3, tmin, interpret=True,
                              perray=False)
    tp, rp = PS.trace_closest(mixed_scene, o3, d3, tmin, interpret=True,
                              perray=True)
    assert int((np.asarray(rb) >= 0).sum()) > 50   # real hits on both types
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(rp))
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(tp))


def test_mixed_any_matches_block(mixed_scene):
    o3, d3, tmin = _ray_batch(7, 1500, spread=2.0, zoff=8.0)
    fb = PS.trace_any(mixed_scene, o3, d3, tmin, interpret=True,
                      perray=False)
    fp = PS.trace_any(mixed_scene, o3, d3, tmin, interpret=True,
                      perray=True)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fp))


@pytest.mark.parametrize("fixt", ["sphere_scene", "cyl_scene", "tri_scene"])
def test_closest_matches_block(fixt, request):
    scene = request.getfixturevalue(fixt)
    o3, d3, tmin = _ray_batch(5, 1500)
    tb, rb = PS.trace_closest(scene, o3, d3, tmin, interpret=True,
                              perray=False)
    tp, rp = PS.trace_closest(scene, o3, d3, tmin, interpret=True,
                              perray=True)
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(rp))
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(tp))


@pytest.mark.parametrize("fixt", ["sphere_scene", "cyl_scene", "tri_scene"])
def test_any_matches_block(fixt, request):
    scene = request.getfixturevalue(fixt)
    o3, d3, tmin = _ray_batch(7, 1500)
    lo = jnp.full(tmin.shape, 0.01)
    fb = PS.trace_any(scene, o3, d3, tmin, t_max=30.0, accept_min=lo,
                      interpret=True, perray=False)
    fp = PS.trace_any(scene, o3, d3, tmin, t_max=30.0, accept_min=lo,
                      interpret=True, perray=True)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fp))


def test_masked_matches_block(sphere_scene):
    """Sparse activity masks are the per-ray kernels' home turf (shadow
    batches): inactive lanes must not pop work or corrupt neighbors."""
    o3, d3, tmin = _ray_batch(9, 2048)
    act = jnp.asarray((np.arange(2048) % 5) == 0)    # 20% live
    tb, rb = PS.trace_closest(sphere_scene, o3, d3, tmin, active=act,
                              interpret=True, perray=False)
    tp, rp = PS.trace_closest(sphere_scene, o3, d3, tmin, active=act,
                              interpret=True, perray=True)
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(rp))
    a = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(tb)[a], np.asarray(tp)[a])
    fb = PS.trace_any(sphere_scene, o3, d3, tmin, t_max=25.0, active=act,
                      interpret=True, perray=False)
    fp = PS.trace_any(sphere_scene, o3, d3, tmin, t_max=25.0, active=act,
                      interpret=True, perray=True)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fp))


def test_cost_counters(sphere_scene):
    """with_cost: the block kernel reports 128 x clusters-swept-by-block
    (the union cost) per ray; the per-ray kernel reports 128 x its own
    pops — never more than the block's union, and the hit/row outputs are
    unchanged by the counting."""
    o3, d3, tmin = _ray_batch(5, 1500)
    tb, rb = PS.trace_closest(sphere_scene, o3, d3, tmin, interpret=True,
                              perray=False)
    tb2, rb2, cb = PS.trace_closest(sphere_scene, o3, d3, tmin,
                                    interpret=True, perray=False,
                                    with_cost=True)
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(rb2))
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(tb2))
    cb = np.asarray(cb)
    hit = np.asarray(rb) >= 0
    assert (cb[hit] >= 128).all()
    assert cb.max() <= sphere_scene.num_clusters * 128

    tp, rp, cp = PS.trace_closest(sphere_scene, o3, d3, tmin,
                                  interpret=True, perray=True,
                                  with_cost=True)
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(rp))
    cp = np.asarray(cp)
    assert (cp <= cb).all()          # own chain <= block union
    assert cp[hit].mean() < cb[hit].mean()

    fb, cab = PS.trace_any(sphere_scene, o3, d3, tmin, t_max=30.0,
                           interpret=True, perray=False, with_cost=True)
    fp, cap = PS.trace_any(sphere_scene, o3, d3, tmin, t_max=30.0,
                           interpret=True, perray=True, with_cost=True)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fp))
    assert (np.asarray(cap) <= np.asarray(cab)).all()


def test_clip_matches_block(tri_scene):
    o3, d3, tmin = _ray_batch(3, 1024)
    clip = (np.array([0.0, 1.0, 0.0], np.float32), 0.0, 1.0)
    tb, rb = PS.trace_closest(tri_scene, o3, d3, tmin, clip=clip,
                              interpret=True, perray=False)
    tp, rp = PS.trace_closest(tri_scene, o3, d3, tmin, clip=clip,
                              interpret=True, perray=True)
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(rp))
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(tp))


@pytest.fixture(scope="module")
def trimix_scene():
    """Cartoon-shaped mix: a triangle soup plus a handful of spheres and
    cylinders (HETATM leftovers) — the full three-type per-ray mode."""
    rng = np.random.default_rng(41)
    t = 900
    v0 = (rng.random((t, 3)).astype(np.float32) - 0.5) * 12
    tv = np.stack([v0,
                   v0 + rng.normal(size=(t, 3)).astype(np.float32),
                   v0 + rng.normal(size=(t, 3)).astype(np.float32)], axis=1)
    ns, nc = 40, 24
    centers = (rng.random((ns, 3)).astype(np.float32) - 0.5) * 12
    radii = (0.2 + rng.random(ns) * 0.3).astype(np.float32)
    colors = rng.random((ns, 3)).astype(np.float32)
    p1 = (rng.random((nc, 3)).astype(np.float32) - 0.5) * 12
    p2 = p1 + rng.normal(size=(nc, 3)).astype(np.float32) * 0.8
    cr = (0.08 + rng.random(nc) * 0.1).astype(np.float32)
    cc = rng.random((nc, 3)).astype(np.float32)
    scene = compile_scene(Geometry(centers, radii, colors, p1, p2, cr, cc),
                          tri_verts=tv)
    assert PS.perray_supported(scene)
    assert PS._perray_mode(scene)[1] == (True, True, True)
    return scene


def test_trimix_matches_block(trimix_scene):
    """Three-type mode: winning rows exactly equal; t to 1e-5 relative —
    the per-step type gating splits the evaluation into pl.when branches,
    which changes XLA's FMA contraction by a last ulp on some candidates
    (winning prims unaffected; see _prim_ts_rows_gated)."""
    o3, d3, tmin = _ray_batch(5, 1500, spread=2.0, zoff=8.0)
    tb, rb = PS.trace_closest(trimix_scene, o3, d3, tmin, interpret=True,
                              perray=False)
    tp, rp = PS.trace_closest(trimix_scene, o3, d3, tmin, interpret=True,
                              perray=True)
    rb_np = np.asarray(rb)
    # Hits must land on every primitive type for the test to mean anything.
    flat = np.asarray(trimix_scene.cluster_prims.reshape(-1, 12))
    hit_types = set(flat[rb_np[rb_np >= 0], 11].astype(int))
    assert hit_types == {0, 1, 2}, hit_types
    np.testing.assert_array_equal(rb_np, np.asarray(rp))
    hit = rb_np >= 0
    np.testing.assert_allclose(np.asarray(tb)[hit], np.asarray(tp)[hit],
                               rtol=1e-5)

    fb = PS.trace_any(trimix_scene, o3, d3, tmin, t_max=30.0,
                      interpret=True, perray=False)
    fp = PS.trace_any(trimix_scene, o3, d3, tmin, t_max=30.0,
                      interpret=True, perray=True)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fp))


@pytest.fixture(scope="module")
def multigroup_scene():
    """> 128 clusters: exercises the TWO-LEVEL per-ray body (outer
    block-uniform group worklist, inner per-ray worklist with 128-aligned
    dynamic slices of the box/gather operands)."""
    rng = np.random.default_rng(31)
    n = 160 * 128
    centers = (rng.random((n, 3)).astype(np.float32) - 0.5) * 60
    radii = (0.15 + rng.random(n) * 0.3).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    scene = compile_scene(Geometry(centers, radii, colors, z3, z3, z1, z3))
    assert scene.num_clusters > 128, scene.num_clusters
    assert PS.perray_supported(scene)
    return scene


def test_multigroup_closest_matches_block(multigroup_scene):
    o3, d3, tmin = _ray_batch(5, 1500, spread=12.0, zoff=40.0)
    tb, rb = PS.trace_closest(multigroup_scene, o3, d3, tmin,
                              interpret=True, perray=False)
    tp, rp = PS.trace_closest(multigroup_scene, o3, d3, tmin,
                              interpret=True, perray=True)
    assert int((np.asarray(rb) >= 0).sum()) > 100
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(rp))
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(tp))


def test_multigroup_any_and_cost(multigroup_scene):
    o3, d3, tmin = _ray_batch(7, 1500, spread=12.0, zoff=40.0)
    lo = jnp.full(tmin.shape, 0.01)
    fb, cab = PS.trace_any(multigroup_scene, o3, d3, tmin, t_max=80.0,
                           accept_min=lo, interpret=True, perray=False,
                           with_cost=True)
    fp, cap = PS.trace_any(multigroup_scene, o3, d3, tmin, t_max=80.0,
                           accept_min=lo, interpret=True, perray=True,
                           with_cost=True)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fp))
    assert (np.asarray(cap) <= np.asarray(cab)).all()

    tb, rb, cb = PS.trace_closest(multigroup_scene, o3, d3, tmin,
                                  interpret=True, perray=False,
                                  with_cost=True)
    tp, rp, cp = PS.trace_closest(multigroup_scene, o3, d3, tmin,
                                  interpret=True, perray=True,
                                  with_cost=True)
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(rp))
    hit = np.asarray(rb) >= 0
    assert (np.asarray(cp) <= np.asarray(cb)).all()
    assert np.asarray(cp)[hit].mean() < np.asarray(cb)[hit].mean()
    # Multi-group scenes qualify for the secondary auto-routing since the
    # round-4 on-chip race (3.8x secondary at K=1984, RACE_perray_150k).
    assert PS.perray_auto_secondary(multigroup_scene)


def test_multigroup_masked_matches_block(multigroup_scene):
    o3, d3, tmin = _ray_batch(9, 2048, spread=12.0, zoff=40.0)
    act = jnp.asarray((np.arange(2048) % 5) == 0)    # 20% live
    tb, rb = PS.trace_closest(multigroup_scene, o3, d3, tmin, active=act,
                              interpret=True, perray=False)
    tp, rp = PS.trace_closest(multigroup_scene, o3, d3, tmin, active=act,
                              interpret=True, perray=True)
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(rp))
    a = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(tb)[a], np.asarray(tp)[a])


def test_auto_secondary_routing(sphere_scene):
    """perray_auto_secondary gates on cluster count, and the auto-routed
    secondary trace (wf_trace_closest_v3(secondary=True)) returns the
    same hits as the block path on a qualifying scene."""
    import os

    import webgl_raytracer_tpu.ops.wavefront as W

    # The module fixture is small; build a cluster-rich scene.
    rng = np.random.default_rng(7)
    n = 70 * 128
    centers = (rng.random((n, 3)).astype(np.float32) - 0.5) * 40
    radii = (0.15 + rng.random(n) * 0.3).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    big = compile_scene(Geometry(centers, radii, colors, z3, z3, z1, z3))
    assert big.num_clusters >= PS.PERRAY_MIN_CLUSTERS
    assert PS.perray_auto_secondary(big)
    assert not PS.perray_auto_secondary(sphere_scene)

    o3, d3, tmin = _ray_batch(9, 1500, spread=8.0, zoff=25.0)
    os.environ["WRT_PALLAS_INTERPRET"] = "1"
    try:
        rec_b = W.wf_trace_closest_v3(big, o3, d3, tmin)
        rec_s = W.wf_trace_closest_v3(big, o3, d3, tmin, secondary=True)
    finally:
        del os.environ["WRT_PALLAS_INTERPRET"]
    np.testing.assert_array_equal(np.asarray(rec_b.prim_slot),
                                  np.asarray(rec_s.prim_slot))
    np.testing.assert_array_equal(np.asarray(rec_b.t), np.asarray(rec_s.t))
