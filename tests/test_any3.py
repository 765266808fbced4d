"""Fused 3-ray shadow-fan occlusion kernel (pallas_trace.trace_any3) vs
three single-ray traces — the kernel's claim is BIT-identical booleans
(occlusion is an order-independent OR over identical per-(ray, prim)
predicates), so every comparison here is exact equality. Interpret mode;
the real-TPU race lives in tools/bench_any3.py."""

import os

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
def mixed_scene():
    """Spheres + cylinders + triangles: exercises the typed sweep dispatch."""
    from webgl_raytracer_tpu.models import (get_builtin_molecule,
                                            molecule_to_geometry)

    geo = molecule_to_geometry(get_builtin_molecule("caffeine"))
    tv = np.array([
        [[-4, -3.0, -4], [4, -3.0, -4], [0, -3.0, 4]],
        [[-4, 3.0, -4], [0, 3.0, 4], [4, 3.0, -4]],
    ], np.float32)
    return compile_scene(geo, tri_verts=tv)


def _fan(n, seed, spread=0.05):
    """Co-origin ray fan: one origin set, three nearly-parallel directions
    (the cone-light shadow shape), random candidate masks."""
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(3, n)).astype(np.float32) * 3
    o[2] += 10
    base = rng.normal(size=(3, n)).astype(np.float32)
    base[2] -= 1.2
    base /= np.linalg.norm(base, axis=0, keepdims=True)
    d3s, acts = [], []
    for j in range(3):
        d = base + rng.normal(size=(3, n)).astype(np.float32) * spread
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        d3s.append(tuple(jnp.asarray(d[i]) for i in range(3)))
        acts.append(jnp.asarray(rng.random(n) < 0.6))
    o3 = tuple(jnp.asarray(o[i]) for i in range(3))
    return o3, tuple(d3s), tuple(acts), jnp.full((n,), np.float32(1e-3))


def _single(scene, o3, d, tmin, lo, act, clip=None):
    return PS.trace_any(scene, o3, d, tmin, accept_min=lo, clip=clip,
                        active=act, interpret=True)


@pytest.mark.parametrize("scene_name", ["sphere_scene", "mixed_scene"])
def test_any3_bit_identical(scene_name, request):
    scene = request.getfixturevalue(scene_name)
    o3, d3s, acts, tmin = _fan(1500, seed=7)
    lo = jnp.full(tmin.shape, 0.01)
    occ3 = PS.trace_any3(scene, o3, d3s, tmin, accept_min=lo, actives=acts,
                         interpret=True)
    for j in range(3):
        ref = _single(scene, o3, d3s[j], tmin, lo, acts[j])
        assert np.array_equal(np.asarray(occ3[j]), np.asarray(ref)), \
            f"direction {j} differs"


def test_any3_divergent_directions(sphere_scene):
    # The fused worklist is a UNION over directions; divergent fans must
    # still resolve each direction exactly.
    o3, d3s, acts, tmin = _fan(1024, seed=13, spread=1.5)
    occ3 = PS.trace_any3(sphere_scene, o3, d3s, tmin, actives=acts,
                         interpret=True)
    for j in range(3):
        ref = _single(sphere_scene, o3, d3s[j], tmin, None, acts[j])
        assert np.array_equal(np.asarray(occ3[j]), np.asarray(ref))


def test_any3_all_masks_dead_and_none(sphere_scene):
    o3, d3s, _, tmin = _fan(512, seed=21)
    dead = (jnp.zeros((512,), bool),) * 3
    occ3 = PS.trace_any3(sphere_scene, o3, d3s, tmin, actives=dead,
                         interpret=True)
    for j in range(3):
        assert not np.asarray(occ3[j]).any()
    # actives=None means every lane live.
    occ_all = PS.trace_any3(sphere_scene, o3, d3s, tmin,
                            actives=(None, None, None), interpret=True)
    for j in range(3):
        ref = _single(sphere_scene, o3, d3s[j], tmin, None, None)
        assert np.array_equal(np.asarray(occ_all[j]), np.asarray(ref))


def test_any3_clip_plane(mixed_scene):
    clip = ((np.float32(0.0), np.float32(0.0), np.float32(1.0)),
            np.float32(0.5), np.float32(1.0))
    o3, d3s, acts, tmin = _fan(768, seed=5)
    occ3 = PS.trace_any3(mixed_scene, o3, d3s, tmin, clip=clip,
                         actives=acts, interpret=True)
    for j in range(3):
        ref = _single(mixed_scene, o3, d3s[j], tmin, None, acts[j],
                      clip=clip)
        assert np.array_equal(np.asarray(occ3[j]), np.asarray(ref))


def test_wf_wrapper_fallback_matches(sphere_scene):
    """Off the Pallas path the wrapper falls back to three single traces."""
    o3, d3s, acts, tmin = _fan(640, seed=9)
    out = W.wf_trace_any3_v3(sphere_scene, o3, d3s, tmin, actives=acts,
                             use_pallas=False)
    for j in range(3):
        ref = W.wf_trace_any_v3(sphere_scene, o3, d3s[j], tmin,
                                active=acts[j], use_pallas=False)
        assert np.array_equal(np.asarray(out[j]), np.asarray(ref))


def test_frame_any3_bit_identical(sphere_scene, monkeypatch):
    """Full-frame A/B: the fused fan and the concatenated batch produce
    bit-identical images (the occlusion booleans are the only coupling)."""
    from webgl_raytracer_tpu.render import Renderer

    def frame(any3: str):
        monkeypatch.setenv("WRT_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("WRT_ANY3", any3)
        r = Renderer(sphere_scene, width=64, height=48)
        r.settings.tone_map = "linear"
        r.render_frames(1)
        return np.asarray(r.image())

    a = frame("1")
    b = frame("0")
    assert np.array_equal(a, b)
