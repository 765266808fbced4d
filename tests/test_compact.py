"""Per-lane live-ray compaction (render/compact.py + the integrator's
compacted transport): movement-primitive roundtrips and full-frame
bit-identity against the block-permutation transport.

The compacted path is the TPU counterpart of the reference's per-pixel
early exit (webgl.js:1173-1186): live lanes are packed densely so the
post-primary launches run at full occupancy. It must be a pure
reformulation — same RNG stream, same transport — so frames are compared
BIT-FOR-BIT, not approximately."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webgl_raytracer_tpu.models.molecular import Geometry
from webgl_raytracer_tpu.render import compact as CP
from webgl_raytracer_tpu.scene import compile_scene


def test_compact_cap_tiles_blocks_and_chunks():
    cap, chunk = CP.compact_cap(1920 * 1080, 8)
    assert cap % 1024 == 0 and cap % chunk == 0
    assert cap >= 1920 * 1080 // 8
    cap, chunk = CP.compact_cap(4096, 8)
    assert cap == chunk == 1024  # floor: one trace block


def test_pack_gather_expand_roundtrip():
    rng = np.random.default_rng(3)
    n = 4096
    live = jnp.asarray(rng.random(n) < 0.11)
    cap, _ = CP.compact_cap(n, 8)
    assert int(live.sum()) <= cap

    vals = tuple(jnp.asarray(rng.normal(size=n).astype(np.float32))
                 for _ in range(3))
    seed = jnp.asarray(rng.integers(0, 2 ** 32, n, dtype=np.uint32))

    idx = CP.live_first_index(live, cap)
    # the first n_live entries are exactly the live lanes, ascending
    n_live = int(live.sum())
    np.testing.assert_array_equal(np.asarray(idx)[:n_live],
                                  np.flatnonzero(np.asarray(live)))

    packed = CP.pack_rows(list(vals) + [seed])
    rows = CP.gather_rows(packed, idx)
    # u32 bit-cast survives the f32 row move
    seed_back = jax.lax.bitcast_convert_type(rows[:, 3], jnp.uint32)
    np.testing.assert_array_equal(np.asarray(seed_back)[:n_live],
                                  np.asarray(seed)[np.asarray(idx)[:n_live]])

    # expand: compact-order triple -> lane order, zeros on dead lanes
    compact_triple = tuple(rows[:, c] for c in range(3))
    out = CP.expand_triple(compact_triple, live)
    liven = np.asarray(live)
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(out[c])[liven],
                                      np.asarray(vals[c])[liven])
        assert (np.asarray(out[c])[~liven] == 0.0).all()


@pytest.fixture(scope="module")
def frame_env():
    """A 64x64 frame (n=4096, a BLOCK multiple) over a mixed scene."""
    rng = np.random.default_rng(17)
    n = 300
    centers = (rng.random((n, 3)).astype(np.float32) - 0.5) * 16
    radii = (0.2 + rng.random(n) * 0.4).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    scene = compile_scene(Geometry(centers, radii, colors, z3, z3, z1, z3))

    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.render.config import split_settings
    from webgl_raytracer_tpu.render.integrator import render_batch_v3
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera

    r = Renderer(scene, width=64, height=64)
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()

    def frame(knobs):
        # WRT_CHUNKS forces the chunked transport (the compaction branch
        # sits behind chunks > 1; production 1080p frames always chunk).
        knobs = dict(knobs, WRT_CHUNKS="4")
        os.environ.update(knobs)
        try:
            fn = jax.jit(lambda uu: render_batch_v3(
                r.scene, None, None, flags, uu, px, py, jnp.uint32(0)))
            return np.stack([np.asarray(c) for c in fn(u)], axis=-1)
        finally:
            for k in knobs:
                del os.environ[k]

    return frame


def test_frame_compact_vs_permuted_bit_identical(frame_env):
    """Forced-on compaction must reproduce the permuted frame exactly
    (fresh jits per variant: knobs are read at trace-build time)."""
    img_c = frame_env({"WRT_COMPACT": "1"})
    img_p = frame_env({"WRT_COMPACT": "0"})
    assert np.isfinite(img_c).all() and img_c.max() > 0.0
    np.testing.assert_array_equal(img_c, img_p)


def test_frame_compact_fallback_when_cap_exceeded(frame_env):
    """A cap below the frame's live count must route through the lax.cond
    fallback (the permuted branch) and still produce the exact frame."""
    img_f = frame_env({"WRT_COMPACT": "1", "WRT_COMPACT_CAP_DIV": "4096"})
    img_p = frame_env({"WRT_COMPACT": "0"})
    np.testing.assert_array_equal(img_f, img_p)


def test_frame_compact_chunked_bit_identical(frame_env):
    """Chunked dense scan (chunk < cap) is the production configuration
    at 1080p; at 64x64 force a small chunk so the scan takes >1 trip."""
    img_c = frame_env({"WRT_COMPACT": "1", "WRT_COMPACT_CAP_DIV": "4",
                       "WRT_COMPACT_CHUNK": "1024"})
    img_p = frame_env({"WRT_COMPACT": "0"})
    np.testing.assert_array_equal(img_c, img_p)


def test_frame_wavefront_bit_identical(frame_env):
    """The bounce-major wavefront transport (per-bounce live-ray
    re-compaction) must reproduce the permuted frame. Radiance is
    reassociated (per-bounce deposits instead of one running carry), but
    every deposit moves exact f32 bits and the measured result is
    bit-identical on CPU; assert exact to catch any real drift."""
    img_w = frame_env({"WRT_WAVEFRONT": "1", "WRT_COMPACT": "0"})
    img_p = frame_env({"WRT_WAVEFRONT": "0", "WRT_COMPACT": "0"})
    assert np.isfinite(img_w).all() and img_w.max() > 0.0
    np.testing.assert_array_equal(img_w, img_p)


def test_frame_wavefront_fallback_when_cap_exceeded(frame_env):
    img_f = frame_env({"WRT_WAVEFRONT": "1", "WRT_WF_CAP_DIV": "4096",
                       "WRT_COMPACT": "0"})
    img_p = frame_env({"WRT_WAVEFRONT": "0", "WRT_COMPACT": "0"})
    np.testing.assert_array_equal(img_f, img_p)


def test_frame_wavefront_repack_knob(frame_env):
    """WRT_WF_REPACKS bounds how many bounce ends re-pack; any value must
    leave the frame unchanged (dead lanes deposit zeros in place)."""
    img_p = frame_env({"WRT_WAVEFRONT": "0", "WRT_COMPACT": "0"})
    for k in ("0", "1"):
        img = frame_env({"WRT_WAVEFRONT": "1", "WRT_WF_REPACKS": k,
                         "WRT_COMPACT": "0"})
        np.testing.assert_array_equal(img, img_p)


def test_ray_stats_agree_across_transports(frame_env):
    """total/path ray accounting must not depend on the transport
    formulation (bench.py's metric rides on these counters)."""
    from webgl_raytracer_tpu.render.integrator import render_batch_stats

    rng = np.random.default_rng(17)
    n = 300
    centers = (rng.random((n, 3)).astype(np.float32) - 0.5) * 16
    radii = (0.2 + rng.random(n) * 0.4).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    scene = compile_scene(Geometry(centers, radii, colors, z3, z3, z1, z3))

    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.render.config import split_settings
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera

    r = Renderer(scene, width=64, height=64)
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()

    def stats(knobs):
        knobs = dict(knobs, WRT_CHUNKS="4")
        os.environ.update(knobs)
        try:
            fn = jax.jit(lambda uu: render_batch_stats(
                r.scene, None, None, flags, uu, px, py, jnp.uint32(0)))
            _, rays = fn(u)
            return int(rays[0]), int(rays[1])
        finally:
            for k in knobs:
                del os.environ[k]

    assert stats({"WRT_COMPACT": "1"}) == stats({"WRT_COMPACT": "0"})
    assert (stats({"WRT_WAVEFRONT": "1", "WRT_COMPACT": "0"})
            == stats({"WRT_COMPACT": "0"}))


def test_bin_key_modes():
    """compact.bin_key: spatial cells follow Morton order, octants follow
    direction signs, and the mode compositions order as documented."""
    lo = jnp.zeros((3,), jnp.float32)
    inv = jnp.ones((3,), jnp.float32)
    o3 = (jnp.asarray([0.05, 0.95]), jnp.asarray([0.05, 0.95]),
          jnp.asarray([0.05, 0.95]))
    d3 = (jnp.asarray([1.0, -1.0]), jnp.asarray([1.0, -1.0]),
          jnp.asarray([1.0, -1.0]))
    k = np.asarray(CP.bin_key(o3, d3, lo, inv, 3, "cell_oct"))
    # corner (0,0,0) -> cell 0, octant 0; corner (7,7,7) -> cell 511,
    # octant 7
    assert k[0] == 0 and k[1] == 511 * 8 + 7
    k2 = np.asarray(CP.bin_key(o3, d3, lo, inv, 3, "oct_cell"))
    assert k2[0] == 0 and k2[1] == 7 * 512 + 511
    assert np.asarray(CP.bin_key(o3, d3, lo, inv, 3, "oct"))[1] == 7
    assert np.asarray(CP.bin_key(o3, d3, lo, inv, 3, "cell"))[1] == 511


def test_frame_binned_bit_identical(frame_env):
    """The coherence-binned transport is a pure lane permutation — each
    lane's RNG stream, shading, and in-lane radiance accumulation are
    untouched — so the frame must be BIT-identical to the permuted path."""
    img_b = frame_env({"WRT_BINNED": "1", "WRT_BIN_B0": "dense", "WRT_COMPACT": "0"})
    img_p = frame_env({"WRT_BINNED": "0", "WRT_COMPACT": "0"})
    assert np.isfinite(img_b).all() and img_b.max() > 0.0
    np.testing.assert_array_equal(img_b, img_p)


def test_frame_binned_key_modes_and_repacks(frame_env):
    """Every key composition and re-pack count is a different permutation
    of the same per-lane computation — all must reproduce the frame."""
    img_p = frame_env({"WRT_BINNED": "0", "WRT_COMPACT": "0"})
    for knobs in ({"WRT_BIN_KEY": "oct_cell"}, {"WRT_BIN_KEY": "cell"},
                  {"WRT_BIN_KEY": "oct"}, {"WRT_BIN_REPACKS": "1"},
                  {"WRT_BIN_REPACKS": "0"}, {"WRT_BIN_CELLS": "2"},
                  {"WRT_BIN_CHUNK": "1024", "WRT_WF_CAP_DIV": "2"}):
        img = frame_env(dict(knobs, WRT_BINNED="1", WRT_COMPACT="0"))
        np.testing.assert_array_equal(img, img_p)


def test_frame_binned_fallback_when_cap_exceeded(frame_env):
    img_f = frame_env({"WRT_BINNED": "1", "WRT_WF_CAP_DIV": "4096",
                       "WRT_COMPACT": "0"})
    img_p = frame_env({"WRT_BINNED": "0", "WRT_COMPACT": "0"})
    np.testing.assert_array_equal(img_f, img_p)


def test_binned_ray_stats_agree(frame_env):
    from webgl_raytracer_tpu.render.integrator import render_batch_stats

    rng = np.random.default_rng(17)
    n = 300
    centers = (rng.random((n, 3)).astype(np.float32) - 0.5) * 16
    radii = (0.2 + rng.random(n) * 0.4).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    scene = compile_scene(Geometry(centers, radii, colors, z3, z3, z1, z3))

    from webgl_raytracer_tpu.render import Renderer
    from webgl_raytracer_tpu.render.config import split_settings
    from webgl_raytracer_tpu.render.lights import light_dirs_for_camera

    r = Renderer(scene, width=64, height=64)
    basis = r.camera.basis()
    flags, u = split_settings(
        r.settings, basis, light_dirs_for_camera(r.settings.lights, basis),
        has_env=False, has_volume=False, clip=None)
    px, py = r._pixel_grids()

    def stats(knobs):
        knobs = dict(knobs, WRT_CHUNKS="4")
        os.environ.update(knobs)
        try:
            fn = jax.jit(lambda uu: render_batch_stats(
                r.scene, None, None, flags, uu, px, py, jnp.uint32(0)))
            _, rays = fn(u)
            return int(rays[0]), int(rays[1])
        finally:
            for k in knobs:
                del os.environ[k]

    assert (stats({"WRT_BINNED": "1", "WRT_COMPACT": "0"})
            == stats({"WRT_COMPACT": "0"}))


def test_frame_binned_b0perm_bit_identical(frame_env):
    """The bounce-0-permuted binned variant (production default): bounce 0
    runs the permuted machinery, survivors continue in-lane in the binned
    buffer — still a pure permutation, still bit-identical."""
    img_b = frame_env({"WRT_BINNED": "1", "WRT_BIN_B0": "permuted",
                       "WRT_COMPACT": "0"})
    img_p = frame_env({"WRT_BINNED": "0", "WRT_COMPACT": "0"})
    assert np.isfinite(img_b).all() and img_b.max() > 0.0
    np.testing.assert_array_equal(img_b, img_p)


def test_frame_binned_b0perm_knobs(frame_env):
    img_p = frame_env({"WRT_BINNED": "0", "WRT_COMPACT": "0"})
    for knobs in ({"WRT_BIN_KEY": "cell_oct"}, {"WRT_BIN_REPACKS": "1"},
                  {"WRT_BIN_CHUNK": "1024", "WRT_BIN_CAP_DIV": "2"}):
        img = frame_env(dict(knobs, WRT_BINNED="1", WRT_BIN_B0="permuted",
                             WRT_COMPACT="0"))
        np.testing.assert_array_equal(img, img_p)


def test_frame_binned_b0perm_fallback(frame_env):
    img_f = frame_env({"WRT_BINNED": "1", "WRT_BIN_B0": "permuted",
                       "WRT_BIN_CAP_DIV": "4096", "WRT_COMPACT": "0"})
    img_p = frame_env({"WRT_BINNED": "0", "WRT_COMPACT": "0"})
    np.testing.assert_array_equal(img_f, img_p)
