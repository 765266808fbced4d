"""Cross-frame lane pooling (render/frame.py _render_frames_fused pool>1):
pooled frames keep each sample's sequential-render seed and fold into the
accumulator in the same order, so on the XLA dense path (per-lane math,
batch-composition independent) the accumulated image matches the unpooled
scan to fp reassociation (<= a few ulps: XLA fuses the sub-frame folds
differently on the pooled shape; traversal results per lane are
identical)."""

import numpy as np
import pytest

from webgl_raytracer_tpu.models.molecular import Geometry
from webgl_raytracer_tpu.render import Renderer
from webgl_raytracer_tpu.scene import compile_scene


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    n = 300
    centers = (rng.random((n, 3)).astype(np.float32) - 0.5) * 12
    radii = (0.2 + rng.random(n) * 0.3).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    return compile_scene(Geometry(centers, radii, colors, z3, z3, z1, z3))


def _render(scene, frames, pool, monkeypatch):
    monkeypatch.setenv("WRT_POOL", str(pool))
    r = Renderer(scene, width=64, height=48)
    r.settings.tone_map = "linear"
    r.settings.max_frames = 10 ** 6
    r.render_frames(frames)
    assert r.frame_index == frames
    return r.accumulated()


@pytest.mark.parametrize("pool", [2, 4])
def test_pool_matches_sequential(scene, pool, monkeypatch):
    base = _render(scene, 4, 1, monkeypatch)
    pooled = _render(scene, 4, pool, monkeypatch)
    np.testing.assert_allclose(pooled, base, atol=1e-6, rtol=0)


def test_pool_indivisible_count_falls_back(scene, monkeypatch):
    # count=5 does not split by 2: the fused scan silently runs unpooled.
    base = _render(scene, 5, 1, monkeypatch)
    pooled = _render(scene, 5, 2, monkeypatch)
    assert np.array_equal(base, pooled)   # fell back: literally the same program


def test_pool_resume_mid_accumulation(scene, monkeypatch):
    """Pooling across a resume boundary (start_frame > 0) keeps the
    running mean consistent."""
    monkeypatch.setenv("WRT_POOL", "2")
    r = Renderer(scene, width=64, height=48)
    r.settings.tone_map = "linear"
    r.settings.max_frames = 10 ** 6
    r.render_frames(2)
    r.render_frames(4)
    a = r.accumulated()
    monkeypatch.setenv("WRT_POOL", "1")
    r2 = Renderer(scene, width=64, height=48)
    r2.settings.tone_map = "linear"
    r2.settings.max_frames = 10 ** 6
    r2.render_frames(6)
    np.testing.assert_allclose(a, r2.accumulated(), atol=1e-6, rtol=0)
