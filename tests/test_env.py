"""Environment layer tests: CDF build/sampling, analytic sky, HDR codec."""

import numpy as np
import pytest

import jax.numpy as jnp

from webgl_raytracer_tpu.env import (
    analytic_sky_cache_key,
    build_env_sampling,
    compute_sun_direction,
    constant_env,
    decode_hdr,
    encode_hdr,
    generate_analytic_sky,
    make_env_buffers,
    normalize_analytic_sky_settings,
)
from webgl_raytracer_tpu.ops.envmap import env_pdf, sample_env_direction, sample_env_radiance
from webgl_raytracer_tpu.ops.rng import init_seed


class TestCDF:
    def test_marginal_and_conditional_shapes(self):
        img = np.random.default_rng(0).random((8, 16, 3)).astype(np.float32)
        marginal, cond, total = build_env_sampling(img)
        assert marginal.shape == (9,)
        assert cond.shape == (8, 17)
        assert float(marginal[0]) == 0.0
        assert float(marginal[-1]) == 1.0
        np.testing.assert_allclose(np.asarray(cond[:, -1]), 1.0)
        assert total > 0

    def test_monotonic(self):
        img = np.random.default_rng(1).random((6, 10, 3)).astype(np.float32)
        marginal, cond, _ = build_env_sampling(img)
        assert (np.diff(np.asarray(marginal)) >= -1e-7).all()
        assert (np.diff(np.asarray(cond), axis=1) >= -1e-7).all()

    def test_sampling_concentrates_on_bright_texel(self):
        # One very bright texel: most samples should land near it.
        img = np.full((16, 32, 3), 0.01, np.float32)
        img[4, 20] = 1000.0
        env = make_env_buffers(img)
        state = init_seed(jnp.arange(4096, dtype=jnp.uint32), jnp.uint32(9), 0)
        _, dirs, pdf = sample_env_direction(env, state)
        dirs = np.asarray(dirs)
        # Bright texel center: v=(4+0.5)/16, u=(20+0.5)/32.
        theta = (4.5 / 16) * np.pi
        phi = (20.5 / 32) * 2 * np.pi - np.pi
        target = np.array([np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)])
        cos_sim = dirs @ target
        assert (cos_sim > 0.95).mean() > 0.9
        assert np.asarray(pdf).min() > 0

    def test_pdf_integrates_to_one(self):
        # Monte-Carlo check: E[1/pdf] over CDF samples = total solid angle 4pi
        # ... actually E[f/pdf] with f=1 gives 4pi only for nonzero-pdf
        # coverage; use the identity sum over pixels of pdf*dOmega = 1.
        img = np.random.default_rng(3).random((16, 32, 3)).astype(np.float32) + 0.05
        env = make_env_buffers(img)
        h, w = 16, 32
        vv, uu = np.meshgrid((np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij")
        theta = vv * np.pi
        phi = uu * 2 * np.pi - np.pi
        dirs = np.stack([
            np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)
        ], axis=-1).reshape(-1, 3)
        pdf = np.asarray(env_pdf(env, jnp.asarray(dirs, jnp.float32)))
        d_omega = (np.pi / h) * (2 * np.pi / w) * np.sin(theta).reshape(-1)
        assert np.sum(pdf * d_omega) == pytest.approx(1.0, rel=0.02)

    def test_constant_env_radiance_lookup(self):
        env = constant_env(2.5)
        dirs = jnp.asarray(np.random.default_rng(4).normal(size=(64, 3)), jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rad = sample_env_radiance(env, dirs, jnp.float32(1.0), jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(rad), 2.5, rtol=1e-5)

    def test_luminance_soft_clamp(self):
        env = constant_env(1000.0)
        d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
        rad = np.asarray(sample_env_radiance(env, d, jnp.float32(1.0), jnp.float32(10.0)))
        lum = rad[0] @ np.array([0.2126, 0.7152, 0.0722])
        assert 10.0 < lum < 20.0  # soft knee approaches 2x max


class TestAnalyticSky:
    def test_defaults_and_cache_key(self):
        key = analytic_sky_cache_key()
        assert key.startswith("1024|512|2.5000|30.0000|35.0000")
        k2 = analytic_sky_cache_key(turbidity=3.0)
        assert key != k2

    def test_validation(self):
        with pytest.raises(ValueError):
            normalize_analytic_sky_settings(turbidity=0.5)
        with pytest.raises(ValueError):
            normalize_analytic_sky_settings(sun_elevation_deg=95)
        with pytest.raises(ValueError):
            normalize_analytic_sky_settings(ground_albedo=2.0)

    def test_sun_direction_normalized(self):
        d = compute_sun_direction(30, 35)
        assert np.linalg.norm(d) == pytest.approx(1.0)
        assert d[1] == pytest.approx(np.sin(np.radians(35)))

    def test_generated_sky_structure(self):
        sky = generate_analytic_sky(width=64, height=32, sun_intensity=20.0)
        img = sky["data"]
        assert img.shape == (32, 64, 3)
        assert np.isfinite(img).all() and (img >= 0).all()
        # Sun direction el=35,az=30: brightest pixel should be near the sun.
        sun = compute_sun_direction(30, 35)
        flat = img.sum(axis=2)
        y, x = np.unravel_index(np.argmax(flat), flat.shape)
        theta = (y + 0.5) / 32 * np.pi
        phi = (x + 0.5) / 64 * 2 * np.pi
        d = np.array([np.cos(phi) * np.sin(theta), np.cos(theta), np.sin(phi) * np.sin(theta)])
        assert d @ sun > 0.95
        # Sky above horizon should be brighter than deep ground except sun.
        assert flat[4].mean() > 0.0

    def test_sky_ground_blend(self):
        sky = generate_analytic_sky(width=32, height=16, sun_intensity=0.0,
                                    ground_albedo=0.5, sky_intensity=1.0)
        img = sky["data"]
        bottom = img[-1].mean(axis=0)
        np.testing.assert_allclose(bottom, 0.5, atol=0.05)


class TestHDR:
    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        img = (rng.random((12, 40, 3)) * 8.0).astype(np.float32)
        data = encode_hdr(img)
        w, h, decoded = decode_hdr(data)
        assert (w, h) == (40, 12)
        # RGBE shares one exponent per pixel: precision is ~max_channel/256.
        tol = img.max(axis=-1, keepdims=True) / 256.0 + 1e-4
        assert (np.abs(decoded[..., :3] - img) <= tol).all()

    def test_black_pixels(self):
        img = np.zeros((2, 8, 3), np.float32)
        w, h, decoded = decode_hdr(encode_hdr(img))
        assert decoded[..., :3].max() == 0.0

    def test_bad_header(self):
        with pytest.raises(ValueError):
            decode_hdr(b"not an hdr file")
