#!/usr/bin/env python3
"""Write a 256x128 outdoor HDR probe with a CONCENTRATED sun peak.

The reference bundles real 1k HDRIs (kloofendal_overcast_1k.hdr,
studio_small_01_1k.hdr) whose luminance CDFs concentrate around bright
sources; with zero egress here, this synthesizes the property that
matters for CDF importance sampling: ~77% of the probe's solid-angle-weighted
luminance lives in the top 0.1% of texels (the sun disc), over a realistic
gradient sky + warm ground. The equirect image is RGBE-encoded through
env/hdr.encode_hdr (the same RLE writer the reference's
create_sky_floor_hdr.py tool family uses).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from webgl_raytracer_tpu.env.hdr import save_hdr  # noqa: E402


def sun_sky_image(width=256, height=128, sun_az_deg=40.0, sun_el_deg=35.0,
                  sun_radius_deg=1.2, sun_radiance=20000.0):
    h, w = height, width
    # Equirect direction grid (matches env/hdr.py uv convention:
    # u = 0.5 + atan2(x, -z)/2pi, v = acos(y)/pi).
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    theta = v * np.pi                      # 0 zenith .. pi nadir
    phi = (u - 0.5) * 2.0 * np.pi
    st = np.sin(theta)[:, None]
    y = np.cos(theta)[:, None] * np.ones((1, w))
    x = st * np.sin(phi)[None, :]
    z = -st * np.cos(phi)[None, :]

    az = np.deg2rad(sun_az_deg)
    el = np.deg2rad(sun_el_deg)
    sun = np.array([np.cos(el) * np.sin(az), np.sin(el),
                    -np.cos(el) * np.cos(az)])
    cosang = np.clip(x * sun[0] + y * sun[1] + z * sun[2], -1.0, 1.0)
    ang = np.arccos(cosang)

    img = np.zeros((h, w, 3), np.float32)
    # Sky gradient above the horizon, ground below.
    t = np.clip(y, 0.0, 1.0)
    sky = (np.array([0.30, 0.45, 0.85])[None, None, :] * t[..., None]
           + np.array([0.80, 0.85, 0.95])[None, None, :] * (1 - t[..., None]))
    ground = np.array([0.25, 0.22, 0.18])[None, None, :] * np.ones((h, w, 1))
    horizon = np.clip((y + 0.02) / 0.04, 0.0, 1.0)[..., None]
    img[:] = ground * (1 - horizon) + sky * horizon
    # Circumsolar glow + hard sun disc.
    sr = np.deg2rad(sun_radius_deg)
    glow = np.exp(-((ang / (sr * 6.0)) ** 2))[..., None] * 4.0
    img += glow * np.array([1.0, 0.9, 0.7])[None, None, :]
    disc = (ang <= sr)[..., None]
    img = np.where(disc, np.float32(sun_radiance)
                   * np.array([1.0, 0.96, 0.9], np.float32)[None, None, :],
                   img)
    return img.astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="assets/env/sunny_sky_256x128.hdr")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    args = p.parse_args()
    img = sun_sky_image(args.width, args.height)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_hdr(args.out, img)
    lum = img @ np.array([0.2126, 0.7152, 0.0722])
    sin_t = np.sin((np.arange(args.height) + 0.5) / args.height * np.pi)
    wlum = lum * sin_t[:, None]
    frac = np.sort(wlum.ravel())[::-1]
    top = frac[: max(1, int(0.001 * frac.size))].sum() / frac.sum()
    print(f"wrote {args.out} ({args.width}x{args.height}); "
          f"top 0.1% of texels carry {top * 100:.1f}% of solid-angle-weighted "
          f"luminance")


if __name__ == "__main__":
    main()
