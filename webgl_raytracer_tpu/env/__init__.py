"""Environment lighting: HDR decode, analytic sky generation, CDF build,
and the environment cache/controller.

Mirrors the reference's L4 layer (/root/reference/src/hdr.js,
analytic_sky.js, environment_controller.js).
"""

from .cdf import build_env_sampling, make_env_buffers, constant_env
from .sky import (
    AnalyticSkySettings,
    ANALYTIC_SKY_ID,
    analytic_sky_cache_key,
    compute_sun_direction,
    generate_analytic_sky,
    normalize_analytic_sky_settings,
)
from .hdr import load_hdr, decode_hdr, encode_hdr
from .controller import EnvironmentController
