"""Environment selection + caching.

The device-side analog of environment_controller.js: a cache keyed by HDR
path or analytic-sky cache key, producing EnvBuffers (image + CDFs) ready
for the integrator, with a manifest listing available HDR assets.
"""

from __future__ import annotations

import json
import os

from ..ops.envmap import EnvBuffers
from .cdf import make_env_buffers
from .hdr import load_hdr
from .sky import analytic_sky_cache_key, generate_analytic_sky, ANALYTIC_SKY_ID


class EnvironmentController:
    def __init__(self, asset_dir: str | None = None, logger=None, device=None):
        self.asset_dir = asset_dir
        self.logger = logger
        self.device = device
        self._cache: dict[str, EnvBuffers] = {}
        self.current: EnvBuffers | None = None
        self.current_key: str | None = None

    def load_hdr_file(self, path: str) -> EnvBuffers:
        key = os.path.abspath(path)
        if key not in self._cache:
            hdr = load_hdr(path, self.logger)
            self._cache[key] = make_env_buffers(hdr["data"], self.device)
            if self.logger:
                self.logger.info(f"Environment loaded: {path} ({hdr['width']}x{hdr['height']})")
        self.current = self._cache[key]
        self.current_key = key
        return self.current

    def load_analytic_sky(self, settings=None, **kw) -> EnvBuffers:
        key = ANALYTIC_SKY_ID + ":" + analytic_sky_cache_key(settings, **kw)
        if key not in self._cache:
            sky = generate_analytic_sky(settings, **kw)
            self._cache[key] = make_env_buffers(sky["data"], self.device)
            if self.logger:
                s = sky["settings"]
                self.logger.info(
                    f"Analytic sky generated ({s.width}x{s.height}, "
                    f"turbidity {s.turbidity:.2f})"
                )
        self.current = self._cache[key]
        self.current_key = key
        return self.current

    def clear(self) -> None:
        """Teardown to 'no environment' (reference resets to a black env)."""
        self.current = None
        self.current_key = None

    def manifest(self) -> list[dict]:
        """List available HDR env assets (assets/env/manifest.json if
        present, else a directory scan)."""
        if not self.asset_dir or not os.path.isdir(self.asset_dir):
            return []
        manifest_path = os.path.join(self.asset_dir, "manifest.json")
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                data = json.load(f)
            return data if isinstance(data, list) else data.get("environments", [])
        return [
            {"name": os.path.splitext(f)[0], "file": f}
            for f in sorted(os.listdir(self.asset_dir))
            if f.lower().endswith(".hdr")
        ]
