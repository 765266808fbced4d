"""Test configuration: run everything on a virtual 8-device CPU mesh.

This environment preloads jax with a TPU ('axon') backend from
sitecustomize, so env vars alone are ignored — the platform must be forced
through jax.config before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
