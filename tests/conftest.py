"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

NOTE: the env var JAX_PLATFORMS alone is NOT enough in this environment — the
axon TPU plugin overrides it; jax.config.update('jax_platforms', ...) before
first backend use is authoritative.  XLA_FLAGS must be set before backend
initialization for the virtual device count.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
