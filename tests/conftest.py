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
# persistent compile cache: the suite is dominated by XLA-CPU compiles of the
# many pipeline signatures; repeat runs drop from ~12 min to ~2 min
jax.config.update("jax_compilation_cache_dir", "/tmp/eff_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
