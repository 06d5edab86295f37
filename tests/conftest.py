"""Test configuration: virtual 8-device CPU mesh, or real-TPU tier.

Default run: force JAX onto a virtual 8-device CPU mesh and run everything
EXCEPT tests marked `tpu` (Pallas kernels execute in interpreter mode).

`EFF_TPU_TESTS=1 python -m pytest tests/ -m tpu` runs the compiled-kernel
parity tier on the real TPU backend (and only that tier) — the repeatable
check that the production compiled kernels, not just their interpreted
semantics, match the oracle.

NOTE: the env var JAX_PLATFORMS alone is NOT enough in this environment — the
axon TPU plugin overrides it; jax.config.update('jax_platforms', ...) before
first backend use is authoritative.  XLA_FLAGS must be set before backend
initialization for the virtual device count.
"""
import itertools
import os

import pytest

RUN_TPU = os.environ.get("EFF_TPU_TESTS") == "1"

if not RUN_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not RUN_TPU:
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache: TPU tier only.  For the CPU suite this is now a
# no-op inside compile_cache.setup — persisted XLA:CPU executables
# intermittently SEGFAULT on deserialize even same-machine (compile-option
# pseudo-features never match the loader's host probe; observed round 4 in
# test_sample_image_sequence).  Cold CPU compiles cost ~2-3 min per full run;
# a deterministic green suite is worth it.
import sys  # noqa: E402
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from efficient_features_tpu.utils import compile_cache  # noqa: E402

compile_cache.setup("/tmp/eff_tpu_xla_cache", "tpu" if RUN_TPU else "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: compiled-kernel parity tier; needs a real TPU "
        "(run with EFF_TPU_TESTS=1)")


_MODULES_PER_CACHE_CLEAR = 3
_module_counter = itertools.count(1)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process XLA:CPU state: two full-suite runs segfaulted inside
    backend_compile_and_load at test_samples (the same compile passes in
    isolation and in smaller combinations), i.e. a state-dependent XLA:CPU
    compiler crash after ~100 accumulated executables.  Dropping compiled
    executables periodically keeps the peak executable count a fraction of
    a full run's.  Clearing every module was measured at 30 min suite time
    on a 1-core machine (vs ~6 min historically) because shared fixture
    shapes recompile each wave — every 3rd module bounds the peak at about
    a quarter of a full accumulation for a third of the waves."""
    yield
    if next(_module_counter) % _MODULES_PER_CACHE_CLEAR == 0:
        import jax
        jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    if RUN_TPU:
        skip = pytest.mark.skip(
            reason="EFF_TPU_TESTS=1 runs only the -m tpu tier")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="compiled-kernel tier needs a real TPU (EFF_TPU_TESTS=1)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
