"""Machine-keyed persistent XLA compile-cache setup.

The persistent compilation cache stores serialized executables, which for the
CPU backend contain AOT machine code.  These sessions hop between host
machines with different CPU feature sets; an executable cached on one host is
not safe to deserialize on another (XLA:CPU's aot loader SIGILL-warns even on
feature-list mismatches from compile-option pseudo-features).  Keying the
cache directory by a fingerprint of the host CPU makes every machine see only
its own artifacts — a cold cache on a new machine instead of a crash.

Separately, serializing MULTI-DEVICE XLA:CPU executables segfaults outright
in this jaxlib (hard crashes observed at both cache write and cache read for
the 8-virtual-device sharded tests); tests/test_sharding.py disables the
persistent cache for its module via an autouse fixture.

Call :func:`setup` BEFORE the first backend use (it only touches
``jax.config``, which is safe pre-initialization).
"""
from __future__ import annotations

import hashlib
import os
import platform

_FP = None


def machine_fingerprint() -> str:
    """Short stable hash of the host CPU identity (model + feature flags)."""
    global _FP
    if _FP is None:
        bits = [platform.machine()]
        try:
            with open("/proc/cpuinfo") as f:
                seen = set()
                for line in f:
                    key = line.split(":", 1)[0].strip()
                    if key in ("model name", "flags") and key not in seen:
                        seen.add(key)
                        bits.append(line.strip())
                        if len(seen) == 2:
                            break
        except OSError:
            pass
        _FP = hashlib.sha1("|".join(bits).encode()).hexdigest()[:10]
    return _FP


def setup(base_dir: str, backend: str) -> str | None:
    """Point JAX's persistent compile cache at ``base_dir/backend``.

    TPU only.  CPU executables are NOT persisted at all: XLA:CPU bakes
    compile-option pseudo-features (prefer-no-scatter/prefer-no-gather) into
    the serialized AOT result that never match the loader's host-feature
    probe — every read warns, and reads intermittently SEGFAULT in
    ``get_executable_and_time`` even for a cache written minutes earlier on
    the SAME machine (observed round 4; the round-3 host-CPU fingerprint
    keying did not help because the mismatch is compile-option, not
    hardware).  CPU compiles here are seconds-scale; correctness of the
    test suite beats warm starts.  TPU executables are device code
    (host-portable) and keep the minutes-long compiles warm.
    """
    import jax

    if backend == "cpu":
        return None
    d = os.path.join(base_dir, backend)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d
