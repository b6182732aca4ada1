"""Persistent XLA compilation cache for every TPU-facing entry point.

The cloud-gate / bench / train programs are compiled from scratch on each
process start; through the axon tunnel a cold compile of the production
step has been observed at 2-5 minutes (BENCH_r03.json attempt 1 lost its
whole 720 s budget to recompiling a program compiled dozens of times that
day). JAX's persistent compilation cache keyed on the serialized HLO makes
every repeat start warm — the same mechanism the test suite has used since
round 2 (tests/conftest.py).

Wired into ``cli.main()`` (covers train / evaluate / rollout / cloud-gate /
overfit / serve / bench subcommands) and the ``benchmark`` child process.
Opt out with ``UCT_NO_COMPILE_CACHE=1`` or redirect with
``UCT_COMPILE_CACHE_DIR=/path``.
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/uct_compile_cache"


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Turn on the JAX persistent compilation cache (idempotent).

    Must run before the first jit compile; safe to call after ``import
    jax`` (config updates, not env vars). Returns the cache dir in use, or
    None when disabled via ``UCT_NO_COMPILE_CACHE``.
    """
    if os.environ.get("UCT_NO_COMPILE_CACHE", "") not in ("", "0"):
        return None
    path = (cache_dir or os.environ.get("UCT_COMPILE_CACHE_DIR")
            or DEFAULT_DIR)
    import sys

    if "jax" not in sys.modules:
        # jax not imported yet (host-only subcommands like gen-mnist never
        # import it — don't pay a multi-second import just to configure a
        # cache): set the env-var defaults jax reads at import time.
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
        os.environ.setdefault(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
        os.environ.setdefault(
            "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
        return path
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # Cache even fast compiles: the tunnel round-trip, not compile CPU
    # time, is what repeat starts pay for.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
