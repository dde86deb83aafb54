"""Persistent XLA compilation cache for the CLI tools.

Scenario physics compiles dominate tool wall-clock on the TPU tunnel
(~30-40 s per env configuration, 13+ configurations per benchmark run).
The cache persists compiled executables across processes, so a campaign of
N evaluate/train invocations pays each compile once instead of N times.

Artifacts are machine/backend-specific: keep the directory local (it is
gitignored), never commit it.
"""
from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str | None:
    """Idempotently point JAX at a persistent compilation cache dir.
    Honors PANDA_GYM_TPU_CACHE (set to "off" to disable)."""
    import jax

    env = os.environ.get("PANDA_GYM_TPU_CACHE")
    if env == "off":
        return None
    # the axon TPU tunnel proxies compilation to a remote server; persisted
    # AOT executables cannot be re-loaded through it (measured: cache
    # lookups stall the first compile instead of skipping it).  Only the
    # in-process CPU backend benefits.
    if env is None and jax.default_backend() != "cpu":
        return None
    path = env or path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
