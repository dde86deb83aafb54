"""Test harness config: force an 8-device virtual CPU mesh.

Tests run physics + sharding on CPU for speed and determinism; the real-TPU
path is exercised by bench.py / __graft_entry__.py.  Must run before any jax
computation: the axon TPU hook (sitecustomize) overrides JAX_PLATFORMS, so we
re-force cpu through jax.config, which takes precedence at backend init.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: recompiling the physics configurations
# dominates suite runtime (VERDICT r2: full suite >30 min cold); with the
# cache, repeat runs skip every unchanged compile.  Machine-specific AOT
# artifacts — keep the cache local (gitignored), never commit it.
_cache_dir = os.environ.get("PANDA_GYM_TPU_TEST_CACHE",
                            os.path.join(os.path.dirname(__file__), "..",
                                         ".pytest_jax_cache"))
if _cache_dir != "off":
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
