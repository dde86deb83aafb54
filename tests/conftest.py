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
