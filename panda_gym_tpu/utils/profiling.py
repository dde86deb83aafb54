"""Profiling hooks (SURVEY §5.1: the reference has only a GUI debug HUD;
here: jax.profiler traces + simple step timers for production use)."""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def sync(x) -> float:
    """Synchronize on a computation the way that cannot lie.

    jax.block_until_ready is a no-op on some remote-device backends (the
    axon TPU tunnel returns before chained dispatches finish; observed
    ~400x throughput over-report in bench.py).  A scalar device-to-host
    fetch cannot complete before everything it depends on has executed, so
    all wall-clock measurements must end with this instead.
    Returns the fetched scalar (sum of x) so callers can also use it as a
    cheap checksum."""
    return float(jax.device_get(jnp.sum(x)))


@contextlib.contextmanager
def trace(logdir: str = "/tmp/panda_gym_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto.

    with profiling.trace("/tmp/trace"):
        states, *_ = core.batched_step(states, actions)
        profiling.sync(states.q)   # scalar fetch; block_until_ready can
                                   # return early on tunnel backends
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock stats for the train loop (steps/s, p50/p95)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.samples = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)
        if len(self.samples) > self.window:
            self.samples.pop(0)

    def stats(self, units_per_step: float = 1.0) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "p50_ms": 1e3 * s[n // 2],
            "p95_ms": 1e3 * s[min(int(n * 0.95), n - 1)],
            "units_per_sec": units_per_step / (sum(s) / n),
        }


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in MiB (where the backend reports it)."""
    out = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_mib": ms.get("bytes_in_use", 0) / 2**20,
                "peak_bytes_mib": ms.get("peak_bytes_in_use", 0) / 2**20,
            }
        except Exception:
            pass
    return out
