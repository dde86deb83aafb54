"""Host-scaling / device-scaling efficiency benchmark (BASELINE.md target:
>=85% efficiency 1 -> N devices).

Without multi-chip hardware, run on a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/scaling_bench.py reach 2048

On a real slice it benches the actual devices. Prints one JSON line per
device count plus an efficiency summary.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# honor JAX_PLATFORMS even where a site hook (e.g. the axon TPU plugin)
# overrides it after env-var processing — same trick as tests/conftest.py
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp

from panda_gym_tpu.utils.profiling import sync
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def bench(task: str = "reach", envs_per_device: int = 2048,
          segment: int = 10, iters: int = 5):
    from panda_gym_tpu.envs.panda_tasks import make_core

    core = make_core(task)
    devices = jax.devices()
    results = []
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for n in counts:
        mesh = Mesh(np.asarray(devices[:n]), ("env",))
        shard = NamedSharding(mesh, P("env"))
        B = envs_per_device * n
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        states, _ = jax.jit(jax.vmap(core.reset))(keys)
        states = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, shard), states)

        @jax.jit
        def seg(states, key):
            def body(carry, _):
                states, key = carry
                key, sub = jax.random.split(key)
                a = jax.random.uniform(
                    sub, (B, core.robot.action_dim), minval=-1.0, maxval=1.0)
                states, obs, r, te, tr, i = core.batched_step(states, a)
                return (states, key), r
            (states, key), rs = jax.lax.scan(
                body, (states, key), None, length=segment)
            return states, key, rs

        key = jax.device_put(jax.random.PRNGKey(1), NamedSharding(mesh, P()))
        with mesh:
            states, key, rs = seg(states, key)
            sync(rs)
            t0 = time.perf_counter()
            for _ in range(iters):
                states, key, rs = seg(states, key)
            sync(rs)
            dt = time.perf_counter() - t0
        sps = B * segment * iters / dt
        results.append({"devices": n, "envs": B, "steps_per_sec": round(sps)})
        print(json.dumps(results[-1]), flush=True)

    if len(results) > 1:
        base = results[0]["steps_per_sec"]
        eff = results[-1]["steps_per_sec"] / (base * results[-1]["devices"])
        row = {"metric": "scaling_efficiency",
               "devices": results[-1]["devices"], "value": round(eff, 4)}
        if jax.default_backend() == "cpu":
            # virtual devices share one host's cores: the emulated mesh
            # validates sharding CORRECTNESS, not scaling — flag it
            row["note"] = "emulated mesh; efficiency meaningful on real chips only"
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    task = sys.argv[1] if len(sys.argv) > 1 else "reach"
    epd = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    bench(task, epd)
