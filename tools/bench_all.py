"""Per-task-family batched throughput bench on the current backend.

Prints one JSON line per task with aggregate env-steps/s at the given batch,
measured like bench.py (compiled lax.scan rollout segments, random actions).

    python tools/bench_all.py [batch] [segment]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from panda_gym_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from panda_gym_tpu.utils.profiling import sync

TASKS = ["reach", "push", "slide", "pickandplace", "stack", "flip"]
REACH_AO = ["reachao1", "reachao3", "wangexp-3", "library2", "narrow_tunnel"]


def bench_core(core, batch: int, segment: int, iters: int = 5) -> float:
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    states, _ = jax.jit(jax.vmap(core.reset))(keys)

    @jax.jit
    def seg(states, key):
        def body(carry, _):
            states, key = carry
            key, sub = jax.random.split(key)
            a = jax.random.uniform(sub, (batch, core.robot.action_dim),
                                   minval=-1.0, maxval=1.0)
            states, obs, r, te, tr, i = core.batched_step(states, a)
            return (states, key), r
        (states, key), rs = jax.lax.scan(body, (states, key), None,
                                         length=segment)
        return states, key, rs

    key = jax.random.PRNGKey(1)
    states, key, rs = seg(states, key)
    sync(rs)
    t0 = time.perf_counter()
    for _ in range(iters):
        states, key, rs = seg(states, key)
    sync(rs)
    return batch * segment * iters / (time.perf_counter() - t0)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    segment = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from panda_gym_tpu.envs.panda_tasks import make_core
    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core

    for task in TASKS:
        sps = bench_core(make_core(task), batch, segment)
        print(json.dumps({"task": task, "batch": batch,
                          "steps_per_sec": round(sps)}), flush=True)
    for sc in REACH_AO:
        sps = bench_core(make_reach_ao_core(scenario=sc), batch, segment)
        print(json.dumps({"task": f"reachao:{sc}", "batch": batch,
                          "steps_per_sec": round(sps)}), flush=True)


if __name__ == "__main__":
    main()
