"""Benchmark: batched env throughput on the current JAX backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: aggregate env-steps/s for PandaReach with 65536 batched envs
on one chip (throughput saturates near this batch; 4096 gives ~95% of it),
measured the way the framework is actually consumed: whole
rollout segments compiled under lax.scan (rl/train.py rollout_episode), so
per-call dispatch is amortized exactly as in training.  BASELINE.json target:
>=1M steps/s aggregate on a v5e-8, i.e. 125k steps/s per chip;
vs_baseline = value / 125_000.

The reference sustains ~42 env-steps/s (300k steps in ~2 h with 8
SubprocVecEnv workers, README.md:6) — reported as secondary context.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

PER_CHIP_TARGET = 125_000.0  # BASELINE.json north star / 8 chips


def _make_bench_core(task: str):
    """Task factory covering all three physics paths: Reach & friends
    (ops/scalarized + Pallas motor kernel), ReachAO scenarios (per-substep
    collision checking, ops/scalarized_collision), and contact tasks
    (free bodies, ops/scalarized_contact)."""
    if task.startswith("reachao") or task in ("wall", "wangexp-3"):
        from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core
        from panda_gym_tpu.rl.config import TrainConfig
        cfg = TrainConfig()
        cfg.obs_max_distance = 2.0
        return make_reach_ao_core(scenario=task, config=cfg,
                                  ee_error_threshold=0.05,
                                  speed_threshold=0.5)
    from panda_gym_tpu.envs.panda_tasks import make_core
    return make_core(task)


def bench_env_steps(batch: int = 4096, segment: int = 25, iters: int = 10,
                    task: str = "reach"):
    core = _make_bench_core(task)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    reset_fn = jax.jit(jax.vmap(core.reset))
    states, _ = reset_fn(keys)

    @jax.jit
    def rollout_segment(states, key):
        """`segment` policy steps with random actions, one dispatch."""
        def body(carry, _):
            states, key = carry
            key, sub = jax.random.split(key)
            actions = jax.random.uniform(
                sub, (batch, core.robot.action_dim), minval=-1.0, maxval=1.0)
            states, obs, reward, term, trunc, info = core.batched_step(
                states, actions)
            return (states, key), reward
        (states, key), rewards = jax.lax.scan(
            body, (states, key), None, length=segment)
        return states, key, rewards

    # scalar-fetch barrier: block_until_ready no-ops on the tunnel backend
    from panda_gym_tpu.utils.profiling import sync

    key = jax.random.PRNGKey(1)
    states, key, rewards = rollout_segment(states, key)  # warmup / compile
    sync(rewards)

    t0 = time.perf_counter()
    for _ in range(iters):
        states, key, rewards = rollout_segment(states, key)
    sync(rewards)
    dt = time.perf_counter() - t0
    return batch * segment * iters / dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    segment = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    sps = bench_env_steps(batch=batch, segment=segment)
    print(json.dumps({
        "metric": f"env_steps_per_sec_per_chip_reach{batch}",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / PER_CHIP_TARGET, 4),
    }))


# per-task batch sizes: contact/collision paths carry much more per-substep
# state, so their throughput saturates at smaller batches
TASK_BENCH = [
    ("reach", 65536),      # robot-only path (Pallas motor kernel)
    ("reachao1", 16384),   # per-substep collision path (3 obstacles)
    ("reachao2", 16384),   # collision path, 9 obstacles
    ("push", 16384),       # free-body contact path
]


def tasks_main():
    """Per-task throughput table (VERDICT r3 #3): updates BENCH_TASKS.json,
    prints one row per task.  A filtered invocation (task names as args)
    merges into the existing table instead of clobbering the other rows."""
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_TASKS.json")
    # MERGE into the existing table (ADVICE r4): preserve unknown top-level
    # keys (e.g. "provenance") and never silently clobber rows measured
    # under a different engine state — each re-measured row gets fresh
    # per-row provenance (date + engine), rows not re-measured keep theirs.
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    rows = data.get("rows", {})
    import datetime

    from panda_gym_tpu.ops import dynamics as _dyn
    engine = (f"lcp={_dyn.LCP_MODE},warm_start={_dyn.LCP_WARM_START},"
              f"warm_iters={_dyn.MOTOR_LCP_WARM_ITERS},"
              f"cold_iters={_dyn.MOTOR_LCP_ITERS}")
    for task, batch in TASK_BENCH:
        if names and task not in names:
            continue
        t0 = time.perf_counter()
        sps = bench_env_steps(batch=batch, segment=25, iters=10, task=task)
        rows[task] = {
            "batch": batch,
            "steps_per_sec": round(sps, 1),
            "vs_per_chip_target": round(sps / PER_CHIP_TARGET, 4),
            "wall_s": round(time.perf_counter() - t0, 1),
            "date": datetime.date.today().isoformat(),
            "engine": engine,
        }
        print(json.dumps({"task": task, **rows[task]}), flush=True)
        # incremental persistence: a timeout/tunnel wedge mid-table keeps
        # every row already measured
        data["device"] = str(jax.devices()[0])
        data["rows"] = rows
        with open(path, "w") as f:
            json.dump(data, f, indent=1)


def _watchdog_main():
    """Run the measurement in a child process with a hard deadline.

    The TPU tunnel can wedge (observed: device-to-host transfers hanging
    indefinitely while dispatch still works); a hang here would leave the
    driver with no output at all.  The child prints the JSON line on
    success; on timeout/failure the parent reports an explicit error record
    instead of hanging.
    """
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           *sys.argv[1:]]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=540)
        out = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if out:
            print(out[-1])
            return
        err = (proc.stderr or "").strip().splitlines()
        note = err[-1][:200] if err else f"exit {proc.returncode}, no output"
    except subprocess.TimeoutExpired:
        note = "timeout: TPU backend unresponsive (tunnel hang)"
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip_reach",
        "value": 0.0, "unit": "steps/s", "vs_baseline": 0.0,
        "error": note,
    }))


if __name__ == "__main__":
    if "--tasks" in sys.argv:
        sys.argv.remove("--tasks")
        tasks_main()
    elif "--child" in sys.argv:
        sys.argv.remove("--child")
        main()
    else:
        _watchdog_main()
