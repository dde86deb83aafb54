"""Multi-host certification: 2-process jax.distributed CPU run.

Certifies the path no single-process test can touch (VERDICT r3 #7):
`parallel/mesh.py::initialize_multihost` actually calling
`jax.distributed.initialize`, a Mesh spanning both processes' devices, and
a cross-process psum through `global_metric_mean`, plus a sharded
batched env step over the global mesh.

Run (driver):
    python tools/multihost_smoke.py            # spawns 2 worker processes

Each worker runs with JAX_PLATFORMS=cpu and 4 virtual CPU devices, so the
global mesh is 8 devices across 2 OS processes — multi-host semantics
(process-local addressable shards, DCN-style coordination) on one machine.
Writes MULTIHOST_SMOKE.json at the repo root on success.

Reference contrast: the reference has no distributed backend at all — its
only cross-process transport is SubprocVecEnv pickle pipes
(training/utils/setup_training.py:44-47); SURVEY §2.2/§5.8 calls for the
jax.distributed + XLA-collectives replacement certified here.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 12973
NPROC = 2
DEV_PER_PROC = 4


def worker(pid: int):
    # force CPU before jax import; the axon site hook may override the env
    # var, so also pin via jax.config
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from panda_gym_tpu.parallel import mesh as M

    n = M.initialize_multihost(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC, process_id=pid)
    assert n == NPROC, f"process_count {n} != {NPROC}"
    assert jax.process_count() == NPROC
    ndev = len(jax.devices())
    nlocal = len(jax.local_devices())
    assert ndev == NPROC * DEV_PER_PROC, (ndev, nlocal)

    import jax.numpy as jnp
    import numpy as np

    m = M.make_env_mesh()
    assert m.devices.size == ndev

    # cross-process psum: per-env metrics sharded over the global env axis,
    # reduced to a replicated mean (XLA lowers to a psum across processes)
    n_envs = 16
    es = M.env_sharding(m)

    # make_array_from_callback: each process supplies only its local shards
    gshape = (n_envs,)
    arr = jax.make_array_from_callback(
        gshape, es, lambda idx: np.arange(n_envs, dtype=np.float32)[idx])
    out = M.global_metric_mean({"metric": arr}, m)
    got = float(out["metric"])
    want = float(np.arange(n_envs, dtype=np.float32).mean())
    assert abs(got - want) < 1e-6, (got, want)

    # sharded batched env step over the global mesh: the real engine path
    from panda_gym_tpu.envs.panda_tasks import make_core
    core = make_core("reach")
    keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    keys = jax.device_put(keys, es)
    reset = jax.jit(jax.vmap(core.reset), out_shardings=(es, es))
    states, obs = reset(keys)
    actions = jax.device_put(
        jnp.zeros((n_envs, core.robot.action_dim)), es)
    step = jax.jit(core.batched_step)
    states2, obs2, reward, term, trunc, info = step(states, actions)
    r = M.global_metric_mean({"reward": reward}, m)
    if pid == 0:
        print(f"worker0: psum_mean={got}, step_reward_mean="
              f"{float(r['reward']):.4f}, devices={ndev} "
              f"({nlocal} local x {NPROC} processes)", flush=True)
    jax.distributed.shutdown()


def main():
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={DEV_PER_PROC}")
    t0 = time.time()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(NPROC)]
    outs = []
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
        ok &= p.returncode == 0
    dtime = time.time() - t0
    for i, o in enumerate(outs):
        tail = "\n".join(o.strip().splitlines()[-4:])
        print(f"--- worker {i} (rc={procs[i].returncode}):\n{tail}")
    if not ok:
        raise SystemExit(1)
    record = {
        "ok": True,
        "processes": NPROC,
        "devices_per_process": DEV_PER_PROC,
        "checks": ["initialize_multihost->jax.distributed.initialize",
                   "global mesh spans processes",
                   "cross-process psum (global_metric_mean)",
                   "sharded batched env step on global mesh"],
        "wall_s": round(dtime, 1),
    }
    with open(os.path.join(REPO, "MULTIHOST_SMOKE.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
