"""Device-mesh utilities: env-axis sharding for the batched env engine.

The reference's only data parallelism is SubprocVecEnv — one OS process per
env with pickle pipes (setup_training.py:44-47).  Here the env batch is a
pytree of arrays sharded over a ("env",) mesh axis with NamedSharding; XLA
inserts the collectives, and stepping N envs on D devices is just the
jit-compiled batched step on sharded inputs.  Multi-host extends the same
mesh over jax.distributed processes (ICI within a slice, DCN across).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_env_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (ENV_AXIS,))


def shard_env_batch(tree, mesh: Mesh):
    """Place a batched EnvState pytree with the leading (env) axis sharded."""
    sharding = NamedSharding(mesh, P(ENV_AXIS))

    def place(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, tree)


def env_sharding(mesh: Mesh):
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def _multihost_env_detected() -> bool:
    """True when a cluster launcher's environment indicates >1 host.

    TPU_WORKER_HOSTNAMES counts only with multiple entries (single-host TPU
    runtimes set it to "localhost")."""
    import os

    for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
              "JAX_COORDINATOR_ADDRESS"):
        if os.environ.get(k):
            return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h.strip()]) > 1


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Bring up jax.distributed for a multi-host mesh; no-op single-host.

    The reference has no distributed backend at all (SubprocVecEnv pipes are
    its only IPC, SURVEY §2.2); here multi-host is one call — afterwards
    jax.devices() spans all hosts and make_env_mesh() shards the env axis
    over the whole slice (collectives ride ICI/DCN, inserted by XLA).

    Must run before any JAX computation (jax.distributed contract), so this
    never queries the backend on the no-op path: with no explicit arguments
    it only engages when a cluster launcher's environment markers are
    present (TPU auto-detection); otherwise it returns 1 without touching
    JAX.  Returns the process count.
    """
    if num_processes == 1:
        return 1
    explicit = any(v is not None for v in (coordinator_address,
                                           num_processes, process_id))
    if not explicit and not _multihost_env_detected():
        return 1  # single-host; leave the backend untouched
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_count()


_METRIC_MEAN_CACHE: dict = {}


def global_metric_mean(tree, mesh: Mesh):
    """Mean of per-env metric arrays across the full sharded env axis.

    jit-compiled with replicated output: XLA lowers the reduction to a
    psum over the mesh (the "metrics psum" of SURVEY §5.8) instead of
    gathering per-env values to the host.  The jitted reduction is cached
    per mesh so repeated logging calls never retrace.
    """
    fn = _METRIC_MEAN_CACHE.get(mesh)
    if fn is None:
        fn = jax.jit(
            lambda t: jax.tree_util.tree_map(
                lambda x: jnp.mean(x, axis=0), t),
            out_shardings=replicated(mesh))
        _METRIC_MEAN_CACHE[mesh] = fn
    return fn(tree)
