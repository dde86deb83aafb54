"""Device-mesh utilities: env-axis sharding for the batched env engine.

The reference's only data parallelism is SubprocVecEnv — one OS process per
env with pickle pipes (setup_training.py:44-47).  Here the env batch is a
pytree of arrays sharded over a ("env",) mesh axis with NamedSharding; XLA
inserts the collectives, and stepping N envs on D devices is just the
jit-compiled batched step on sharded inputs.  Multi-host extends the same
mesh over jax.distributed processes (ICI within a slice, DCN across).
"""
from __future__ import annotations

from functools import partial
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


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Bring up jax.distributed for a multi-host mesh; no-op single-host.

    The reference has no distributed backend at all (SubprocVecEnv pipes are
    its only IPC, SURVEY §2.2); here multi-host is one call — afterwards
    jax.devices() spans all hosts and make_env_mesh() shards the env axis
    over the whole slice (collectives ride ICI/DCN, inserted by XLA).
    Arguments default to TPU auto-detection (JAX coordination service).
    Returns the process count.
    """
    if num_processes == 1 or (coordinator_address is None
                              and jax.process_count() == 1
                              and num_processes is None):
        return jax.process_count()
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_count()


def global_metric_mean(tree, mesh: Mesh):
    """Mean of per-env metric arrays across the full sharded env axis.

    jit-compiled with replicated output: XLA lowers the reduction to a
    psum over the mesh (the "metrics psum" of SURVEY §5.8) instead of
    gathering per-env values to the host.
    """
    @partial(jax.jit, out_shardings=replicated(mesh))
    def _mean(t):
        return jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), t)

    return _mean(tree)
