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
