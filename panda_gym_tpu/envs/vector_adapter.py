"""gymnasium.vector.VectorEnv over the batched functional core.

The reference's vectorization seam is SB3's `make_vec_env(...,
vec_env_cls=SubprocVecEnv)` — one OS process per env and pickle pipes
(reference training/utils/setup_training.py:44-47).  Here the same public
contract (the gymnasium vector API) is served by ONE jit-compiled batched
step over the env-state pytree: no processes, no pipes, thousands of envs
per device.

    import gymnasium as gym, panda_gym_tpu
    panda_gym_tpu.register_envs(50)
    venv = gym.make_vec("PandaReach-v3", num_envs=4096)   # vector_entry_point
    obs, info = venv.reset(seed=0)
    obs, r, term, trunc, info = venv.step(venv.action_space.sample())

Autoreset follows gymnasium's NEXT_STEP mode: a step that ends an episode
returns its final observation; the env resets on the following step (that
step's action is ignored for it, reward 0, no termination flags).

Internal training prefers `rl/train.py::VectorEnv` (whole episode segments
under one lax.scan dispatch); this adapter is the drop-in for external
gym-vector tooling, paying one host round-trip per step.
"""
from __future__ import annotations

from typing import Optional

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium.vector import AutoresetMode, VectorEnv
from gymnasium.vector.utils import batch_space

from panda_gym_tpu.envs.core import RobotTaskEnv


class JaxVectorEnv(VectorEnv):
    """Batched functional core -> gymnasium.vector.VectorEnv."""

    metadata = {"autoreset_mode": AutoresetMode.NEXT_STEP}

    def __init__(self, core: RobotTaskEnv, num_envs: int,
                 max_episode_steps: int = 50):
        self.core = core
        self.num_envs = int(num_envs)
        self.max_episode_steps = int(max_episode_steps)

        _, probe = jax.eval_shape(core.reset, jax.random.PRNGKey(0))
        from gymnasium import spaces
        self.single_observation_space = spaces.Dict({
            k: spaces.Box(-10.0, 10.0, shape=v.shape, dtype=np.float32)
            for k, v in probe.items()})
        self.single_action_space = spaces.Box(
            -1.0, 1.0, shape=(core.robot.action_dim,), dtype=np.float32)
        self.observation_space = batch_space(self.single_observation_space,
                                             self.num_envs)
        self.action_space = batch_space(self.single_action_space,
                                        self.num_envs)

        self._jit_reset = jax.jit(jax.vmap(core.reset))
        self._jit_step = jax.jit(core.batched_step)

        n = self.num_envs

        def step_with_reset(states, mask, actions, key):
            """Reset masked envs (their action is ignored this step), step
            the rest — one dispatch."""
            keys = jax.random.split(key, n + 1)
            r_states, r_obs = jax.vmap(core.reset)(keys[1:])
            pick = lambda a, b: jnp.where(
                mask.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
            states = jax.tree_util.tree_map(pick, r_states, states)
            nstates, obs, reward, term, trunc, info = core.batched_step(
                states, actions)
            out_states = jax.tree_util.tree_map(pick, states, nstates)
            obs = jax.tree_util.tree_map(pick, r_obs, obs)
            reward = jnp.where(mask, 0.0, reward)
            term = jnp.where(mask, False, term)
            trunc = jnp.where(mask, False, trunc)
            info = {k: jnp.where(mask, False, v) for k, v in info.items()}
            return keys[0], out_states, obs, reward, term, trunc, info

        self._jit_step_with_reset = jax.jit(step_with_reset)

        self._states = None
        self._needs_reset = np.zeros(n, dtype=bool)
        self._ep_steps = np.zeros(n, dtype=np.int64)
        self._key = jax.random.PRNGKey(0)

    # -- gymnasium vector API ---------------------------------------------
    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(int(seed))
        self._key, k = jax.random.split(self._key)
        keys = jax.random.split(k, self.num_envs)
        self._states, obs = self._jit_reset(keys)
        self._needs_reset[:] = False
        self._ep_steps[:] = 0
        return {k: np.asarray(v) for k, v in obs.items()}, {}

    def step(self, actions):
        if self._states is None:
            raise RuntimeError("call reset() before step()")
        actions = jnp.asarray(np.asarray(actions), jnp.float32)
        mask = self._needs_reset
        if mask.any():
            (self._key, self._states, obs, reward, term, trunc,
             info) = self._jit_step_with_reset(
                self._states, jnp.asarray(mask), actions, self._key)
        else:
            self._states, obs, reward, term, trunc, info = self._jit_step(
                self._states, actions)

        term = np.asarray(term)
        trunc = np.asarray(trunc)
        # the autoreset step returns the episode's initial observation — it
        # is not a step of the new episode (gymnasium NEXT_STEP semantics)
        self._ep_steps = np.where(mask, 0, self._ep_steps + 1)
        # adapter-level TimeLimit (the single-env path gets this from
        # gymnasium's TimeLimit wrapper via register(max_episode_steps=...))
        trunc = trunc | ((self._ep_steps >= self.max_episode_steps)
                         & ~term)
        self._needs_reset = term | trunc
        return (
            {k: np.asarray(v) for k, v in obs.items()},
            np.asarray(reward),
            term,
            trunc,
            {k: np.asarray(v) for k, v in info.items()},
        )

    def close_extras(self, **kwargs):
        pass


def make_vector_env(num_envs: int = 1, max_episode_steps: int = 50,
                    vector_task: str = "reach", scenario: str = "reachao1",
                    **kwargs) -> JaxVectorEnv:
    """`vector_entry_point` factory for gym.make_vec (panda_gym_tpu
    register_envs wires every env id here with its `vector_task`)."""
    kwargs.pop("render", None)
    if vector_task == "reachao":
        from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core
        from panda_gym_tpu.rl.config import TrainConfig
        cfg = TrainConfig()
        if "control_type" in kwargs:
            cfg.control_type = kwargs["control_type"]
        core = make_reach_ao_core(scenario=scenario, config=cfg)
    else:
        from panda_gym_tpu.envs.panda_tasks import make_core
        core = make_core(vector_task, **kwargs)
    return JaxVectorEnv(core, num_envs, max_episode_steps=max_episode_steps)
