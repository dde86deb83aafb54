"""On-device episodic replay buffer with Hindsight Experience Replay.

Replaces SB3's HerReplayBuffer / the missing sb3_extensions
CustomHerReplayBuffer the reference trains with (train_config.py:15,
setup_training.py:16).  TPU-native design: an episode-major ring buffer that
lives in device memory as a pytree of arrays

    (capacity_episodes, ep_len, ...)

written by the vectorized collector and sampled with 'future'-strategy goal
relabeling entirely on device — no pickling, no host round-trips.  Rewards
are recomputed at sample time from (achieved, relabeled_goal, aux) via the
task's pure reward function, which is exactly the HER contract the reference
relies on (env.compute_reward, core.py:282).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class HerBuffer:
    obs: jnp.ndarray          # (E, T+1, obs_dim) flat "observation"
    achieved: jnp.ndarray     # (E, T+1, goal_dim)
    desired: jnp.ndarray      # (E, goal_dim) one goal per episode
    action: jnp.ndarray       # (E, T, act_dim)
    aux: jnp.ndarray          # (E, T, aux_dim) task reward terms
    ep_len: jnp.ndarray       # (E,) valid transitions per episode slot
    terminated: jnp.ndarray   # (E, T) early-termination flag per step
    write_idx: jnp.ndarray    # () next episode slot
    n_stored: jnp.ndarray     # () episodes currently stored

    capacity: int = struct.field(pytree_node=False, default=0)
    ep_horizon: int = struct.field(pytree_node=False, default=0)


def create(capacity_episodes: int, ep_horizon: int, obs_dim: int,
           goal_dim: int, act_dim: int, aux_dim: int) -> HerBuffer:
    E, T = capacity_episodes, ep_horizon
    z = jnp.zeros
    return HerBuffer(
        obs=z((E, T + 1, obs_dim)), achieved=z((E, T + 1, goal_dim)),
        desired=z((E, goal_dim)), action=z((E, T, act_dim)),
        aux=z((E, T, aux_dim)), ep_len=z((E,), jnp.int32),
        terminated=z((E, T), bool),
        write_idx=jnp.asarray(0, jnp.int32), n_stored=jnp.asarray(0, jnp.int32),
        capacity=E, ep_horizon=T)


def add_episodes(buf: HerBuffer, obs, achieved, desired, action, aux,
                 ep_len, terminated) -> HerBuffer:
    """Write a batch of B completed episodes into the ring."""
    B = obs.shape[0]
    idx = (buf.write_idx + jnp.arange(B)) % buf.capacity
    return buf.replace(
        obs=buf.obs.at[idx].set(obs),
        achieved=buf.achieved.at[idx].set(achieved),
        desired=buf.desired.at[idx].set(desired),
        action=buf.action.at[idx].set(action),
        aux=buf.aux.at[idx].set(aux),
        ep_len=buf.ep_len.at[idx].set(ep_len),
        terminated=buf.terminated.at[idx].set(terminated),
        write_idx=(buf.write_idx + B) % buf.capacity,
        n_stored=jnp.minimum(buf.n_stored + B, buf.capacity))


def sample(buf: HerBuffer, key, batch_size: int,
           reward_fn: Callable, her_ratio: float = 0.8,
           gamma_mask_terminal: bool = True) -> Dict[str, jnp.ndarray]:
    """Sample transitions with 'future' goal relabeling (SB3 default,
    n_sampled_goal=4 -> her_ratio 0.8).

    reward_fn(achieved_next, goal, aux) -> reward must be the task's pure
    reward; `done` returned is the env termination signal for bootstrapping.
    """
    k_ep, k_t, k_f, k_h = jax.random.split(key, 4)
    n = jnp.maximum(buf.n_stored, 1)
    ep = jax.random.randint(k_ep, (batch_size,), 0, n)
    L = jnp.maximum(buf.ep_len[ep], 1)                       # (B,)
    t = (jax.random.uniform(k_t, (batch_size,)) * L).astype(jnp.int32)
    t = jnp.minimum(t, L - 1)

    obs = buf.obs[ep, t]
    next_obs = buf.obs[ep, t + 1]
    achieved = buf.achieved[ep, t]
    achieved_next = buf.achieved[ep, t + 1]
    action = buf.action[ep, t]
    aux = buf.aux[ep, t]
    terminated = buf.terminated[ep, t]

    # future strategy: goal <- achieved at tau ~ U[t+1, L]
    tau = t + 1 + (jax.random.uniform(k_f, (batch_size,))
                   * (L - t - 1).astype(jnp.float32)).astype(jnp.int32)
    tau = jnp.clip(tau, t + 1, L)
    future_goal = buf.achieved[ep, tau]
    use_her = jax.random.uniform(k_h, (batch_size,)) < her_ratio
    goal = jnp.where(use_her[:, None], future_goal, buf.desired[ep])

    reward = reward_fn(achieved_next, goal, aux)
    return dict(obs=obs, next_obs=next_obs, achieved=achieved,
                achieved_next=achieved_next, goal=goal, action=action,
                reward=reward, terminated=terminated)
