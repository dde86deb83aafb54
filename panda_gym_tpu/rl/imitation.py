"""Prior / pretrained-model replay-buffer bootstrap.

Replaces training/learning_methods/imitation_learning.py:
fill_replay_buffer_with_prior (:6-56, rolls the NEO QP controller) and
fill_replay_buffer_with_init_model (:58-106, rolls a pretrained policy) —
but vectorized: whole episode batches are generated on device and written
into the HER buffer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from panda_gym_tpu.ops import kinematics as K
from panda_gym_tpu.rl import her


def neo_policy_fn(core, scale: float = 0.5):
    """Batched NEO prior as an action policy (imitation_learning.py:23)."""
    from panda_gym_tpu.ops.neo import compute_action_neo

    model = core.model
    ee_site = core.robot.ee_site

    def policy(x, states, key):
        def one(state):
            fk = K.fk_world(model, state.q, state.qd)
            qd = compute_action_neo(model, ee_site, state, fk, state.goal)
            return jnp.clip(qd * scale, -1.0, 1.0)
        return jax.vmap(one)(states)

    return policy


def fill_buffer_with_prior(venv, buffer, key, n_rollouts: int = 4,
                           scale: float = 0.5):
    """Roll the NEO prior for n_rollouts episode batches into the buffer."""
    policy = neo_policy_fn(venv.core, scale)

    @jax.jit
    def one(buf, key):
        episodes, stats, key = venv.rollout_episode(
            None, None, key, policy_fn=policy)
        return her.add_episodes(buf, **episodes), stats, key

    for _ in range(n_rollouts):
        key, k = jax.random.split(key)
        buffer, stats, _ = one(buffer, k)
    return buffer, stats


def fill_buffer_with_model(venv, buffer, learner, ts, key,
                           n_rollouts: int = 4):
    """Roll a pretrained policy into the buffer
    (fill_replay_buffer_with_init_model equivalent)."""

    @jax.jit
    def one(buf, key):
        episodes, stats, key = venv.rollout_episode(learner, ts, key,
                                                    deterministic=False)
        return her.add_episodes(buf, **episodes), stats, key

    for _ in range(n_rollouts):
        key, k = jax.random.split(key)
        buffer, stats, _ = one(buffer, k)
    return buffer, stats
