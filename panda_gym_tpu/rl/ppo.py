"""PPO: on-policy learner + rollout collection.

The reference ships a PPO hyperparameter preset (hyperparameters.py:55-70)
on SB3's PPO (clipped surrogate, GAE(lambda), n_epochs minibatch reuse,
value clipping off, entropy bonus).  This is the flax/optax equivalent,
consuming the same batched functional envs as the off-policy stack — with
auto-resetting continuing rollouts instead of episode-aligned ones.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from panda_gym_tpu.rl.networks import MLP, GaussianPolicy, gaussian_logp


@struct.dataclass
class PPOState:
    actor_params: Any
    value_params: Any
    actor_opt: Any
    value_opt: Any
    step: jnp.ndarray


class PPOLearner:
    """Clipped-surrogate PPO (SB3 semantics, hyperparameters.py:55-70)."""

    def __init__(self, obs_dim: int, act_dim: int, hp):
        self.obs_dim = obs_dim
        self.act_dim = act_dim
        self.hp = hp
        self.gamma = getattr(hp, "gamma", 0.99)
        self.gae_lambda = getattr(hp, "gae_lambda", 0.9)
        self.clip_range = getattr(hp, "clip_range", 0.4)
        self.n_epochs = getattr(hp, "n_epochs", 20)
        self.batch_size = getattr(hp, "batch_size", 128)
        self.ent_coef = getattr(hp, "ent_coef", 0.0)
        self.vf_coef = getattr(hp, "vf_coef", 0.5)
        self.n_steps = getattr(hp, "n_steps", 512)
        lr = getattr(hp, "learning_rate", 3e-5)
        clip = getattr(hp, "max_grad_norm", 0.5)
        pk = getattr(hp, "policy_kwargs", {})
        self.net_arch = tuple(pk.get("net_arch", [256, 256]))
        self.log_std_init = float(pk.get("log_std_init", -2.0))
        self.actor = GaussianPolicy(act_dim, self.net_arch, self.log_std_init)
        self.value = MLP(self.net_arch, 1)
        self.tx = optax.chain(optax.clip_by_global_norm(clip), optax.adam(lr))

    def init(self, key) -> PPOState:
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((1, self.obs_dim))
        ap = self.actor.init(k1, x)
        vp = self.value.init(k2, x)
        return PPOState(
            actor_params=ap, value_params=vp,
            actor_opt=self.tx.init(ap), value_opt=self.tx.init(vp),
            step=jnp.asarray(0, jnp.int32))

    # ------------------------------------------------------------- acting
    def act(self, ts: PPOState, x, key, deterministic: bool = False):
        mean, log_std = self.actor.apply(ts.actor_params, x)
        if deterministic:
            return jnp.clip(mean, -1.0, 1.0)
        a = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        return jnp.clip(a, -1.0, 1.0)

    def act_logp_value(self, ts: PPOState, x, key):
        """Sample action + its log-prob + state value (rollout collection).

        The UNCLIPPED action is what the log-prob corresponds to; SB3 stores
        it in the buffer and clips only what is sent to the env."""
        mean, log_std = self.actor.apply(ts.actor_params, x)
        a = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        logp = gaussian_logp(mean, log_std, a)
        v = self.value.apply(ts.value_params, x)[..., 0]
        return a, logp, v

    def value_of(self, ts: PPOState, x):
        return self.value.apply(ts.value_params, x)[..., 0]

    # ------------------------------------------------------------- update
    def update(self, ts: PPOState, rollout: Dict, key) -> (Any, Dict):
        """n_epochs of shuffled minibatch clipped-surrogate updates.

        rollout: dict of flattened tensors x, action, logp, adv, ret with
        leading dim N = n_steps * n_envs.
        """
        N = rollout["x"].shape[0]
        nmb = max(N // self.batch_size, 1)
        adv = rollout["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        rollout = dict(rollout, adv=adv)

        def loss_fn(ap, vp, mb):
            mean, log_std = self.actor.apply(ap, mb["x"])
            logp = gaussian_logp(mean, log_std, mb["action"])
            ratio = jnp.exp(logp - mb["logp"])
            s1 = ratio * mb["adv"]
            s2 = jnp.clip(ratio, 1 - self.clip_range,
                          1 + self.clip_range) * mb["adv"]
            pg_loss = -jnp.mean(jnp.minimum(s1, s2))
            entropy = jnp.mean(jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e),
                                       axis=-1))
            v = self.value.apply(vp, mb["x"])[..., 0]
            v_loss = jnp.mean((mb["ret"] - v) ** 2)
            loss = pg_loss - self.ent_coef * entropy + self.vf_coef * v_loss
            return loss, dict(pg_loss=pg_loss, v_loss=v_loss, entropy=entropy)

        def minibatch_step(carry, idx):
            ap, vp, ao, vo = carry
            mb = {k: v[idx] for k, v in rollout.items()}
            (loss, aux), grads = jax.value_and_grad(
                lambda p: loss_fn(p[0], p[1], mb), has_aux=True)((ap, vp))
            ga, gv = grads
            ua, ao = self.tx.update(ga, ao, ap)
            ap = optax.apply_updates(ap, ua)
            uv, vo = self.tx.update(gv, vo, vp)
            vp = optax.apply_updates(vp, uv)
            return (ap, vp, ao, vo), aux

        def epoch_step(carry, k):
            perm = jax.random.permutation(k, N)[: nmb * self.batch_size]
            idxs = perm.reshape(nmb, self.batch_size)
            carry, auxs = jax.lax.scan(minibatch_step, carry, idxs)
            return carry, jax.tree_util.tree_map(jnp.mean, auxs)

        keys = jax.random.split(key, self.n_epochs)
        carry = (ts.actor_params, ts.value_params, ts.actor_opt, ts.value_opt)
        (ap, vp, ao, vo), auxs = jax.lax.scan(epoch_step, carry, keys)
        metrics = jax.tree_util.tree_map(jnp.mean, auxs)
        return ts.replace(actor_params=ap, value_params=vp, actor_opt=ao,
                          value_opt=vo, step=ts.step + 1), metrics


def gae(rewards, values, last_value, dones, gamma: float, lam: float):
    """GAE(lambda) over a (T, N) rollout; dones mask bootstrapping."""
    def scan_fn(carry, inp):
        adv_next, v_next = carry
        r, v, d = inp
        nonterm = 1.0 - d
        delta = r + gamma * v_next * nonterm - v
        adv = delta + gamma * lam * nonterm * adv_next
        return (adv, v), adv

    T = rewards.shape[0]
    (_, _), advs = jax.lax.scan(
        scan_fn, (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones), reverse=True)
    return advs, advs + values


def collect_rollout(core, learner: PPOLearner, ts: PPOState, states, obs,
                    key, n_steps: int, max_episode_steps: int = 50):
    """Auto-resetting continuing rollout of n_steps across the env batch.

    Returns (new states/obs/key, flattened rollout dict, stats)."""
    from panda_gym_tpu.rl.train import flat_x

    n_envs = states.q.shape[0]

    def step_fn(carry, _):
        states, obs, key = carry
        key, k_act, k_reset = jax.random.split(key, 3)
        x = flat_x(obs)
        a, logp, v = learner.act_logp_value(ts, x, k_act)
        nstates, nobs, reward, term, trunc, info = core.batched_step(
            states, jnp.clip(a, -1.0, 1.0))
        # gymnasium semantics: task terminations/truncations (success,
        # collision) are terminal for value targets; TIME-LIMIT cutoffs
        # bootstrap from the terminal observation (SB3 PPO
        # handle_timeout_termination).
        terminal = term | trunc
        timeout = (nstates.steps >= max_episode_steps) & ~terminal
        v_term = learner.value_of(ts, flat_x(nobs))
        raw_reward = reward
        reward = reward + learner.gamma * v_term * timeout.astype(jnp.float32)
        done = terminal | timeout
        # auto-reset finished envs (fresh PRNG streams)
        rkeys = jax.random.split(k_reset, n_envs)
        rstates, robs = jax.vmap(core.reset)(rkeys)
        sel = lambda o, n: jnp.where(
            done.reshape((-1,) + (1,) * (n.ndim - 1)), o, n)
        nstates = jax.tree_util.tree_map(sel, rstates, nstates)
        nobs = jax.tree_util.tree_map(sel, robs, nobs)
        out = dict(x=x, action=a, logp=logp, value=v, reward=reward,
                   raw_reward=raw_reward, done=done.astype(jnp.float32),
                   success=info["is_success"])
        return (nstates, nobs, key), out

    (states, obs, key), traj = jax.lax.scan(
        step_fn, (states, obs, key), None, length=n_steps)
    last_v = learner.value_of(ts, flat_x(obs))
    adv, ret = gae(traj["reward"], traj["value"], last_v, traj["done"],
                   learner.gamma, learner.gae_lambda)
    flat = lambda t: t.reshape((-1,) + t.shape[2:])
    rollout = dict(x=flat(traj["x"]), action=flat(traj["action"]),
                   logp=flat(traj["logp"]), adv=flat(adv), ret=flat(ret))
    stats = dict(mean_reward=jnp.mean(traj["raw_reward"]),
                 success_rate=jnp.mean(traj["success"].astype(jnp.float32)))
    return states, obs, key, rollout, stats


def train_ppo(core, hp=None, total_steps: int = 100_000, n_envs: int = 16,
              seed: int = 0, log_every: int = 1, logger=None,
              max_episode_steps: int = 50):
    """Minimal PPO training driver over a batched functional env."""
    from panda_gym_tpu.rl.config import Hyperparameters
    from panda_gym_tpu.rl.train import flat_x

    hp = hp or Hyperparameters("PPO")
    key = jax.random.PRNGKey(seed)
    key, k_init, k_reset = jax.random.split(key, 3)
    keys = jax.random.split(k_reset, n_envs)
    states, obs = jax.jit(jax.vmap(core.reset))(keys)
    x_dim = flat_x(obs).shape[-1]
    learner = PPOLearner(x_dim, core.robot.action_dim, hp)
    ts = learner.init(k_init)

    @jax.jit
    def iteration(ts, states, obs, key):
        states, obs, key, rollout, stats = collect_rollout(
            core, learner, ts, states, obs, key, learner.n_steps,
            max_episode_steps=max_episode_steps)
        key, k_upd = jax.random.split(key)
        ts, metrics = learner.update(ts, rollout, k_upd)
        return ts, states, obs, key, {**stats, **metrics}

    steps_per_iter = learner.n_steps * n_envs
    history = []
    for it in range(max(total_steps // steps_per_iter, 1)):
        ts, states, obs, key, m = iteration(ts, states, obs, key)
        m = {k: float(v) for k, v in m.items()}
        history.append(m)
        if logger is not None and it % log_every == 0:
            logger.log({"iter": it, "env_steps": (it + 1) * steps_per_iter, **m})
    return learner, ts, history
