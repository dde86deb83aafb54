"""Off-policy learners: SAC, TQC, TD3, DDPG in Flax/Optax.

Replaces the torch/SB3 algorithm zoo the reference dispatches over
(setup_training.py:100-115: DDPG/TD3/SAC + sb3_contrib TQC) with pure-JAX
update steps that jit/pmap cleanly.  TQC follows Kuznetsov et al. 2020
(truncated quantile critics): per-critic quantile heads, pooled-sorted
targets with the top-k quantiles per net dropped.

All learners share one interface:
    learner = make_learner(algo, obs_dim, act_dim, hp)
    ts      = learner.init(key)
    action  = learner.act(ts, x, key, deterministic)
    ts, metrics = learner.update(ts, batch, key)
where x = concat([achieved_goal, desired_goal, observation], -1).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from panda_gym_tpu.rl.networks import (
    DeterministicActor, QCritic, SDEGaussianActor, SquashedGaussianActor,
    deterministic_action, sample_sde_squashed, sample_squashed,
    sde_action_from_expl, sde_std,
)


@struct.dataclass
class TrainState:
    actor_params: Any
    critic_params: Any
    target_critic_params: Any
    actor_opt: Any
    critic_opt: Any
    log_alpha: jnp.ndarray
    alpha_opt: Any
    step: jnp.ndarray


class _Base:
    def __init__(self, obs_dim: int, act_dim: int, hp):
        self.obs_dim = obs_dim
        self.act_dim = act_dim
        self.hp = hp
        self.gamma = getattr(hp, "gamma", 0.98)
        self.tau = getattr(hp, "tau", 0.02)
        lr = getattr(hp, "learning_rate", 3e-4)
        self.actor_tx = optax.adam(lr)
        self.critic_tx = optax.adam(lr)
        self.alpha_tx = optax.adam(lr)
        self.net_arch = tuple(getattr(hp, "policy_kwargs", {}).get("net_arch", [256, 256]))
        # gSDE (use_sde=True, every reference SAC/TQC preset,
        # hyperparameters.py:19-27): log_std_init=-3 parameterizes the
        # weight-space noise matrix, usable as-is with the SDE actor.
        self.use_sde = bool(getattr(hp, "use_sde", False))
        self.log_std_init = getattr(hp, "policy_kwargs", {}).get(
            "log_std_init", -3.0 if self.use_sde else -1.0)
        self.target_entropy = -float(act_dim)

    def soft_update(self, params, target):
        return optax.incremental_update(params, target, self.tau)


class SACLearner(_Base):
    """Soft actor-critic with automatic entropy tuning (ent_coef='auto',
    hyperparameters.py:18)."""

    N_QUANTILES = 0  # scalar critics

    def __init__(self, obs_dim, act_dim, hp):
        super().__init__(obs_dim, act_dim, hp)
        if self.use_sde:
            self.actor = SDEGaussianActor(act_dim, self.net_arch,
                                          self.log_std_init)
        else:
            self.actor = SquashedGaussianActor(act_dim, self.net_arch,
                                               self.log_std_init)
        self.n_critics = getattr(hp, "n_critics", 2)
        out_dim = max(getattr(self, "N_QUANTILES", 0), 1)
        self.critic = QCritic(self.net_arch, out_dim, self.n_critics)

    # one sampling helper both actor types share: (action, logp), reparam.
    def _actor_sample(self, actor_params, x, key):
        if self.use_sde:
            mean, latent, log_std = self.actor.apply(actor_params, x)
            return sample_sde_squashed(mean, latent, log_std, key)
        mean, log_std = self.actor.apply(actor_params, x)
        return sample_squashed(mean, log_std, key)

    def init(self, key) -> TrainState:
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((1, self.obs_dim))
        a = jnp.zeros((1, self.act_dim))
        actor_params = self.actor.init(k1, x)
        critic_params = self.critic.init(k2, x, a)
        return TrainState(
            actor_params=actor_params, critic_params=critic_params,
            target_critic_params=critic_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            log_alpha=jnp.zeros(()),
            alpha_opt=self.alpha_tx.init(jnp.zeros(())),
            step=jnp.asarray(0, jnp.int32))

    # ------------------------------------------------------------- acting
    def act(self, ts: TrainState, x, key, deterministic: bool = False,
            expl=None):
        """expl: optional per-env episode-persistent gSDE exploration
        matrices (B, latent_dim, act_dim) from sample_expl(); None falls
        back to a per-call shared noise draw."""
        if self.use_sde:
            mean, latent, log_std = self.actor.apply(ts.actor_params, x)
            if deterministic:
                return deterministic_action(mean)
            if expl is not None:
                return sde_action_from_expl(mean, latent, log_std, expl)
            a, _ = sample_sde_squashed(mean, latent, log_std, key)
            return a
        mean, log_std = self.actor.apply(ts.actor_params, x)
        if deterministic:
            return deterministic_action(mean)
        a, _ = sample_squashed(mean, log_std, key)
        return a

    def sample_expl(self, ts: TrainState, key, n: int):
        """Per-episode gSDE exploration matrices (sde_sample_freq=-1:
        resampled once per rollout, SB3 collect_rollouts reset_noise);
        None for non-SDE actors."""
        if not self.use_sde:
            return None
        return jax.random.normal(key, (n, self.net_arch[-1], self.act_dim))

    def act_with_std(self, ts: TrainState, x):
        if self.use_sde:
            mean, latent, log_std = self.actor.apply(ts.actor_params, x)
            return deterministic_action(mean), sde_std(latent, log_std)
        mean, log_std = self.actor.apply(ts.actor_params, x)
        return deterministic_action(mean), jnp.exp(log_std)

    # ------------------------------------------------------------- target
    def _target_q(self, ts, x2, key, alpha):
        a2, logp2 = self._actor_sample(ts.actor_params, x2, key)
        q2 = self.critic.apply(ts.target_critic_params, x2, a2)  # (C,B,1)
        q2 = jnp.min(q2[..., 0], axis=0)                          # (B,)
        return q2 - alpha * logp2

    def _critic_loss(self, critic_params, ts, batch, target):
        q = self.critic.apply(critic_params, batch["x"], batch["action"])
        q = q[..., 0]                                             # (C,B)
        return jnp.mean((q - target[None, :]) ** 2), {}

    # ------------------------------------------------------------- update
    def update(self, ts: TrainState, batch: Dict, key):
        k_t, k_a = jax.random.split(key)
        alpha = jnp.exp(ts.log_alpha)

        tq = self._target_q(ts, batch["x2"], k_t, alpha)
        target = batch["reward"] + self.gamma * (1.0 - batch["terminated"]) * tq
        target = jax.lax.stop_gradient(target)

        (closs, _), cgrad = jax.value_and_grad(self._critic_loss, has_aux=True)(
            ts.critic_params, ts, batch, target)
        cup, copt = self.critic_tx.update(cgrad, ts.critic_opt, ts.critic_params)
        critic_params = optax.apply_updates(ts.critic_params, cup)

        def actor_loss(actor_params):
            a, logp = self._actor_sample(actor_params, batch["x"], k_a)
            q = self.critic.apply(critic_params, batch["x"], a)[..., 0]
            q = jnp.min(q, axis=0)
            return jnp.mean(alpha * logp - q), logp

        (aloss, logp), agrad = jax.value_and_grad(actor_loss, has_aux=True)(
            ts.actor_params)
        aup, aopt = self.actor_tx.update(agrad, ts.actor_opt, ts.actor_params)
        actor_params = optax.apply_updates(ts.actor_params, aup)

        def alpha_loss(log_alpha):
            return -jnp.mean(log_alpha * jax.lax.stop_gradient(
                logp + self.target_entropy))

        lloss, lgrad = jax.value_and_grad(alpha_loss)(ts.log_alpha)
        lup, lopt = self.alpha_tx.update(lgrad, ts.alpha_opt, ts.log_alpha)
        log_alpha = optax.apply_updates(ts.log_alpha, lup)

        new_ts = ts.replace(
            actor_params=actor_params, critic_params=critic_params,
            target_critic_params=self.soft_update(critic_params,
                                                  ts.target_critic_params),
            actor_opt=aopt, critic_opt=copt,
            log_alpha=log_alpha, alpha_opt=lopt, step=ts.step + 1)
        metrics = dict(critic_loss=closs, actor_loss=aloss, alpha=alpha,
                       q_target_mean=jnp.mean(target))
        return new_ts, metrics


class TQCLearner(SACLearner):
    """Truncated Quantile Critics (sb3_contrib TQC equivalent) — the
    reference's primary algorithm (train_config.py:13)."""

    def __init__(self, obs_dim, act_dim, hp):
        self.N_QUANTILES = getattr(hp, "n_quantiles", 25)
        super().__init__(obs_dim, act_dim, hp)
        self.top_drop = getattr(hp, "top_quantiles_to_drop_per_net", 2)

    def _target_q(self, ts, x2, key, alpha):
        a2, logp2 = self._actor_sample(ts.actor_params, x2, key)
        z2 = self.critic.apply(ts.target_critic_params, x2, a2)  # (C,B,Q)
        C, B, Q = z2.shape
        pooled = jnp.swapaxes(z2, 0, 1).reshape(B, C * Q)
        pooled = jnp.sort(pooled, axis=-1)
        keep = C * Q - self.top_drop * C
        z_trunc = pooled[:, :keep]                               # (B, keep)
        return z_trunc - alpha * logp2[:, None]                  # (B, keep)

    def _critic_loss(self, critic_params, ts, batch, target):
        # target: (B, keep) quantile samples; prediction: (C, B, Q)
        z = self.critic.apply(critic_params, batch["x"], batch["action"])
        C, B, Q = z.shape
        taus = (jnp.arange(Q, dtype=jnp.float32) + 0.5) / Q      # midpoints
        # pairwise TD errors: (C, B, Q, keep)
        delta = target[None, :, None, :] - z[..., None]
        abs_d = jnp.abs(delta)
        huber = jnp.where(abs_d <= 1.0, 0.5 * delta ** 2, abs_d - 0.5)
        weight = jnp.abs(taus[None, None, :, None] - (delta < 0.0))
        return jnp.mean(weight * huber), {}

    def update(self, ts: TrainState, batch: Dict, key):
        # same flow as SAC but the target is a quantile vector; override the
        # bellman broadcast: r + gamma (1-d) z
        k_t, k_a = jax.random.split(key)
        alpha = jnp.exp(ts.log_alpha)
        z_next = self._target_q(ts, batch["x2"], k_t, alpha)     # (B, keep)
        target = batch["reward"][:, None] + self.gamma * \
            (1.0 - batch["terminated"][:, None]) * z_next
        target = jax.lax.stop_gradient(target)

        (closs, _), cgrad = jax.value_and_grad(self._critic_loss, has_aux=True)(
            ts.critic_params, ts, batch, target)
        cup, copt = self.critic_tx.update(cgrad, ts.critic_opt, ts.critic_params)
        critic_params = optax.apply_updates(ts.critic_params, cup)

        def actor_loss(actor_params):
            a, logp = self._actor_sample(actor_params, batch["x"], k_a)
            z = self.critic.apply(critic_params, batch["x"], a)  # (C,B,Q)
            q = jnp.mean(z, axis=(0, 2))
            return jnp.mean(alpha * logp - q), logp

        (aloss, logp), agrad = jax.value_and_grad(actor_loss, has_aux=True)(
            ts.actor_params)
        aup, aopt = self.actor_tx.update(agrad, ts.actor_opt, ts.actor_params)
        actor_params = optax.apply_updates(ts.actor_params, aup)

        def alpha_loss(log_alpha):
            return -jnp.mean(log_alpha * jax.lax.stop_gradient(
                logp + self.target_entropy))

        lloss, lgrad = jax.value_and_grad(alpha_loss)(ts.log_alpha)
        lup, lopt = self.alpha_tx.update(lgrad, ts.alpha_opt, ts.log_alpha)
        log_alpha = optax.apply_updates(ts.log_alpha, lup)

        new_ts = ts.replace(
            actor_params=actor_params, critic_params=critic_params,
            target_critic_params=self.soft_update(critic_params,
                                                  ts.target_critic_params),
            actor_opt=aopt, critic_opt=copt,
            log_alpha=log_alpha, alpha_opt=lopt, step=ts.step + 1)
        return new_ts, dict(critic_loss=closs, actor_loss=aloss, alpha=alpha,
                            q_target_mean=jnp.mean(target))


class TD3Learner(_Base):
    """Twin-delayed DDPG (policy smoothing + delayed actor)."""

    policy_noise = 0.2
    noise_clip = 0.5
    policy_delay = 2

    def __init__(self, obs_dim, act_dim, hp):
        super().__init__(obs_dim, act_dim, hp)
        self.actor = DeterministicActor(act_dim, self.net_arch)
        self.n_critics = 2
        self.critic = QCritic(self.net_arch, 1, self.n_critics)
        self.tau = getattr(hp, "tau", 0.005)

    def init(self, key) -> TrainState:
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((1, self.obs_dim))
        a = jnp.zeros((1, self.act_dim))
        actor_params = self.actor.init(k1, x)
        critic_params = self.critic.init(k2, x, a)
        return TrainState(
            actor_params=actor_params, critic_params=critic_params,
            target_critic_params=critic_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            log_alpha=jnp.zeros(()), alpha_opt=self.alpha_tx.init(jnp.zeros(())),
            step=jnp.asarray(0, jnp.int32))

    def act(self, ts, x, key, deterministic: bool = False):
        a = self.actor.apply(ts.actor_params, x)
        if not deterministic:
            noise = getattr(self.hp, "noise_std", 0.1)
            a = jnp.clip(a + noise * jax.random.normal(key, a.shape), -1, 1)
        return a

    def update(self, ts: TrainState, batch: Dict, key):
        k_n = key
        a2 = self.actor.apply(ts.actor_params, batch["x2"])
        noise = jnp.clip(self.policy_noise * jax.random.normal(k_n, a2.shape),
                         -self.noise_clip, self.noise_clip)
        a2 = jnp.clip(a2 + noise, -1, 1)
        q2 = self.critic.apply(ts.target_critic_params, batch["x2"], a2)[..., 0]
        q2 = jnp.min(q2, axis=0)
        target = jax.lax.stop_gradient(
            batch["reward"] + self.gamma * (1 - batch["terminated"]) * q2)

        def critic_loss(cp):
            q = self.critic.apply(cp, batch["x"], batch["action"])[..., 0]
            return jnp.mean((q - target[None]) ** 2)

        closs, cgrad = jax.value_and_grad(critic_loss)(ts.critic_params)
        cup, copt = self.critic_tx.update(cgrad, ts.critic_opt, ts.critic_params)
        critic_params = optax.apply_updates(ts.critic_params, cup)

        def actor_loss(ap):
            a = self.actor.apply(ap, batch["x"])
            q = self.critic.apply(critic_params, batch["x"], a)[0, :, 0]
            return -jnp.mean(q)

        do_actor = (ts.step % self.policy_delay) == 0
        aloss, agrad = jax.value_and_grad(actor_loss)(ts.actor_params)
        agrad = jax.tree_util.tree_map(
            lambda g: jnp.where(do_actor, g, jnp.zeros_like(g)), agrad)
        aup, aopt = self.actor_tx.update(agrad, ts.actor_opt, ts.actor_params)
        actor_params = optax.apply_updates(ts.actor_params, aup)

        new_ts = ts.replace(
            actor_params=actor_params, critic_params=critic_params,
            target_critic_params=self.soft_update(critic_params,
                                                  ts.target_critic_params),
            actor_opt=aopt, critic_opt=copt, step=ts.step + 1)
        return new_ts, dict(critic_loss=closs, actor_loss=aloss,
                            q_target_mean=jnp.mean(target))


class DDPGLearner(TD3Learner):
    policy_noise = 0.0
    noise_clip = 0.0
    policy_delay = 1

    def __init__(self, obs_dim, act_dim, hp):
        super().__init__(obs_dim, act_dim, hp)
        self.n_critics = 1
        self.critic = QCritic(self.net_arch, 1, 1)


def ckpt_uses_sde(ts) -> bool:
    """Whether a TrainState's actor was built with the gSDE actor.

    Checkpoints from before the true-gSDE implementation carry the legacy
    squashed-Gaussian actor even when their config says use_sde=True (the old
    remap); callers rebuilding a learner around a loaded TrainState should
    align hp.use_sde with this so parameter trees match."""
    try:
        params = ts.actor_params.get("params", {})
    except AttributeError:
        return False
    return "log_std_sde" in params


def align_sde_with_ckpt(hp, ts) -> None:
    """Mutate hp.use_sde in place to match the checkpoint's actor type."""
    has = ckpt_uses_sde(ts)
    if bool(getattr(hp, "use_sde", False)) != has:
        hp.use_sde = has


def make_learner(algorithm: str, obs_dim: int, act_dim: int, hp):
    """Algorithm dispatch (setup_training.py:100-115; + PPO, which the
    reference ships a preset for, hyperparameters.py:55-70, but never wires
    into its dispatch)."""
    if algorithm == "PPO":
        # on-policy: consumed by rl/ppo.py::train_ppo's rollout dict, NOT by
        # the off-policy Trainer/HER pipeline (which the reference also
        # never wires PPO into, setup_training.py:100-115) — Trainer
        # rejects it in _ensure_learner rather than feeding it replay
        # batches it cannot consume
        from panda_gym_tpu.rl.ppo import PPOLearner
        return PPOLearner(obs_dim, act_dim, hp)
    algos = {"SAC": SACLearner, "TQC": TQCLearner, "TQC_v2": TQCLearner,
             "TD3": TD3Learner, "DDPG": DDPGLearner}
    if algorithm not in algos:
        raise Exception("Algorithm not found!")  # setup_training.py:112-113
    return algos[algorithm](obs_dim, act_dim, hp)
