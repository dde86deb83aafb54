"""Flax policy/critic networks for the off-policy learners.

Replaces the SB3 torch policies the reference trains
(MultiInputPolicy with net_arch=[256,256], hyperparameters.py:20;
TQC quantile critics from sb3_contrib).  Dict observations are flattened by
concatenating observation/achieved_goal/desired_goal, matching SB3's
MultiInputPolicy CombinedExtractor.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

LOG_STD_MIN = -20.0
LOG_STD_MAX = 2.0


def flatten_obs(obs: dict) -> jnp.ndarray:
    """Concat dict obs in SB3 CombinedExtractor key order (sorted)."""
    return jnp.concatenate(
        [obs[k] for k in ("achieved_goal", "desired_goal", "observation")],
        axis=-1)


class MLP(nn.Module):
    hidden: Sequence[int]
    out_dim: int

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)


class SquashedGaussianActor(nn.Module):
    """tanh-Normal actor (SAC/TQC policy head)."""

    action_dim: int
    hidden: Sequence[int] = (256, 256)
    log_std_init: float = -3.0

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        mean = nn.Dense(self.action_dim)(x)
        log_std = nn.Dense(
            self.action_dim,
            bias_init=nn.initializers.constant(self.log_std_init))(x)
        log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
        return mean, log_std


def sample_squashed(mean, log_std, key):
    """Sample tanh-squashed action + log prob."""
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape)
    pre = mean + std * eps
    a = jnp.tanh(pre)
    logp = -0.5 * (eps ** 2 + 2 * log_std + jnp.log(2 * jnp.pi))
    logp = jnp.sum(logp, axis=-1)
    # tanh correction
    logp -= jnp.sum(2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)),
                    axis=-1)
    return a, logp


def deterministic_action(mean):
    return jnp.tanh(mean)


class SDEGaussianActor(nn.Module):
    """tanh-squashed actor with generalized State-Dependent Exploration.

    SB3 gSDE semantics (StateDependentNoiseDistribution, used by every
    reference SAC/TQC preset: use_sde=True, log_std_init=-3,
    hyperparameters.py:19-27): exploration noise is weight-space —
    a matrix W ~ N(0, 1)^(latent_dim, action_dim) is drawn once per
    episode/rollout and the pre-tanh action is

        pre = mean(s) + latent(s) @ (W * exp(log_std))

    so noise is a smooth deterministic function of the state within an
    episode.  log_std is a (latent_dim, action_dim) parameter (full_std);
    the marginal std used for log-probs is analytic:
    sqrt(latent^2 @ exp(log_std)^2).
    """

    action_dim: int
    hidden: Sequence[int] = (256, 256)
    log_std_init: float = -3.0

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        latent = x
        mean = nn.Dense(self.action_dim)(latent)
        log_std = self.param(
            "log_std_sde", nn.initializers.constant(self.log_std_init),
            (self.hidden[-1], self.action_dim))
        # SDE log_std bounds are tighter than plain SAC's (SB3 uses -20..2
        # for the squashed Gaussian but the SDE sigma multiplies latent
        # activations; clip keeps exp() finite under optimization)
        return mean, latent, jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)


def sde_std(latent, log_std):
    """Analytic marginal std of latent @ (W * exp(log_std)), W ~ N(0,1):
    element-wise sqrt(latent^2 @ sigma^2).  (B, L) x (L, A) -> (B, A)."""
    return jnp.sqrt(jnp.square(latent) @ jnp.exp(2.0 * log_std) + 1e-6)


def sample_sde_squashed(mean, latent, log_std, key):
    """Sample a tanh-squashed gSDE action + log prob with ONE shared
    exploration matrix for the whole batch (SB3 resamples the matrix per
    gradient step via actor.reset_noise(), sac.py train loop)."""
    W = jax.random.normal(key, log_std.shape)                 # (L, A)
    noise = latent @ (W * jnp.exp(log_std))                   # (B, A)
    pre = mean + noise
    std = sde_std(latent, log_std)
    logp = jnp.sum(
        -0.5 * ((pre - mean) / std) ** 2 - jnp.log(std)
        - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
    logp -= jnp.sum(2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)),
                    axis=-1)
    return jnp.tanh(pre), logp


def sde_action_from_expl(mean, latent, log_std, expl):
    """Per-env episode-persistent gSDE action: expl is (B, L, A) standard
    normal drawn once per episode (sde_sample_freq=-1 -> per-rollout,
    SB3 off_policy_algorithm.collect_rollouts reset_noise)."""
    noise = jnp.einsum("bl,bla->ba", latent, expl * jnp.exp(log_std)[None])
    return jnp.tanh(mean + noise)


class DeterministicActor(nn.Module):
    """tanh deterministic actor (TD3/DDPG)."""

    action_dim: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return jnp.tanh(nn.Dense(self.action_dim)(x))


class QCritic(nn.Module):
    """Ensemble of n_critics Q(s,a) heads; out_dim=1 (SAC) or n_quantiles
    (TQC).  Ensemble via nn.vmap over parameter axis."""

    hidden: Sequence[int] = (256, 256)
    out_dim: int = 1
    n_critics: int = 2

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        vmapped = nn.vmap(
            MLP,
            in_axes=None, out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            axis_size=self.n_critics,
        )
        return vmapped(hidden=self.hidden, out_dim=self.out_dim)(x)
        # shape: (n_critics, batch, out_dim)


class GaussianPolicy(nn.Module):
    """Unsquashed diagonal-Gaussian policy with a state-independent log-std
    parameter (SB3 PPO MlpPolicy semantics; hyperparameters.py:56-70
    log_std_init=-2)."""

    action_dim: int
    hidden: Sequence[int] = (256, 256)
    log_std_init: float = -2.0

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        mean = nn.Dense(self.action_dim)(x)
        log_std = self.param(
            "log_std", nn.initializers.constant(self.log_std_init),
            (self.action_dim,))
        return mean, jnp.broadcast_to(log_std, mean.shape)


def gaussian_logp(mean, log_std, a):
    z = (a - mean) / jnp.exp(log_std)
    return jnp.sum(-0.5 * z ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi),
                   axis=-1)
