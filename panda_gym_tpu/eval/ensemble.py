"""Ensemble action-fusion strategies.

Re-implementation of evaluation/ensemble_utils/action_selection.py and the
prior-policy fusion helper (evaluate.py:33-40 fuse_controllers) in jnp so the
fusion runs on-device for batched ensembles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bayesian_fusion(agent_means, agent_variances, key=None):
    """Precision-weighted fusion + a sample from the fused Gaussian
    (action_selection.py:4-27)."""
    precisions = 1.0 / (agent_variances + 1e-8)
    fused_precision = jnp.sum(precisions, axis=0)
    fused_mean = jnp.sum(agent_means * precisions, axis=0) / fused_precision
    fused_var = 1.0 / fused_precision
    if key is None:
        return fused_mean
    return fused_mean + jnp.sqrt(fused_var) * jax.random.normal(
        key, fused_mean.shape)


def weighted_aggregation(agent_variances, agent_means):
    """Inverse-variance weighted average (action_selection.py:29-35)."""
    weights = 1.0 / (agent_variances + 1e-8)
    weights = weights / jnp.sum(weights, axis=0, keepdims=True)
    return jnp.sum(agent_means * weights, axis=0)


def mean(agent_means):
    """action_selection.py:38-39."""
    return jnp.mean(agent_means, axis=0)


def confidence(agent_means, agent_variances):
    """Pick the member with the lowest variance (action_selection.py:42-44).
    Variances are reduced over the action dim for the argmin."""
    total_var = jnp.sum(agent_variances, axis=-1)
    idx = jnp.argmin(total_var, axis=0)
    return jnp.take_along_axis(
        agent_means, idx[None, ..., None], axis=0)[0], idx


def fuse_controllers(prior_mu, prior_sigma, policy_mu, policy_sigma):
    """Multiplicative Gaussian fusion of a prior controller with the policy
    (evaluate.py:33-40, BCF-style)."""
    var_pi = jnp.square(policy_sigma)
    var_pr = jnp.square(prior_sigma)
    mu = (var_pi * prior_mu + var_pr * policy_mu) / (var_pi + var_pr)
    sigma = jnp.sqrt((var_pr * var_pi) / (var_pi + var_pr))
    return mu, sigma
