"""Routed-generalist unit tests (eval/router.py).

The router is the round-5 mechanism for the scene-blind generalist
(VERDICT r4 #1b): masked bayesian fusion must reproduce
eval/ensemble.py::bayesian_fusion on the masked subset, and the
save/load round-trip must preserve the routed action bit-for-bit.
"""
import jax
import jax.numpy as jnp
import numpy as np

from panda_gym_tpu.eval import ensemble as fusion
from panda_gym_tpu.eval.router import (
    RoutedLearner, RoutedPolicy, RouterMLP, load_routed_policy,
    masked_bayesian_fusion, member_mean_std, routed_action,
    save_routed_policy, stack_members,
)
from panda_gym_tpu.rl.config import Hyperparameters
from panda_gym_tpu.rl.learners import make_learner

X_DIM, ACT_DIM, K = 12, 4, 3


def _pool(seed=0):
    hp = Hyperparameters("TQC")
    hp.use_sde = True
    hp.policy_kwargs = dict(hp.policy_kwargs or {})
    hp.policy_kwargs["net_arch"] = [32, 32]
    learner = make_learner("TQC", X_DIM, ACT_DIM, hp)
    keys = jax.random.split(jax.random.PRNGKey(seed), K)
    params = [learner.init(k).actor_params for k in keys]
    return learner, params


def test_masked_fusion_matches_bayesian_fusion():
    learner, params = _pool()
    x = jax.random.normal(jax.random.PRNGKey(1), (5, X_DIM))
    members = stack_members(params)
    means, stds = member_mean_std(learner.actor, members, x)

    # all-ones mask == full bayesian fusion
    full = masked_bayesian_fusion(means, stds, jnp.ones(K))
    ref = fusion.bayesian_fusion(means, stds ** 2)
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref), atol=1e-6)

    # subset mask == bayesian fusion of exactly that subset
    sub = masked_bayesian_fusion(means, stds, jnp.asarray([1.0, 0.0, 1.0]))
    sel = jnp.asarray([0, 2])
    ref_sub = fusion.bayesian_fusion(means[sel], stds[sel] ** 2)
    np.testing.assert_allclose(np.asarray(sub), np.asarray(ref_sub),
                               atol=1e-6)

    # single-member mask == that member's deterministic action
    solo = masked_bayesian_fusion(means, stds, jnp.asarray([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(solo), np.asarray(means[1]),
                               atol=1e-6)


def test_routed_action_follows_router_choice():
    learner, params = _pool()
    members = stack_members(params)
    n_ctrl = 2
    masks = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    router = RouterMLP(n_ctrl, (16,))
    rp = router.init(jax.random.PRNGKey(2), jnp.zeros((1, X_DIM)))
    policy = RoutedPolicy(members=members, masks=masks, router_params=rp)
    x = jax.random.normal(jax.random.PRNGKey(3), (7, X_DIM))
    act, choice = routed_action(learner.actor, router, policy, x,
                                return_choice=True)
    means, stds = member_mean_std(learner.actor, members, x)
    for b in range(7):
        want = means[0 if int(choice[b]) == 0 else 2, b]
        np.testing.assert_allclose(np.asarray(act[b]), np.asarray(want),
                                   atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    learner, params = _pool()
    members = stack_members(params)
    masks = jnp.asarray([[1.0, 1.0, 0.0], [0.0, 1.0, 1.0]])
    router = RouterMLP(2, (16,))
    rp = router.init(jax.random.PRNGKey(4), jnp.zeros((1, X_DIM)))
    policy = RoutedPolicy(members=members, masks=masks, router_params=rp)
    meta = {"members": ["a", "b", "c"], "x_dim": X_DIM}
    path = save_routed_policy(str(tmp_path / "pol"), policy, meta)
    loaded, meta2 = load_routed_policy(path)
    assert meta2["members"] == ["a", "b", "c"]

    x = jax.random.normal(jax.random.PRNGKey(5), (4, X_DIM))
    rl = RoutedLearner(learner, 2, (16,))
    a1 = rl.act(policy, x)
    a2 = rl.act(loaded, x)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=0)
    m, s = rl.act_with_std(loaded, x)
    assert m.shape == (4, ACT_DIM) and s.shape == (4, ACT_DIM)
