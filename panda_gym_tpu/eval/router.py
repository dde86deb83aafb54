"""Scene-blind routed generalist: route, don't average.

Round-4 diagnosis (ROUND4_NOTES.md "Final state"): Bayesian fusion
AVERAGES complementary specialists — measured ceiling ~0.79 across four
ensembles — while per-scene specialist controllers reach 0.90–1.00.  The
missing mechanism is ROUTING (VERDICT r4 #1b): infer which specialist
fits the current scene from the observation ALONE, and let only that
specialist act.

A routed policy is three arrays:

  * member pool  — K actor parameter sets stacked on a leading axis (all
    members share one actor graph: the campaign's TQC [256,256] gSDE
    actor, rl/networks.py::SDEGaussianActor);
  * controller table — C binary masks over the pool.  A controller is the
    precision-weighted (bayesian) fusion of its masked members — exactly
    eval/ensemble.py::bayesian_fusion restricted to a subset, so each
    controller reproduces one of the campaign's per-scene ens_* fusions;
  * router — a small MLP x -> C logits, trained supervised on labeled
    rollouts of each controller on its home scene (tools/build_router.py).

At eval the router runs per step from the flat observation x only; the
scene id never enters the compiled graph — scene-blind by construction
(the claim rule of VERDICT r4 #1: inferring scene from obs is fair,
reading the scene id is not).  The winning controller's masked fusion
acts.  `RoutedLearner` adapts this to the act/act_with_std interface so
eval/benchmark.py::perform_benchmark drives a routed policy unchanged.

Reference contrast: the reference's evaluation fuses ensembles with
global strategies only (evaluation/ensemble_utils/action_selection.py)
and benchmarks per-scene experts separately
(training/utils/setup_training.py:334-381); it has no router.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from panda_gym_tpu.rl.networks import sde_std


class RouterMLP(nn.Module):
    """Obs -> controller logits."""

    n_controllers: int
    hidden: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.n_controllers)(x)


class RoutedPolicy(NamedTuple):
    """The complete routed generalist as a single pytree (jit-traversable).

    members: stacked actor params, leading axis K.
    masks:   (C, K) float32 controller membership.
    router_params: RouterMLP params.
    """

    members: Any
    masks: jnp.ndarray
    router_params: Any


def stack_members(actor_params_list: List[Any]):
    """Stack K same-structure actor param trees along a new leading axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *actor_params_list)


def member_mean_std(actor, members, x):
    """(K, B, A) deterministic means and marginal stds of every member.

    actor: the shared actor module (weights come from `members`) — either
    the legacy SquashedGaussianActor (2 outputs: mean, log_std; what every
    campaign checkpoint through round 4 carries) or SDEGaussianActor
    (3 outputs: mean, latent, log_std).  The arity is static at trace
    time, so both branch-free compile.
    """

    def one(params):
        out = actor.apply(params, x)
        if len(out) == 3:            # gSDE actor
            mean, latent, log_std = out
            return jnp.tanh(mean), sde_std(latent, log_std)
        mean, log_std = out          # squashed-Gaussian actor
        return jnp.tanh(mean), jnp.exp(log_std)

    return jax.vmap(one)(members)


def masked_bayesian_fusion(means, stds, mask):
    """Precision-weighted fusion over the masked member subset.

    means/stds: (K, B, A); mask: (B, K) or (K,) in {0,1}.  With an
    all-ones mask this IS eval/ensemble.py::bayesian_fusion (deterministic
    branch); a subset mask reproduces the campaign's per-scene ens_*
    fusions inside one compiled graph.
    """
    if mask.ndim == 1:
        w = mask[:, None, None]
    else:
        w = jnp.swapaxes(mask, 0, 1)[:, :, None]          # (K, B, 1)
    prec = w / (stds ** 2 + 1e-8)
    total = jnp.sum(prec, axis=0)
    return jnp.sum(means * prec, axis=0) / jnp.maximum(total, 1e-12)


def routed_action(actor, router: RouterMLP, policy: RoutedPolicy, x,
                  return_choice: bool = False):
    """Scene-blind routed action for a batch of flat observations x.

    Per-step hard routing: argmax of the router logits selects the
    controller mask; the masked bayesian fusion of the pool acts.
    """
    means, stds = member_mean_std(actor, policy.members, x)
    logits = router.apply(policy.router_params, x)          # (B, C)
    choice = jnp.argmax(logits, axis=-1)                    # (B,)
    mask = policy.masks[choice]                             # (B, K)
    act = masked_bayesian_fusion(means, stds, mask)
    if return_choice:
        return act, choice
    return act


class RoutedLearner:
    """Adapter: drive a RoutedPolicy through the learner interface.

    perform_benchmark(learner, [ts], core) calls learner.act_with_std(ts,
    x); with learner=RoutedLearner(base) and ts=RoutedPolicy the routed
    action flows through the standard benchmark harness unchanged
    (strategy None/"mean" over the single pseudo-member).
    """

    def __init__(self, base_learner, n_controllers: int,
                 hidden: Sequence[int] = (128, 128)):
        self.actor = base_learner.actor
        self.router = RouterMLP(n_controllers, tuple(hidden))

    def act(self, ts: RoutedPolicy, x, key=None, deterministic=True,
            expl=None):
        return routed_action(self.actor, self.router, ts, x)

    def act_with_std(self, ts: RoutedPolicy, x):
        act = routed_action(self.actor, self.router, ts, x)
        # routed action is deterministic; tiny std keeps downstream
        # fusion formulas well-conditioned (matches benchmark._member_actions
        # fallback convention)
        return act, jnp.full_like(act, 1e-3)


# --------------------------------------------------------------------------
# persistence: one .router.npz artifact (durable across rounds, ~K * 0.4 MB)
# --------------------------------------------------------------------------


def save_routed_policy(path: str, policy: RoutedPolicy, meta: Dict) -> str:
    from panda_gym_tpu.rl.policy_io import _flatten
    if not path.endswith(".npz"):
        path += ".npz"
    arrays = {}
    for k, v in _flatten(policy.members).items():
        arrays[f"members/{k}"] = np.asarray(v)
    for k, v in _flatten(policy.router_params).items():
        arrays[f"router/{k}"] = np.asarray(v)
    arrays["masks"] = np.asarray(policy.masks)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)
    return path


def load_routed_policy(path: str):
    """Returns (RoutedPolicy, meta).

    Leaves stay HOST-side numpy deliberately: consumers either pass the
    policy as a jit argument (device_put at dispatch) or close over it —
    and a closed-over numpy constant folds into the lowering for free,
    while a device-array constant forces a device->host read during MLIR
    lowering, which on the TPU tunnel can wedge for minutes (round-5
    faulthandler diagnosis: _array_mlir_constant_handler blocked on
    _value for the 5 MB member stack)."""
    from panda_gym_tpu.rl.policy_io import _unflatten
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        members = _unflatten(
            {k[len("members/"):]: z[k] for k in z.files
             if k.startswith("members/")})
        router = _unflatten(
            {k[len("router/"):]: z[k] for k in z.files
             if k.startswith("router/")})
        masks = z["masks"]
    policy = RoutedPolicy(members=members, masks=np.asarray(masks),
                          router_params=router)
    return policy, meta
