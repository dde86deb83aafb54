"""Distill per-scene expert controllers into ONE scene-blind network.

VERDICT r4 #1 mechanism (a): behavioral cloning from expert rollouts at
engine rate, then DAgger on the student's own state distribution.  The
teachers are the campaign's per-scene-best controllers (masked bayesian
fusions over the member pool, eval/router.py); the student is a single
SDEGaussianActor with the campaign architecture, so the result exports
as a standard .policy.npz and evaluates through every existing tool as
ONE network — the strongest form of the generalist claim (no router, no
ensemble at eval).

TPU shape: collection is the batched deterministic rollout the eval
harness uses (jit scan over horizon, N episodes in lockstep); BC/DAgger
training is dense MSE minibatch regression — both run at full MXU
utilization, which is why "hours" in the verdict is actually minutes
here.

Reference contrast: the reference has no distillation path at all; its
generalisation story is training one TQC policy on a scene curriculum
(README.md:1-14, training/utils/setup_training.py:233-307).  Cited for
the protocol only: the distilled student is benchmarked with the same
13-scene table (setup_training.py:334-381).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from panda_gym_tpu.eval.router import masked_bayesian_fusion, member_mean_std
from panda_gym_tpu.rl.train import flat_x


def collect_labeled(core, actor, members, mask, n_episodes: int,
                    horizon: int, key, student_params=None,
                    drive_noise: float = 0.0, student_actor=None):
    """Roll a policy on `core`; label every visited state with the
    TEACHER's (masked-fusion) action.

    student_params None  -> teacher drives (behavioral cloning round);
    student_params given -> the STUDENT drives and the teacher only
    labels (DAgger: corrections on the student's own distribution).

    drive_noise > 0 adds Gaussian action noise to the DRIVING action only
    (labels stay the noiseless teacher action) — DART-style injection
    (Laskey et al. 2017): the dataset covers a tube around the expert
    trajectories instead of their measure-zero spine, which is what plain
    BC from a deterministic teacher fatally lacks (round-5 measurement:
    noiseless BC student 0.16-0.77 per scene with 0.2-0.7 collision).

    Returns (X, A_teacher, active): (T, B, x_dim), (T, B, act_dim), (T, B).
    """

    def teacher(x):
        means, stds = member_mean_std(actor, members, x)
        return masked_bayesian_fusion(means, stds, mask)

    def student(x):
        # the student may have its own (wider) actor module
        mod = student_actor if student_actor is not None else actor
        out = mod.apply(student_params, x)     # arity static: SDE=3, legacy=2
        return jnp.tanh(out[0])

    def step_fn(carry, _):
        states, obs, done, k = carry
        x = flat_x(obs)
        a_t = teacher(x)
        a_drive = a_t if student_params is None else student(x)
        if drive_noise > 0.0:
            k, k_n = jax.random.split(k)
            a_drive = jnp.clip(
                a_drive + drive_noise * jax.random.normal(
                    k_n, a_drive.shape), -1.0, 1.0)
        nstates, nobs, _r, term, trunc, _info = core.batched_step(
            states, a_drive)
        keep = lambda old, new: jnp.where(
            done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new)
        states = jax.tree_util.tree_map(keep, states, nstates)
        obs = jax.tree_util.tree_map(keep, obs, nobs)
        out = (x, a_t, ~done)
        done = done | term | trunc
        return (states, obs, done, k), out

    key, k_loop = jax.random.split(key)
    keys = jax.random.split(key, n_episodes)
    states, obs0 = jax.vmap(core.reset)(keys)
    done0 = jnp.zeros(n_episodes, bool)
    _carry, (X, A, act) = jax.lax.scan(
        step_fn, (states, obs0, done0, k_loop), None, length=horizon)
    return X, A, act


def bc_train(actor, params, X: np.ndarray, A: np.ndarray, *,
             steps: int = 4000, batch_size: int = 4096, lr: float = 3e-4,
             seed: int = 0, weights: Optional[np.ndarray] = None,
             log: Callable = print) -> Tuple:
    """Minibatch MSE regression of tanh(student_mean(x)) onto teacher
    actions.  Returns (params, final_loss)."""
    tx = optax.adam(lr)
    opt = tx.init(params)
    rng = np.random.default_rng(seed)
    p = None
    if weights is not None:
        p = np.asarray(weights, np.float64)
        p = p / p.sum()

    @jax.jit
    def train_step(params, opt, xb, ab):
        def loss_fn(params):
            out = actor.apply(params, xb)      # SDE=3 outputs, legacy=2
            return jnp.mean((jnp.tanh(out[0]) - ab) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    t0 = time.time()
    loss = None
    for step in range(steps):
        idx = rng.choice(len(X), size=min(batch_size, len(X)), p=p)
        params, opt, loss = train_step(params, opt, jnp.asarray(X[idx]),
                                       jnp.asarray(A[idx]))
        # sync the loss scalar RARELY: each float() is a device->host
        # round-trip, and the TPU tunnel's D2H path intermittently wedges
        # for many minutes on exactly such tiny reads (round-5 stall
        # diagnosed at this line)
        if (step + 1) % 2000 == 0:
            log(f"bc step {step+1}: loss {float(loss):.5f} "
                f"({time.time()-t0:.0f}s)")
    return params, float(loss)


def init_student(learner, key):
    """Fresh student actor params with the campaign actor graph."""
    return learner.init(key).actor_params


def student_as_trainstate(learner, student_params, key=None):
    """Wrap the distilled actor in a full TrainState (fresh critics /
    optimizers) so it can seed RL fine-tuning through rl/train.py or be
    saved as a Trainer-compatible .ckpt."""
    ts = learner.init(key if key is not None else jax.random.PRNGKey(0))
    return ts.replace(actor_params=student_params)
