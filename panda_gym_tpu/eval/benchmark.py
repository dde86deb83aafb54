"""Evaluation harness: batched policy benchmarking over scenarios.

Replaces evaluation/evaluate.py's perform_benchmark / evaluate_ensemble
(evaluate.py:88-317, 319-403): N-episode evaluation collecting success /
collision / timeout rates, episode lengths, effort, jerk, manipulability and
EE-speed statistics — but vectorized: all episodes of a scenario run as one
jit-compiled batch on device instead of a tqdm loop of single env steps.

Ensembles: a list of TrainStates for the same learner; per-step member
actions are fused with the strategies of eval/ensemble.py
(evaluate.py:174-211 dispatch), optionally fused with the NEO prior
(strategy="bcf", fuse_controllers evaluate.py:33-40) or replaced by it
(strategy="prior").
"""
from __future__ import annotations

import json
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from panda_gym_tpu.eval import ensemble as fusion
from panda_gym_tpu.ops import kinematics as K
from panda_gym_tpu.rl.train import flat_x


def _member_actions(learner, ts_list, x, key, deterministic=True):
    means, stds = [], []
    for ts in ts_list:
        if hasattr(learner, "act_with_std"):
            m, s = learner.act_with_std(ts, x)
        else:
            m = learner.act(ts, x, key, deterministic=True)
            s = jnp.full_like(m, 1e-3)
        means.append(m)
        stds.append(s)
    return jnp.stack(means), jnp.stack(stds)


# compiled-run cache: checkpoints enter the compiled program as ARGUMENTS,
# so benchmarking N same-architecture checkpoints over one scenario core
# compiles once and executes N times (a 13-run x 13-scene campaign pass
# drops from 169 scenario compiles to 13; see tools/benchmark_pool.py)
_RUN_CACHE: Dict = {}


def _build_run(
    learner,
    core,
    n_episodes: int,
    horizon: int,
    strategy: Optional[str],
    prior_sigma: float,
    n_members: int,
):
    model = core.model
    ee_site = core.robot.ee_site
    n_arm = 7
    use_prior = strategy in ("prior", "bcf")

    def prior_action(state, fk):
        from panda_gym_tpu.ops.neo import compute_action_neo
        # raw NEO joint velocities, like evaluate.py:160/192 — the env's own
        # action limiter normalizes them direction-preservingly
        # (panda.py:129-133); per-joint clipping here would distort direction
        return compute_action_neo(model, ee_site, state, fk, state.goal)

    def policy(states, obs, key, ts_list):
        x = flat_x(obs)
        if ts_list:
            means, stds = _member_actions(learner, list(ts_list), x, key)
        elif strategy != "prior":
            raise ValueError("no learner checkpoints; only strategy='prior' "
                             "works without models (evaluate_neo.py:18-92)")
        if strategy in (None, "", "mean"):
            act = fusion.mean(means)
        elif strategy == "weighted_aggregation":
            act = fusion.weighted_aggregation(stds ** 2, means)
        elif strategy == "bayesian_fusion":
            act = fusion.bayesian_fusion(means, stds ** 2)
        elif strategy == "confidence":
            act, _ = fusion.confidence(means, stds ** 2)
        elif strategy in ("prior", "bcf"):
            fks = jax.vmap(lambda s: K.fk_world(model, s.q, s.qd))(states)
            pr = jax.vmap(prior_action)(states, fks)
            if strategy == "prior":
                act = pr
            else:
                mu, sigma = fusion.fuse_controllers(
                    pr, prior_sigma, fusion.mean(means),
                    jnp.mean(stds, axis=0))
                act = mu
        else:
            raise ValueError(f"unknown strategy {strategy}")
        return act

    def step_fn(carry, _, ts_list):
        states, obs, done, ep_len, key = carry
        key, k_act = jax.random.split(key)
        action = policy(states, obs, k_act, ts_list)
        nstates, nobs, reward, term, trunc, info = core.batched_step(
            states, action)
        keep = lambda old, new: jnp.where(
            done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new)
        states = jax.tree_util.tree_map(keep, states, nstates)
        obs = jax.tree_util.tree_map(keep, obs, nobs)
        ep_len = ep_len + (~done).astype(jnp.int32)

        fks = jax.vmap(lambda s: K.fk_world(model, s.q, s.qd))(states)
        ee_speed = jax.vmap(
            lambda s, f: jnp.linalg.norm(core.robot.ee_velocity(f)))(states, fks)
        manip = jax.vmap(lambda s: K.manipulability(model, ee_site, s.q))(states)
        effort = jax.vmap(lambda s: jnp.linalg.norm(s.cur_jacc))(states)
        jerk = jax.vmap(lambda s: jnp.linalg.norm(s.cur_jerk))(states)
        active = (~done).astype(jnp.float32)
        metrics = dict(
            effort=effort * active, jerk=jerk * active,
            manip=manip * active, ee_speed=ee_speed * active,
            reward=jnp.where(done, 0.0, reward),
            success=info["is_success"] & ~done,
            collided=info["is_truncated"] & ~done,
            active=active)
        done = done | term | trunc
        return (states, obs, done, ep_len, key), metrics

    @jax.jit
    def run(key, ts_list):
        # independent fold for resets: split(key, 2)[:2] equals the first
        # entries of split(key, n), so carrying `key` into the action scan
        # while also using split(key, n) for resets would replay reset keys
        # as action-noise keys
        reset_key = jax.random.fold_in(key, 1)
        keys = jax.random.split(reset_key, n_episodes)
        states, obs = jax.vmap(core.reset)(keys)
        done0 = jnp.zeros(n_episodes, bool)
        len0 = jnp.zeros(n_episodes, jnp.int32)
        (states, obs, done, ep_len, _), m = jax.lax.scan(
            lambda c, x: step_fn(c, x, ts_list),
            (states, obs, done0, len0, key), None, length=horizon)
        return done, ep_len, m

    return run


def perform_benchmark(
    learner,
    ts_list: Sequence,
    core,
    n_episodes: int = 100,
    horizon: int = 300,
    strategy: Optional[str] = None,
    prior_sigma: float = 0.3,
    seed: int = 0,
) -> Dict[str, float]:
    """Batched evaluation; returns the reference's results schema
    (evaluate.py:286-300).  Checkpoint params are inputs to a cached
    compiled program: same (core, learner, shapes) -> no recompile."""
    ck = (id(core), id(learner), n_episodes, horizon, strategy,
          prior_sigma, len(ts_list))
    ent = _RUN_CACHE.get(ck)
    if ent is None or ent[0] is not core or ent[1] is not learner:
        # bounded LRU (ADVICE r3): entries pin the core AND its compiled
        # executable for process lifetime; evict least-recently-used beyond
        # 16 so a long campaign over many (core, config) pairs cannot grow
        # unboundedly.  Replacing a stale entry for the same key does not
        # evict an unrelated one.  The strong refs held here also keep the
        # id() keys unambiguous.
        _RUN_CACHE.pop(ck, None)
        while len(_RUN_CACHE) >= 16:
            _RUN_CACHE.pop(next(iter(_RUN_CACHE)))
        _RUN_CACHE[ck] = (core, learner,
                          _build_run(learner, core, n_episodes, horizon,
                                     strategy, prior_sigma, len(ts_list)))
    else:
        # refresh recency on hit (dict preserves insertion order)
        _RUN_CACHE[ck] = _RUN_CACHE.pop(ck)
    run = _RUN_CACHE[ck][2]
    done, ep_len, m = run(jax.random.PRNGKey(seed), list(ts_list))
    m = jax.device_get(m)
    done = np.asarray(done)
    ep_len = np.asarray(ep_len)

    success_ep = np.asarray(m["success"]).any(axis=0)
    collided_ep = np.asarray(m["collided"]).any(axis=0) & ~success_ep
    timeout_ep = ~success_ep & ~collided_ep
    steps_total = np.asarray(m["active"]).sum()

    def per_step_mean(x):
        return float(np.sum(x) / max(steps_total, 1))

    results = {
        "scenario_episodes": int(n_episodes),
        "success_rate": float(success_ep.mean()),
        "collision_rate": float(collided_ep.mean()),
        "timeout_rate": float(timeout_ep.mean()),
        "mean_ep_length": float(ep_len.mean()),
        "mean_num_sim_steps": float(ep_len.mean() * core.n_substeps),
        "mean_effort": per_step_mean(m["effort"]),
        "mean_jerk": per_step_mean(m["jerk"]),
        "mean_manipulability": per_step_mean(m["manip"]),
        "mean_ee_speed": per_step_mean(m["ee_speed"]),
        "mean_reward": float(np.asarray(m["reward"]).sum() / n_episodes),
    }
    return results


def evaluate_scenarios(learner, ts_list, make_core: Callable[[str], object],
                       scenarios: Sequence[str], n_episodes: int = 100,
                       horizon: int = 300, strategy: Optional[str] = None,
                       prior_sigma: float = 0.3,
                       seed: int = 0) -> Dict[str, Dict[str, float]]:
    """Benchmark over the reference's scenario table
    (setup_training.py:334-381 benchmark_model / evaluate.py:361-379)."""
    out = {}
    for sc in scenarios:
        core = make_core(sc)
        out[sc] = perform_benchmark(learner, ts_list, core,
                                    n_episodes=n_episodes, horizon=horizon,
                                    strategy=strategy,
                                    prior_sigma=prior_sigma, seed=seed)
    return out


def display_and_save_benchmark_results(results: Dict[str, Dict], path: str):
    """Tabulate + persist (evaluate.py:386-403; CSV/JSON instead of xlsx)."""
    import pandas as pd

    df = pd.DataFrame(results).T
    print(df.to_string())
    df.to_csv(path + ".csv")
    with open(path + ".json", "w") as f:
        json.dump(results, f, indent=1)
    return df


BENCHMARK_SCENARIOS = [
    # benchmark_model's exact scenario list (setup_training.py:337-350)
    "reachao1", "reachao2", "reachao3", "wangexp-3", "reachao_rand",
    "reachao_rand_start", "library1", "library2", "narrow_tunnel",
    "tunnel", "workshop", "industrial", "wall",
]
