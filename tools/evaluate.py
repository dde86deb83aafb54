"""Evaluation entry point — CLI equivalent of the reference's
evaluation/evaluate.py (evaluate_ensemble, :319-403): load trained learner
checkpoints from a run dir, benchmark over the reference's scenario table,
optionally with ensemble action fusion, and persist the results table.

Examples:
    # benchmark the latest curriculum run
    python tools/evaluate.py training/run_data/curriculum_demo/tqc_curriculum_r1

    # ensemble of several runs with Bayesian fusion
    python tools/evaluate.py run1 run2 run3 --strategy bayesian_fusion

    # NEO analytical prior only (evaluate_neo.py equivalent)
    python tools/evaluate.py --strategy prior
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from panda_gym_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("runs", nargs="*", help="run dirs (ensemble if several)")
    p.add_argument("--scenarios", nargs="+", default=None,
                   help="default: the reference's 13-scenario benchmark list")
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--horizon", type=int, default=300)
    p.add_argument("--strategy", default=None,
                   choices=[None, "mean", "confidence", "weighted_aggregation",
                            "bayesian_fusion", "prior", "bcf"],
                   help="ensemble fusion / prior strategy (action_selection.py)")
    p.add_argument("--prior-sigma", type=float, default=0.3,
                   help="NEO-prior confidence for BCF fusion (smaller = "
                        "trust the prior more; fuse_controllers "
                        "evaluate.py:33-40)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="output path prefix (default <first run>/benchmark)")
    args = p.parse_args()

    # honor JAX_PLATFORMS even where a site hook (e.g. the axon TPU plugin)
    # overrides the env var: jax.config takes precedence at backend init
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import pickle

    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core
    from panda_gym_tpu.eval.benchmark import (
        BENCHMARK_SCENARIOS, display_and_save_benchmark_results,
        evaluate_scenarios)
    from panda_gym_tpu.rl.config import Hyperparameters, TrainConfig
    from panda_gym_tpu.rl.learners import make_learner
    from panda_gym_tpu.rl.logging_utils import load_run

    if not args.runs and args.strategy not in ("prior",):
        p.error("need at least one run dir (or --strategy prior)")

    from panda_gym_tpu.rl.policy_io import graft_actor, load_policy

    cfg = TrainConfig()
    ts_list = []   # TrainStates or ("npz", actor, meta) sentinels
    member_sde = []   # each member's ACTUAL actor type
    learner = None
    member_archs = []  # (run_dir, algorithm, net_arch) per ensemble member
    for run_dir in args.runs:
        cfg, ckpts = load_run(run_dir)
        if ckpts:
            with open(ckpts[-1], "rb") as f:
                payload = pickle.load(f)
            ts = payload["ts"] if isinstance(payload, dict) and "ts" in payload \
                else payload
            from panda_gym_tpu.rl.learners import ckpt_uses_sde
            member_sde.append(ckpt_uses_sde(ts))
        else:
            # actor-only exports (.gitignore keeps full ckpts out of git)
            npz = None
            for nm in ("best_model.policy.npz", "final_model.policy.npz"):
                c = os.path.join(run_dir, nm)
                if os.path.exists(c):
                    npz = c
                    break
            if npz is None:
                raise SystemExit(f"no checkpoints in {run_dir}")
            actor, meta = load_policy(npz)
            member_sde.append(bool(meta.get("use_sde", False)))
            ts = ("npz", actor, meta)
        ts_list.append(ts)
        hp = getattr(cfg, "hyperparams", None)
        arch = None
        if hp is not None:
            pk = getattr(hp, "policy_kwargs", None) or {}
            arch = tuple(pk.get("net_arch", ()) or ()) or None
        member_archs.append((run_dir, cfg.algorithm, arch))
    # one learner serves every member's params: all members must agree on
    # algorithm and net_arch, else param pytrees mismatch (or silently
    # mis-evaluate when shapes coincide)
    if len({(alg, arch) for _, alg, arch in member_archs}) > 1:
        detail = "\n".join(f"  {d}: algorithm={a} net_arch={n}"
                           for d, a, n in member_archs)
        raise SystemExit(
            "ensemble members disagree on algorithm/net_arch — one learner "
            f"cannot serve them all:\n{detail}")
    if not isinstance(getattr(cfg, "hyperparams", None), Hyperparameters):
        cfg.hyperparams = Hyperparameters(cfg.algorithm)
    # safety_distance is a TRAINING margin (clearance counted as collision);
    # benchmarks always score at true collision so margin-trained runs stay
    # comparable (reference evaluates with an env fresh from gym.make,
    # evaluate.py:361-379, not the training config)
    cfg.safety_distance = 0.0

    make_core = lambda sc: make_reach_ao_core(
        scenario=sc, config=cfg,
        ee_error_threshold=cfg.ee_error_thresholds[-1],
        speed_threshold=cfg.speed_thresholds[-1])

    if ts_list:
        # pre-gSDE checkpoints carry the legacy Gaussian actor even under
        # use_sde=True configs; align the learner to the members' ACTUAL
        # actor type (recorded per member above, regardless of whether a
        # member is a .ckpt or an actor-only .npz export) — and refuse
        # mixed-actor ensembles, which one learner cannot serve
        if len(set(member_sde)) > 1:
            detail = "\n".join(f"  {d}: use_sde={s}"
                               for (d, _, _), s in zip(member_archs,
                                                       member_sde))
            raise SystemExit(
                f"ensemble members mix gSDE and Gaussian actors:\n{detail}")
        cfg.hyperparams.use_sde = member_sde[0]
        probe = make_core("reachao1")
        import jax
        _, obs = jax.eval_shape(probe.reset, jax.random.PRNGKey(0))
        x_dim = (obs["observation"].shape[0]
                 + 2 * obs["achieved_goal"].shape[0])
        learner = make_learner(cfg.algorithm, x_dim, probe.robot.action_dim,
                               cfg.hyperparams)
        template = None
        for i, ts in enumerate(ts_list):
            if isinstance(ts, tuple) and ts and ts[0] == "npz":
                if template is None:
                    template = learner.init(jax.random.PRNGKey(0))
                ts_list[i] = graft_actor(template, ts[1])

    scenarios = args.scenarios or BENCHMARK_SCENARIOS
    results = evaluate_scenarios(
        learner, ts_list, make_core=make_core, scenarios=scenarios,
        n_episodes=args.episodes, horizon=args.horizon,
        strategy=args.strategy, prior_sigma=args.prior_sigma, seed=args.seed)
    out = args.out or os.path.join(
        args.runs[0] if args.runs else ".", "benchmark")
    display_and_save_benchmark_results(results, out)


if __name__ == "__main__":
    main()
