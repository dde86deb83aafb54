"""Benchmark a POOL of runs over the scenario table with shared compiles.

tools/evaluate.py compiles every scenario separately for every run
(N_runs x N_scenes scenario compiles; ~90 s each on the TPU tunnel, so a
13-run campaign pass costs hours).  This tool inverts the loop: runs are
grouped by (algorithm, net_arch, core-relevant config); per scenario ONE
core is built and ONE program compiled (checkpoint params are arguments,
eval/benchmark.py _RUN_CACHE), then every run's checkpoint executes through
it.  Output is identical to tools/evaluate.py: per-run benchmark.json/csv.

Usage:
    python tools/benchmark_pool.py RUN_DIR [RUN_DIR ...] \
        [--episodes 100] [--horizon 300] [--ckpt best_model.ckpt]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from panda_gym_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def main():
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)   # stack dump, not kill
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+", help="run dirs")
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--horizon", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt", default=None,
                   help="checkpoint filename inside each run dir (default: "
                        "best_model.ckpt, falling back to final_model.ckpt/"
                        "final.ckpt like tools/evaluate.py)")
    p.add_argument("--scenarios", nargs="+", default=None)
    args = p.parse_args()

    import jax

    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core
    from panda_gym_tpu.eval.benchmark import (
        BENCHMARK_SCENARIOS, display_and_save_benchmark_results,
        perform_benchmark)
    from panda_gym_tpu.rl.config import Hyperparameters
    from panda_gym_tpu.rl.learners import align_sde_with_ckpt, make_learner
    from panda_gym_tpu.rl.logging_utils import load_run

    scenarios = args.scenarios or BENCHMARK_SCENARIOS

    # ---- load every run: config + checkpoint -----------------------------
    # a member's ts is either a full TrainState (.ckpt pickle) or the
    # sentinel ("npz", actor_params, meta) for actor-only .policy.npz
    # exports (rl/policy_io.py) — grafted onto the group's template below
    from panda_gym_tpu.rl.policy_io import graft_actor, load_policy

    members = []   # (run_dir, cfg, ts)
    for run_dir in args.runs:
        cfg, ckpts = load_run(run_dir)
        path = None
        names = ([args.ckpt] if args.ckpt else
                 ["best_model.ckpt", "final_model.ckpt", "final.ckpt",
                  "best_model.policy.npz", "final_model.policy.npz"])
        for nm in names:
            c = os.path.join(run_dir, nm)
            if os.path.exists(c):
                path = c
                break
        if path is None and ckpts:
            path = ckpts[-1]
        if path is None:
            print(f"!! no checkpoint in {run_dir}, skipping")
            continue
        if path.endswith(".npz"):
            actor, meta = load_policy(path)
            cfg.hyperparams.use_sde = bool(meta.get("use_sde", False))
            ts = ("npz", actor, meta)
        else:
            with open(path, "rb") as f:
                payload = pickle.load(f)
            ts = payload["ts"] if isinstance(payload, dict) and "ts" in payload \
                else payload
            # per-run SDE alignment BEFORE grouping so group_key reflects
            # the checkpoint's actual actor type
            align_sde_with_ckpt(cfg.hyperparams, ts)
        members.append((run_dir, cfg, ts))
        print(f"loaded {run_dir} ({os.path.basename(path)})")

    # ---- group by everything that changes the compiled program -----------
    def group_key(cfg):
        hp = getattr(cfg, "hyperparams", None)
        pk = (getattr(hp, "policy_kwargs", {}) or {}) if hp else {}
        return json.dumps({
            "algorithm": cfg.algorithm,
            "net_arch": list(pk.get("net_arch", []) or []),
            # policy-graph-affecting hyperparams (ADVICE r3): a pooled run
            # differing in any of these must NOT share the compiled learner
            "use_sde": getattr(hp, "use_sde", None) if hp else None,
            "log_std_init": pk.get("log_std_init", None),
            "activation_fn": str(pk.get("activation_fn", None)),
            "n_quantiles": getattr(hp, "n_quantiles", None) if hp else None,
            "n_critics": getattr(hp, "n_critics", None) if hp else None,
            "control_type": cfg.control_type,
            "reward_type": cfg.reward_type,
            "goal_condition": cfg.goal_condition,
            "collision_reward": cfg.collision_reward,
            "task_observations": getattr(cfg, "task_observations", None),
        }, sort_keys=True, default=str)

    groups = {}
    for run_dir, cfg, ts in members:
        groups.setdefault(group_key(cfg), []).append((run_dir, cfg, ts))

    all_results = {}
    failed = []   # (run_dir, scenario) pairs that exhausted retries
    for gk, runs in groups.items():
        cfg = runs[0][1]
        cfg.safety_distance = 0.0   # benchmark at true collision
        if not isinstance(getattr(cfg, "hyperparams", None), Hyperparameters):
            cfg.hyperparams = Hyperparameters(cfg.algorithm)
        probe = make_reach_ao_core(
            scenario="reachao1", config=cfg,
            ee_error_threshold=cfg.ee_error_thresholds[-1],
            speed_threshold=cfg.speed_thresholds[-1])
        _, obs = jax.eval_shape(probe.reset, jax.random.PRNGKey(0))
        x_dim = obs["observation"].shape[0] + 2 * obs["achieved_goal"].shape[0]
        learner = make_learner(cfg.algorithm, x_dim, probe.robot.action_dim,
                               cfg.hyperparams)
        # materialize actor-only .policy.npz members onto a template state
        template = None
        materialized = []
        for run_dir, c, ts in runs:
            if isinstance(ts, tuple) and ts and ts[0] == "npz":
                if template is None:
                    template = learner.init(jax.random.PRNGKey(0))
                ts = graft_actor(template, ts[1])
            materialized.append((run_dir, c, ts))
        runs = materialized
        # guard against a silent wrong-policy-graph eval (ADVICE r3): every
        # checkpoint in the group must have the same pytree structure as the
        # one the shared learner was built from
        ref_struct = jax.tree_util.tree_structure(runs[0][2])
        for run_dir, _c, ts in runs[1:]:
            st = jax.tree_util.tree_structure(ts)
            if st != ref_struct:
                raise SystemExit(
                    f"checkpoint tree structure of {run_dir} does not match "
                    f"group leader {runs[0][0]} — configs grouped together "
                    f"but policy graphs differ; benchmark would be wrong")
        print(f"group {gk[:80]}...: {len(runs)} runs")
        for sc in scenarios:
            core = make_reach_ao_core(
                scenario=sc, config=cfg,
                ee_error_threshold=cfg.ee_error_thresholds[-1],
                speed_threshold=cfg.speed_thresholds[-1])
            for run_dir, _c, ts in runs:
                res = None
                for attempt in range(3):
                    try:
                        res = perform_benchmark(
                            learner, [ts], core, n_episodes=args.episodes,
                            horizon=args.horizon, seed=args.seed)
                        break
                    except jax.errors.JaxRuntimeError as e:
                        # the TPU tunnel's remote_compile intermittently
                        # truncates large responses; retry
                        print(f"  !! {sc}/{os.path.basename(run_dir)} "
                              f"attempt {attempt}: {e}", flush=True)
                if res is None:
                    # explicit failure marker (ADVICE r3): never let a
                    # dropped scenario masquerade as a complete campaign
                    all_results.setdefault(run_dir, {})[sc] = None
                    failed.append((run_dir, sc))
                    continue
                all_results.setdefault(run_dir, {})[sc] = res
                print(f"  {sc:>20s} {os.path.basename(run_dir):>24s} "
                      f"success={res['success_rate']:.2f} "
                      f"collision={res['collision_rate']:.2f}", flush=True)
            # incremental persistence: a crash keeps everything done so far
            for run_dir, results in all_results.items():
                with open(os.path.join(run_dir, "benchmark.json"), "w") as f:
                    json.dump(results, f, indent=1)

    for run_dir, results in all_results.items():
        display_and_save_benchmark_results(
            {sc: r for sc, r in results.items() if r is not None},
            os.path.join(run_dir, "benchmark"))

    if failed:
        print("\n!! FAILED (run, scenario) pairs after 3 retries:")
        for run_dir, sc in failed:
            print(f"  {run_dir}  {sc}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
