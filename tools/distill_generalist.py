"""Distill the routed generalist into ONE scene-blind network
(rl/distill.py, VERDICT r4 #1a).

Consumes the routed-policy artifact from tools/build_router.py (member
pool + per-scene controller masks), behavior-clones the per-scene
teachers into a single campaign-architecture actor, then runs DAgger
rounds on the student's own state distribution, benchmarking after each
round with the reference protocol (13 scenes x 100 episodes, horizon
300 — setup_training.py:334-381).  The best round's student is exported
as a standard .policy.npz — a single network, no router or ensemble at
eval.

Usage:
    python tools/distill_generalist.py \
        [--router training/run_data/round5_campaign/routed_gen/routed_policy.npz] \
        [--bc-episodes 64] [--dagger-rounds 3] [--dagger-episodes 32] \
        [--steps 4000] [--out training/run_data/round5_campaign/distilled_gen]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from panda_gym_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--router", default="training/run_data/round5_campaign/"
                                       "routed_gen/routed_policy.npz")
    p.add_argument("--out", default="training/run_data/round5_campaign/"
                                    "distilled_gen")
    p.add_argument("--bc-episodes", type=int, default=128)
    p.add_argument("--dagger-rounds", type=int, default=3)
    p.add_argument("--dagger-episodes", type=int, default=64)
    p.add_argument("--horizon", type=int, default=300)
    p.add_argument("--drive-noise", type=float, default=0.3,
                   help="DART-style Gaussian noise on the teacher's "
                        "DRIVING action during BC collection (labels stay "
                        "noiseless); 0 disables")
    p.add_argument("--steps", type=int, default=8000,
                   help="gradient steps per training round")
    p.add_argument("--net-arch", nargs="+", type=int, default=[512, 512],
                   help="student MLP widths — wider than the 256x256 "
                        "experts by default: one net absorbs 17")
    p.add_argument("--episodes", type=int, default=100,
                   help="benchmark episodes per scene")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)

    # honor JAX_PLATFORMS under the axon site hook (jax.config wins)
    if os.environ.get("JAX_PLATFORMS"):
        import jax as _jax
        _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax
    import numpy as np

    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core
    from panda_gym_tpu.eval.benchmark import (
        BENCHMARK_SCENARIOS, display_and_save_benchmark_results,
        perform_benchmark)
    from panda_gym_tpu.eval.router import load_routed_policy
    from panda_gym_tpu.rl.config import Hyperparameters
    from panda_gym_tpu.rl.distill import (
        bc_train, collect_labeled, init_student, student_as_trainstate)
    from panda_gym_tpu.rl.learners import make_learner
    from panda_gym_tpu.rl.logging_utils import load_run
    from panda_gym_tpu.rl.policy_io import _flatten
    import jax.numpy as jnp

    os.makedirs(args.out, exist_ok=True)
    policy, meta = load_routed_policy(args.router)
    scene_to_ctrl = meta["scene_to_controller"]
    ctrl_names = list(meta["controllers"].keys())
    print(f"router artifact: {len(meta['members'])} members, "
          f"{len(ctrl_names)} controllers")

    cfg, _ = load_run("training/run_data/round4_campaign/tqc_r4_gen")
    cfg.safety_distance = 0.0
    if not isinstance(getattr(cfg, "hyperparams", None), Hyperparameters):
        cfg.hyperparams = Hyperparameters(cfg.algorithm)
    # match the member pool's actor graph (campaign ckpts carry the legacy
    # squashed-Gaussian actor; build_router records which)
    cfg.hyperparams.use_sde = bool(meta.get("use_sde", False))
    # MEMBER learner keeps the pool arch; the STUDENT gets its own width
    student_hp = Hyperparameters(cfg.algorithm)
    student_hp.use_sde = cfg.hyperparams.use_sde
    student_hp.policy_kwargs = dict(student_hp.policy_kwargs,
                                    net_arch=list(args.net_arch))

    cores = {}

    def make_core(sc):
        if sc not in cores:
            cores[sc] = make_reach_ao_core(
                scenario=sc, config=cfg,
                ee_error_threshold=cfg.ee_error_thresholds[-1],
                speed_threshold=cfg.speed_thresholds[-1])
        return cores[sc]

    probe = make_core("reachao1")
    _, obs = jax.eval_shape(probe.reset, jax.random.PRNGKey(0))
    x_dim = obs["observation"].shape[0] + 2 * obs["achieved_goal"].shape[0]
    learner = make_learner(cfg.algorithm, x_dim, probe.robot.action_dim,
                           cfg.hyperparams)
    student_learner = make_learner(cfg.algorithm, x_dim,
                                   probe.robot.action_dim, student_hp)
    actor = learner.actor
    student_actor = student_learner.actor
    members, masks = policy.members, policy.masks

    collect_j = jax.jit(
        lambda core_id, mask, key, student: collect_labeled(
            cores[core_id], actor, members, mask,
            args.bc_episodes, args.horizon, key,
            student_params=student, drive_noise=args.drive_noise,
            student_actor=student_actor),
        static_argnums=(0,))

    # DAgger collection has its own episode count -> separate jit
    collect_dagger_j = jax.jit(
        lambda core_id, mask, key, student: collect_labeled(
            cores[core_id], actor, members, mask,
            args.dagger_episodes, args.horizon, key,
            student_params=student, student_actor=student_actor),
        static_argnums=(0,))

    key = jax.random.PRNGKey(args.seed)

    data_dir = os.path.join(args.out, "data")
    os.makedirs(data_dir, exist_ok=True)

    def gather(student_params, episodes_jit, tag):
        """One labeled pass over all scenes; returns per-scene (X, A).

        Parts persist to <out>/data/<tag>_<scene>.npz and are reloaded on
        resume; transient tunnel failures (remote_compile truncations)
        retry 3x instead of killing the whole pipeline."""
        nonlocal key
        data = {}
        for sc in scene_to_ctrl:
            key, k = jax.random.split(key)
            part = os.path.join(data_dir, f"{tag}_{sc}.npz")
            if os.path.exists(part):
                with np.load(part) as z:
                    data[sc] = (z["X"], z["A"])
                print(f"  collect[{tag}] {sc:>20s}: {len(data[sc][0]):7d} "
                      f"labeled (resumed)", flush=True)
                continue
            make_core(sc)   # materialize before the static-arg jit lookup
            mask = masks[ctrl_names.index(scene_to_ctrl[sc])]
            t0 = time.time()
            X = None
            for attempt in range(3):
                try:
                    X, A, act = episodes_jit(sc, mask, k, student_params)
                    break
                except jax.errors.JaxRuntimeError as e:
                    print(f"  !! collect[{tag}] {sc} attempt {attempt}: "
                          f"{e}", flush=True)
            if X is None:
                print(f"  !! collect[{tag}] {sc}: FAILED, skipping scene",
                      flush=True)
                continue
            m = np.asarray(act).reshape(-1)
            X = np.asarray(X).reshape(-1, x_dim)[m]
            A = np.asarray(A).reshape(-1, A.shape[-1])[m]
            np.savez_compressed(part, X=X.astype(np.float32),
                                A=A.astype(np.float32))
            data[sc] = (X, A)
            print(f"  collect[{tag}] {sc:>20s}: {len(X):7d} labeled "
                  f"({time.time()-t0:.1f}s)", flush=True)
        return data

    def flatten_balanced(rounds):
        """Concat rounds of per-scene data with per-sample weights that
        balance scenes (early-terminating scenes yield fewer steps)."""
        Xs, As, scene_ids = [], [], []
        for data in rounds:
            for i, sc in enumerate(scene_to_ctrl):
                if sc in data:
                    X, A = data[sc]
                    Xs.append(X)
                    As.append(A)
                    scene_ids.append(np.full(len(X), i))
        X = np.concatenate(Xs)
        A = np.concatenate(As)
        sid = np.concatenate(scene_ids)
        counts = np.bincount(sid, minlength=len(scene_to_ctrl))
        w = 1.0 / np.maximum(counts, 1)[sid]
        return X, A, w

    def benchmark(student_params, tag):
        ts = student_as_trainstate(student_learner, student_params)
        results = {}
        cache = os.path.join(data_dir, f"bench_{tag}.json")
        if os.path.exists(cache):
            with open(cache) as f:
                results = json.load(f)
        for sc in BENCHMARK_SCENARIOS:
            if sc in results:
                continue
            res = None
            for attempt in range(3):
                try:
                    res = perform_benchmark(
                        student_learner, [ts], make_core(sc),
                        n_episodes=args.episodes, horizon=300,
                        seed=args.seed)
                    break
                except jax.errors.JaxRuntimeError as e:
                    print(f"  !! bench[{tag}] {sc} attempt {attempt}: {e}",
                          flush=True)
            if res is None:
                print(f"  !! bench[{tag}] {sc}: FAILED after retries",
                      flush=True)
                continue
            results[sc] = res
            with open(cache, "w") as f:
                json.dump(results, f, indent=1)
            print(f"  bench[{tag}] {sc:>20s} "
                  f"success={res['success_rate']:.2f} "
                  f"collision={res['collision_rate']:.2f}", flush=True)
        mean = float(np.mean([r["success_rate"] for r in results.values()]))
        print(json.dumps({f"distilled_mean_{tag}": round(mean, 4),
                          "scenes": len(results)}), flush=True)
        return results, mean

    from panda_gym_tpu.rl.policy_io import _flatten as _pflat, \
        _unflatten as _punflat

    def save_student(params, tag):
        arrays = {k: np.asarray(v) for k, v in _pflat(params).items()}
        np.savez_compressed(os.path.join(data_dir, f"student_{tag}.npz"),
                            **arrays)

    def load_student(tag):
        p = os.path.join(data_dir, f"student_{tag}.npz")
        if not os.path.exists(p):
            return None
        with np.load(p) as z:
            return _punflat({k: z[k] for k in z.files})

    # ---- round 0: behavioral cloning from teacher rollouts ---------------
    rounds = [gather(None, collect_j, "bc")]
    student = load_student("bc")
    if student is None:
        key, k_init = jax.random.split(key)
        student = init_student(student_learner, k_init)
        X, A, w = flatten_balanced(rounds)
        print(f"BC dataset: {len(X)} samples")
        student, loss = bc_train(student_actor, student, X, A,
                                 steps=args.steps, seed=args.seed,
                                 weights=w)
        save_student(student, "bc")
    else:
        print("resumed student_bc", flush=True)
    results, mean = benchmark(student, "bc")
    best = (mean, student, results, "bc")

    # ---- DAgger rounds ---------------------------------------------------
    for r in range(args.dagger_rounds):
        tag = f"dagger{r+1}"
        rounds.append(gather(student, collect_dagger_j, tag))
        resumed = load_student(tag)
        if resumed is None:
            X, A, w = flatten_balanced(rounds)
            print(f"DAgger round {r+1} dataset: {len(X)} samples")
            student, loss = bc_train(student_actor, student, X, A,
                                     steps=args.steps,
                                     seed=args.seed + r + 1, weights=w)
            save_student(student, tag)
        else:
            student = resumed
            print(f"resumed student_{tag}", flush=True)
        results, mean = benchmark(student, tag)
        if mean > best[0]:
            best = (mean, student, results, tag)

    # ---- persist the best student ----------------------------------------
    mean, student, results, tag = best
    ts = student_as_trainstate(student_learner, student)
    ckpt = os.path.join(args.out, "best_model.ckpt")
    with open(ckpt, "wb") as f:
        pickle.dump({"ts": jax.device_get(ts), "timesteps": 0,
                     "algorithm": cfg.algorithm}, f)
    # actor-only durable export (policy_io format)
    from panda_gym_tpu.rl.policy_io import export_policy
    export_policy(ckpt, os.path.join(args.out, "best_model.policy"),
                  config=cfg)
    with open(os.path.join(args.out, "benchmark.json"), "w") as f:
        json.dump(results, f, indent=1)
    display_and_save_benchmark_results(
        results, os.path.join(args.out, "benchmark"))
    with open(os.path.join(args.out, "config.json"), "w") as f:
        cfg_dict = {k: v for k, v in vars(cfg).items()
                    if not k.startswith("_") and k != "hyperparams"}
        cfg_dict["hyperparams"] = vars(cfg.hyperparams)
        json.dump(cfg_dict, f, indent=1, default=str)
    with open(os.path.join(args.out, "distill_meta.json"), "w") as f:
        json.dump({"best_round": tag, "mean_success": mean,
                   "router_artifact": args.router,
                   "bc_episodes": args.bc_episodes,
                   "dagger_rounds": args.dagger_rounds,
                   "dagger_episodes": args.dagger_episodes}, f, indent=1)
    print(json.dumps({"distilled_generalist_mean": round(mean, 4),
                      "best_round": tag}))


if __name__ == "__main__":
    main()
