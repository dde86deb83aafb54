"""Build + evaluate the scene-blind ROUTED generalist (VERDICT r4 #1b).

Round-4 measured that bayesian fusion of generalists ceilings at ~0.79
(it averages complementary policies) while per-scene controllers reach
0.90-1.00.  This tool builds the router that closes the gap:

 1. load the campaign's per-scene-best members (one shared TQC [256,256]
    gSDE actor graph) and stack them into a member pool;
 2. for each scene, roll the scene's controller (masked bayesian fusion
    == the campaign's ens_* recipes) on its home scene and collect the
    flat observations it visits, labeled with the controller index;
 3. train eval/router.py::RouterMLP to classify obs -> controller
    (the scene id is a training LABEL only — at eval the compiled graph
    sees nothing but x: scene-blind by construction);
 4. save the whole routed policy as one durable artifact
    (routed_policy.npz) and benchmark it over the reference's 13-scene
    table with the standard protocol (eval/benchmark.py, 100 episodes,
    horizon 300, seed 0 — setup_training.py:334-381).

Usage:
    python tools/build_router.py [--collect-episodes 64] [--steps 3000]
        [--out training/run_data/round5_campaign/routed_gen]
        [--benchmark] [--episodes 100]
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

R2 = "training/run_data/round2_campaign"
R3 = "training/run_data/round3_campaign"
R4 = "training/run_data/round4_campaign"

# scene -> member run dirs.  These reproduce the round-4 claim table's
# per-scene best controllers (training/run_data/round4_campaign/summary.md;
# ens recipes from tools/campaign_round4_final.sh): a controller is the
# bayesian fusion of its members, single-member controllers degenerate to
# that member's deterministic policy.
CONTROLLERS = {
    "reachao1": [f"{R4}/tqc_r4_gen"],
    "reachao2": [f"{R4}/tqc_r4_ao2_s1", f"{R4}/tqc_r4_rr_s1",
                 f"{R2}/tqc_ft21_reachao2"],
    "reachao3": [f"{R4}/tqc_r4_w3_s2", f"{R4}/tqc_r4_rr_s1",
                 f"{R3}/tqc_r3_wang3"],
    "wangexp-3": [f"{R4}/tqc_r4_w3_s2", f"{R4}/tqc_r4_rr_s1",
                  f"{R3}/tqc_r3_wang3"],
    "reachao_rand": [f"{R4}/tqc_r4_rr_s1", f"{R4}/tqc_r4_w3_s2",
                     f"{R3}/tqc_r3_wang3"],
    "reachao_rand_start": [f"{R4}/tqc_r4_rs_s3", f"{R4}/tqc_r4_rs_s1",
                           f"{R4}/tqc_r4_rs_s2", f"{R2}/tqc_ft21_rand_start"],
    "library1": [f"{R4}/tqc_r4_gen"],
    "library2": [f"{R2}/tqc_ft21_library2"],
    "narrow_tunnel": [f"{R4}/tqc_r4_gen", f"{R2}/tqc_gen_w_s2",
                      f"{R2}/tqc_gen_w_s3", f"{R2}/tqc_gen_w"],
    "tunnel": [f"{R2}/tqc_gen_w"],
    "workshop": [f"{R4}/tqc_r4_ws_s1"],
    "industrial": [f"{R2}/tqc_gen_w", f"{R2}/tqc_gen_w_s1",
                   f"{R2}/tqc_gen_w_s2", f"{R2}/tqc_gen_w_s3"],
    "wall": [f"{R4}/tqc_r4_wall_s1"],
}


def load_actor_params(run_dir: str):
    """best_model actor params from .policy.npz (preferred) or .ckpt.

    Returns (actor_params, uses_sde).  The campaign checkpoints through
    round 4 all carry the LEGACY squashed-Gaussian actor even under
    use_sde=True configs (the pre-gSDE remap — rl/learners.py
    align_sde_with_ckpt); the pool just needs every member to agree.
    """
    from panda_gym_tpu.rl.policy_io import load_policy
    npz = os.path.join(run_dir, "best_model.policy.npz")
    if os.path.exists(npz):
        actor, meta = load_policy(npz)
        return actor, bool(meta.get("use_sde", False))
    ckpt = os.path.join(run_dir, "best_model.ckpt")
    with open(ckpt, "rb") as f:
        payload = pickle.load(f)
    ts = payload["ts"] if isinstance(payload, dict) and "ts" in payload \
        else payload
    from panda_gym_tpu.rl.learners import ckpt_uses_sde
    return ts.actor_params, ckpt_uses_sde(ts)


def main():
    # `kill -USR1 <pid>` dumps thread stacks without killing the run —
    # tunnel hangs are diagnosable (docs/guide/performance.md)
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)

    # honor JAX_PLATFORMS even where a site hook (e.g. the axon TPU
    # plugin) overrides the env var: jax.config takes precedence at
    # backend init (same pattern as tools/train.py)
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    p = argparse.ArgumentParser()
    p.add_argument("--collect-episodes", type=int, default=64)
    p.add_argument("--collect-horizon", type=int, default=300)
    p.add_argument("--steps", type=int, default=3000,
                   help="router training steps")
    p.add_argument("--out", default="training/run_data/round5_campaign/"
                                    "routed_gen")
    p.add_argument("--collect-only", action="store_true",
                   help="collect labeled obs for --scenarios (default all) "
                        "into <out>/data/collect_<scene>.npz and exit — "
                        "run several in parallel to shard the per-scene "
                        "compiles over processes")
    p.add_argument("--train-from-data", action="store_true",
                   help="skip collection; train the router from the "
                        "<out>/data parts written by --collect-only")
    p.add_argument("--benchmark", action="store_true")
    p.add_argument("--benchmark-only", action="store_true",
                   help="skip collection/training; load the existing "
                        "routed_policy.npz from --out and benchmark it "
                        "(e.g. train on the fast-compiling CPU backend, "
                        "then claim numbers on the real chip)")
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scenarios", nargs="+", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core
    from panda_gym_tpu.eval.benchmark import BENCHMARK_SCENARIOS
    from panda_gym_tpu.eval.router import (
        RoutedLearner, RoutedPolicy, RouterMLP, load_routed_policy,
        masked_bayesian_fusion, member_mean_std, save_routed_policy,
        stack_members,
    )
    from panda_gym_tpu.rl.config import Hyperparameters
    from panda_gym_tpu.rl.learners import make_learner
    from panda_gym_tpu.rl.logging_utils import load_run

    os.makedirs(args.out, exist_ok=True)
    artifact = os.path.join(args.out, "routed_policy.npz")

    # ---- member pool ------------------------------------------------------
    member_dirs: list = []
    for sc, runs in CONTROLLERS.items():
        for r in runs:
            if r not in member_dirs:
                member_dirs.append(r)
    # controller classes: unique member-mask tuples (reachao3/wangexp-3
    # collapse into one class)
    ctrl_masks, ctrl_names, scene_to_ctrl = [], [], {}
    for sc, runs in CONTROLLERS.items():
        mask = tuple(1.0 if d in runs else 0.0 for d in member_dirs)
        if mask not in ctrl_masks:
            ctrl_masks.append(mask)
            ctrl_names.append(sc)
        scene_to_ctrl[sc] = ctrl_masks.index(mask)
    n_ctrl = len(ctrl_masks)
    masks = jnp.asarray(ctrl_masks, jnp.float32)
    print(f"pool: {len(member_dirs)} members, {n_ctrl} controllers")

    # one shared learner graph (all members are TQC [256,256] gSDE)
    if args.benchmark_only:
        _policy, _meta = load_routed_policy(artifact)
        pool_sde = bool(_meta.get("use_sde", False))
        loaded = None
    else:
        loaded = [load_actor_params(d) for d in member_dirs]
        sde_flags = {d: s for d, (_a, s) in zip(member_dirs, loaded)}
        if len(set(sde_flags.values())) != 1:
            raise SystemExit(f"pool mixes actor types: {sde_flags}")
        pool_sde = next(iter(sde_flags.values()))

    cfg, _ = load_run(f"{R4}/tqc_r4_gen")
    cfg.safety_distance = 0.0
    if not isinstance(getattr(cfg, "hyperparams", None), Hyperparameters):
        cfg.hyperparams = Hyperparameters(cfg.algorithm)
    cfg.hyperparams.use_sde = pool_sde

    cores = {}

    def make_core(sc):
        # stable core identity per scene: one build, one compile
        # (benchmark._RUN_CACHE keys on id(core))
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
    if not args.benchmark_only:
        members = stack_members([a for a, _s in loaded])
    actor = learner.actor

    if not args.benchmark_only:
        # ---- 2. collect labeled obs ------------------------------------------
        def collect(sc, mask, key):
            """Roll the masked controller on scene `sc`; return (X, active).
            `sc` is a STATIC jit arg (string) — the core it names is a Python
            object looked up from `cores`, one trace per scene."""
            core = cores[sc]

            def step_fn(carry, _):
                states, obs, done = carry
                from panda_gym_tpu.rl.train import flat_x
                x = flat_x(obs)
                means, stds = member_mean_std(actor, members, x)
                action = masked_bayesian_fusion(means, stds, mask)
                nstates, nobs, _r, term, trunc, _info = core.batched_step(
                    states, action)
                keep = lambda old, new: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new)
                states = jax.tree_util.tree_map(keep, states, nstates)
                obs = jax.tree_util.tree_map(keep, obs, nobs)
                out = (x, ~done)
                done = done | term | trunc
                return (states, obs, done), out

            keys = jax.random.split(key, args.collect_episodes)
            states, obs0 = jax.vmap(core.reset)(keys)
            done0 = jnp.zeros(args.collect_episodes, bool)
            (_s, _o, _d), (X, act) = jax.lax.scan(
                step_fn, (states, obs0, done0), None,
                length=args.collect_horizon)
            return X, act

        collect_j = jax.jit(collect, static_argnums=(0,))

        data_dir = os.path.join(args.out, "data")
        os.makedirs(data_dir, exist_ok=True)
        if args.train_from_data:
            # parts written by parallel --collect-only workers
            Xs, ys = [], []
            for sc in CONTROLLERS:
                part = os.path.join(data_dir, f"collect_{sc}.npz")
                if not os.path.exists(part):
                    raise SystemExit(f"missing {part} (collect it first)")
                with np.load(part) as z:
                    Xs.append(z["X"])
                    ys.append(z["y"])
                print(f"loaded {part}: {len(Xs[-1])} obs", flush=True)
        else:
            # per-scene collection — shardable across processes: each
            # --collect-only invocation handles its --scenarios subset and
            # writes one part per scene (scene PRNG folded from the scene
            # name, so sharding does not change the data)
            Xs, ys = [], []
            scenes = args.scenarios or list(CONTROLLERS)
            import zlib
            for sc in scenes:
                # crc32, not hash(): str hash is salted per process, which
                # would make sharded collection non-deterministic
                k = jax.random.fold_in(
                    jax.random.PRNGKey(args.seed + 1234),
                    zlib.crc32(sc.encode()) % (2 ** 31))
                make_core(sc)
                t0 = time.time()
                X, act = collect_j(sc, masks[scene_to_ctrl[sc]], k)
                X = np.asarray(X).reshape(-1, x_dim)
                m = np.asarray(act).reshape(-1)
                X = X[m]
                y_part = np.full(len(X), scene_to_ctrl[sc], np.int32)
                np.savez_compressed(
                    os.path.join(data_dir, f"collect_{sc}.npz"),
                    X=X.astype(np.float32), y=y_part)
                Xs.append(X)
                ys.append(y_part)
                print(f"collect {sc:>20s}: {len(X):7d} obs "
                      f"({time.time()-t0:.1f}s)", flush=True)
            if args.collect_only:
                return
        X = np.concatenate(Xs)
        y = np.concatenate(ys)

        # ---- 3. train the router ---------------------------------------------
        rng = np.random.default_rng(args.seed)
        perm = rng.permutation(len(X))
        X, y = X[perm], y[perm]
        n_val = max(len(X) // 10, 1)
        Xv, yv = X[:n_val], y[:n_val]
        Xt, yt = X[n_val:], y[n_val:]
        # class-balanced sampling weights (scenes produce different step counts)
        counts = np.bincount(yt, minlength=n_ctrl).astype(np.float64)
        w = (1.0 / np.maximum(counts, 1))[yt]
        w /= w.sum()

        router = RouterMLP(n_ctrl)
        rp = router.init(jax.random.PRNGKey(args.seed), jnp.zeros((1, x_dim)))
        tx = optax.adam(3e-4)
        opt = tx.init(rp)

        @jax.jit
        def train_step(rp, opt, xb, yb):
            def loss_fn(rp):
                logits = router.apply(rp, xb)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb).mean()
            loss, g = jax.value_and_grad(loss_fn)(rp)
            up, opt = tx.update(g, opt, rp)
            return optax.apply_updates(rp, up), opt, loss

        @jax.jit
        def accuracy(rp, xb, yb):
            return (jnp.argmax(router.apply(rp, xb), -1) == yb).mean()

        bs = 4096
        t0 = time.time()
        for step in range(args.steps):
            idx = rng.choice(len(Xt), size=bs, p=w)
            rp, opt, loss = train_step(rp, opt, jnp.asarray(Xt[idx]),
                                       jnp.asarray(yt[idx]))
            if (step + 1) % 500 == 0:
                acc = float(accuracy(rp, jnp.asarray(Xv), jnp.asarray(yv)))
                print(f"step {step+1}: loss {float(loss):.4f} "
                      f"val acc {acc:.4f} ({time.time()-t0:.0f}s)", flush=True)
        # per-class validation accuracy + confusion
        pred = np.asarray(jnp.argmax(router.apply(rp, jnp.asarray(Xv)), -1))
        conf = np.zeros((n_ctrl, n_ctrl), int)
        for a, b in zip(yv, pred):
            conf[a, b] += 1
        per_class = {ctrl_names[c]: round(float(conf[c, c] / max(conf[c].sum(), 1)), 4)
                     for c in range(n_ctrl)}
        print("per-class val acc:", json.dumps(per_class, indent=1))

        policy = RoutedPolicy(members=members, masks=masks, router_params=rp)
        meta = {
            "format": "panda_gym_tpu.routed_policy.v1",
            "members": member_dirs,
            "controllers": {ctrl_names[c]: [member_dirs[i]
                                            for i, v in enumerate(ctrl_masks[c])
                                            if v]
                            for c in range(n_ctrl)},
            "scene_to_controller": {sc: ctrl_names[scene_to_ctrl[sc]]
                                    for sc in CONTROLLERS},
            "router_hidden": [128, 128],
            "use_sde": pool_sde,
            "x_dim": x_dim,
            "val_acc_per_class": per_class,
            "train_obs": int(len(Xt)),
        }
        save_routed_policy(artifact, policy, meta)
        print(f"saved {artifact}")

    # ---- 4. scene-blind benchmark ----------------------------------------
    if args.benchmark or args.benchmark_only:
        from panda_gym_tpu.eval.benchmark import (
            display_and_save_benchmark_results, perform_benchmark)
        rl = RoutedLearner(learner, n_ctrl)
        policy, meta = load_routed_policy(artifact)  # round-trip the artifact
        parts = os.path.join(args.out, "benchmark_parts")
        os.makedirs(parts, exist_ok=True)
        for sc in (args.scenarios or BENCHMARK_SCENARIOS):
            core = make_core(sc)
            res = perform_benchmark(rl, [policy], core,
                                    n_episodes=args.episodes,
                                    horizon=300, seed=args.seed)
            print(f"  {sc:>20s} success={res['success_rate']:.2f} "
                  f"collision={res['collision_rate']:.2f}", flush=True)
            # per-scene part files: parallel invocations over scenario
            # subsets never clobber each other; merged below
            with open(os.path.join(parts, f"{sc}.json"), "w") as f:
                json.dump(res, f, indent=1)
        results = {}
        for sc in BENCHMARK_SCENARIOS:
            pf = os.path.join(parts, f"{sc}.json")
            if os.path.exists(pf):
                with open(pf) as f:
                    results[sc] = json.load(f)
        with open(os.path.join(args.out, "benchmark.json"), "w") as f:
            json.dump(results, f, indent=1)
        display_and_save_benchmark_results(
            results, os.path.join(args.out, "benchmark"))
        mean = float(np.mean([r["success_rate"] for r in results.values()]))
        print(json.dumps({"routed_generalist_mean": round(mean, 4),
                          "scenes": len(results)}))


if __name__ == "__main__":
    main()
