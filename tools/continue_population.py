"""Continue a population run: reload the K member TrainStates (with
optimizer state) and train further on a stage (VERDICT r4 #3 follow-up).

PopulationTrainer trains stages fresh; this tool seeds pt.ts from an
existing run's member checkpoints, so a finished sitting can be extended
(the replay buffer is NOT persisted — it refills from the current
policies during the learning-starts ramp, which is on-distribution
data, before interleaved updates resume).

Usage:
    python tools/continue_population.py \
        [--src training/run_data/round5_campaign/pop_rs] \
        [--ckpt best_model] [--stage reachao_rand_start] \
        [--steps 700000] [--name pop_rs2]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from panda_gym_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="training/run_data/round5_campaign/pop_rs")
    p.add_argument("--ckpt", default="best_model",
                   help="member ckpt prefix: best_model | final | "
                        "model_<stage>_<i>")
    p.add_argument("--stage", default="reachao_rand_start")
    p.add_argument("--steps", type=int, default=700_000)
    p.add_argument("--learning-starts", type=int, default=25_000,
                   help="buffer refill budget before updates resume")
    p.add_argument("--name", default="pop_rs2")
    p.add_argument("--group", default="round5_campaign")
    p.add_argument("--seed", type=int, default=100)
    args = p.parse_args()

    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)
    if os.environ.get("JAX_PLATFORMS"):
        import jax as _jax
        _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax

    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core
    from panda_gym_tpu.rl.logging_utils import RunLogger, load_run
    from panda_gym_tpu.rl.population import PopulationTrainer, _stack_trees

    cfg, _ = load_run(args.src)
    cfg.stages = [args.stage]
    cfg.success_thresholds = [2.0]
    cfg.max_timesteps = args.steps
    cfg.learning_starts = args.learning_starts
    # gate scales off learning_starts; keep the refill short — the policy
    # is already competent, so early interleave is safe
    cfg.interleave_min_buffer = max(2 * args.learning_starts, 40_000)

    # member TrainStates (full: params + optimizer state)
    states = []
    for i in range(64):
        path = os.path.join(args.src, f"{args.ckpt}_m{i}.ckpt")
        if not os.path.exists(path):
            break
        with open(path, "rb") as f:
            states.append(pickle.load(f)["ts"])
    if not states:
        raise SystemExit(f"no member ckpts under {args.src}")
    K = len(states)
    print(f"continuing {K} members from {args.src} ({args.ckpt}_m*.ckpt) "
          f"on {args.stage} for {args.steps} steps/member")

    logger = RunLogger(group=args.group, name=args.name, config=cfg)
    print(f"run dir: {logger.dir}")

    make_env = lambda sc, thr, spd: make_reach_ao_core(
        scenario=sc, config=cfg, ee_error_threshold=thr,
        speed_threshold=spd)
    pt = PopulationTrainer(cfg, make_env=make_env, n_members=K,
                           logger=logger)
    pt.ts = jax.device_put(_stack_trees(states))
    pt.learn(seed=args.seed)
    pt.save_members(os.path.join(logger.dir, "final"))
    print(f"saved {K} member checkpoints under {logger.dir}")
    logger.close()


if __name__ == "__main__":
    main()
