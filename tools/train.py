"""Training entry point — CLI equivalent of the reference's training/train.py
(train_base_model / continue_learning, train.py:66-136) on the TPU-native
stack: builds a TrainConfig, runs the curriculum Trainer, checkpoints the
learner, and optionally benchmarks over the reference's scenario table
(setup_training.py:334-381).

Examples:
    # default experiment: TQC on the reachao1->2->3 curriculum
    python tools/train.py

    # short single-stage run with benchmarking
    python tools/train.py --stages reachao1 --max-timesteps 100000 \
        --n-envs 512 --benchmark

    # resume from a checkpoint
    python tools/train.py --resume training/run_data/default/run_x/final.ckpt
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from panda_gym_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--algorithm", default="TQC",
                   choices=["TQC", "TQC_v2", "SAC", "TD3", "DDPG"])
    p.add_argument("--stages", nargs="+",
                   default=["reachao1", "reachao2", "reachao3"])
    p.add_argument("--success-thresholds", nargs="+", type=float, default=None,
                   help="per-stage eval success to advance (default .9/.9/1)")
    p.add_argument("--max-ep-steps", nargs="+", type=int, default=[50, 75, 100])
    p.add_argument("--max-timesteps", type=int, default=600_000)
    # Interleaved mode (default) runs one update burst after every vector
    # env step, so large n_envs stays sample-efficient (the old
    # collect-then-update loop made n_envs=512 effectively offline between
    # policy improvements and it stalled near 0; see rl/train.py
    # rollout_train).
    p.add_argument("--n-envs", type=int, default=64)
    p.add_argument("--utd", type=float, default=None,
                   help="updates per transition (default: SB3 TQC-preset "
                        "ratio 0.125)")
    p.add_argument("--update-batch-size", type=int, default=None,
                   help="gradient batch size (default: preset batch_size "
                        "256); raise with --utd lowered to trade gradient "
                        "count for TPU throughput at large --n-envs")
    p.add_argument("--no-interleave", action="store_true",
                   help="collect-then-update loop instead of interleaved "
                        "bursts. Rarely needed since round 4: resumed "
                        "fine-tunes are protected by the buffer-fill gate "
                        "(--interleave-min-buffer) plus --learning-starts; "
                        "evidence in THROUGHPUT_r04.json (interleave = "
                        "2.4k->22.9k steps/s at n_envs=64, no collapse "
                        "under the ramp)")
    p.add_argument("--interleave-min-buffer", type=int, default=None,
                   help="interleaved bursts only fire once the buffer holds "
                        "this many transitions (default max(2*learning_"
                        "starts, 20k)) — guards resumed policies against "
                        "high-UTD updates on a near-empty fresh buffer")
    p.add_argument("--moving-obstacles", action="store_true",
                   help="sample random obstacle velocities at reset; the "
                        "engine integrates them per substep (reference "
                        "reach_ao.py:104,997-1001,1091-1095)")
    p.add_argument("--learning-starts", type=int, default=10_000)
    p.add_argument("--reward-type", default="sparse",
                   choices=["sparse", "wang", "kumar_her", "kumar_optim",
                            "kumar", "dense"])
    p.add_argument("--control-type", default="js",
                   choices=["js", "ee", "jsd", "pcc"])
    p.add_argument("--goal-condition", default="reach",
                   choices=["reach", "halt"])
    p.add_argument("--collision-reward", type=float, default=-100.0)
    p.add_argument("--safety-distance", type=float, default=0.0,
                   help="treat obstacle distances <= this as collisions "
                        "during training (reference train_config.py "
                        "safety_distance; reach_ao.py:1150 margin) — train "
                        "with clearance, evaluate at 0.0")
    p.add_argument("--prior-steps", type=int, default=0,
                   help="NEO-prior imitation transitions to prefill "
                        "(imitation_learning.py:6-56 equivalent)")
    p.add_argument("--eval-freq", type=int, default=10_000)
    p.add_argument("--n-eval-episodes", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--group", default="default")
    p.add_argument("--name", default=None)
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TB event files under the run dir "
                        "(reference syncs SB3 TB logs, setup_training.py:163)")
    p.add_argument("--wandb", action="store_true",
                   help="also log to Weights & Biases if available")
    p.add_argument("--resume", default=None,
                   help="checkpoint path to resume the learner from")
    p.add_argument("--resume-full", default=None,
                   help="full-state checkpoint dir (<run>/full_state) to "
                        "resume mid-stage bit-exactly: learner + buffer + "
                        "PRNG key + stage/step counters")
    p.add_argument("--full-ckpt-freq", type=int, default=0,
                   help="write a rolling full-state checkpoint every N env "
                        "steps (0 = off)")
    p.add_argument("--benchmark", action="store_true",
                   help="run the 13-scenario benchmark after training")
    p.add_argument("--benchmark-episodes", type=int, default=100)
    p.add_argument("--obs-max-distance", type=float, default=None,
                   help="cap per-link obstacle distances in observations "
                        "(reference feeds raw 999.0 'blind' readings, "
                        "reach_ao.py:907; scenes with buried links need a "
                        "sane cap, e.g. 2.0)")
    p.add_argument("--net-arch", nargs="+", type=int, default=None,
                   help="override the algorithm preset's MLP widths, e.g. "
                        "--net-arch 512 512 (reference: policy_kwargs "
                        "net_arch, hyperparameters.py:20)")
    p.add_argument("--no-resume-buffer", action="store_true",
                   help="on --resume, start with a fresh replay buffer "
                        "(matches the reference's continue_learning, whose "
                        "buffer reload is commented out, "
                        "setup_training.py:80-82)")
    return p.parse_args()


def main():
    # diagnosability on the TPU tunnel: `kill -USR1 <pid>` dumps all thread
    # stacks to stderr without killing the run (hangs have historically been
    # device-transfer wedges; see docs/guide/performance.md)
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)

    # honor JAX_PLATFORMS even where a site hook (e.g. the axon TPU plugin)
    # overrides the env var: jax.config takes precedence at backend init
    import os as _os
    if _os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

    args = parse_args()

    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core
    from panda_gym_tpu.rl.config import Hyperparameters, TrainConfig
    from panda_gym_tpu.rl.logging_utils import RunLogger
    from panda_gym_tpu.rl.train import Trainer

    n_stages = len(args.stages)
    succ = args.success_thresholds or [0.9] * (n_stages - 1) + [1.0]
    cfg = TrainConfig(
        name=args.name or "cli", group=args.group,
        algorithm=args.algorithm, n_envs=args.n_envs,
        stages=list(args.stages), success_thresholds=list(succ),
        ee_error_thresholds=[0.05] * n_stages,
        speed_thresholds=([0.5, 0.1, 0.01] + [0.01] * n_stages)[:n_stages],
        max_ep_steps=list(args.max_ep_steps),
        max_timesteps=args.max_timesteps,
        learning_starts=args.learning_starts,
        reward_type=args.reward_type, control_type=args.control_type,
        goal_condition=args.goal_condition,
        collision_reward=args.collision_reward,
        safety_distance=args.safety_distance,
        prior_steps=args.prior_steps,
        eval_freq=args.eval_freq, n_eval_episodes=args.n_eval_episodes,
        seed=args.seed,
        utd=args.utd, update_batch_size=args.update_batch_size,
        interleave_updates=not args.no_interleave,
        interleave_min_buffer=args.interleave_min_buffer,
        randomize_obstacle_velocity=args.moving_obstacles,
        full_ckpt_freq=args.full_ckpt_freq,
    )
    if args.obs_max_distance is not None:
        cfg.task_observations = dict(cfg.task_observations,
                                     max_distance=args.obs_max_distance)
    cfg.hyperparams = Hyperparameters(args.algorithm)
    if args.net_arch is not None:
        cfg.hyperparams.policy_kwargs = dict(
            cfg.hyperparams.policy_kwargs, net_arch=list(args.net_arch))

    logger = RunLogger(group=args.group, name=args.name, config=cfg,
                       use_wandb=args.wandb, use_tensorboard=args.tensorboard)
    print(f"run dir: {logger.dir}")

    make_env = lambda sc, thr, spd: make_reach_ao_core(
        scenario=sc, config=cfg, ee_error_threshold=thr, speed_threshold=spd)
    trainer = Trainer(cfg, make_env=make_env, logger=logger)
    if args.resume:
        trainer.load(args.resume, restore_buffer=not args.no_resume_buffer)
        print(f"resumed learner from {args.resume}")
    if args.resume_full:
        trainer.load_full(args.resume_full)
        print(f"resumed full training state from {args.resume_full} "
              f"(stage {trainer._resume['stage_index']}, "
              f"{trainer.timesteps} steps)")

    trainer.learn(seed=args.seed)
    final = os.path.join(logger.dir, "final.ckpt")
    trainer.save(final, include_buffer=True)
    # model-only twin (small enough to commit; survives filesystem resets
    # between rounds, unlike the replay-carrying final.ckpt)
    trainer.save(os.path.join(logger.dir, "final_model.ckpt"))
    print(f"saved final learner to {final}")

    if args.benchmark:
        from panda_gym_tpu.eval.benchmark import (
            BENCHMARK_SCENARIOS, display_and_save_benchmark_results,
            evaluate_scenarios)
        # Benchmark the best eval snapshot when one exists — the reference
        # benchmarks best_model.zip (load_model_utils.py:14-50), not the
        # final (possibly collapsed) policy.
        best = os.path.join(logger.dir, "best_model.ckpt")
        if os.path.exists(best):
            trainer.load(best, restore_buffer=False)
            print(f"benchmarking best eval snapshot {best}")
        results = evaluate_scenarios(
            trainer.learner, [trainer.ts],
            make_core=lambda sc: make_env(sc, 0.05, 0.5),
            scenarios=BENCHMARK_SCENARIOS,
            n_episodes=args.benchmark_episodes, horizon=300, seed=args.seed)
        display_and_save_benchmark_results(
            results, os.path.join(logger.dir, "benchmark"))
    logger.close()


if __name__ == "__main__":
    main()
