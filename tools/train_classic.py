"""Train the classic panda-gym task family (Reach/Push/Slide/PickAndPlace/
Stack/Flip, reference envs/tasks/*.py + panda_tasks.py) with the TPU-native
Trainer — the upstream panda-gym training story (TQC/SAC + HER on sparse
rewards, docs/usage/train_with_sb3 in the reference docs tree) that
tools/train.py's ReachAO curriculum does not cover.

Examples:
    python tools/train_classic.py --task reach --max-timesteps 150000
    python tools/train_classic.py --task push --max-timesteps 1000000 \
        --n-envs 64 --group classic_campaign
    python tools/train_classic.py --task pickandplace --control-type ee \
        --max-timesteps 2000000
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from panda_gym_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--task", default="reach",
                   choices=["reach", "push", "slide", "pickandplace",
                            "stack", "flip", "mycobotreach"])
    p.add_argument("--algorithm", default="TQC",
                   choices=["TQC", "TQC_v2", "SAC", "TD3", "DDPG"])
    p.add_argument("--reward-type", default="sparse",
                   choices=["sparse", "dense"])
    p.add_argument("--control-type", default=None,
                   choices=["js", "ee", "jsd", "pcc"],
                   help="default: the task's reference default "
                        "(js for reach/push, ee for the rest)")
    p.add_argument("--max-ep-steps", type=int, default=None,
                   help="default 50 (100 for stack), like the reference "
                        "registry (panda_gym/__init__.py:19-91)")
    p.add_argument("--max-timesteps", type=int, default=600_000)
    p.add_argument("--n-envs", type=int, default=64)
    p.add_argument("--learning-starts", type=int, default=10_000)
    p.add_argument("--eval-freq", type=int, default=10_000)
    p.add_argument("--n-eval-episodes", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--group", default="classic")
    p.add_argument("--name", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--no-resume-buffer", action="store_true")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--wandb", action="store_true")
    return p.parse_args()


def main():
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)

    # honor JAX_PLATFORMS even where a site hook (e.g. the axon TPU plugin)
    # overrides the env var: jax.config takes precedence at backend init
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    args = parse_args()

    from panda_gym_tpu.envs.panda_tasks import make_core
    from panda_gym_tpu.rl.config import Hyperparameters, TrainConfig
    from panda_gym_tpu.rl.logging_utils import RunLogger
    from panda_gym_tpu.rl.train import Trainer

    horizon = args.max_ep_steps or (100 if args.task == "stack" else 50)
    # per-task reference default (make_core factories: js for reach/push/
    # mycobotreach, ee for slide/pickandplace/stack/flip) — record the SAME
    # value in config.json that the env factory actually uses, so a
    # config-driven rebuild reconstructs the right action/obs space
    default_ct = "js" if args.task in ("reach", "push", "mycobotreach") else "ee"
    control_type = args.control_type or default_ct
    kw = dict(reward_type=args.reward_type, control_type=control_type)

    cfg = TrainConfig(
        name=args.name or f"{args.algorithm.lower()}_{args.task}",
        group=args.group, algorithm=args.algorithm, n_envs=args.n_envs,
        stages=[args.task], success_thresholds=[2.0],  # run the full budget
        ee_error_thresholds=[0.05], speed_thresholds=[0.5],
        max_ep_steps=[horizon], max_timesteps=args.max_timesteps,
        learning_starts=args.learning_starts,
        reward_type=args.reward_type,
        control_type=control_type,
        eval_freq=args.eval_freq, n_eval_episodes=args.n_eval_episodes,
        seed=args.seed,
    )
    cfg.hyperparams = Hyperparameters(args.algorithm)
    cfg.benchmark_eval_scenes = []  # no ReachAO scenes here

    logger = RunLogger(group=args.group, name=args.name or cfg.name,
                       config=cfg, use_wandb=args.wandb,
                       use_tensorboard=args.tensorboard)
    print(f"run dir: {logger.dir}")

    make_env = lambda task, thr, spd: make_core(task, **kw)
    trainer = Trainer(cfg, make_env=make_env, logger=logger)
    if args.resume:
        trainer.load(args.resume, restore_buffer=not args.no_resume_buffer)
        print(f"resumed learner from {args.resume}")

    trainer.learn(seed=args.seed)
    trainer.save(os.path.join(logger.dir, "final.ckpt"), include_buffer=True)
    trainer.save(os.path.join(logger.dir, "final_model.ckpt"))
    print(f"saved final learner to {logger.dir}")
    logger.close()


if __name__ == "__main__":
    main()
