"""Population training CLI: K seeds simultaneously in one jit
(rl/population.py, VERDICT r4 #2).

The round-4 campaign trained its cross-seed ensemble members serially
(rs_s1..s5 = five sittings) while the update-bound loop left the chip
~99.7% idle; this tool trains the whole seed population at once — the
member axis is one more batch dimension for XLA, so K seeds cost far
less than K sittings (THROUGHPUT_r05.json records the scaling).

Examples:
    # 4 seeds of the rand_start pose-randomization curriculum
    python tools/train_population.py --members 4 \
        --stages reachao_rand reachao_rand_start --max-timesteps 700000

    # 8-seed quick pool on one scene
    python tools/train_population.py --members 8 --stages wall \
        --max-timesteps 300000
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
    p.add_argument("--members", type=int, default=4)
    p.add_argument("--algorithm", default="TQC",
                   choices=["TQC", "TQC_v2", "SAC", "TD3", "DDPG"])
    p.add_argument("--stages", nargs="+", default=["reachao1"])
    p.add_argument("--success-thresholds", nargs="+", type=float,
                   default=None)
    p.add_argument("--max-ep-steps", nargs="+", type=int, default=[100])
    p.add_argument("--max-timesteps", type=int, default=600_000,
                   help="per-member env-step budget per stage")
    p.add_argument("--n-envs", type=int, default=64,
                   help="envs PER MEMBER (total envs = members * n_envs)")
    p.add_argument("--utd", type=float, default=None)
    p.add_argument("--update-batch-size", type=int, default=None)
    p.add_argument("--interleave-min-buffer", type=int, default=None)
    p.add_argument("--learning-starts", type=int, default=50_000)
    p.add_argument("--reward-type", default="sparse")
    p.add_argument("--control-type", default="js")
    p.add_argument("--goal-condition", default="reach")
    p.add_argument("--collision-reward", type=float, default=-100.0)
    p.add_argument("--safety-distance", type=float, default=0.0)
    p.add_argument("--eval-freq", type=int, default=25_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--group", default="default")
    p.add_argument("--name", default=None)
    p.add_argument("--obs-max-distance", type=float, default=2.0)
    # start-pose randomization curriculum: express it through scenario
    # NAMES — '<scene>_p25' is <scene> with pose_randomize_prob=0.25
    # (reach_ao.py ScenarioSpec curriculum axis), e.g.
    # --stages reachao_rand_start_p25 reachao_rand_start_p50 \
    #          reachao_rand_start
    p.add_argument("--buffer-size", type=int, default=None,
                   help="per-member replay transitions (default preset "
                        "300k; lower to fit K large buffers in HBM)")
    return p.parse_args()


def main():
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)

    import os as _os
    if _os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

    args = parse_args()

    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core
    from panda_gym_tpu.rl.config import Hyperparameters, TrainConfig
    from panda_gym_tpu.rl.logging_utils import RunLogger
    from panda_gym_tpu.rl.population import PopulationTrainer

    n_stages = len(args.stages)
    succ = args.success_thresholds or [0.9] * (n_stages - 1) + [2.0]
    cfg = TrainConfig(
        name=args.name or "pop", group=args.group,
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
        eval_freq=args.eval_freq, seed=args.seed,
        utd=args.utd, update_batch_size=args.update_batch_size,
        interleave_min_buffer=args.interleave_min_buffer,
    )
    cfg.task_observations = dict(cfg.task_observations,
                                 max_distance=args.obs_max_distance)
    cfg.hyperparams = Hyperparameters(args.algorithm)
    if args.buffer_size is not None:
        cfg.hyperparams.buffer_size = args.buffer_size

    logger = RunLogger(group=args.group, name=args.name, config=cfg)
    print(f"run dir: {logger.dir} (members={args.members})")

    make_env = lambda sc, thr, spd: make_reach_ao_core(
        scenario=sc, config=cfg, ee_error_threshold=thr, speed_threshold=spd)
    pt = PopulationTrainer(cfg, make_env=make_env, n_members=args.members,
                           logger=logger)
    pt.learn(seed=args.seed)
    pt.save_members(os.path.join(logger.dir, "final"))
    print(f"saved {args.members} member checkpoints under {logger.dir}")
    logger.close()


if __name__ == "__main__":
    main()
