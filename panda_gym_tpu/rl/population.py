"""Population training: K learners trained simultaneously in one jit.

Round-4 finding (THROUGHPUT_r04.json / VERDICT r4 weak #3): the fused
train loop is UPDATE-bound at 11–29k env-steps/s against a 6M steps/s
engine — during a campaign sitting the chip is ~99.7% idle, and the
campaign's core mechanism (cross-seed ensembles: rs_s1…s5) trains seeds
SERIALLY.  This module is the TPU-native fix: vmap the entire fused
collect+update rollout over a leading member axis, so K independent
seeds (own envs, own HER buffers, own PRNG streams, own optimizer
states) advance together in one compiled program.  The per-update
matmuls batch K-fold on the MXU, so aggregate steps/s scales far better
than K serial runs (measured in THROUGHPUT_r05.json).

Semantics: members are fully independent replicas — identical
algorithm/architecture/hyperparameters (those are trace-time constants),
different seeds.  Equivalence with K sequential single-seed runs is
pinned by tests/test_population.py (vmapped update == per-member update).

Reference contrast: the reference's only scale axis is n_envs inside ONE
SB3 learn loop (training/utils/setup_training.py:44-47); K seeds there
are K python processes each re-paying the whole pipeline.  Here the
member axis is just another batch dimension handed to XLA.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from panda_gym_tpu.envs.core import RobotTaskEnv
from panda_gym_tpu.rl import her
from panda_gym_tpu.rl.config import TrainConfig
from panda_gym_tpu.rl.learners import make_learner
from panda_gym_tpu.rl.train import VectorEnv, stage_tag


def _stack_trees(trees: List):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def member_slice(tree, i: int):
    """Member i's pytree (e.g. one TrainState out of the stacked state)."""
    return jax.tree_util.tree_map(lambda x: x[i], tree)


class PopulationTrainer:
    """K-seed trainer sharing the Trainer's building blocks.

    Mirrors rl/train.py::Trainer's fused interleaved loop (buffer-fill
    gate, learning-starts ramp, curriculum stages, per-member best-eval
    snapshots) with every per-member computation vmapped over the leading
    member axis.
    """

    def __init__(self, config: TrainConfig,
                 make_env: Callable[[str, float, float], RobotTaskEnv],
                 n_members: int, logger=None):
        self.config = config
        self.make_env = make_env
        self.K = int(n_members)
        self.logger = logger
        self.learner = None
        self.ts = None            # stacked TrainState (leading axis K)
        self.buffer = None        # stacked HerBuffer
        self.timesteps = 0        # aggregate env steps across members
        self._best_eval = None    # (K,) per-member best eval success

    # ------------------------------------------------------------------
    def learn(self, seed: Optional[int] = None):
        cfg = self.config
        key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        n_stages = len(cfg.stages)
        for i, stage in enumerate(cfg.stages):
            ee_thr = cfg.ee_error_thresholds[i]
            sp_thr = cfg.speed_thresholds[i] \
                if cfg.goal_condition == "halt" else 0.5
            horizon = cfg.max_ep_steps[min(i, len(cfg.max_ep_steps) - 1)]
            succ_thr = cfg.success_thresholds[i]
            key, k = jax.random.split(key)
            reached = self.train_stage(stage, horizon, ee_thr, sp_thr,
                                       succ_thr, k,
                                       final=(i == n_stages - 1))
            print(f"[pop stage {stage}] done (threshold reached: {reached});"
                  f" aggregate timesteps: {self.timesteps}")
            run_dir = getattr(self.logger, "dir", None)
            if run_dir:
                self.save_members(os.path.join(
                    run_dir, f"model_{stage_tag(stage)}_{i}"))
        return self.ts

    def _ensure_learner(self, venv: VectorEnv, key):
        cfg = self.config
        if self.learner is None:
            self.learner = make_learner(cfg.algorithm, venv.x_dim,
                                        venv.act_dim, cfg.hyperparams)
            if self.ts is None:
                keys = jax.random.split(key, self.K)
                self.ts = jax.jit(jax.vmap(self.learner.init))(keys)
        if self.buffer is None or self.buffer.ep_horizon < venv.horizon:
            cap_eps = max(getattr(cfg.hyperparams, "buffer_size", 300_000)
                          // max(venv.horizon, 1), venv.n_envs)
            aux_dim = int(jax.eval_shape(
                lambda s: venv.core.task.reward_aux(venv.core, s),
                venv.core._template).shape[0])
            template = her.create(cap_eps, venv.horizon, venv.obs_dim,
                                  venv.goal_dim, venv.act_dim, aux_dim)
            # K independent zero-initialized rings (identical static fields)
            self.buffer = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(
                    x, (self.K,) + x.shape).copy(), template)
            # struct.dataclass static fields survive the tree_map
            # (capacity/ep_horizon are not pytree nodes)

    # ------------------------------------------------------------------
    def train_stage(self, scenario: str, horizon: int, ee_thr: float,
                    sp_thr: float, success_threshold: float, key,
                    final: bool = False) -> bool:
        cfg = self.config
        core = self.make_env(scenario, ee_thr, sp_thr)
        venv = VectorEnv(core, cfg.n_envs, horizon)
        key, k_init = jax.random.split(key)
        self._ensure_learner(venv, k_init)
        learner = self.learner
        hp = cfg.hyperparams
        self._best_eval = np.full(self.K, -1.0)
        batch_size = getattr(cfg, "update_batch_size", None) or getattr(
            hp, "batch_size", 256)
        utd = getattr(cfg, "utd", None)
        if utd is None:
            utd = getattr(hp, "gradient_steps", 8) / (
                max(getattr(hp, "train_freq", 8), 1) * 8.0)
        n_upd_per_step = max(int(round(utd * cfg.n_envs)), 1)
        reward_fn = self._reward_fn(core)

        def update_burst(ts, buf, key, length):
            def one(carry, _):
                ts, key = carry
                key, k_s, k_u = jax.random.split(key, 3)
                batch = her.sample(buf, k_s, batch_size, reward_fn)
                x = jnp.concatenate([batch["achieved"], batch["goal"],
                                     batch["obs"]], axis=-1)
                x2 = jnp.concatenate([batch["achieved_next"], batch["goal"],
                                      batch["next_obs"]], axis=-1)
                b = dict(x=x, x2=x2, action=batch["action"],
                         reward=batch["reward"],
                         terminated=batch["terminated"].astype(jnp.float32))
                ts, m = learner.update(ts, b, k_u)
                return (ts, key), m
            (ts, key), ms = jax.lax.scan(one, (ts, key), None, length=length)
            return ts, key, jax.tree_util.tree_map(lambda x: x[-1], ms)

        def step_update(ts, buf, key):
            return update_burst(ts, buf, key, n_upd_per_step)

        # per-member programs, vmapped over the leading member axis ------
        def member_train(ts, buf, key):
            ts, episodes, stats, m, key = venv._rollout_episode(
                learner, ts, key, False, None, buf=buf,
                update_fn=step_update)
            buf = her.add_episodes(buf, **episodes)
            return ts, buf, stats, m, key

        def member_collect(ts, buf, key):
            episodes, stats, key = venv._rollout_episode(learner, ts, key)
            buf = her.add_episodes(buf, **episodes)
            return buf, stats, key

        def member_eval(ts, key):
            _eps, stats, _key = venv._rollout_episode(
                learner, ts, key, deterministic=True)
            return stats["success"]

        pop_train = jax.jit(jax.vmap(member_train))
        pop_collect = jax.jit(jax.vmap(member_collect))
        pop_eval = jax.jit(jax.vmap(member_eval))

        interleave = getattr(cfg, "interleave_updates", True)
        interleave_min = getattr(cfg, "interleave_min_buffer", None)
        if interleave_min is None:
            interleave_min = max(2 * cfg.learning_starts, 20_000,
                                 8 * n_upd_per_step * batch_size)
        gate_open = False

        def buffer_filled():
            nonlocal gate_open
            if gate_open:
                return True
            # members fill in lockstep (same n_envs/horizon); member 0's
            # count is every member's count
            gate_open = (
                int(self.buffer.n_stored[0])
                >= int(self.buffer.ep_len.shape[1])
                or int(jnp.sum(self.buffer.ep_len[0])) >= interleave_min)
            return gate_open

        stage_steps = 0            # per-member env steps this stage
        learning_started = False
        t_start = time.time()
        while stage_steps < cfg.max_timesteps:
            key, k_c = jax.random.split(key)
            keys = jax.random.split(k_c, self.K)
            m: Dict = {}
            if learning_started and interleave and buffer_filled():
                self.ts, self.buffer, stats, ms, _ = pop_train(
                    self.ts, self.buffer, keys)
                m = {k: float(jnp.mean(v)) for k, v in ms.items()}
            else:
                self.buffer, stats, _ = pop_collect(self.ts, self.buffer,
                                                    keys)
            rollout_steps = int(jnp.sum(stats["ep_len"])) // self.K
            stage_steps += rollout_steps
            self.timesteps += rollout_steps * self.K

            if (not learning_started
                    and stage_steps >= min(cfg.learning_starts,
                                           cfg.max_timesteps // 4)):
                learning_started = True

            row = dict(
                scenario=scenario, timesteps=self.timesteps,
                stage_steps=stage_steps, members=self.K,
                rollout_success=[round(float(s), 4) for s in
                                 jnp.mean(stats["success"], axis=1)],
                agg_sps=self.timesteps / max(time.time() - t_start, 1e-9),
                **m)
            if self.logger is not None:
                self.logger.log(row)

            if learning_started and \
                    stage_steps % max(cfg.eval_freq, 1) < rollout_steps:
                key, k_e = jax.random.split(key)
                succ = pop_eval(self.ts, jax.random.split(k_e, self.K))
                per_member = np.asarray(jnp.mean(succ, axis=1))
                if self.logger is not None:
                    self.logger.log(dict(
                        eval_success=[round(float(s), 4)
                                      for s in per_member],
                        timesteps=self.timesteps))
                run_dir = getattr(self.logger, "dir", None)
                for i in range(self.K):
                    if per_member[i] > self._best_eval[i] and run_dir:
                        self._best_eval[i] = per_member[i]
                        self.save_member(
                            os.path.join(run_dir,
                                         f"best_model_m{i}.ckpt"), i)
                # stage advance on the population MEDIAN: one lucky seed
                # must not advance the curriculum for everyone
                if float(np.median(per_member)) >= success_threshold \
                        and not final:
                    return True
        return False

    def _reward_fn(self, core):
        task = core.task

        def fn(achieved_next, goal, aux):
            return jax.vmap(
                lambda a, g, x: task.reward_from_aux(core, a, g, x))(
                achieved_next, goal, aux)
        return fn

    # ------------------------------------------------------------- ckpt
    def save_member(self, path: str, i: int):
        """One member as a Trainer-compatible .ckpt payload (consumable by
        tools/evaluate.py / benchmark_pool.py / policy_io export)."""
        import pickle
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {"ts": jax.device_get(member_slice(self.ts, i)),
                   "timesteps": self.timesteps // self.K,
                   "algorithm": self.config.algorithm}
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def save_members(self, prefix: str):
        for i in range(self.K):
            self.save_member(f"{prefix}_m{i}.ckpt", i)
