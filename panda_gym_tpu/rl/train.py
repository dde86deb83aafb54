"""Curriculum training pipeline: vectorized collector + staged driver.

Replaces the reference's training/ package (setup_training.py:182-307 learn /
train_model, the SB3 model.learn loop, and the missing sb3_extensions
callbacks — StopTrainingOnSuccessThreshold / EvalSuccessCallback /
RecordCustomMetricsCallback, setup_training.py:16-17) with a TPU-native
loop:

  * N envs stepped in lockstep under jit(vmap(step)) — the SubprocVecEnv
    replacement (setup_training.py:44-47), no processes or pipes;
  * synchronous episode collection: each rollout runs one episode batch of
    max_ep_steps steps per env (post-termination steps frozen), writes the
    episodes into the on-device HER buffer, then runs gradient updates;
  * curriculum stages advance when the deterministic-eval success rate
    reaches the stage threshold (setup_training.py:233-307).
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from panda_gym_tpu.envs.core import RobotTaskEnv
from panda_gym_tpu.rl import her
from panda_gym_tpu.rl.config import TrainConfig
from panda_gym_tpu.rl.learners import make_learner

# ---------------------------------------------------------------------------


def flat_x(obs):
    return jnp.concatenate(
        [obs["achieved_goal"], obs["desired_goal"], obs["observation"]], axis=-1)


def stage_tag(stage: str, limit: int = 120) -> str:
    """Filesystem-safe tag for a stage name. Long mixture names
    ('a+b+...' can exceed the 255-byte filename limit) are truncated with
    a digest suffix so the per-stage snapshot stays unique and the save
    cannot fail."""
    if len(stage) <= limit:
        return stage
    import hashlib
    digest = hashlib.sha1(stage.encode()).hexdigest()[:8]
    return f"{stage[:100]}...{digest}"


class VectorEnv:
    """Batched functional env with jit-compiled episode rollouts.

    With `mesh`, the env batch is sharded along the mesh's "env" axis
    (parallel/mesh.py): the SubprocVecEnv replacement scaled over devices —
    XLA partitions the whole rollout, no processes or pipes.
    """

    def __init__(self, core: RobotTaskEnv, n_envs: int, horizon: int,
                 mesh=None):
        self.core = core
        self.n_envs = n_envs
        self.horizon = horizon
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.env_sharding = NamedSharding(mesh, P("env"))
        else:
            self.env_sharding = None
        # shape-only probe: an eager reset would execute thousands of tiny
        # ops over the device tunnel (measured 160 s for ReachAO)
        _, probe_obs = jax.eval_shape(core.reset, jax.random.PRNGKey(0))
        self.obs_dim = probe_obs["observation"].shape[0]
        self.goal_dim = probe_obs["achieved_goal"].shape[0]
        self.act_dim = core.robot.action_dim
        self.x_dim = self.obs_dim + 2 * self.goal_dim
        self._rollout_cache = {}

    def batch_reset(self, key):
        keys = jax.random.split(key, self.n_envs)
        if self.env_sharding is not None:
            keys = jax.lax.with_sharding_constraint(keys, self.env_sharding)
        states, obs = jax.vmap(self.core.reset)(keys)
        if self.env_sharding is not None:
            shard = lambda t: jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, self.env_sharding), t)
            states, obs = shard(states), shard(obs)
        return states, obs

    def rollout_episode(self, learner, ts, key, deterministic=False,
                        policy_fn=None):
        """Jit-cached wrapper over _rollout_episode: direct callers would
        otherwise execute the whole rollout eagerly (measured ~2000x slower
        on a TPU tunnel); the cache key is the (learner, flags) identity."""
        k = (id(learner), bool(deterministic), id(policy_fn))
        if k not in self._rollout_cache:
            self._rollout_cache[k] = jax.jit(
                lambda ts, key: self._rollout_episode(
                    learner, ts, key, deterministic, policy_fn))
        return self._rollout_cache[k](ts, key)

    def rollout_train(self, learner, ts, buf, key, update_fn):
        """Fused collect + interleaved-update rollout, jit-cached.

        update_fn(ts, buf, key) -> (ts, key, metrics) runs one gradient-update
        burst against the (frozen) replay buffer; it is invoked after EVERY
        vector env step, so the policy improves `horizon` times per episode
        batch instead of once at the end — this is what keeps large n_envs
        sample-efficient (an SB3-style train_freq inside one jit; the
        reference updates every train_freq=8 env transitions,
        hyperparameters.py:16-17).  The buffer itself is only appended to
        after the episodes complete (HER needs whole episodes)."""
        k = (id(learner), id(update_fn))
        if k not in self._rollout_cache:
            def fused(ts, buf, key):
                ts, episodes, stats, m, key = self._rollout_episode(
                    learner, ts, key, False, None, buf=buf,
                    update_fn=update_fn)
                buf = her.add_episodes(buf, **episodes)
                return ts, buf, stats, m, key
            self._rollout_cache[k] = jax.jit(fused)
        return self._rollout_cache[k](ts, buf, key)

    def _sample_expl(self, learner, ts, key):
        """Per-episode gSDE exploration matrices, env-sharded like the
        batch; None for non-SDE learners."""
        if not hasattr(learner, "sample_expl"):
            return None
        expl = learner.sample_expl(ts, key, self.n_envs)
        if expl is not None and self.env_sharding is not None:
            expl = jax.lax.with_sharding_constraint(expl, self.env_sharding)
        return expl

    def _rollout_episode(self, learner, ts, key, deterministic=False,
                         policy_fn=None, buf=None, update_fn=None):
        """One synchronous episode batch of `horizon` steps.

        Returns stacked episode tensors shaped for HerBuffer plus episode
        stats.  Post-termination steps are frozen (no further state change,
        no further writes).  `policy_fn(x, states, key) -> actions` overrides
        the learner (used by the prior-bootstrap imitation fill).

        With `update_fn` (and `buf`), each env step is followed by a
        gradient-update burst and the updated TrainState is carried into the
        next step's action selection; returns (ts, episodes, stats, metrics,
        key) instead of (episodes, stats, key).
        """
        core = self.core
        T = self.horizon
        train = update_fn is not None

        key, k_expl = jax.random.split(key)
        expl = None
        if policy_fn is None and not deterministic:
            expl = self._sample_expl(learner, ts, k_expl)

        def step_fn(carry, t):
            if train:
                states, obs, done, ep_len, ts_c, key = carry
            else:
                states, obs, done, ep_len, key = carry
                ts_c = ts
            key, k_act, k_step = jax.random.split(key, 3)
            x = flat_x(obs)
            if policy_fn is not None:
                action = policy_fn(x, states, k_act)
            elif deterministic:
                action = learner.act(ts_c, x, k_act, deterministic=True)
            elif expl is not None:
                action = learner.act(ts_c, x, k_act, expl=expl)
            else:
                action = learner.act(ts_c, x, k_act)
            nstates, nobs, reward, term, trunc, info = core.batched_step(
                states, action)
            step_done = term | trunc
            # freeze finished envs
            keep = lambda old, new: jnp.where(
                done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new)
            states = jax.tree_util.tree_map(keep, states, nstates)
            obs = jax.tree_util.tree_map(keep, obs, nobs)
            reward = jnp.where(done, 0.0, reward)
            aux = jax.vmap(lambda s: core.task.reward_aux(core, s))(states)
            ep_len = ep_len + (~done).astype(jnp.int32)
            new_done = done | step_done
            # collision truncation is a real episode end, not a time limit:
            # SB3 bootstraps only through TimeLimit truncations, so a
            # collision-ended transition must be terminal for the Bellman
            # target too — otherwise Q bootstraps from the frozen absorbing
            # collision state, which no update ever grounds
            out = dict(obs=obs["observation"], achieved=obs["achieved_goal"],
                       action=action, aux=aux, reward=reward,
                       terminated=jnp.where(done, False, term | trunc),
                       success=info["is_success"], collided=info["is_truncated"],
                       active=~done)
            if train:
                key, k_upd = jax.random.split(key)
                ts2, _k, m = update_fn(ts_c, buf, k_upd)
                return (states, obs, new_done, ep_len, ts2, key), (out, m)
            return (states, obs, new_done, ep_len, key), out

        key, k_reset = jax.random.split(key)
        states, obs0 = self.batch_reset(k_reset)
        done0 = jnp.zeros(self.n_envs, bool)
        ep_len0 = jnp.zeros(self.n_envs, jnp.int32)
        if train:
            (states, obs_f, done, ep_len, ts, key), (traj, ms) = jax.lax.scan(
                step_fn, (states, obs0, done0, ep_len0, ts, key),
                jnp.arange(T))
            metrics = jax.tree_util.tree_map(lambda v: v[-1], ms)
        else:
            (states, obs_f, done, ep_len, key), traj = jax.lax.scan(
                step_fn, (states, obs0, done0, ep_len0, key), jnp.arange(T))

        # episode tensors: (N, T+1, ...) observations incl. the initial one
        obs_seq = jnp.concatenate(
            [obs0["observation"][:, None], jnp.swapaxes(traj["obs"], 0, 1)], axis=1)
        ach_seq = jnp.concatenate(
            [obs0["achieved_goal"][:, None], jnp.swapaxes(traj["achieved"], 0, 1)],
            axis=1)
        episodes = dict(
            obs=obs_seq, achieved=ach_seq, desired=obs0["desired_goal"],
            action=jnp.swapaxes(traj["action"], 0, 1),
            aux=jnp.swapaxes(traj["aux"], 0, 1),
            ep_len=ep_len,
            terminated=jnp.swapaxes(traj["terminated"], 0, 1))
        stats = dict(
            success=jnp.any(traj["success"], axis=0).astype(jnp.float32),
            collided=jnp.any(traj["collided"], axis=0).astype(jnp.float32),
            ep_reward=jnp.sum(jnp.swapaxes(traj["reward"], 0, 1), axis=1),
            ep_len=ep_len.astype(jnp.float32))
        if train:
            return ts, episodes, stats, metrics, key
        return episodes, stats, key


# ---------------------------------------------------------------------------


@dataclass
class TrainerMetrics:
    history: List[Dict] = field(default_factory=list)

    def log(self, row: Dict):
        self.history.append(row)


class Trainer:
    """learn()/train_model() equivalent (setup_training.py:182-307)."""

    def __init__(self, config: TrainConfig,
                 make_env: Callable[[str, float, float], RobotTaskEnv],
                 logger=None, mesh=None):
        self.config = config
        self.make_env = make_env
        self.logger = logger
        self.mesh = mesh          # optional ("env",) device mesh: envs +
                                  # replay sharded, learner params replicated
        self.metrics = TrainerMetrics()
        self.learner = None
        self.ts = None
        self.buffer = None
        self.timesteps = 0
        self._best_eval_success = -1.0
        self._stage_index = 0
        self._resume = None       # pending full-state payload (load_full)

    # -------------------------------------------------------------- stages
    def learn(self, seed: Optional[int] = None):
        cfg = self.config
        key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        n_stages = len(cfg.stages)
        # full-state resume: skip completed stages but keep the key-split
        # sequence identical to the uninterrupted run's
        start_stage = self._resume["stage_index"] if self._resume else 0
        for i, stage in enumerate(cfg.stages):
            ee_thr = cfg.ee_error_thresholds[i]
            sp_thr = cfg.speed_thresholds[i] if cfg.goal_condition == "halt" else 0.5
            horizon = cfg.max_ep_steps[min(i, len(cfg.max_ep_steps) - 1)]
            succ_thr = cfg.success_thresholds[i]
            key, k = jax.random.split(key)
            if i < start_stage:
                continue
            self._stage_index = i
            reached = self.train_stage(stage, horizon, ee_thr, sp_thr,
                                       succ_thr, k,
                                       final=(i == n_stages - 1))
            print(f"[stage {stage}] done (threshold reached: {reached}); "
                  f"timesteps so far: {self.timesteps}")
            # per-stage learner snapshot (setup_training.py:299 model.save)
            run_dir = getattr(self.logger, "dir", None)
            if run_dir:
                self.save(os.path.join(run_dir,
                                       f"model_{stage_tag(stage)}_{i}.ckpt"))
        return self.ts

    def _ensure_learner(self, venv: VectorEnv, key):
        cfg = self.config
        if cfg.algorithm == "PPO":
            raise ValueError(
                "PPO is on-policy: use rl/ppo.py::train_ppo (the off-policy "
                "Trainer would feed it HER replay batches it cannot "
                "consume; the reference never wires PPO into its dispatch "
                "either, setup_training.py:100-115)")
        if self.learner is None:
            self.learner = make_learner(cfg.algorithm, venv.x_dim,
                                        venv.act_dim, cfg.hyperparams)
            if self.ts is None:  # not restored via load()
                self.ts = self.learner.init(key)
            if self.mesh is not None:
                from panda_gym_tpu.parallel.mesh import replicated
                self.ts = jax.device_put(self.ts, replicated(self.mesh))
        if self.buffer is None or self.buffer.ep_horizon < venv.horizon:
            cap_eps = max(getattr(cfg.hyperparams, "buffer_size", 300_000)
                          // max(venv.horizon, 1), venv.n_envs)
            if self.mesh is not None:  # episode axis must tile over devices
                n_dev = self.mesh.devices.size
                cap_eps = -(-cap_eps // n_dev) * n_dev
            aux_dim = int(jax.eval_shape(
                lambda s: venv.core.task.reward_aux(venv.core, s),
                venv.core._template).shape[0])
            self.buffer = her.create(cap_eps, venv.horizon, venv.obs_dim,
                                     venv.goal_dim, venv.act_dim, aux_dim)
            if self.mesh is not None:
                # episode-capacity axis sharded over devices; scalars repl.
                from panda_gym_tpu.parallel.mesh import (env_sharding,
                                                         replicated)
                es, rs = env_sharding(self.mesh), replicated(self.mesh)
                self.buffer = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, es if getattr(x, "ndim", 0)
                                             else rs), self.buffer)

    def train_stage(self, scenario: str, horizon: int, ee_thr: float,
                    sp_thr: float, success_threshold: float, key,
                    final: bool = False) -> bool:
        cfg = self.config
        core = self.make_env(scenario, ee_thr, sp_thr)
        venv = VectorEnv(core, cfg.n_envs, horizon, mesh=self.mesh)
        self._best_eval_success = -1.0  # per-stage, like the per-stage EvalCallback
        key, k_init = jax.random.split(key)
        self._ensure_learner(venv, k_init)
        learner = self.learner
        hp = cfg.hyperparams
        batch_size = getattr(cfg, "update_batch_size", None) or getattr(
            hp, "batch_size", 256)
        # update-to-data ratio: SB3's TQC preset (train_freq=8 vec-steps of 8
        # envs, gradient_steps=8, setup_training + hyperparameters.py:16-17)
        # performs 8 updates per 64 transitions = 0.125 updates/transition.
        # Keep that ratio independent of our (much larger) n_envs; cfg.utd
        # overrides it (e.g. fewer, larger-batch updates at big n_envs).
        utd = getattr(cfg, "utd", None)
        if utd is None:
            utd = getattr(hp, "gradient_steps", 8) / (
                max(getattr(hp, "train_freq", 8), 1) * 8.0)
        transitions_per_rollout = cfg.n_envs * horizon
        updates_per_rollout = max(int(utd * transitions_per_rollout), 1)
        # interleaved mode: one update burst after EVERY vector env step, so
        # the policy improves `horizon` times per episode batch — the fix for
        # the large-n_envs sample-efficiency stall (collect-then-update made
        # training effectively offline between policy improvements).
        interleave = getattr(cfg, "interleave_updates", True)
        n_upd_per_step = max(int(round(utd * cfg.n_envs)), 1)

        reward_fn = self._reward_fn(core)

        stage_steps = 0
        learning_started = False
        if self._resume is not None:
            # restore mid-stage position FIRST (before the prior bootstrap —
            # ADVICE r3: bootstrapping onto the template buffer and then
            # overwriting it with the restored one wasted whole rollouts):
            # counters, loop PRNG key, learner and buffer leaves grafted
            # onto the freshly built templates
            r, self._resume = self._resume, None
            stage_steps = int(r["stage_steps"])
            learning_started = bool(r["learning_started"])
            self._best_eval_success = float(r["best_eval_success"])
            key = jnp.asarray(np.asarray(r["key"]), jnp.uint32)

            def unpack(vals, meta, template, what):
                # zero-size leaves were stored as (shape, dtype) metadata
                # (orbax cannot serialise empty arrays); validate each
                # restored leaf against the template built from the current
                # config so a buffer_size/n_envs/net_arch mismatch fails
                # loudly instead of as an opaque jit error (ADVICE r3)
                t_leaves = jax.tree_util.tree_leaves(template)
                if len(t_leaves) != len(vals):
                    raise ValueError(
                        f"resume {what}: checkpoint has {len(vals)} leaves, "
                        f"config-built template has {len(t_leaves)} — "
                        f"config does not match the checkpointed run")
                out = []
                for i, (v, m, t) in enumerate(zip(vals, meta, t_leaves)):
                    leaf = (jnp.zeros(m[0], dtype=m[1]) if v is None
                            else jnp.asarray(v))
                    if tuple(leaf.shape) != tuple(t.shape) or \
                            leaf.dtype != t.dtype:
                        raise ValueError(
                            f"resume {what}: leaf {i} is "
                            f"{leaf.shape}/{leaf.dtype} in the checkpoint "
                            f"but {t.shape}/{t.dtype} under the current "
                            f"config (check buffer_size, n_envs, "
                            f"max_ep_steps, net_arch)")
                    out.append(leaf)
                return out

            self.ts = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.ts),
                unpack(r["ts_leaves"], r["ts_meta"], self.ts, "learner"))
            if r.get("buffer_leaves") is not None:
                self.buffer = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(self.buffer),
                    unpack(r["buffer_leaves"], r["buffer_meta"], self.buffer,
                           "buffer"))

        # Final stage: per-scene benchmark eval envs with best-model
        # snapshots (setup_training.py:255-290: 5 eval_benchmark_scenes,
        # an EvalSuccessCallback each, best_model_save_path per scene).
        bench_venvs = {}
        bench_best: Dict[str, float] = {}
        if final and cfg.benchmark_eval_scenes:
            for scene in cfg.benchmark_eval_scenes:
                bench_venvs[scene] = VectorEnv(
                    self.make_env(scene, ee_thr, sp_thr), cfg.n_envs,
                    horizon, mesh=self.mesh)
                bench_best[scene] = -1.0

        # optional NEO-prior bootstrap before any learning
        # (setup_training.py:219-222 -> imitation_learning.py:6-56): fires
        # whenever the replay buffer holds nothing yet — fresh runs AND
        # resumed fine-tunes started with --no-resume-buffer.
        if cfg.prior_steps > 0 and int(self.buffer.n_stored) == 0:
            from panda_gym_tpu.rl.imitation import fill_buffer_with_prior
            n_roll = max(1, -(-cfg.prior_steps // transitions_per_rollout))
            key, k_p = jax.random.split(key)
            self.buffer, _ = fill_buffer_with_prior(
                venv, self.buffer, k_p, n_rollouts=n_roll)

        @jax.jit
        def collect(ts, buf, key):
            episodes, stats, key = venv.rollout_episode(learner, ts, key)
            buf = her.add_episodes(buf, **episodes)
            return buf, stats, key

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

        # per-env-step burst for the fused rollout (rollout_train)
        def step_update(ts, buf, key):
            return update_burst(ts, buf, key, n_upd_per_step)

        @partial(jax.jit, static_argnums=())
        def update_many(ts, buf, key):
            return update_burst(ts, buf, key, updates_per_rollout)

        full_freq = getattr(cfg, "full_ckpt_freq", 0)
        t_start = time.time()
        # buffer-fill gate for interleaved bursts (round-3 incident: a
        # resumed policy on a fresh near-empty buffer collapsed 0.61->0.26
        # under interleaved updates).  Until the buffer holds enough
        # transitions, fall back to collect + one end-of-rollout burst.
        interleave_min = getattr(cfg, "interleave_min_buffer", None)
        if interleave_min is None:
            # Scale the gate with UPDATE PRESSURE, not just learning_starts
            # (ADVICE r4): the flat 20k floor permitted the documented
            # n_envs=512 resume collapse (32 upd/env-step against a
            # single-rollout fresh buffer, eval 0.38->0.07).  Each fused
            # env step consumes n_upd_per_step * batch_size samples; gate
            # until the buffer holds >= 8 such bursts' worth so early
            # interleaved updates cannot overfit a near-empty ring.
            interleave_min = max(2 * cfg.learning_starts, 20_000,
                                 8 * n_upd_per_step * batch_size)
        gate_open = False   # monotone: latch once open, no more host syncs

        def buffer_filled():
            nonlocal gate_open
            if gate_open:
                return True
            # a full episode ring is maximal attainable diversity — open the
            # gate even if short episodes keep the transition count under
            # interleave_min (capacity_episodes * mean_ep_len < the gate)
            gate_open = (
                int(self.buffer.n_stored) >= int(self.buffer.ep_len.shape[0])
                or int(jnp.sum(self.buffer.ep_len)) >= interleave_min)
            return gate_open

        while stage_steps < cfg.max_timesteps:
            key, k_c = jax.random.split(key)
            t_c = time.time()
            m = {}
            t_u = 0.0
            did_interleave = False
            if learning_started and interleave and buffer_filled():
                self.ts, self.buffer, stats, m, _ = venv.rollout_train(
                    learner, self.ts, self.buffer, k_c, step_update)
                m = {k: float(v) for k, v in m.items()}
                did_interleave = True
            else:
                self.buffer, stats, _ = collect(self.ts, self.buffer, k_c)
            rollout_steps = int(jnp.sum(stats["ep_len"]))
            t_c = time.time() - t_c
            stage_steps += rollout_steps
            self.timesteps += rollout_steps

            if (not learning_started
                    and stage_steps >= min(cfg.learning_starts,
                                           cfg.max_timesteps // 4)):
                learning_started = True
            if learning_started and not did_interleave:
                key, k_u = jax.random.split(key)
                t_u = time.time()
                self.ts, key, m = update_many(self.ts, self.buffer, k_u)
                m = {k: float(v) for k, v in m.items()}
                t_u = time.time() - t_u

            row = dict(
                scenario=scenario, timesteps=self.timesteps,
                stage_steps=stage_steps,
                rollout_success=float(jnp.mean(stats["success"])),
                rollout_collided=float(jnp.mean(stats["collided"])),
                rollout_reward=float(jnp.mean(stats["ep_reward"])),
                sps=self.timesteps / max(time.time() - t_start, 1e-9),
                t_collect=round(t_c, 4), t_update=round(t_u, 4),
                **m)
            self.metrics.log(row)
            if self.logger is not None:
                self.logger.log(row)

            # eval + stop-on-success-threshold (EvalSuccessCallback /
            # StopTrainingOnSuccessThreshold equivalents)
            if learning_started and stage_steps % max(cfg.eval_freq, 1) < rollout_steps:
                key, k_e = jax.random.split(key)
                sr = self.evaluate(venv, k_e,
                                   n_episodes=cfg.n_eval_episodes)
                self.metrics.log(dict(scenario=scenario, eval_success=sr,
                                      timesteps=self.timesteps))
                if self.logger is not None:
                    self.logger.log(dict(eval_success=sr, timesteps=self.timesteps))
                # best_model.ckpt on the stage's own scenario — the artifact
                # the reference's EvalCallback keeps as best_model.zip
                # (setup_training.py:277-279, load_model_utils.py:14-50);
                # guards against late-training policy collapse.
                run_dir = getattr(self.logger, "dir", None)
                if run_dir and sr > self._best_eval_success:
                    self._best_eval_success = sr
                    self.save(os.path.join(run_dir, "best_model.ckpt"))
                for scene, bvenv in bench_venvs.items():
                    key, k_b = jax.random.split(key)
                    bsr = self.evaluate(bvenv, k_b,
                                        n_episodes=cfg.n_eval_episodes)
                    row = {f"{scene}_eval_success": bsr,
                           "timesteps": self.timesteps}
                    self.metrics.log(dict(row, scenario=scenario))
                    if self.logger is not None:
                        self.logger.log(row)
                    if bsr > bench_best[scene] and run_dir:
                        bench_best[scene] = bsr
                        # best_model per scene (setup_training.py:277-279)
                        self.save(os.path.join(run_dir,
                                               f"best_model_{scene}.ckpt"))
                if sr >= success_threshold and not final:
                    return True

            # periodic full-training-state checkpoint (SURVEY §5.3): at the
            # end of a loop iteration, so resume continues with exactly the
            # next rollout the uninterrupted run would have collected
            if full_freq and stage_steps % full_freq < rollout_steps:
                run_dir = getattr(self.logger, "dir", None)
                if run_dir:
                    self._write_full_state(run_dir, stage_steps,
                                           learning_started, key)
        return False

    def _write_full_state(self, run_dir: str, stage_steps: int,
                          learning_started: bool, key) -> str:
        """Write learner + buffer + PRNG key + counters via the orbax
        CheckpointManager (rolling, keep=2) — everything needed for
        kill-and-resume to reproduce the uninterrupted run bit-exactly."""
        from panda_gym_tpu.rl.checkpoint import CheckpointManager
        mgr = CheckpointManager(os.path.join(run_dir, "full_state"), keep=2)

        def pack(tree):
            # orbax rejects zero-size arrays (e.g. the buffer's aux field
            # with aux_dim 0); store their shape/dtype instead
            leaves = jax.tree_util.tree_leaves(tree)
            vals = [None if x.size == 0 else jax.device_get(x)
                    for x in leaves]
            meta = [[list(x.shape), str(x.dtype)] if x.size == 0 else None
                    for x in leaves]
            return vals, meta

        ts_leaves, ts_meta = pack(self.ts)
        buf_leaves, buf_meta = (None, None) if self.buffer is None \
            else pack(self.buffer)
        payload = {
            "algorithm": self.config.algorithm,
            "timesteps": self.timesteps,
            "stage_index": self._stage_index,
            "stage_steps": stage_steps,
            "learning_started": learning_started,
            "best_eval_success": self._best_eval_success,
            "key": jax.device_get(key),
            "ts_leaves": ts_leaves, "ts_meta": ts_meta,
            "buffer_leaves": buf_leaves, "buffer_meta": buf_meta,
        }
        return mgr.save(self.timesteps, payload)

    def load_full(self, path: str):
        """Resume from a full-state checkpoint directory written by
        _write_full_state (tools/train.py --resume-full).  learn() then
        skips to the saved stage and continues mid-stage.  Limitations:
        final-stage per-scene bench_best high-water marks are not captured
        (best_model_<scene>.ckpt snapshots may re-save)."""
        from panda_gym_tpu.rl.checkpoint import load_checkpoint
        # accept either a specific ckpt_<step> dir or the full_state root
        entries = [d for d in os.listdir(path) if d.startswith("ckpt_")]
        if entries:
            _, best = max((int(d.split("_")[1]), d) for d in entries)
            path = os.path.join(path, best)
        payload = load_checkpoint(path)
        if payload.get("algorithm") != self.config.algorithm:
            raise ValueError(
                f"checkpoint algorithm {payload.get('algorithm')!r} != "
                f"config {self.config.algorithm!r}")
        self.timesteps = int(payload["timesteps"])
        self._resume = payload

    def _reward_fn(self, core):
        task = core.task

        def fn(achieved_next, goal, aux):
            return jax.vmap(lambda a, g, x: task.reward_from_aux(core, a, g, x))(
                achieved_next, goal, aux)
        return fn

    # ------------------------------------------------------------- eval
    def evaluate(self, venv: VectorEnv, key, n_episodes: int = 100) -> float:
        # NOTE: rollout_episode is already jit-cached per (learner, flags);
        # wrapping it in a fresh jax.jit here recompiled the whole eval
        # rollout on EVERY eval (~50 s each on the TPU tunnel).
        learner = self.learner
        rounds = max(1, int(np.ceil(n_episodes / venv.n_envs)))
        succ = []
        for _ in range(rounds):
            key, k = jax.random.split(key)
            _, stats, _ = venv.rollout_episode(
                learner, self.ts, k, deterministic=True)
            succ.append(np.asarray(stats["success"]))
        return float(np.mean(np.concatenate(succ)[:n_episodes]))

    # ------------------------------------------------------------- ckpt
    def save(self, path: str, include_buffer: bool = False):
        """Checkpoint for resume (continue_learning, setup_training.py:
        383-422): learner state + step counter, optionally the full replay
        buffer (large: capacity x obs_dim)."""
        import pickle
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {"ts": jax.device_get(self.ts),
                   "timesteps": self.timesteps,
                   "algorithm": self.config.algorithm}
        if include_buffer and self.buffer is not None:
            payload["buffer"] = jax.device_get(self.buffer)
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load(self, path: str, restore_buffer: bool = True):
        """restore_buffer=False starts fine-tuning with fresh replay — what
        the reference's continue_learning effectively does (its buffer
        reload is commented out, setup_training.py:80-82)."""
        import pickle
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if isinstance(payload, dict) and "ts" in payload:
            self.ts = payload["ts"]
            self.timesteps = payload.get("timesteps", 0)
            if restore_buffer and "buffer" in payload:
                self.buffer = payload["buffer"]
        else:  # legacy: raw TrainState pickle
            self.ts = payload
        # pre-gSDE checkpoints carry the legacy Gaussian actor even under
        # use_sde=True configs; align so _ensure_learner builds a matching
        # parameter tree.
        if self.learner is None and self.config.algorithm in (
                "SAC", "TQC", "TQC_v2"):
            from panda_gym_tpu.rl.learners import align_sde_with_ckpt
            align_sde_with_ckpt(self.config.hyperparams, self.ts)
