"""Multi-device sharding tests on the 8-device virtual CPU mesh (conftest).

The reference has no distributed tests at all (SURVEY §4); these validate the
TPU-native replacement for SubprocVecEnv: env batches sharded over an
("env",) mesh axis produce bitwise-identical results to unsharded execution,
and the Trainer runs end-to-end with envs + replay sharded.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panda_gym_tpu.parallel.mesh import (env_sharding, make_env_mesh,
                                         shard_env_batch)

# slow tier: sharded Trainer runs on the 8-device mesh
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_env_mesh(8)


def test_sharded_step_matches_unsharded(mesh):
    from panda_gym_tpu.envs.panda_tasks import make_reach_core

    core = make_reach_core()
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, _ = jax.jit(jax.vmap(core.reset))(keys)
    actions = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (B, core.robot.action_dim)),
        jnp.float32)

    s1, o1, r1, *_ = jax.jit(core.batched_step)(states, actions)

    states_sh = shard_env_batch(states, mesh)
    actions_sh = jax.device_put(actions, env_sharding(mesh))
    s2, o2, r2, *_ = jax.jit(core.batched_step)(states_sh, actions_sh)

    # tight tolerance, not bitwise: per-env math is independent of the
    # partitioning, but XLA vectorizes the (16,)- vs (2,)-row kernels
    # differently (FMA order), which moves low-order bits
    np.testing.assert_allclose(np.asarray(o1["observation"]),
                               np.asarray(o2["observation"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.q), np.asarray(s2.q), atol=1e-6)
    # and the outputs must actually be distributed
    assert len(s2.q.sharding.device_set) == 8


def test_trainer_runs_sharded(mesh):
    from panda_gym_tpu.envs.panda_tasks import make_reach_core
    from panda_gym_tpu.rl.config import Hyperparameters, TrainConfig
    from panda_gym_tpu.rl.train import Trainer

    cfg = TrainConfig(
        algorithm="SAC", n_envs=16,
        stages=["reach"], success_thresholds=[2.0],
        ee_error_thresholds=[0.05], speed_thresholds=[0.5],
        max_ep_steps=[4], max_timesteps=150,
        learning_starts=30, eval_freq=10_000, n_eval_episodes=16,
    )
    cfg.hyperparams = Hyperparameters("SAC")
    cfg.hyperparams.buffer_size = 2_000
    tr = Trainer(cfg, make_env=lambda sc, t, s: make_reach_core(),
                 mesh=mesh)
    tr.learn(seed=0)
    assert tr.timesteps >= 150
    rows = [r for r in tr.metrics.history if "rollout_success" in r]
    assert rows and all(np.isfinite(r["rollout_reward"]) for r in rows)
    # replay buffer episode axis is sharded over the mesh
    assert len(tr.buffer.obs.sharding.device_set) == 8


def test_global_metric_mean_matches_host(mesh):
    from panda_gym_tpu.parallel import mesh as M

    x = jnp.arange(64, dtype=jnp.float32)
    tree = {"a": x, "b": x * 2}
    sharded = M.shard_env_batch(tree, mesh)
    out = M.global_metric_mean(sharded, mesh)
    assert np.allclose(out["a"], x.mean())
    assert np.allclose(out["b"], 2 * x.mean())


def test_initialize_multihost_noop_single_process():
    from panda_gym_tpu.parallel.mesh import initialize_multihost

    assert initialize_multihost() == 1
