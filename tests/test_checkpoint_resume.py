"""Full-training-state checkpoint/resume (SURVEY §5.3).

The reference's only recovery is manual best_model.zip reloading
(continue_learning, setup_training.py:383-422) — learner weights only, no
buffer, no RNG, no position in the curriculum.  Here `full_ckpt_freq`
writes rolling orbax checkpoints of the COMPLETE training state (learner,
replay buffer, loop PRNG key, stage index, stage/step counters), and
kill-and-resume must reproduce the uninterrupted run's metric curve
exactly.
"""
import os

import numpy as np
import pytest

from panda_gym_tpu.envs.panda_tasks import make_reach_core
from panda_gym_tpu.rl.config import TrainConfig
from panda_gym_tpu.rl.train import Trainer

# slow tier: two full Trainer runs (~6 min)
pytestmark = pytest.mark.slow


class _DirLogger:
    """Minimal logger exposing the run dir (what Trainer keys off)."""

    def __init__(self, d):
        self.dir = str(d)

    def log(self, row):
        pass


def _cfg():
    cfg = TrainConfig()
    cfg.n_envs = 4
    cfg.stages = ["s0"]
    cfg.success_thresholds = [2.0]
    cfg.max_ep_steps = [5]
    cfg.ee_error_thresholds = [0.05]
    cfg.max_timesteps = 60
    cfg.learning_starts = 10
    cfg.eval_freq = 10_000        # no eval rows; rollout rows only
    cfg.full_ckpt_freq = 20       # one full-state ckpt per rollout
    return cfg


MK = staticmethod(lambda s, e, sp: make_reach_core(reward_type="dense"))


def _rows(tr):
    return [(r["timesteps"], r["rollout_reward"], r["rollout_success"])
            for r in tr.metrics.history if "rollout_reward" in r]


def test_kill_and_resume_reproduces_run(tmp_path):
    cfg = _cfg()
    mk = lambda s, e, sp: make_reach_core(reward_type="dense")

    # uninterrupted run A, writing full-state checkpoints as it goes
    tr_a = Trainer(cfg, mk, logger=_DirLogger(tmp_path / "a"))
    tr_a.learn(seed=0)
    rows_a = _rows(tr_a)
    assert len(rows_a) == 3  # 3 rollouts of 20 steps

    root = os.path.join(str(tmp_path / "a"), "full_state")
    ckpts = sorted(os.listdir(root), key=lambda d: int(d.split("_")[1]))
    assert ckpts, "no full-state checkpoints written"
    # resume from the EARLIEST kept checkpoint (simulating a kill right
    # after it was written)
    first = os.path.join(root, ckpts[0])
    step0 = int(ckpts[0].split("_")[1])

    tr_b = Trainer(cfg, mk, logger=_DirLogger(tmp_path / "b"))
    tr_b.load_full(first)
    assert tr_b.timesteps == step0
    tr_b.learn(seed=0)
    rows_b = _rows(tr_b)

    tail_a = [r for r in rows_a if r[0] > step0]
    assert len(rows_b) == len(tail_a)
    for (t_a, rew_a, suc_a), (t_b, rew_b, suc_b) in zip(tail_a, rows_b):
        assert t_a == t_b
        assert suc_a == suc_b
        np.testing.assert_allclose(rew_a, rew_b, rtol=0, atol=0)

    # learner params identical at the end of both runs
    import jax
    for la, lb in zip(jax.tree_util.tree_leaves(tr_a.ts),
                      jax.tree_util.tree_leaves(tr_b.ts)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_load_full_rejects_algorithm_mismatch(tmp_path):
    cfg = _cfg()
    mk = lambda s, e, sp: make_reach_core(reward_type="dense")
    tr = Trainer(cfg, mk, logger=_DirLogger(tmp_path / "a"))
    tr.learn(seed=0)
    root = os.path.join(str(tmp_path / "a"), "full_state")

    cfg2 = _cfg()
    cfg2.algorithm = "TD3"
    from panda_gym_tpu.rl.config import Hyperparameters
    cfg2.hyperparams = Hyperparameters("TD3")
    tr2 = Trainer(cfg2, mk)
    with pytest.raises(ValueError):
        tr2.load_full(root)
