"""Actor-only policy export/import round-trip (rl/policy_io.py).

The exported .policy.npz must reproduce the checkpoint's actions exactly:
evaluation only reads ts.actor_params (eval/benchmark.py _member_actions),
so grafting the exported actor onto a fresh template TrainState must give
bit-identical deterministic actions.
"""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panda_gym_tpu.rl.config import Hyperparameters
from panda_gym_tpu.rl.learners import make_learner
from panda_gym_tpu.rl.policy_io import (export_policy, graft_actor,
                                        load_policy)


@pytest.mark.parametrize("algorithm", ["TQC", "TD3"])
def test_export_roundtrip_bit_exact(tmp_path, algorithm):
    hp = Hyperparameters(algorithm)
    learner = make_learner(algorithm, 32, 7, hp)
    ts = learner.init(jax.random.PRNGKey(3))

    ckpt = tmp_path / "best_model.ckpt"
    with open(ckpt, "wb") as f:
        pickle.dump({"ts": jax.device_get(ts), "timesteps": 123,
                     "algorithm": algorithm}, f)

    class Cfg:
        pass
    cfg = Cfg()
    cfg.algorithm = algorithm
    cfg.hyperparams = hp
    out = export_policy(str(ckpt), str(tmp_path / "best_model.policy"),
                        config=cfg)
    assert out.endswith(".npz")
    # the export must be materially smaller than the full checkpoint
    assert os.path.getsize(out) < os.path.getsize(ckpt)

    actor, meta = load_policy(out)
    assert meta["algorithm"] == algorithm
    assert meta["timesteps"] == 123

    template = learner.init(jax.random.PRNGKey(99))  # different init
    ts2 = graft_actor(template, actor)

    x = jax.random.normal(jax.random.PRNGKey(7), (5, 32))
    k = jax.random.PRNGKey(0)
    a1 = learner.act(ts, x, k, deterministic=True)
    a2 = learner.act(ts2, x, k, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_graft_rejects_shape_mismatch(tmp_path):
    hp = Hyperparameters("TQC")
    learner = make_learner("TQC", 32, 7, hp)
    ts = learner.init(jax.random.PRNGKey(0))
    ckpt = tmp_path / "m.ckpt"
    with open(ckpt, "wb") as f:
        pickle.dump({"ts": jax.device_get(ts), "algorithm": "TQC"}, f)
    out = export_policy(str(ckpt), str(tmp_path / "m.policy"))
    actor, _ = load_policy(out)

    other = make_learner("TQC", 48, 7, hp)   # different obs dim
    template = other.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        graft_actor(template, actor)


def test_meta_records_sde_actor(tmp_path):
    hp = Hyperparameters("TQC")
    assert hp.use_sde
    learner = make_learner("TQC", 16, 7, hp)
    ts = learner.init(jax.random.PRNGKey(0))
    ckpt = tmp_path / "m.ckpt"
    with open(ckpt, "wb") as f:
        pickle.dump({"ts": jax.device_get(ts), "algorithm": "TQC"}, f)
    out = export_policy(str(ckpt), str(tmp_path / "m.policy"))
    _, meta = load_policy(out)
    assert meta["use_sde"] is True
