"""gymnasium.vector API over the batched core (envs/vector_adapter.py)."""
import gymnasium as gym
import numpy as np
import pytest

import panda_gym_tpu

# slow tier: gym vector adapter compiles the batched step
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def venv():
    panda_gym_tpu.register_envs(5)  # short TimeLimit to exercise autoreset
    v = gym.make_vec("PandaReach-v3", num_envs=4)
    yield v
    v.close()


def test_make_vec_uses_vector_entry_point(venv):
    from panda_gym_tpu.envs.vector_adapter import JaxVectorEnv
    assert isinstance(venv.unwrapped, JaxVectorEnv)
    assert venv.num_envs == 4


def test_vector_reset_and_step_shapes(venv):
    obs, info = venv.reset(seed=0)
    assert obs["observation"].shape == (4, 6)
    assert obs["achieved_goal"].shape == (4, 3)
    actions = np.zeros((4, 7), np.float32)
    obs, reward, term, trunc, info = venv.step(actions)
    assert obs["observation"].shape == (4, 6)
    assert reward.shape == (4,)
    assert term.dtype == bool and trunc.dtype == bool
    assert "is_success" in info


def test_vector_next_step_autoreset(venv):
    """NEXT_STEP semantics: TimeLimit(5) truncates on step 5; step 6 resets —
    reward 0, no flags, fresh observation."""
    obs, _ = venv.reset(seed=1)
    actions = np.zeros((4, 7), np.float32)
    for t in range(5):
        obs, reward, term, trunc, info = venv.step(actions)
    ended = term | trunc
    assert ended.all(), (term, trunc)  # TimeLimit hits every env at t=5
    obs_final = obs["observation"].copy()

    obs, reward, term, trunc, info = venv.step(actions)
    assert not term.any() and not trunc.any()
    assert (reward == 0.0).all()
    # a reset redraws the goal: desired_goal changes for every env
    assert not np.allclose(obs["observation"], obs_final)


def test_vector_episode_after_autoreset_runs_full_length(venv):
    venv.reset(seed=2)
    actions = np.zeros((4, 7), np.float32)
    for _ in range(6):  # 5 steps + reset step
        _, _, term, trunc, _ = venv.step(actions)
    # fresh episode: needs another 5 steps before the next truncation
    for t in range(5):
        _, _, term, trunc, _ = venv.step(actions)
        ended = term | trunc
        if t < 4:
            assert not ended.any()
    assert ended.all()


def test_vector_seed_determinism():
    panda_gym_tpu.register_envs(10)
    v1 = gym.make_vec("PandaReachJoints-v3", num_envs=3)
    v2 = gym.make_vec("PandaReachJoints-v3", num_envs=3)
    o1, _ = v1.reset(seed=7)
    o2, _ = v2.reset(seed=7)
    np.testing.assert_array_equal(o1["observation"], o2["observation"])
    a = np.full((3, 7), 0.3, np.float32)
    s1 = v1.step(a)
    s2 = v2.step(a)
    np.testing.assert_array_equal(s1[0]["observation"], s2[0]["observation"])
    np.testing.assert_array_equal(s1[1], s2[1])
    v1.close()
    v2.close()
