"""Env API conformance + seed determinism + physics golden values.

Mirrors the reference test strategy (test/envs_test.py random-rollout API
checks, test/seed_test.py same-seed determinism — upgraded to bitwise,
test/pybullet_test.py:56-64 free-fall golden value)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import panda_gym_tpu
from panda_gym_tpu.envs import panda_tasks

# slow tier: random-rollout conformance compiles every registered env family
pytestmark = pytest.mark.slow

ENV_IDS = [
    "PandaReach-v3", "PandaReachDense-v3", "PandaReachJoints-v3",
    "PandaReachChecker-v3",
    "PandaPush-v3", "PandaPushDense-v3",
    "PandaSlide-v3",
    "PandaPickAndPlace-v3",
    "PandaStack-v3",
    "PandaFlip-v3",
    "MyCobotReach-v0",
]


@pytest.fixture(scope="module")
def gym():
    import gymnasium
    panda_gym_tpu.register_envs(50)
    return gymnasium


def run_env(env, n_steps=30):
    """reference test/envs_test.py:6-14 run_env helper."""
    obs, _ = env.reset()
    for _ in range(n_steps):
        action = env.action_space.sample()
        obs, reward, terminated, truncated, info = env.step(action)
        # The reference declares Box(-10, 10) obs spaces (core.py:274-280) but
        # never enforces containment — its own Flip env exceeds them (object
        # angular velocity, flip.py:55, unscaled).  Match that contract: check
        # structure + finiteness, not the advisory bounds.
        for key, space in env.observation_space.spaces.items():
            assert obs[key].shape == space.shape, (key, obs[key].shape)
            assert obs[key].dtype == space.dtype, (key, obs[key].dtype)
            assert np.all(np.isfinite(obs[key])), (key, obs[key])
        assert np.isfinite(reward)
        if terminated or truncated:
            obs, _ = env.reset()
    env.close()


@pytest.mark.parametrize("env_id", ENV_IDS)
def test_env_rollout(gym, env_id):
    run_env(gym.make(env_id))


def test_seed_determinism_bitwise(gym):
    """Same seed + same action script twice -> bitwise-equal observations
    (seed_test.py contract, upgraded from allclose to exact equality)."""
    for env_id in ["PandaReach-v3", "PandaPush-v3", "PandaPickAndPlace-v3"]:
        env = gym.make(env_id)
        rng = np.random.default_rng(0)
        actions = [rng.uniform(-1, 1, env.action_space.shape).astype(np.float32)
                   for _ in range(6)]
        finals = []
        for _ in range(2):
            obs, _ = env.reset(seed=12345)
            for a in actions:
                obs, *_ = env.step(a)
            finals.append(obs)
        for k in finals[0]:
            assert np.array_equal(finals[0][k], finals[1][k]), (env_id, k)
        env.close()


def test_different_seeds_differ(gym):
    env = gym.make("PandaReach-v3")
    o1, _ = env.reset(seed=1)
    o2, _ = env.reset(seed=2)
    assert not np.array_equal(o1["desired_goal"], o2["desired_goal"])
    env.close()


def test_save_restore_state_exact(gym):
    """save -> step -> restore -> same action gives exactly equal obs
    (test/save_and_restore_test.py:9-37, exact equality)."""
    env = gym.make("PandaPush-v3").unwrapped
    env.reset(seed=7)
    sid = env.save_state()
    a = np.full(env.action_space.shape, 0.3, np.float32)
    obs1, *_ = env.step(a)
    env.step(a)
    env.restore_state(sid)
    obs2, *_ = env.step(a)
    for k in obs1:
        assert np.array_equal(obs1[k], obs2[k]), k
    env.remove_state(sid)
    with pytest.raises(KeyError):
        env.restore_state(sid)


def test_free_fall_golden_value():
    """A free body reaches v_z ~= -0.392 after one env step (20 x 1/500 s),
    the reference's golden value (test/pybullet_test.py:56-64)."""
    from panda_gym_tpu.sim.state import build_scene, SHAPE_BOX
    from panda_gym_tpu.sim import engine
    from panda_gym_tpu.envs.robot import PandaRobot, PandaConfig

    robot = PandaRobot(PandaConfig(block_gripper=True))
    scene = build_scene(
        [dict(shape=SHAPE_BOX, size=(0.5, 0.5, 0.5), mass=1.0)],
        1.0, 1.0, 0.4, plane_z=-10.0)
    step = engine.make_physics_step(robot.model, scene, robot_contact=False)

    core = panda_tasks.make_push_core()
    state = core.init_state(jax.random.PRNGKey(0))
    state = state.replace(body_pos=jnp.array([[3.0, 3.0, 5.0]]))  # in the air
    state = jax.jit(step)(state)
    vz = float(state.body_vel[0, 2])
    np.testing.assert_allclose(vz, -0.392, atol=1e-3)


def test_dt_semantics():
    """dt = 20 * 1/500 = 0.04 (pybullet.py:63-66, test asserted :30-35)."""
    from panda_gym_tpu.sim.engine import TIMESTEP
    assert TIMESTEP * 20 == 0.04


def test_ee_control_mode(gym):
    """'ee' control moves the EE roughly along the commanded displacement."""
    env = gym.make("PandaReach-v3", control_type="ee")
    obs, _ = env.reset(seed=3)
    start = obs["achieved_goal"].copy()
    for _ in range(10):
        obs, *_ = env.step(np.array([1.0, 0.0, 0.0], np.float32))
    moved = obs["achieved_goal"] - start
    assert moved[0] > 0.1, moved  # moved towards +x
    # z tolerance covers the gravity sag of consecutive max-displacement IK
    # targets (measured 0.128 under the round-4 warm-started motor chain,
    # 0.11 under the cold chain; golden parity is pinned elsewhere)
    assert abs(moved[1]) < 0.08 and abs(moved[2]) < 0.15, moved
    env.close()


def test_fingers_open_close():
    """Prismatic gripper variant: finger action opens the gripper."""
    import gymnasium
    panda_gym_tpu.register_envs(50)
    env = gymnasium.make("PandaPickAndPlace-v3")
    obs, _ = env.reset(seed=5)
    w0 = obs["observation"][6]
    for _ in range(5):
        obs, *_ = env.step(np.array([0, 0, 0, 1.0], np.float32))
    w_open = obs["observation"][6]
    assert w_open > w0 + 0.02, (w0, w_open)
    for _ in range(8):
        obs, *_ = env.step(np.array([0, 0, 0, -1.0], np.float32))
    w_closed = obs["observation"][6]
    assert w_closed < w_open - 0.02, (w_open, w_closed)
    env.close()


def test_object_rests_on_table(gym):
    """A spawned cube must settle at z ~= half size, not sink or explode."""
    env = gym.make("PandaPush-v3")
    obs, _ = env.reset(seed=11)
    for _ in range(10):
        obs, *_ = env.step(np.zeros(env.action_space.shape, np.float32))
    z = obs["achieved_goal"][2]
    assert 0.012 < z < 0.028, z
    env.close()


def test_bound_robot_reference_getters():
    """GymAdapter.robot exposes the reference's Panda getter surface
    (panda.py:264-317, core.py:105-209) bound to the live state."""
    import gymnasium as gym
    import panda_gym_tpu
    panda_gym_tpu.register_envs(max_ep_steps=50)
    env = gym.make("PandaReach-v3").unwrapped
    env.reset(seed=3)
    r = env.robot
    p0 = r.get_ee_position()
    assert p0.shape == (3,) and np.all(np.isfinite(p0))
    assert r.get_ee_velocity().shape == (3,)
    assert isinstance(r.get_fingers_width(), float)
    assert r.get_manipulability() > 0.0
    assert isinstance(r.get_joint_angle(0), float)
    assert isinstance(r.get_joint_velocity(0), float)
    assert r.get_obs().shape[0] >= 6
    assert r.action_dim == env.action_space.shape[0]  # delegation intact
    q = r.inverse_kinematics(r.ee_site, np.array([0.3, 0.0, 0.3]))
    assert np.all(np.isfinite(q))
    env.step(env.action_space.sample())
    p1 = env.robot.get_ee_position()
    r.set_joint_neutral()  # mutates live state
    p2 = env.robot.get_ee_position()
    assert not np.allclose(p1, p2) or np.allclose(p0, p1)
