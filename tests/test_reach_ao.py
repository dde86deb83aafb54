"""ReachAO: scenario registry, observation modes, collision semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panda_gym_tpu.envs.tasks import reach_ao as rao
from panda_gym_tpu.rl.config import TrainConfig

# slow tier: each scenario variant compiles its own collision physics
pytestmark = pytest.mark.slow

ALL_SCENARIOS = [
    "reach1", "reach2", "reach3", "reachao1", "reachao2", "reachao3",
    "reachao_rand", "reachao_rand_start", "reachao_rand_shape",
    "wall", "showcase", "wang-3", "wangexp-3", "wangexp_3",
    "narrow_tunnel", "tunnel", "library", "library1", "library2",
    "workshop", "workshop2", "workshop3", "industrial", "kasys",
    "warehouse", "countertop", "kitchen", "raised_shelves",
    "tabletop", "tabletop2", "bookshelves",
]


def test_scenario_registry_complete():
    """Every scenario name in the reference's dispatch table
    (reach_ao.py:229-260) must resolve."""
    for name in ALL_SCENARIOS:
        spec = rao.get_scenario(name)
        assert spec is not None


def test_unknown_scenario_raises():
    with pytest.raises(ValueError):
        rao.get_scenario("nope")


@pytest.mark.parametrize("scenario", ["reachao1", "reachao_rand_shape", "tunnel"])
def test_reach_ao_rollout(scenario):
    env = rao.PandaReachAOEnv(scenario=scenario)
    obs, _ = env.reset(seed=0)
    assert obs["observation"].shape == (56,)  # 20 robot + 9 dist + 27 vectors
    for _ in range(10):
        obs, r, term, trunc, info = env.step(env.action_space.sample())
        assert np.isfinite(r)
        if term or trunc:
            obs, _ = env.reset()
    env.close()


def test_obs_modes_dims():
    dims = {"closest_per_link": 29, "closest": 21, "vectors": 47,
            "vectors+past": 101, "vectors+closest_per_link": 56}
    for mode, dim in dims.items():
        cfg = TrainConfig()
        cfg.task_observations = {"obstacles": mode, "prior": None}
        env = rao.PandaReachAOEnv(scenario="reachao1", config=cfg)
        obs, _ = env.reset(seed=1)
        assert obs["observation"].shape == (dim,), (mode, obs["observation"].shape)
        obs2, *_ = env.step(np.zeros(7, np.float32))
        assert obs2["observation"].shape == (dim,)
        env.close()


def test_collision_truncates_episode():
    """An obstacle placed on top of the arm must set is_collided and truncate
    (reach_ao.py:182-198 per-substep check, :1263-1264 truncation)."""
    env = rao.PandaReachAOEnv(scenario="reachao1")
    obs, _ = env.reset(seed=0)
    st = env.state
    # teleport the sphere onto link4's position
    import panda_gym_tpu.ops.kinematics as K
    fk = K.fk_world(env.robot.model, st.q)
    p = K.site_com_position(env.robot.model, fk, 3)
    st = st.replace(obstacle_pos=st.obstacle_pos.at[0].set(p))
    env._state = st
    obs, r, term, trunc, info = env.step(np.zeros(7, np.float32))
    assert trunc
    assert info["is_truncated"]
    # collision reward applied (sparse + truncate_on_collision)
    assert r <= -100.0
    env.close()


def test_goal_samples_collision_free():
    """Sampled goals keep a margin from the table (z >= 0) over many resets."""
    env = rao.PandaReachAOEnv(scenario="reachao3")
    for seed in range(8):
        obs, _ = env.reset(seed=seed)
        g = obs["desired_goal"]
        assert g[2] > 0.0, g
    env.close()


def test_obstacles_not_on_goal():
    env = rao.PandaReachAOEnv(scenario="reachao3")
    for seed in range(5):
        obs, _ = env.reset(seed=seed)
        st = env.state
        d = np.linalg.norm(np.asarray(st.obstacle_pos[:3]) - np.asarray(st.goal), axis=-1)
        assert (d > 0.05).all(), d
    env.close()


def test_random_num_obs_teleports_far():
    env = rao.PandaReachAOEnv(scenario="reachao_rand")
    counts = set()
    for seed in range(6):
        env.reset(seed=seed)
        pos = np.asarray(env.state.obstacle_pos[:6])
        near = (np.linalg.norm(pos, axis=-1) < 5).sum()
        counts.add(int(near))
    assert counts <= {4, 5}, counts  # sample_size_obs (4, 6) exclusive high
    assert len(counts) >= 1


def test_halt_goal_condition_latches():
    cfg = TrainConfig()
    cfg.goal_condition = "halt"
    env = rao.PandaReachAOEnv(scenario="reachao1", config=cfg)
    env.reset(seed=0)
    st = env.state
    # force goal at the EE -> reached with ~zero speed
    import panda_gym_tpu.ops.kinematics as K
    fk = K.fk_world(env.robot.model, st.q, st.qd)
    ee = K.site_com_position(env.robot.model, fk, 11)
    env._state = st.replace(goal=ee)
    obs, r, term, trunc, info = env.step(np.zeros(7, np.float32))
    assert info["is_success"]
    assert bool(env.state.goal_reached)
    env.close()


def test_batched_step_matches_per_env():
    """Full batched ReachAO step (scalarized collision physics + batch-native
    obs/reward assembly) must be numerically equivalent to vmap of the
    per-env path."""
    core = rao.make_reach_ao_core("reachao1")
    assert core.physics_step_batched is not None
    assert core.step_post_batched is not None
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, _ = jax.jit(jax.vmap(core.reset))(keys)
    rng = np.random.default_rng(5)
    s1, s2 = states, states
    f1 = jax.jit(jax.vmap(core.step))
    f2 = jax.jit(core.batched_step)
    for _ in range(2):
        a = jnp.asarray(rng.uniform(-1, 1, (B, core.robot.action_dim)),
                        jnp.float32)
        s1, o1, r1, t1, tr1, i1 = f1(s1, a)
        s2, o2, r2, t2, tr2, i2 = f2(s2, a)
        np.testing.assert_allclose(np.asarray(s1.q), np.asarray(s2.q),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(o1["observation"]),
                                   np.asarray(o2["observation"]), atol=5e-4)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
        assert (np.asarray(s1.is_collided) == np.asarray(s2.is_collided)).all()
        assert (np.asarray(i1["is_success"]) == np.asarray(i2["is_success"])).all()


def test_benchmark_scenarios_start_collision_free():
    """Regression: 'wall' buries link1/2 in its cuboid (reach_ao.py:457-468)
    and 'tunnel' ships with globalScaling=1.4 (tunnel.json) — with Bullet's
    convex-margin blindness and manifest scaling honored, a zero policy must
    survive the first steps instead of truncating immediately."""
    import jax.numpy as jnp

    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core

    for sc in ("wall", "tunnel", "narrow_tunnel"):
        core = make_reach_ao_core(sc)
        state, _ = jax.jit(core.reset)(jax.random.PRNGKey(0))
        step = jax.jit(core.step)
        for t in range(5):
            state, o, r, te, tr, info = step(
                state, jnp.zeros(core.robot.action_dim))
            assert not bool(state.is_collided), (sc, t)


def test_scenario_global_scaling_applied():
    """tunnel.json declares globalScaling=1.4; compiled boxes must be scaled
    (pybullet loadURDF semantics: origins+geometry scale, basePosition not)."""
    import json
    import os

    path = os.path.join(os.path.dirname(rao.__file__), "..", "..", "assets",
                        "scenarios_compiled.json")
    boxes = json.load(open(path))["scenarios"]["tunnel"]["boxes"]
    # unscaled bottom wall would be at x=0.325 half 0.15; scaled: 0.455/0.21
    xs = sorted(b[0] for b in boxes)
    assert abs(xs[0] - 0.455) < 1e-6, xs
    assert abs(boxes[0][3] - 0.21) < 1e-6 or abs(boxes[0][3] - 0.105) < 1e-6


def test_random_start_variant_spec():
    """`<scene>_rs` yields a random-start training variant of any scene:
    same geometry/goal space, start pose IK'd into the scene's goal region
    (generalizes the reference's per-scene robot_pose_randomizer,
    reach_ao.py:310-317,395-400)."""
    from dataclasses import asdict

    from panda_gym_tpu.envs.tasks.reach_ao import get_scenario

    for scene in ["tunnel", "library1", "wall"]:
        base = get_scenario(scene)
        rs = get_scenario(scene + "_rs")
        assert rs.randomize_robot_pose
        assert rs.pose_randomizer == ("ik_goal",)
        same = {k: v for k, v in asdict(base).items()
                if k not in ("randomize_robot_pose", "pose_randomizer")}
        same_rs = {k: v for k, v in asdict(rs).items()
                   if k not in ("randomize_robot_pose", "pose_randomizer")}
        assert same == same_rs


def test_wall_height_curriculum_variants():
    """wall_h1/wall_h2 keep everything canonical except the wall's z
    half-extent (obstacle-height curriculum for the wall scene)."""
    full = rao.get_scenario("wall")
    for name, h in [("wall_h1", 0.1), ("wall_h15", 0.15), ("wall_h2", 0.2),
                    ("wall_h22", 0.22)]:
        spec = rao.get_scenario(name)
        assert spec.cuboids == ((0.2, 0.05, h),)
        assert spec.goal_low == full.goal_low
        assert spec.goal_high == full.goal_high
        assert spec.neutral_joints == full.neutral_joints
        assert spec.cuboid_positions == full.cuboid_positions


def test_pose_prob_curriculum_variants():
    """`<scene>_pNN` randomizes the start pose in only NN% of episodes —
    the stage axis for pose-randomized scenes (reachao_rand_start)."""
    from dataclasses import asdict

    full = rao.get_scenario("reachao_rand_start")
    for name, p in [("reachao_rand_start_p25", 0.25),
                    ("reachao_rand_start_p50", 0.5),
                    ("reachao_rand_start_p75", 0.75)]:
        spec = rao.get_scenario(name)
        assert spec.pose_randomize_prob == p
        same = {k: v for k, v in asdict(spec).items()
                if k != "pose_randomize_prob"}
        assert same == {k: v for k, v in asdict(full).items()
                        if k != "pose_randomize_prob"}


def test_pose_prob_zero_starts_neutral():
    """p=0 must reduce to the fixed neutral start under jit/vmap."""
    import jax

    core = rao.make_reach_ao_core("reachao_rand_start_p0")
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    states, _ = jax.jit(jax.vmap(core.reset))(keys)
    neutral = jnp.asarray(core.robot.reset_q()[0])
    assert jnp.allclose(states.q, neutral[None, :])

    core_full = rao.make_reach_ao_core("reachao_rand_start")
    states_full, _ = jax.jit(jax.vmap(core_full.reset))(keys)
    # the full scene really randomizes: poses differ across the batch
    assert not jnp.allclose(states_full.q, neutral[None, :])


def test_obs_max_distance_caps_distance_observations():
    """task_observations['max_distance'] caps the per-link distance block of
    the observation (blind 999 readings otherwise blow up value nets); the
    default keeps the reference's raw 999.0 (reach_ao.py:907)."""
    from panda_gym_tpu.rl.config import TrainConfig

    import jax

    # wall: links buried in the cuboid read 999 under the blindness rule
    core_raw = rao.make_reach_ao_core(scenario="wall")
    state, obs = core_raw.reset(jax.random.PRNGKey(0))
    n_robot = 20
    gd_block = np.asarray(obs["observation"][n_robot:n_robot + 9])
    assert gd_block.max() > 900.0

    cfg = TrainConfig()
    cfg.task_observations = dict(cfg.task_observations, max_distance=2.0)
    core_cap = rao.make_reach_ao_core(scenario="wall", config=cfg)
    state, obs = core_cap.reset(jax.random.PRNGKey(0))
    gd_block = np.asarray(obs["observation"][n_robot:n_robot + 9])
    assert gd_block.max() <= 2.0 + 1e-6
    # unaffected parts (vectors) still present
    assert obs["observation"].shape == (56,)


def test_wangexp3_equals_reachao3_under_default_config():
    """Documented parity quirk: the reference's create_scenario_wang_
    experimental ("wangexp-3", reach_ao.py:701-722) differs from
    create_scenario_reachao3 (:573-585) only in robot_pose_randomizer
    (inert unless config.randomize_robot_pose) and sample_size_obs (inert
    while random_num_obs=False) — so under the default config the two
    scenes produce identical episode distributions, and deterministic
    seeded runs on them are bit-identical.  Pin the functional equality so
    a future spec edit that breaks it is deliberate."""
    a = rao.get_scenario("reachao3")
    b = rao.get_scenario("wangexp-3")
    assert a.goal_sampler == b.goal_sampler
    assert a.obstacle_sampler == b.obstacle_sampler
    assert a.spheres == b.spheres
    assert a.randomize_obstacle_position == b.randomize_obstacle_position
    assert a.random_num_obs is b.random_num_obs is False
    # the two inert-by-default knobs that DO differ:
    assert a.pose_randomizer != b.pose_randomizer
    assert b.sample_size_obs == (3, 3)


def test_mixture_core_resets_across_scenarios():
    """'+'-joined scenario names build the multi-scene mixture env: obstacle
    arrays padded to a shared capacity, per-env scenario draw at reset."""
    core = rao.make_reach_ao_core("reachao1+wall+narrow_tunnel")
    # capacity = narrow_tunnel's 3 static boxes + goal probe minimum
    caps = [rao.make_reach_ao_core(s).task.n_obstacles
            for s in ("reachao1", "wall", "narrow_tunnel")]
    assert core.task.n_obstacles == max(caps)

    keys = jax.random.split(jax.random.PRNGKey(0), 24)
    states, obs = jax.jit(jax.vmap(core.reset))(keys)
    assert obs["observation"].shape == (24, 56)
    # different scenarios produce visibly different obstacle rosters:
    # reachao1 = 1 active sphere, wall = 1 active box, narrow_tunnel = 3 boxes
    n_active = np.asarray(jnp.sum(states.obstacle_active, axis=1))
    assert set(n_active.tolist()) >= {1, 3}, n_active
    # batched step runs the shared physics over the mixed batch
    actions = jnp.zeros((24, core.robot.action_dim))
    states2, obs2, r, term, trunc, info = jax.jit(core.batched_step)(
        states, actions)
    assert np.all(np.isfinite(np.asarray(obs2["observation"])))


def test_mixture_reset_matches_member_distribution():
    """A mixture env's per-scenario resets are the member scenarios' own
    resets (same sub-key), so episodes drawn for scenario i are
    distributionally identical to single-scene training.  Tolerance is
    float-noise only: lax.switch may reorder fused ops inside a branch."""
    mix = rao.make_reach_ao_core("reachao1+wall")
    solo = rao.make_reach_ao_core("wall", capacity=mix.task.n_obstacles)
    # find a key that selects scenario index 1 (wall)
    for seed in range(20):
        key = jax.random.PRNGKey(seed)
        k_sel, k_reset = jax.random.split(key)
        if int(jax.random.randint(k_sel, (), 0, 2)) == 1:
            s_mix, o_mix = mix.reset(key)
            s_solo, o_solo = solo.reset(k_reset)
            np.testing.assert_allclose(np.asarray(o_mix["observation"]),
                                       np.asarray(o_solo["observation"]),
                                       rtol=0, atol=1e-6)
            return
    raise AssertionError("no seed selected scenario 1")


def test_moving_obstacles_translate_and_collide():
    """randomize_obstacle_velocity must be live end-to-end: obstacles get a
    velocity at reset (reference reach_ao.py:997-1001 set_random_obs_velocity,
    range +-0.2, :151-152), the engine integrates it every substep (PyBullet
    integrates base velocities, :1091-1095), and a moving obstacle can cause
    a collision truncation."""
    cfg = TrainConfig(randomize_obstacle_velocity=True)
    core = rao.make_reach_ao_core("reachao1", config=cfg)
    assert core.task.moving_obstacles is True

    state, obs = jax.jit(core.reset)(jax.random.PRNGKey(0))
    vel = np.asarray(state.obstacle_vel[0])
    assert 0.0 < np.linalg.norm(vel) <= np.linalg.norm([0.2, 0.2, 0.2])

    # velocities integrate: |dp| == |v| * n_steps * dt
    p0 = np.asarray(state.obstacle_pos[0])
    step = jax.jit(core.step)
    s = state
    for _ in range(5):
        s, *_ = step(s, jnp.zeros(core.robot.action_dim))
    dp = np.linalg.norm(np.asarray(s.obstacle_pos[0]) - p0)
    np.testing.assert_allclose(dp, np.linalg.norm(vel) * 5 * (core.n_substeps / 500.0),
                               rtol=1e-4)

    # a sphere steered straight at the robot base column truncates the
    # episode via the per-substep collision latch
    fk_ee = np.asarray(obs["achieved_goal"])
    aim = state.replace(
        obstacle_pos=state.obstacle_pos.at[0].set(
            jnp.asarray(fk_ee + np.array([0.3, 0.0, 0.0]), jnp.float32)),
        obstacle_vel=state.obstacle_vel.at[0].set(
            jnp.asarray([-0.75, 0.0, 0.0], jnp.float32)))
    s = aim
    truncated = False
    for _ in range(20):
        s, o, r, term, trunc, info = step(s, jnp.zeros(core.robot.action_dim))
        if bool(trunc):
            truncated = True
            break
    assert truncated, "moving obstacle never caused a collision truncation"


def test_static_scenarios_unaffected_by_velocity_default():
    """Default config keeps obstacles static (obstacle_vel zero or unused)."""
    core = rao.make_reach_ao_core("reachao1")
    assert core.task.moving_obstacles is False
    state, _ = jax.jit(core.reset)(jax.random.PRNGKey(0))
    p0 = np.asarray(state.obstacle_pos[0])
    s = state
    step = jax.jit(core.step)
    for _ in range(3):
        s, *_ = step(s, jnp.zeros(core.robot.action_dim))
    np.testing.assert_allclose(np.asarray(s.obstacle_pos[0]), p0, atol=1e-6)
