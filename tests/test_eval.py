"""Eval subsystem: trajectory traces, rendering, benchmark schema.

Covers the offline equivalents of the reference's GUI-side eval tooling
(evaluation/evaluate.py:43-86 visualize_trajectory; perform_benchmark
results schema evaluate.py:286-300)."""
import jax
import numpy as np
import pytest

from panda_gym_tpu.envs.panda_tasks import make_reach_core


@pytest.fixture(scope="module")
def reach_core():
    return make_reach_core()


def _random_policy(core):
    def pol(obs, key):
        return jax.random.uniform(key, (core.robot.action_dim,),
                                  minval=-1.0, maxval=1.0)
    return pol


def test_trace_episode_and_roundtrip(reach_core, tmp_path):
    from panda_gym_tpu.eval.trajectory import (
        load_traces, save_traces, trace_episode)

    core = reach_core
    state, trace = trace_episode(core, _random_policy(core),
                                 jax.random.PRNGKey(0), n_steps=10)
    assert trace["ee"].shape == (11, 3)
    assert trace["speed"].shape == (11,)
    assert trace["reward"].shape == (10,)
    assert np.all(np.isfinite(trace["ee"]))
    # ee actually moves under random actions
    assert np.linalg.norm(trace["ee"][-1] - trace["ee"][0]) > 1e-4

    p = str(tmp_path / "traces.npz")
    save_traces(p, [trace, trace])
    back = load_traces(p)
    assert len(back) == 2
    np.testing.assert_array_equal(back[0]["ee"], trace["ee"])


def test_draw_traces_overlay(reach_core):
    from panda_gym_tpu.eval.trajectory import draw_traces, trace_episode

    core = reach_core
    state, trace = trace_episode(core, _random_policy(core),
                                 jax.random.PRNGKey(1), n_steps=8)
    img_plain = draw_traces(core, state, [])
    img = draw_traces(core, state, [trace])
    assert img.shape == (480, 720, 3) and img.dtype == np.uint8
    # the polyline overlay must actually change pixels
    assert (img != img_plain).any()


def test_render_state_smoke(reach_core):
    from panda_gym_tpu.render import render_state

    core = reach_core
    state, _ = core.reset(jax.random.PRNGKey(0))
    img = render_state(core, state, width=160, height=120)
    assert img.shape == (120, 160, 3)
    # scene is not a flat background
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 4


def test_goal_maker_frozen_sets(tmp_path):
    """make_scenario_goals: deterministic frozen goal sets per scenario
    (reference evaluation/goal_maker.py:14-29)."""
    from panda_gym_tpu.eval.goal_maker import make_scenario_goals

    a = make_scenario_goals(["wangexp_3"], n_goals=16, seed=3)
    b = make_scenario_goals(["wangexp_3"], n_goals=16, seed=3)
    assert a == b
    goals = np.asarray(a["wangexp_3"])
    assert goals.shape == (16, 3)
    # hollow-sphere sampler: radii in [0.5, 0.8] (reach_ao.py:573-585)
    r = np.linalg.norm(goals - np.array([0.0, 0.0, 0.333]), axis=1)
    assert (r > 0.3).all() and (r < 1.0).all()
    # different seed differs
    c = make_scenario_goals(["wangexp_3"], n_goals=16, seed=4)
    assert c != a


def test_interact_rows_and_policies():
    """interact(): headless probe reports the HUD quantities per step
    (reference evaluation/panda_interact.py:20-59)."""
    from panda_gym_tpu.eval.interact import interact

    rows = interact("reachao1", n_steps=3, policy="zero", verbose=False)
    assert 1 <= len(rows) <= 3
    for row in rows:
        assert set(row) >= {"t", "ee_error", "min_obstacle_dist", "reward",
                            "collided", "success"}
        assert np.isfinite(row["ee_error"])


@pytest.mark.slow
def test_perform_benchmark_schema():
    """perform_benchmark returns the reference's results schema
    (evaluate.py:286-300)."""
    from panda_gym_tpu.eval.benchmark import perform_benchmark
    from panda_gym_tpu.rl.config import Hyperparameters
    from panda_gym_tpu.rl.learners import make_learner
    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core

    core = make_reach_ao_core("reachao1")
    obs_probe = jax.eval_shape(core.reset, jax.random.PRNGKey(0))[1]
    x_dim = (obs_probe["observation"].shape[0]
             + 2 * obs_probe["achieved_goal"].shape[0])
    learner = make_learner("SAC", x_dim, core.robot.action_dim,
                           Hyperparameters("SAC"))
    ts = learner.init(jax.random.PRNGKey(0))
    res = perform_benchmark(learner, [ts], core, n_episodes=4, horizon=10,
                            seed=0)
    expected = {"scenario_episodes", "success_rate", "collision_rate",
                "timeout_rate", "mean_ep_length", "mean_num_sim_steps",
                "mean_effort", "mean_jerk", "mean_manipulability",
                "mean_ee_speed", "mean_reward"}
    assert expected <= set(res)
    assert res["scenario_episodes"] == 4
    assert 0.0 <= res["success_rate"] <= 1.0


@pytest.mark.parametrize("strategy,n_members",
                         [("prior", 0), ("bcf", 1), ("bayesian_fusion", 2)])
@pytest.mark.slow
def test_perform_benchmark_strategies(strategy, n_members):
    """Prior / BCF controller fusion and ensemble fusion run end-to-end
    (evaluate.py:174-211 strategy dispatch, fuse_controllers :33-40,
    evaluate_neo.py:18-92 prior-only eval)."""
    from panda_gym_tpu.eval.benchmark import perform_benchmark
    from panda_gym_tpu.rl.config import Hyperparameters
    from panda_gym_tpu.rl.learners import make_learner
    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core

    core = make_reach_ao_core("reachao1")
    obs_probe = jax.eval_shape(core.reset, jax.random.PRNGKey(0))[1]
    x_dim = (obs_probe["observation"].shape[0]
             + 2 * obs_probe["achieved_goal"].shape[0])
    learner = make_learner("SAC", x_dim, core.robot.action_dim,
                           Hyperparameters("SAC"))
    ts_list = [learner.init(jax.random.PRNGKey(i)) for i in range(n_members)]
    res = perform_benchmark(learner, ts_list, core, n_episodes=3, horizon=8,
                            strategy=strategy, seed=0)
    assert res["scenario_episodes"] == 3
    for k in ("success_rate", "collision_rate", "timeout_rate"):
        assert 0.0 <= res[k] <= 1.0
    assert np.isfinite(res["mean_reward"])


def test_save_video_gif_and_frames(reach_core, tmp_path):
    """render.save_video: GIF + PNG-sequence export (offline equivalent of
    the reference's Bullet-GUI mp4 capture, pybullet.py:41-47)."""
    import os

    from panda_gym_tpu.render import render_state, save_video

    core = reach_core
    state, _ = core.reset(jax.random.PRNGKey(0))
    frames = [render_state(core, state, width=80, height=60)] * 3
    gif = save_video(frames, str(tmp_path / "roll.gif"), fps=10)
    assert os.path.getsize(gif) > 100
    d = save_video(frames, str(tmp_path / "frames"))
    assert len(os.listdir(d)) == 3
