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
