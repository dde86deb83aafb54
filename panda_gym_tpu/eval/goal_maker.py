"""Fixed-goal-set generator (reference evaluation/goal_maker.py:14-29).

Samples N reset goals per scenario (batched on-device: one vmapped reset
draws all goals at once) and writes them to JSON, for evaluation protocols
that need a frozen goal set across runs.
"""
from __future__ import annotations

import json
from typing import Dict, List, Sequence

import jax
import numpy as np

DEFAULT_SCENARIOS = ("wangexp_3", "narrow_tunnel", "workshop", "library2",
                     "wall")  # goal_maker.py:15


def make_scenario_goals(scenarios: Sequence[str] = DEFAULT_SCENARIOS,
                        n_goals: int = 1000, seed: int = 0
                        ) -> Dict[str, List[tuple]]:
    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core

    out = {}
    for scenario in scenarios:
        core = make_reach_ao_core(scenario)
        keys = jax.random.split(jax.random.PRNGKey(seed), n_goals)
        states, _ = jax.jit(jax.vmap(core.reset))(keys)
        out[scenario] = [tuple(float(x) for x in g)
                         for g in np.asarray(states.goal)]
    return out


def main(path: str = "scenario_goals.json", n_goals: int = 1000,
         seed: int = 0):
    goals = make_scenario_goals(n_goals=n_goals, seed=seed)
    with open(path, "w") as f:
        f.write(json.dumps(goals))
    return goals


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:2])
