"""Interactive env probe (reference evaluation/panda_interact.py:20-59).

The reference opens a PyBullet GUI and steps the env manually; headless on
TPU, this rolls a chosen policy through a scenario, prints per-step
diagnostics (the debug-HUD quantities: ee error, min obstacle distance,
reward, collision flag — reach_ao.py:1266-1289), and optionally saves
software-rendered frames.
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


def interact(scenario: str = "wangexp_3", n_steps: int = 60,
             policy: Union[str, Callable] = "zero", seed: int = 0,
             save_frames: Optional[str] = None, verbose: bool = True):
    """Roll `policy` through one episode and report the HUD quantities.

    policy: "zero" | "random" | "neo" (the QP prior) | callable
    (state, obs) -> action.
    """
    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core
    from panda_gym_tpu.ops import kinematics as K

    core = make_reach_ao_core(scenario)
    key = jax.random.PRNGKey(seed)
    key, k_reset = jax.random.split(key)
    state, obs = jax.jit(core.reset)(k_reset)
    step = jax.jit(core.step)
    rows = []

    if save_frames:
        import os
        os.makedirs(save_frames, exist_ok=True)

    for t in range(n_steps):
        if callable(policy):
            action = np.asarray(policy(state, obs), np.float32)
        elif policy == "zero":
            action = np.zeros(core.robot.action_dim, np.float32)
        elif policy == "random":
            key, k = jax.random.split(key)
            action = jax.random.uniform(k, (core.robot.action_dim,),
                                        minval=-1.0, maxval=1.0)
        elif policy == "neo":
            fk = K.fk_world(core.model, state.q, state.qd)
            from panda_gym_tpu.ops.neo import compute_action_neo
            action = compute_action_neo(core.model, core.robot.ee_site,
                                        state, fk, state.goal)
        else:
            raise ValueError(f"unknown policy {policy!r}")

        state, obs, reward, term, trunc, info = step(
            state, jnp.asarray(action, jnp.float32))
        row = dict(
            t=t,
            ee_error=float(np.linalg.norm(
                np.asarray(obs["achieved_goal"]) -
                np.asarray(obs["desired_goal"]))),
            min_obstacle_dist=float(jnp.min(state.link_obstacle_dist)),
            reward=float(reward),
            collided=bool(state.is_collided),
            success=bool(np.asarray(info["is_success"])),
        )
        rows.append(row)
        if verbose:
            print("  ".join(f"{k}={v:.4f}" if isinstance(v, float)
                            else f"{k}={v}" for k, v in row.items()))
        if save_frames:
            from panda_gym_tpu.render import render_state
            frame = render_state(core, state)
            _save_png(f"{save_frames}/frame_{t:04d}.png", frame)
        if bool(term) or bool(trunc):
            break
    return rows


def _save_png(path: str, rgb: np.ndarray):
    try:
        from PIL import Image
        Image.fromarray(np.asarray(rgb, np.uint8)).save(path)
    except ImportError:  # minimal PPM fallback, no deps
        ppm = path.rsplit(".", 1)[0] + ".ppm"
        h, w = rgb.shape[:2]
        with open(ppm, "wb") as f:
            f.write(f"P6 {w} {h} 255\n".encode())
            f.write(np.asarray(rgb, np.uint8).tobytes())


if __name__ == "__main__":
    import sys
    interact(*(sys.argv[1:2] or ["wangexp_3"]))
