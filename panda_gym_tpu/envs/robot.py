"""Panda robot layer: action pipeline, robot observations, reset.

Pure-functional re-implementation of the reference Panda robot class
(/root/reference/panda_gym/envs/robots/panda.py): control modes "ee"
(IK-resolved end-effector displacement), "js" (joint position deltas), "jsd"
(joint velocity), "pcc" (teleport); "clip"/"scale" action limiters; obs modes
"ee"/"js"; finger handling; velocity/acceleration/jerk bookkeeping
(panda.py:120-175, 264-288).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from panda_gym_tpu.models import panda_constants as pc
from panda_gym_tpu.models.panda import EE_SITE, make_panda_model
from panda_gym_tpu.ops import dynamics as D
from panda_gym_tpu.ops import kinematics as K
from panda_gym_tpu.sim.state import EnvState

# IK orientation target for "ee" control: (1,0,0,0) xyzw = gripper pointing
# down (panda.py:242-244).
EE_DOWN_QUAT = np.array([1.0, 0.0, 0.0, 0.0], dtype=np.float32)


@dataclass
class PandaConfig:
    block_gripper: bool = False
    control_type: str = "js"           # panda.py:36 default
    obs_type: Tuple[str, ...] = ("ee",)
    action_limiter: str = "clip"       # panda.py:39
    base_position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    gripper: str = "auto"              # auto: welded if blocked else prismatic
    max_change_position: float = 0.05  # panda.py:74
    finger_change: float = 0.2         # panda.py:151
    neutral: Tuple[float, ...] = tuple(pc.NEUTRAL_JOINT_VALUES[:7])


class PandaRobot:
    """Owns the ChainModel + static config; all methods are pure."""

    def __init__(self, config: PandaConfig):
        self.config = config
        gripper = config.gripper
        if gripper == "auto":
            gripper = "welded" if config.block_gripper else "prismatic"
        self.gripper = gripper
        self.model = make_panda_model(base_position=config.base_position,
                                      gripper=gripper)
        self.ndof = self.model.ndof
        self.n_arm = 7
        self.ee_site = EE_SITE
        # action dim: 3 (ee) or n_arm (joints) + 1 finger channel if not
        # blocked (panda.py:47-48)
        self._init_common(np.asarray(config.neutral, dtype=np.float32))

    def _init_common(self, neutral_arm):
        """Shared tail of robot construction: action dim (panda.py:47-48),
        control-mode dispatch, neutral pose padded to ndof."""
        config = self.config
        n = 3 if config.control_type == "ee" else self.n_arm
        self.action_dim = n + (0 if config.block_gripper else 1)
        self.ctrl_mode = (D.CTRL_VELOCITY if config.control_type == "jsd"
                          else D.CTRL_POSITION)
        self.neutral = np.zeros(self.ndof, dtype=np.float32)
        self.neutral[:self.n_arm] = neutral_arm

    # ------------------------------------------------------------------ obs
    def ee_position(self, fk):
        return K.site_com_position(self.model, fk, self.ee_site)

    def ee_velocity(self, fk):
        return K.site_com_velocity(self.model, fk, self.ee_site)

    def fingers_width(self, state: EnvState):
        """finger1 + finger2 joint positions (panda.py:300-304); identically
        0 for the welded gripper, like the reference's fixed-joint reads."""
        if self.ndof > 7:
            return state.q[7] + state.q[8]
        return jnp.asarray(0.0)

    def robot_obs(self, state: EnvState, fk):
        """panda.py:264-288 get_obs."""
        parts = []
        if "ee" in self.config.obs_type:
            parts += [self.ee_position(fk), self.ee_velocity(fk)]
        if "js" in self.config.obs_type:
            parts += [state.q[:self.n_arm], state.qd[:self.n_arm]]
        if not self.config.block_gripper:
            parts.append(self.fingers_width(state)[None])
        return jnp.concatenate(parts)

    # --------------------------------------------------------------- action
    def _limit_action(self, action):
        if self.config.action_limiter == "scale":
            # scale down if any |a| > 1 (panda.py:129-133)
            mx = jnp.max(jnp.abs(action))
            return jnp.where(mx > 1.0, action / mx, action)
        return jnp.clip(action, -1.0, 1.0)  # panda.py:134-135

    def set_action(self, state: EnvState, action) -> EnvState:
        """Compute motor targets + bookkeeping (panda.py:120-175).

        Must be called before the physics step, exactly like the reference's
        robot.set_action -> sim.step() ordering (core.py:352-354).
        """
        cfg = self.config
        action = self._limit_action(jnp.asarray(action))

        if cfg.control_type == "ee":
            fk = K.fk_world(self.model, state.q, state.qd)
            disp = action[:3] * cfg.max_change_position  # panda.py:235
            target_ee = self.ee_position(fk) + disp
            target_ee = target_ee.at[2].set(jnp.maximum(0.0, target_ee[2]))  # :240
            q_arm = K.dls_ik(
                self.model, self.ee_site, target_ee,
                target_quat=jnp.asarray(EE_DOWN_QUAT),
                q0=state.q, n_iters=10, n_arm=self.n_arm)[:self.n_arm]
        else:
            n = self.n_arm
            q_arm = state.q[:n] + action[:n] * cfg.max_change_position  # :257-261

        return self._finish_set_action(state, action, q_arm)

    def make_set_action_batched(self):
        """Batch-native set_action for "ee" control: the vmap'd per-env DLS-IK
        dominates batched_step on TPU (measured ~80x slower than "js" at
        B=4096); ops/scalarized.py:dls_ik_batched solves the damped normal
        equations in scalar-component form across the whole batch instead.
        Returns None for the other control modes (elementwise; vmap is free).
        """
        if self.config.control_type != "ee":
            return None
        from panda_gym_tpu.ops import scalarized as S

        mc = S.consts_from_model(self.model)
        cfg = self.config
        ndof, n_arm = self.ndof, self.n_arm

        def fn(states: EnvState, actions) -> EnvState:
            actions = jax.vmap(self._limit_action)(jnp.asarray(actions))
            q = tuple(states.q[:, d] for d in range(ndof))
            zero_qd = [0.0] * ndof
            Rs, ps, oms, vs, _ = S.fk_full(mc, q, zero_qd)
            ee_p, _ = S.site_com_pos_vel(mc, Rs, ps, oms, vs, self.ee_site)
            tx = ee_p[0] + actions[:, 0] * cfg.max_change_position
            ty = ee_p[1] + actions[:, 1] * cfg.max_change_position
            tz = jnp.maximum(
                0.0, ee_p[2] + actions[:, 2] * cfg.max_change_position)
            target_pos = jnp.stack([tx, ty, tz], axis=-1)
            q_new = S.dls_ik_batched(
                mc, self.ee_site, target_pos, EE_DOWN_QUAT, states.q,
                n_iters=10, n_arm=n_arm)
            return jax.vmap(self._finish_set_action)(
                states, actions, q_new[:, :n_arm])

        return fn

    def _finish_set_action(self, state: EnvState, action, q_arm) -> EnvState:
        """Everything after target-arm-angle resolution: gripper targets,
        control-mode dispatch, vel/acc/jerk bookkeeping (panda.py:137-175)."""
        cfg = self.config
        if self.ndof > 7:
            if cfg.block_gripper:
                finger_t = jnp.zeros(2)
            else:
                width = self.fingers_width(state)
                target_w = width + action[-1] * cfg.finger_change  # :151-153
                finger_t = jnp.full(2, target_w / 2.0)             # :164
            target = jnp.concatenate([q_arm, finger_t])
        else:
            target = q_arm

        if cfg.control_type == "jsd":
            # velocity control: targets are the action itself (panda.py:155-158)
            vel_t = action[:self.n_arm]
            if self.ndof > 7:
                vel_t = jnp.concatenate([vel_t, jnp.zeros(2)])
            ctrl_target = vel_t
            q, qd = state.q, state.qd
        elif cfg.control_type == "pcc":
            # teleport (panda.py:159-162): resetJointState zeroes velocity
            q = jnp.clip(target, self.model.q_lo, self.model.q_hi)
            qd = jnp.zeros_like(state.qd)
            ctrl_target = q
        else:
            ctrl_target = target
            q, qd = state.q, state.qd

        # velocity/acceleration/jerk bookkeeping, recorded pre-step with the
        # reference's exact (sign-flipped) finite differences (panda.py:167-172)
        prev_jvel = state.cur_jvel
        prev_jacc = state.cur_jacc
        cur_jvel = jnp.zeros(7).at[:self.n_arm].set(state.qd[:min(self.n_arm, 7)])
        cur_jacc = prev_jvel - cur_jvel
        cur_jerk = jnp.abs(prev_jacc - cur_jacc)

        na = self.action_dim
        return state.replace(
            q=q, qd=qd, ctrl_target=ctrl_target,
            prev_action=state.recent_action,
            recent_action=action[:na],
            action_count=state.action_count + 1,
            prev_jvel=prev_jvel, cur_jvel=cur_jvel,
            prev_jacc=prev_jacc, cur_jacc=cur_jacc, cur_jerk=cur_jerk,
        )

    # ---------------------------------------------------------------- reset
    def reset_q(self):
        return jnp.asarray(self.neutral), jnp.zeros(self.ndof)

    def manipulability(self, q):
        return K.manipulability(self.model, self.ee_site, q)


class MyCobotRobot(PandaRobot):
    """6-DoF MyCobot variant (reference envs/robots/mycobot.py): same action
    pipeline minus the gripper; joint forces default to the reference's zeros
    (mycobot.py:56), i.e. the motors exert no torque."""

    def __init__(self, config: PandaConfig, effort: float = 0.0):
        from panda_gym_tpu.models.mycobot import (
            EE_SITE as MC_EE, NEUTRAL as MC_NEUTRAL, make_mycobot_model)

        self.config = config
        self.gripper = "none"
        self.model = make_mycobot_model(base_position=config.base_position,
                                        effort=effort)
        self.ndof = self.model.ndof
        self.n_arm = 6
        self.ee_site = MC_EE
        self._init_common(np.asarray(MC_NEUTRAL, dtype=np.float32))

    def fingers_width(self, state):
        return jnp.asarray(0.0)
