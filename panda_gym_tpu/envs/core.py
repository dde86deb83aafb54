"""Core env abstractions: Task base + functional RobotTaskEnv + gym adapter.

TPU-native counterpart of /root/reference/panda_gym/envs/core.py: the same
composition (one robot + one task -> goal-conditioned dict-obs env,
core.py:255-414) but as a *pure functional core*:

    state, obs            = env.reset(key)
    state, obs, r, t, tr, info = env.step(state, action)

Batching is jax.vmap over `state` (and key/action); the GymAdapter at the
bottom re-exposes the exact gymnasium API (dict observation space, seed
handling, save/restore snapshots) for single-env compatibility, including
HER's `compute_reward(achieved, desired, info)` contract (core.py:282).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from panda_gym_tpu.envs.robot import PandaRobot
from panda_gym_tpu.ops import kinematics as K
from panda_gym_tpu.sim import engine
from panda_gym_tpu.sim.state import EnvState, SceneParams


def _hi_prec(fn):
    """Trace `fn` under f32-highest matmul precision.

    The physics/kinematics paths are built from (3,3) matmuls that cost
    nothing but, on TPU, default to bf16 MXU passes — enough error to break
    trajectory parity with the reference and with the batch-last scalarized
    path (which is elementwise and always full f32).  Scoped here so user
    networks keep the fast default."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **kw)
    return wrapped


class Task:
    """Base task: scene + goal lifecycle + reward contract (core.py:212-252).

    Subclasses set `scene`, `goal_dim` and override the pure methods; all
    methods receive the env (for robot/model access) and operate on EnvState.
    """

    scene: SceneParams
    goal_dim: int = 3
    n_obstacles: int = 1          # capacity (>=1 keeps arrays non-empty)
    past_obs_dim: int = 1
    robot_contact: bool = False
    body_pairs: Tuple[Tuple[int, int], ...] = ()
    check_collision: bool = False
    moving_obstacles: bool = False
    terminate_on_success: bool = False

    def reset(self, env: "RobotTaskEnv", state: EnvState, key) -> EnvState:
        raise NotImplementedError

    def reset_robot(self, env: "RobotTaskEnv", state: EnvState, key) -> EnvState:
        """Default robot reset: neutral pose (panda.py:290-298)."""
        q, qd = env.robot.reset_q()
        return state.replace(q=q, qd=qd, ctrl_target=q)

    def task_obs(self, env, state: EnvState, fk) -> jnp.ndarray:
        return jnp.zeros(0)

    def achieved_goal(self, env, state: EnvState, fk) -> jnp.ndarray:
        raise NotImplementedError

    def is_success(self, env, achieved, desired, state: EnvState):
        raise NotImplementedError

    def is_truncated(self, env, state: EnvState):
        return jnp.asarray(False)

    def pre_obs(self, env, state: EnvState, fk) -> EnvState:
        """Optional state refresh before observation assembly (e.g. ReachAO's
        per-link distance / past-observation bookkeeping)."""
        return state

    def compute_reward(self, env, achieved, desired, state: EnvState, fk):
        raise NotImplementedError

    # HER support: rewards decomposed into (achieved, desired, aux) with aux
    # capturing every state-dependent term, so relabeled rewards are exact.
    def reward_aux(self, env, state: EnvState) -> jnp.ndarray:
        return jnp.zeros(0)

    def reward_from_aux(self, env, achieved, desired, aux):
        raise NotImplementedError


class RobotTaskEnv:
    """Functional robot+task env (replaces core.py:255-414 RobotTaskEnv)."""

    def __init__(self, robot: PandaRobot, task: Task,
                 terminate_on_success: Optional[bool] = None,
                 n_substeps: int = 20):
        self.robot = robot
        self.task = task
        self.model = robot.model
        self.n_substeps = n_substeps
        self.terminate_on_success = (
            task.terminate_on_success if terminate_on_success is None
            else terminate_on_success)
        physics_kw = dict(
            n_substeps=n_substeps,
            ctrl_mode=robot.ctrl_mode,
            robot_contact=task.robot_contact,
            body_pairs=task.body_pairs,
            check_collision=task.check_collision,
            moving_obstacles=task.moving_obstacles,
            has_bodies=task.scene.nb > 0,
        )
        self.physics_step = engine.make_physics_step(
            robot.model, task.scene, **physics_kw)
        # batch-native fast paths (None -> vmap fallback in batched_step)
        self.physics_step_batched = engine.make_batched_physics_step(
            robot.model, task.scene, **physics_kw)
        self.step_post_batched = (
            task.make_step_post_batched(self)
            if hasattr(task, "make_step_post_batched") else None)
        self.set_action_batched = robot.make_set_action_batched()
        # derive dims from a template rollout
        self._template = self.init_state(jax.random.PRNGKey(0))

    # ------------------------------------------------------------------
    def init_state(self, key) -> EnvState:
        m = self.model
        nb = self.task.scene.nb
        no = self.task.n_obstacles
        na = self.robot.action_dim
        q = jnp.asarray(self.robot.neutral)
        return EnvState(
            q=q, qd=jnp.zeros(m.ndof), ctrl_target=q,
            body_pos=jnp.zeros((nb, 3)),
            body_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (nb, 1)),
            body_vel=jnp.zeros((nb, 3)), body_ang=jnp.zeros((nb, 3)),
            obstacle_pos=jnp.full((no, 3), 99.9),
            obstacle_vel=jnp.zeros((no, 3)),
            obstacle_size=jnp.full((no, 3), 1e-3),
            obstacle_type=jnp.zeros((no,), jnp.int32),
            obstacle_active=jnp.zeros((no,), bool),
            goal=jnp.zeros(self.task.goal_dim),
            key=key, steps=jnp.asarray(0, jnp.int32),
            is_collided=jnp.asarray(False), goal_reached=jnp.asarray(False),
            prev_action=jnp.zeros(na), recent_action=jnp.zeros(na),
            action_count=jnp.asarray(0, jnp.int32),
            cur_jvel=jnp.zeros(7), prev_jvel=jnp.zeros(7),
            cur_jacc=jnp.zeros(7), prev_jacc=jnp.zeros(7),
            cur_jerk=jnp.zeros(7),
            link_obstacle_dist=jnp.full((max(m.ngroup, 1),), 999.0),
            past_obs=jnp.zeros((3, self.task.past_obs_dim)),
        )

    # ------------------------------------------------------------------
    @_hi_prec
    def reset(self, key) -> Tuple[EnvState, Dict[str, jnp.ndarray]]:
        """Pure reset: sample robot pose + goal + scene (core.py:298-308)."""
        k_state, k_robot, k_task = jax.random.split(key, 3)
        state = self.init_state(k_state)
        state = self.task.reset_robot(self, state, k_robot)
        state = self.task.reset(self, state, k_task)
        fk = K.fk_world(self.model, state.q, state.qd)
        state = self.task.pre_obs(self, state, fk)
        obs = self._get_obs(state, fk)
        return state, obs

    def _get_obs(self, state: EnvState, fk=None) -> Dict[str, jnp.ndarray]:
        """Dict observation assembly (core.py:286-296).  Callers thread the
        FK they already computed; recomputed only if absent."""
        if fk is None:
            fk = K.fk_world(self.model, state.q, state.qd)
        robot_obs = self.robot.robot_obs(state, fk)
        task_obs = self.task.task_obs(self, state, fk)
        achieved = self.task.achieved_goal(self, state, fk)
        return {
            "observation": jnp.concatenate([robot_obs, task_obs]).astype(jnp.float32),
            "achieved_goal": achieved.astype(jnp.float32),
            "desired_goal": state.goal.astype(jnp.float32),
        }

    @_hi_prec
    def step(self, state: EnvState, action):
        """Pure step (core.py:352-368): set_action -> physics -> obs/reward."""
        state = self.robot.set_action(state, action)
        state = self.physics_step(state)
        return self._step_post(state)

    @_hi_prec
    def _step_post(self, state: EnvState):
        """Everything after the physics substeps: obs/reward/termination."""
        state = state.replace(steps=state.steps + 1)

        fk = K.fk_world(self.model, state.q, state.qd)
        state = self.task.pre_obs(self, state, fk)
        obs = self._get_obs(state, fk)
        achieved = obs["achieved_goal"]
        desired = obs["desired_goal"]
        success, state = self._success(achieved, desired, state)
        terminated = success if self.terminate_on_success else jnp.asarray(False)
        truncated = jnp.asarray(self.task.is_truncated(self, state), bool)
        reward = jnp.asarray(
            self.task.compute_reward(self, achieved, desired, state, fk),
            jnp.float32)
        info = {"is_success": success, "is_truncated": truncated}
        return state, obs, reward, terminated, truncated, info

    def _success(self, achieved, desired, state):
        out = self.task.is_success(self, achieved, desired, state)
        if isinstance(out, tuple):
            success, state = out
        else:
            success = out
        return jnp.asarray(success, bool), state

    # convenience: jitted batched rollout primitives ---------------------
    def batched_reset(self, keys):
        return jax.vmap(self.reset)(keys)

    def batched_step(self, states, actions):
        """Batched step; routes physics through the batch-native scalarized
        path when the task configuration allows it (engine.py:
        make_batched_physics_step), else vmap of the per-env step."""
        if self.physics_step_batched is None:
            return jax.vmap(self.step)(states, actions)
        set_action = self.set_action_batched or jax.vmap(self.robot.set_action)
        states = _hi_prec(set_action)(states, actions)
        states = self.physics_step_batched(states)
        if self.step_post_batched is not None:
            return self.step_post_batched(states)
        return jax.vmap(self._step_post)(states)


# ---------------------------------------------------------------------------
# Gymnasium adapter
# ---------------------------------------------------------------------------

import gymnasium as _gym


class GymAdapter(_gym.Env):
    """Single-env gymnasium.Env facade over the functional core.

    Preserves the reference env surface: dict observation space with
    observation/achieved_goal/desired_goal Boxes in [-10, 10] (core.py:
    274-280), `compute_reward` for HER relabeling (core.py:282), seed-driven
    reset, and save/restore via state snapshots (core.py:310-336 — here a
    snapshot is just the EnvState pytree, exact by construction).
    """

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, env: RobotTaskEnv):
        from gymnasium import spaces

        self.env = env

        def reset_with_info(key):
            state, obs = env.reset(key)
            out = env.task.is_success(env, obs["achieved_goal"],
                                      obs["desired_goal"], state)
            success = out[0] if isinstance(out, tuple) else out
            return state, obs, jnp.asarray(success, bool)

        self._jit_reset = jax.jit(reset_with_info)
        self._jit_step = jax.jit(env.step)
        self._state: Optional[EnvState] = None
        self._np_seed_counter = 0

        state, obs, _ = self._jit_reset(jax.random.PRNGKey(0))
        self._state = state
        self.observation_space = spaces.Dict(
            dict(
                observation=spaces.Box(-10.0, 10.0, shape=obs["observation"].shape, dtype=np.float32),
                desired_goal=spaces.Box(-10.0, 10.0, shape=obs["desired_goal"].shape, dtype=np.float32),
                achieved_goal=spaces.Box(-10.0, 10.0, shape=obs["achieved_goal"].shape, dtype=np.float32),
            )
        )
        self.action_space = spaces.Box(
            -1.0, 1.0, shape=(env.robot.action_dim,), dtype=np.float32)
        self._saved_states: Dict[int, EnvState] = {}
        self._next_state_id = 0

    # -- gymnasium API ---------------------------------------------------
    def reset(self, seed: Optional[int] = None, options=None):
        if seed is None:
            # fold fresh OS entropy + a per-adapter counter into one 31-bit
            # seed (PRNGKey accepts any uint32; keep clear of the explicit
            # user-seed space by staying within [0, 2^31) after mixing)
            self._np_seed_counter += 1
            seed = (np.random.SeedSequence().entropy
                    + self._np_seed_counter) % (2 ** 31)
        key = jax.random.PRNGKey(int(seed))
        state, obs, success = self._jit_reset(key)
        self._state = state
        info = {"is_success": bool(np.asarray(success))}
        return {k: np.asarray(v) for k, v in obs.items()}, info

    def step(self, action):
        state, obs, reward, terminated, truncated, info = self._jit_step(
            self._state, jnp.asarray(action, jnp.float32))
        self._state = state
        return (
            {k: np.asarray(v) for k, v in obs.items()},
            float(reward),
            bool(terminated),
            bool(truncated),
            {k: bool(np.asarray(v)) for k, v in info.items()},
        )

    def compute_reward(self, achieved_goal, desired_goal, info) -> np.ndarray:
        """Vectorized HER relabeling hook (core.py:282 contract).

        State-dependent reward terms (ReachAO's collision/effort/jerk
        penalties) are taken from the adapter's *current* state — the same
        quirk as the reference, whose compute_reward also reads live `self`
        state for those terms.  The in-repo trainer instead stores
        per-transition aux via Task.reward_aux/reward_from_aux and relabels
        exactly (rl/her.py); prefer that path for off-policy training."""
        a = jnp.asarray(achieved_goal)
        d = jnp.asarray(desired_goal)
        fk = None
        r = self.env.task.compute_reward(self.env, a, d, self._state, fk)
        return np.asarray(r)

    # -- state snapshots (core.py:310-336) -------------------------------
    def save_state(self) -> int:
        sid = self._next_state_id
        self._next_state_id += 1
        self._saved_states[sid] = self._state
        return sid

    def restore_state(self, state_id: int) -> None:
        self._state = self._saved_states[state_id]

    def remove_state(self, state_id: int) -> None:
        del self._saved_states[state_id]

    def render(self, mode: str = "rgb_array", width: int = 720,
               height: int = 480, target_position=None, distance: float = 1.4,
               yaw: float = 45, pitch: float = -30, roll: float = 0):
        """rgb_array software render (reference core.py:373-414 signature)."""
        from panda_gym_tpu.render import render_env
        return render_env(self, width=width, height=height,
                          target_position=target_position, distance=distance,
                          yaw=yaw, pitch=pitch, roll=roll)

    def close(self):
        pass

    @property
    def unwrapped(self):
        return self

    # task/robot passthroughs used by training/eval code
    @property
    def robot(self):
        """State-bound robot view: the functional robot's attributes plus the
        reference's getter names (panda.py:264-317, core.py:105-209) evaluated
        against this adapter's current EnvState."""
        return BoundRobot(self)

    @property
    def task(self):
        return self.env.task

    @property
    def state(self) -> EnvState:
        return self._state


class BoundRobot:
    """Reference-named robot accessors bound to a GymAdapter's live state.

    Delegates every other attribute to the functional robot, so framework
    code (`action_dim`, `robot_obs`, ...) keeps working while reference users
    find `get_ee_position()` etc. (panda.py:264-317, mycobot.py:209-230,
    core.py:105-209).
    """

    def __init__(self, adapter: "GymAdapter"):
        object.__setattr__(self, "_adapter", adapter)
        object.__setattr__(self, "_robot", adapter.env.robot)

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "_robot"), name)

    def _fk(self):
        a = self._adapter
        return K.fk_world(a.env.model, a.state.q, a.state.qd)

    # panda.py:306-312
    def get_ee_position(self):
        return np.asarray(self._robot.ee_position(self._fk()))

    def get_ee_velocity(self):
        return np.asarray(self._robot.ee_velocity(self._fk()))

    # panda.py:300-304
    def get_fingers_width(self):
        return float(np.asarray(self._robot.fingers_width(self._adapter.state)))

    # panda.py:314-317 Yoshikawa manipulability
    def get_manipulability(self):
        return float(np.asarray(self._robot.manipulability(self._adapter.state.q)))

    # core.py:150-171 joint getters.  Accepts the reference's PyBullet joint
    # numbering (fingers at 9/10, fixed joints at 7/8, panda.py:62); the
    # chain stores prismatic fingers at dof 7/8.
    def _dof_index(self, joint: int) -> int:
        from panda_gym_tpu.models.chain import pybullet_dof_index
        return pybullet_dof_index(self._adapter.state.q.shape[0], joint)

    def get_joint_angle(self, joint: int) -> float:
        i = self._dof_index(joint)
        if i < 0:
            return 0.0
        return float(np.asarray(self._adapter.state.q[i]))

    def get_joint_velocity(self, joint: int) -> float:
        i = self._dof_index(joint)
        if i < 0:
            return 0.0
        return float(np.asarray(self._adapter.state.qd[i]))

    # core.py:195-209 IK passthrough (DLS IK, replaces calculateInverseKinematics)
    def inverse_kinematics(self, link: int, position, orientation=None):
        q = K.dls_ik(self._robot.model, link, jnp.asarray(position),
                     None if orientation is None else jnp.asarray(orientation),
                     q0=self._adapter.state.q)
        return np.asarray(q)

    # panda.py:264-288 — the robot part of the observation
    def get_obs(self):
        a = self._adapter
        return np.asarray(self._robot.robot_obs(a.state, self._fk()))

    # panda.py:290-298 — mutate the adapter's live state
    def set_joint_neutral(self) -> None:
        a = self._adapter
        q = jnp.asarray(self._robot.neutral)  # full-ndof neutral pose
        a._state = a.state.replace(q=q, qd=jnp.zeros_like(a.state.qd),
                                   ctrl_target=q)

    def reset(self) -> None:
        self.set_joint_neutral()
