"""The six upstream goal-conditioned tasks, TPU-native.

Functional re-implementations of /root/reference/panda_gym/envs/tasks/
{reach,push,slide,pick_and_place,stack,flip}.py: same scenes, goal/object
sampling ranges, achieved-goal semantics, sparse/dense rewards and success
thresholds; state-dependent sampling is driven by PRNG keys instead of
np_random.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from panda_gym_tpu.envs.core import RobotTaskEnv, Task
from panda_gym_tpu.math.transforms import quat_to_euler
from panda_gym_tpu.ops import kinematics as K
from panda_gym_tpu.sim.state import (
    SHAPE_BOX, SHAPE_CYLINDER, SHAPE_SPHERE, build_scene,
)
from panda_gym_tpu.utils import angle_distance, distance


class _GoalTask(Task):
    """Shared sparse/dense reward + success logic (reach.py:80-89 et al.)."""

    reward_type: str = "sparse"
    distance_threshold: float = 0.05

    def is_success(self, env, achieved, desired, state):
        d = distance(achieved, desired)
        return d < self.distance_threshold

    def compute_reward(self, env, achieved, desired, state, fk):
        return self.reward_from_aux(env, achieved, desired, jnp.zeros(0))

    def reward_from_aux(self, env, achieved, desired, aux):
        d = distance(achieved, desired)
        if self.reward_type == "sparse":
            return -(d > self.distance_threshold).astype(jnp.float32)
        return -d.astype(jnp.float32)


class _ObjectObsMixin:
    """Object position/rotation/velocity observation block shared by
    Push/Slide/PickAndPlace (push.py:50-66)."""

    def task_obs(self, env, state, fk):
        return jnp.concatenate([
            state.body_pos[0],
            quat_to_euler(state.body_quat[0]),
            state.body_vel[0],
            state.body_ang[0],
        ])

    def achieved_goal(self, env, state, fk):
        return state.body_pos[0]


class Reach(_GoalTask):
    """reach.py: goal = point in a box around the robot; achieved = EE."""

    def __init__(self, reward_type="sparse", distance_threshold=0.05,
                 goal_range=0.3):
        self.reward_type = reward_type
        self.distance_threshold = distance_threshold
        # reach.py:24-26 goal ranges; scene reach.py:32-33
        self.goal_range_low = np.array([-goal_range / 2, -goal_range / 2, 0], np.float32)
        self.goal_range_high = np.array([goal_range / 2, goal_range / 2, goal_range], np.float32)
        self.scene = build_scene([], 1.1, 0.7, 0.4, -0.3)
        self.fixed_target = None

    def reset(self, env, state, key):
        if self.fixed_target is not None:
            # set_fixed_target shifts x by -0.6 (reach.py:66-68)
            goal = jnp.asarray(self.fixed_target) + jnp.array([-0.6, 0.0, 0.0])
        else:
            goal = jax.random.uniform(
                key, (3,), minval=jnp.asarray(self.goal_range_low),
                maxval=jnp.asarray(self.goal_range_high))
        return state.replace(goal=goal)

    def achieved_goal(self, env, state, fk):
        return env.robot.ee_position(fk)


class Push(_ObjectObsMixin, _GoalTask):
    """push.py: push a 4 cm cube to an on-table goal; gripper blocked."""

    robot_contact = True

    def __init__(self, reward_type="sparse", distance_threshold=0.05,
                 goal_xy_range=0.3, obj_xy_range=0.3):
        self.reward_type = reward_type
        self.distance_threshold = distance_threshold
        self.object_size = 0.04
        half = self.object_size / 2
        self.goal_range_low = np.array([-goal_xy_range / 2, -goal_xy_range / 2, 0], np.float32)
        self.goal_range_high = np.array([goal_xy_range / 2, goal_xy_range / 2, 0], np.float32)
        self.obj_range_low = np.array([-obj_xy_range / 2, -obj_xy_range / 2, 0], np.float32)
        self.obj_range_high = np.array([obj_xy_range / 2, obj_xy_range / 2, 0], np.float32)
        self.scene = build_scene(
            [dict(shape=SHAPE_BOX, size=(half, half, half), mass=1.0)],
            1.1, 0.7, 0.4, -0.3)

    def reset(self, env, state, key):
        kg, ko = jax.random.split(key)
        z = self.object_size / 2
        goal = jnp.array([0.0, 0.0, z]) + jax.random.uniform(
            kg, (3,), minval=jnp.asarray(self.goal_range_low),
            maxval=jnp.asarray(self.goal_range_high))
        obj = jnp.array([0.0, 0.0, z]) + jax.random.uniform(
            ko, (3,), minval=jnp.asarray(self.obj_range_low),
            maxval=jnp.asarray(self.obj_range_high))
        return state.replace(
            goal=goal,
            body_pos=state.body_pos.at[0].set(obj),
            body_quat=state.body_quat.at[0].set(jnp.array([0., 0., 0., 1.])),
            body_vel=jnp.zeros_like(state.body_vel),
            body_ang=jnp.zeros_like(state.body_ang))


class Slide(_ObjectObsMixin, _GoalTask):
    """slide.py: low-friction puck slid to an out-of-reach goal."""

    robot_contact = True

    def __init__(self, reward_type="sparse", distance_threshold=0.05,
                 goal_xy_range=0.3, goal_x_offset=0.4, obj_xy_range=0.3):
        self.reward_type = reward_type
        self.distance_threshold = distance_threshold
        self.object_size = 0.06
        self.goal_range_low = np.array(
            [-goal_xy_range / 2 + goal_x_offset, -goal_xy_range / 2, 0], np.float32)
        self.goal_range_high = np.array(
            [goal_xy_range / 2 + goal_x_offset, goal_xy_range / 2, 0], np.float32)
        self.obj_range_low = np.array([-obj_xy_range / 2, -obj_xy_range / 2, 0], np.float32)
        self.obj_range_high = np.array([obj_xy_range / 2, obj_xy_range / 2, 0], np.float32)
        # slide.py:34-42: cylinder r=0.03, height=0.03, lateral_friction 0.04
        self.scene = build_scene(
            [dict(shape=SHAPE_CYLINDER,
                  size=(self.object_size / 2, self.object_size / 4, 0.0),
                  mass=1.0, mu=0.04)],
            1.4, 0.7, 0.4, -0.1)

    def reset(self, env, state, key):
        kg, ko = jax.random.split(key)
        z = self.object_size / 2
        goal = jnp.array([0.0, 0.0, z]) + jax.random.uniform(
            kg, (3,), minval=jnp.asarray(self.goal_range_low),
            maxval=jnp.asarray(self.goal_range_high))
        obj = jnp.array([0.0, 0.0, z]) + jax.random.uniform(
            ko, (3,), minval=jnp.asarray(self.obj_range_low),
            maxval=jnp.asarray(self.obj_range_high))
        return state.replace(
            goal=goal,
            body_pos=state.body_pos.at[0].set(obj),
            body_quat=state.body_quat.at[0].set(jnp.array([0., 0., 0., 1.])),
            body_vel=jnp.zeros_like(state.body_vel),
            body_ang=jnp.zeros_like(state.body_ang))


class PickAndPlace(_ObjectObsMixin, _GoalTask):
    """pick_and_place.py: cube to a possibly-elevated goal; 30% of goals on
    the ground (pick_and_place.py:75-77)."""

    robot_contact = True

    def __init__(self, reward_type="sparse", distance_threshold=0.05,
                 goal_xy_range=0.3, goal_z_range=0.2, obj_xy_range=0.3):
        self.reward_type = reward_type
        self.distance_threshold = distance_threshold
        self.object_size = 0.04
        half = self.object_size / 2
        self.goal_range_low = np.array([-goal_xy_range / 2, -goal_xy_range / 2, 0], np.float32)
        self.goal_range_high = np.array(
            [goal_xy_range / 2, goal_xy_range / 2, goal_z_range], np.float32)
        self.obj_range_low = np.array([-obj_xy_range / 2, -obj_xy_range / 2, 0], np.float32)
        self.obj_range_high = np.array([obj_xy_range / 2, obj_xy_range / 2, 0], np.float32)
        self.scene = build_scene(
            [dict(shape=SHAPE_BOX, size=(half, half, half), mass=1.0)],
            1.1, 0.7, 0.4, -0.3)

    def reset(self, env, state, key):
        kg, kz, ko = jax.random.split(key, 3)
        z = self.object_size / 2
        noise = jax.random.uniform(
            kg, (3,), minval=jnp.asarray(self.goal_range_low),
            maxval=jnp.asarray(self.goal_range_high))
        ground = jax.random.uniform(kz) < 0.3
        noise = noise.at[2].set(jnp.where(ground, 0.0, noise[2]))
        goal = jnp.array([0.0, 0.0, z]) + noise
        obj = jnp.array([0.0, 0.0, z]) + jax.random.uniform(
            ko, (3,), minval=jnp.asarray(self.obj_range_low),
            maxval=jnp.asarray(self.obj_range_high))
        return state.replace(
            goal=goal,
            body_pos=state.body_pos.at[0].set(obj),
            body_quat=state.body_quat.at[0].set(jnp.array([0., 0., 0., 1.])),
            body_vel=jnp.zeros_like(state.body_vel),
            body_ang=jnp.zeros_like(state.body_ang))


class Stack(_GoalTask):
    """stack.py: stack two cubes; 6-D goal, threshold 0.1 over the stacked
    vector (stack.py:124-131)."""

    robot_contact = True
    body_pairs = ((0, 1),)
    goal_dim = 6

    def __init__(self, reward_type="sparse", distance_threshold=0.1,
                 goal_xy_range=0.3, obj_xy_range=0.3):
        self.reward_type = reward_type
        self.distance_threshold = distance_threshold
        self.object_size = 0.04
        half = self.object_size / 2
        self.goal_range_low = np.array([-goal_xy_range / 2, -goal_xy_range / 2, 0], np.float32)
        self.goal_range_high = np.array([goal_xy_range / 2, goal_xy_range / 2, 0], np.float32)
        self.obj_range_low = np.array([-obj_xy_range / 2, -obj_xy_range / 2, 0], np.float32)
        self.obj_range_high = np.array([obj_xy_range / 2, obj_xy_range / 2, 0], np.float32)
        self.scene = build_scene(
            [dict(shape=SHAPE_BOX, size=(half, half, half), mass=2.0),
             dict(shape=SHAPE_BOX, size=(half, half, half), mass=1.0)],
            1.1, 0.7, 0.4, -0.3)

    def reset(self, env, state, key):
        kg, k1, k2 = jax.random.split(key, 3)
        z = self.object_size / 2
        noise = jax.random.uniform(
            kg, (3,), minval=jnp.asarray(self.goal_range_low),
            maxval=jnp.asarray(self.goal_range_high))
        goal1 = jnp.array([0.0, 0.0, z]) + noise
        goal2 = jnp.array([0.0, 0.0, 3 * z]) + noise
        o1 = jnp.array([0.0, 0.0, z]) + jax.random.uniform(
            k1, (3,), minval=jnp.asarray(self.obj_range_low),
            maxval=jnp.asarray(self.obj_range_high))
        o2 = jnp.array([0.0, 0.0, 3 * z]) + jax.random.uniform(
            k2, (3,), minval=jnp.asarray(self.obj_range_low),
            maxval=jnp.asarray(self.obj_range_high))
        return state.replace(
            goal=jnp.concatenate([goal1, goal2]),
            body_pos=jnp.stack([o1, o2]),
            body_quat=jnp.tile(jnp.array([0., 0., 0., 1.]), (2, 1)),
            body_vel=jnp.zeros_like(state.body_vel),
            body_ang=jnp.zeros_like(state.body_ang))

    def task_obs(self, env, state, fk):
        parts = []
        for b in range(2):
            parts += [state.body_pos[b], quat_to_euler(state.body_quat[b]),
                      state.body_vel[b], state.body_ang[b]]
        return jnp.concatenate(parts)

    def achieved_goal(self, env, state, fk):
        return jnp.concatenate([state.body_pos[0], state.body_pos[1]])


class Flip(_GoalTask):
    """flip.py: rotate a cube to a random goal orientation; quaternion goal,
    angle_distance metric (flip.py:84-91)."""

    robot_contact = True
    goal_dim = 4

    def __init__(self, reward_type="sparse", distance_threshold=0.2,
                 obj_xy_range=0.3):
        self.reward_type = reward_type
        self.distance_threshold = distance_threshold
        self.object_size = 0.04
        half = self.object_size / 2
        self.obj_range_low = np.array([-obj_xy_range / 2, -obj_xy_range / 2, 0], np.float32)
        self.obj_range_high = np.array([obj_xy_range / 2, obj_xy_range / 2, 0], np.float32)
        self.scene = build_scene(
            [dict(shape=SHAPE_BOX, size=(half, half, half), mass=1.0)],
            1.1, 0.7, 0.4, -0.3)

    def reset(self, env, state, key):
        kg, ko = jax.random.split(key)
        # uniform random unit quaternion (equivalent of R.random(), flip.py:71)
        u = jax.random.uniform(kg, (3,))
        q = jnp.array([
            jnp.sqrt(1 - u[0]) * jnp.sin(2 * jnp.pi * u[1]),
            jnp.sqrt(1 - u[0]) * jnp.cos(2 * jnp.pi * u[1]),
            jnp.sqrt(u[0]) * jnp.sin(2 * jnp.pi * u[2]),
            jnp.sqrt(u[0]) * jnp.cos(2 * jnp.pi * u[2]),
        ])
        z = self.object_size / 2
        obj = jnp.array([0.0, 0.0, z]) + jax.random.uniform(
            ko, (3,), minval=jnp.asarray(self.obj_range_low),
            maxval=jnp.asarray(self.obj_range_high))
        return state.replace(
            goal=q,
            body_pos=state.body_pos.at[0].set(obj),
            body_quat=state.body_quat.at[0].set(jnp.array([0., 0., 0., 1.])),
            body_vel=jnp.zeros_like(state.body_vel),
            body_ang=jnp.zeros_like(state.body_ang))

    def task_obs(self, env, state, fk):
        return jnp.concatenate([
            state.body_pos[0], state.body_quat[0],
            state.body_vel[0], state.body_ang[0]])

    def achieved_goal(self, env, state, fk):
        return state.body_quat[0]

    def is_success(self, env, achieved, desired, state):
        return angle_distance(achieved, desired) < self.distance_threshold

    def compute_reward(self, env, achieved, desired, state, fk):
        return self.reward_from_aux(env, achieved, desired, jnp.zeros(0))

    def reward_from_aux(self, env, achieved, desired, aux):
        d = angle_distance(achieved, desired)
        if self.reward_type == "sparse":
            return -(d > self.distance_threshold).astype(jnp.float32)
        return -d.astype(jnp.float32)
