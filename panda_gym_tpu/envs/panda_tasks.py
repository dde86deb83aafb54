"""Concrete env factories binding robot + task (reference envs/panda_tasks.py).

Each class builds the functional core and exposes the gymnasium surface via
GymAdapter; `make_*_core()` returns the raw functional env for vmapped /
sharded training (the TPU-native path).

Base positions / gripper blocking follow the reference exactly
(panda_tasks.py:71-88 PandaReachEnv etc.: classic tasks put the base at
(-0.6, 0, 0); ReachAO at the origin).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from panda_gym_tpu.envs.core import GymAdapter, RobotTaskEnv
from panda_gym_tpu.envs.robot import MyCobotRobot, PandaConfig, PandaRobot
from panda_gym_tpu.envs.tasks.classic import (
    Flip, PickAndPlace, Push, Reach, Slide, Stack,
)

_CLASSIC_BASE = (-0.6, 0.0, 0.0)


def _robot(block_gripper: bool, control_type: str,
           obs_type: Tuple[str, ...] = ("ee",),
           base_position=_CLASSIC_BASE, **kw) -> PandaRobot:
    return PandaRobot(PandaConfig(
        block_gripper=block_gripper, control_type=control_type,
        obs_type=obs_type, base_position=base_position, **kw))


def make_reach_core(reward_type="sparse", control_type="js", goal_range=0.3,
                    **kw) -> RobotTaskEnv:
    robot = _robot(True, control_type)
    return RobotTaskEnv(robot, Reach(reward_type=reward_type, goal_range=goal_range))


def make_push_core(reward_type="sparse", control_type="js", **kw) -> RobotTaskEnv:
    robot = _robot(True, control_type)
    return RobotTaskEnv(robot, Push(reward_type=reward_type))


def make_slide_core(reward_type="sparse", control_type="ee", **kw) -> RobotTaskEnv:
    robot = _robot(True, control_type)
    return RobotTaskEnv(robot, Slide(reward_type=reward_type))


def make_pick_and_place_core(reward_type="sparse", control_type="ee", **kw) -> RobotTaskEnv:
    robot = _robot(False, control_type)
    return RobotTaskEnv(robot, PickAndPlace(reward_type=reward_type))


def make_stack_core(reward_type="sparse", control_type="ee", **kw) -> RobotTaskEnv:
    robot = _robot(False, control_type)
    return RobotTaskEnv(robot, Stack(reward_type=reward_type))


def make_flip_core(reward_type="sparse", control_type="ee", **kw) -> RobotTaskEnv:
    robot = _robot(False, control_type)
    return RobotTaskEnv(robot, Flip(reward_type=reward_type))


def make_mycobot_reach_core(reward_type="sparse", control_type="js",
                            goal_range=0.3, **kw) -> RobotTaskEnv:
    robot = MyCobotRobot(PandaConfig(
        block_gripper=True, control_type=control_type,
        base_position=_CLASSIC_BASE))
    return RobotTaskEnv(robot, Reach(reward_type=reward_type,
                                     goal_range=goal_range))


_CORE_FACTORIES = {
    "mycobotreach": make_mycobot_reach_core,
    "reach": make_reach_core,
    "push": make_push_core,
    "slide": make_slide_core,
    "pickandplace": make_pick_and_place_core,
    "stack": make_stack_core,
    "flip": make_flip_core,
}


def make_core(task: str, **kw) -> RobotTaskEnv:
    return _CORE_FACTORIES[task.lower()](**kw)


# gymnasium entry points -----------------------------------------------------

class PandaReachEnv(GymAdapter):
    def __init__(self, render: bool = False, reward_type: str = "sparse",
                 control_type: str = "js", goal_range=0.3,
                 show_goal_space=False, **kw):
        super().__init__(make_reach_core(reward_type, control_type, goal_range))


class PandaPushEnv(GymAdapter):
    def __init__(self, render: bool = False, reward_type: str = "sparse",
                 control_type: str = "js", **kw):
        super().__init__(make_push_core(reward_type, control_type))


class PandaSlideEnv(GymAdapter):
    def __init__(self, render: bool = False, reward_type: str = "sparse",
                 control_type: str = "ee", **kw):
        super().__init__(make_slide_core(reward_type, control_type))


class PandaPickAndPlaceEnv(GymAdapter):
    def __init__(self, render: bool = False, reward_type: str = "sparse",
                 control_type: str = "ee", **kw):
        super().__init__(make_pick_and_place_core(reward_type, control_type))


class PandaStackEnv(GymAdapter):
    def __init__(self, render: bool = False, reward_type: str = "sparse",
                 control_type: str = "ee", **kw):
        super().__init__(make_stack_core(reward_type, control_type))


class PandaFlipEnv(GymAdapter):
    def __init__(self, render: bool = False, reward_type: str = "sparse",
                 control_type: str = "ee", **kw):
        super().__init__(make_flip_core(reward_type, control_type))


class PandaReachCheckerEnv(GymAdapter):
    """Reach variant used by the reference as an analytical-model-free probe
    (panda_tasks.py:111-129: Panda with use_robotics_toolbox=False,
    action_limiter="clip", same Reach task).  In this framework the robot has
    no stateful analytical twin, so this reduces to Reach with the "clip"
    limiter made explicit."""

    def __init__(self, render: bool = False, reward_type: str = "sparse",
                 control_type: str = "js", goal_range=0.3,
                 show_goal_space=False, **kw):
        robot = _robot(True, control_type, action_limiter="clip")
        super().__init__(RobotTaskEnv(
            robot, Reach(reward_type=reward_type, goal_range=goal_range)))


class MyCobotReachEnv(GymAdapter):
    def __init__(self, render: bool = False, reward_type: str = "sparse",
                 control_type: str = "js", goal_range=0.3, **kw):
        super().__init__(make_mycobot_reach_core(reward_type, control_type,
                                                 goal_range))
