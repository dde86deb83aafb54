"""MyCobot 280 6-DoF arm model — the reference's second robot (robot plugin
seam demo, /root/reference/panda_gym/envs/robots/mycobot.py).

The reference loads "mycobot/mycobot.urdf" through PyBullet's search path
(mycobot.py:52) but does NOT ship that asset, and passes zero joint forces
(mycobot.py:56) so its motors exert no torque.  We reproduce the same
interface; the kinematic parameters below approximate the Elephant Robotics
myCobot 280 (≈280 mm reach, joint layout yaw-pitch-pitch-pitch-yaw-roll).
Effort defaults to 0 N·m for faithfulness (free-drifting joints, as the
reference's zero forces produce) and can be overridden for a usable arm.
"""
import numpy as np

HALF_PI = np.pi / 2.0

# (name, type, parent, child, xyz, rpy, axis, lower, upper, effort, velocity)
JOINTS = [
    ("joint1", "revolute", "base", "link1",
     (0.0, 0.0, 0.13156), (0, 0, 0), (0, 0, 1), -2.88, 2.88, 0.0, 2.0),
    ("joint2", "revolute", "link1", "link2",
     (0.0, 0.0, 0.0), (HALF_PI, 0, 0), (0, 0, 1), -2.88, 2.88, 0.0, 2.0),
    ("joint3", "revolute", "link2", "link3",
     (0.0, -0.1104, 0.0), (0, 0, 0), (0, 0, 1), -2.88, 2.88, 0.0, 2.0),
    ("joint4", "revolute", "link3", "link4",
     (0.0, -0.096, 0.0), (0, 0, 0), (0, 0, 1), -2.88, 2.88, 0.0, 2.0),
    ("joint5", "revolute", "link4", "link5",
     (0.0, -0.07318, 0.0), (-HALF_PI, 0, 0), (0, 0, 1), -2.88, 2.88, 0.0, 2.0),
    ("joint6", "revolute", "link5", "link6",
     (0.0, 0.0456, 0.0), (HALF_PI, 0, 0), (0, 0, 1), -3.05, 3.05, 0.0, 2.0),
    ("ee_joint", "fixed", "link6", "ee",
     (0.0, 0.0, 0.034), (0, 0, 0), (0, 0, 0), 0.0, 0.0, 0.0, 0.0),
]

LINKS = {
    "base": (0.3, (0.0, 0.0, 0.05), (0.01, 0.01, 0.01)),
    "link1": (0.25, (0.0, 0.0, -0.03), (0.01, 0.01, 0.01)),
    "link2": (0.2, (0.0, -0.05, 0.0), (0.01, 0.01, 0.01)),
    "link3": (0.15, (0.0, -0.05, 0.0), (0.01, 0.01, 0.01)),
    "link4": (0.1, (0.0, -0.03, 0.0), (0.01, 0.01, 0.01)),
    "link5": (0.1, (0.0, 0.02, 0.0), (0.01, 0.01, 0.01)),
    "link6": (0.05, (0.0, 0.0, 0.01), (0.005, 0.005, 0.005)),
    "ee": (0.0, (0.0, 0.0, 0.0), (0.001, 0.001, 0.001)),
}

COLLISION_CAPSULES = {
    "link1": [((0, 0, -0.10), (0, 0, 0.0), 0.035)],
    "link2": [((0, 0, 0), (0, -0.1104, 0), 0.03)],
    "link3": [((0, 0, 0), (0, -0.096, 0), 0.025)],
    "link4": [((0, 0, 0), (0, -0.0732, 0), 0.02)],
    "link5": [((0, 0, 0), (0, 0.0456, 0), 0.02)],
    "link6": [((0, 0, 0), (0, 0, 0.034), 0.015)],
}

EE_SITE = 6  # "ee" link index (joint order) — mycobot.py:60 ee_link = 6
NEUTRAL = np.zeros(6, dtype=np.float32)  # mycobot.py:59


def make_mycobot_model(base_position=(0.0, 0.0, 0.0), effort: float = 0.0):
    from panda_gym_tpu.models.chain import build_chain

    overrides = {f"joint{i}": effort for i in range(1, 7)} if effort else {}
    return build_chain(
        joints=JOINTS, links=LINKS, root_link="base",
        collision_capsules=COLLISION_CAPSULES,
        collision_groups=[f"link{i}" for i in range(1, 7)],
        base_position=base_position,
        effort_overrides=overrides,
    )
