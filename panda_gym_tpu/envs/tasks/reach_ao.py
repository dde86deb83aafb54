"""ReachAO — reach-among-obstacles task family (the fork's centerpiece).

TPU-native re-implementation of /root/reference/panda_gym/envs/tasks/
reach_ao.py (1416 LoC): ~27 scenario variants, obstacle randomization,
collision-free rejection sampling of goal/obstacles/robot pose, per-substep
collision checking with episode truncation, 5 obstacle-observation modes and
6 reward functions.

Design differences from the reference (imperative PyBullet -> functional
JAX): scenarios are *data* (ScenarioSpec) instead of builder methods
(reach_ao.py:225-266); unbounded rejection-sampling `while` loops
(reach_ao.py:1101-1167, 9999-iteration guards) become fixed-budget masked
candidate draws with the same fallbacks; dynamic body creation/removal
(random cuboid rebuild :1084-1089, random obstacle count :1062-1082) becomes
fixed-capacity arrays with size/position updates (teleport-far semantics kept
verbatim: inactive obstacles go to (99.9, 99.9, -99.9), :1078).
"""
from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from panda_gym_tpu.envs.core import GymAdapter, RobotTaskEnv, Task
from panda_gym_tpu.envs.robot import PandaConfig, PandaRobot
from panda_gym_tpu.models import panda_constants as pc
from panda_gym_tpu.ops import kinematics as K
from panda_gym_tpu.ops import contact as C
from panda_gym_tpu.rl.config import TrainConfig
from panda_gym_tpu.sim.engine import (group_obstacle_distances,
                                      group_table_distances)
from panda_gym_tpu.sim.state import OBS_BOX, OBS_SPHERE, build_scene
from panda_gym_tpu.utils import distance, unit_vector

_ASSET_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                           "scenarios_compiled.json")

# goal-space defaults (reach_ao.py:74-82)
_GOAL_RANGE = 0.3
_X_OFFSET = 0.6
DEFAULT_GOAL_LOW = (-_GOAL_RANGE / 2.5 + _X_OFFSET, -_GOAL_RANGE / 1.5, 0.0)
DEFAULT_GOAL_HIGH = (_GOAL_RANGE / 2.5 + _X_OFFSET, _GOAL_RANGE / 1.5, _GOAL_RANGE)

# cube sizes (reach_ao.py:66-69)
CUBE_LARGE = (0.05, 0.05, 0.05)
CUBE_MEDIUM = (0.03, 0.03, 0.03)
CUBE_SMALL = (0.02, 0.02, 0.02)
CUBE_MINI = (0.01, 0.01, 0.01)

NEUTRAL = tuple(pc.NEUTRAL_JOINT_VALUES[:7])


@dataclass(frozen=True)
class ScenarioSpec:
    """Declarative scenario description (replaces create_scenario_* methods)."""

    goal_sampler: Tuple = ("range",)          # ('range',) | ('hollow', rmin, rmax, upper, front, three_quarter)
    obstacle_sampler: Tuple = ("range",)      # ('range',) | ('wang',) | ('experimental',) | ('wang_paper',) | ('goal_hollow', rmin, rmax)
    pose_randomizer: Optional[Tuple] = None   # ('torus', front_only) | ('ik_goal',) | ('ik_sphere', rmin, rmax) | ('random_base',) | ('ik_range', low, high)
    randomize_robot_pose: bool = False
    pose_randomize_prob: float = 1.0          # curriculum axis: fraction of episodes with a randomized start pose (rest start neutral)
    neutral_joints: Tuple[float, ...] = NEUTRAL
    goal_low: Tuple[float, float, float] = DEFAULT_GOAL_LOW
    goal_high: Tuple[float, float, float] = DEFAULT_GOAL_HIGH
    spheres: Tuple[float, ...] = ()           # dynamic sphere radii
    cuboids: Tuple[Tuple[float, float, float], ...] = ()  # half extents
    obstacle_init: Tuple[float, float, float] = (0.1, 0.0, 0.1)  # create_obstacle_* default (reach_ao.py:819, 841)
    cuboid_positions: Tuple = ()              # fixed cuboid positions (wall)
    static_scenario: Optional[str] = None     # compiled-asset key
    randomize_obstacle_position: bool = False
    random_num_obs: bool = False
    sample_size_obs: Tuple[int, int] = (0, 0)
    allow_overlapping_obstacles: bool = False
    random_size_cuboids: bool = False


def _reach1():
    # reach_ao.py:518-522
    return ScenarioSpec(
        goal_low=(-0.2 + 0.6, -0.2, 0.0), goal_high=(0.2 + 0.6, 0.2, 0.4),
        pose_randomizer=("torus", True))


def _reach2():
    # :524-531
    return ScenarioSpec(goal_sampler=("hollow", 0.5, 0.85, True, False, True),
                        pose_randomizer=("torus", True))


def _reach3():
    # :533-539
    return ScenarioSpec(goal_sampler=("hollow", 0.5, 0.85, True, False, True),
                        pose_randomizer=("torus", False))


def _reachao1():
    # :541-545
    return replace(_reach1(), randomize_obstacle_position=True, spheres=(0.04,))


def _reachao2():
    # :547-564
    return ScenarioSpec(
        goal_sampler=("hollow", 0.5, 0.8, True, True, False),
        obstacle_sampler=("wang",),
        spheres=(0.05, 0.05),
        randomize_obstacle_position=True,
        pose_randomizer=("ik_goal",))


def _reachao3():
    # :573-585
    return ScenarioSpec(
        goal_sampler=("hollow", 0.5, 0.8, True, False, False),
        obstacle_sampler=("wang",),
        spheres=(0.05, 0.05, 0.05),
        randomize_obstacle_position=True,
        pose_randomizer=("ik_goal",))


def _reachao_rand():
    # :587-599
    return replace(
        _reachao3(),
        obstacle_sampler=("experimental",),
        cuboids=(CUBE_LARGE, CUBE_LARGE, CUBE_LARGE),
        random_num_obs=True, allow_overlapping_obstacles=True,
        sample_size_obs=(4, 6))


def _reachao_rand_start():
    # :601-604
    return replace(_reachao_rand(), randomize_robot_pose=True,
                   pose_randomizer=("ik_sphere", 0.45, 0.7))


def _reachao_rand_shape():
    # :606-608
    return replace(_reachao_rand(), random_size_cuboids=True)


def _wang(n: int):
    # :646-699
    return ScenarioSpec(
        goal_sampler=("hollow", 0.4, 0.95, True, False, False),
        obstacle_sampler=("wang_paper",),
        spheres=(0.05,) * n,
        randomize_obstacle_position=True,
        pose_randomizer=("torus", False))


def _wangexp(n: int):
    # :701-722
    return ScenarioSpec(
        goal_sampler=("hollow", 0.5, 0.8, True, False, False),
        obstacle_sampler=("wang",),
        spheres=(0.05,) * n,
        randomize_obstacle_position=True,
        sample_size_obs=(n, n),
        pose_randomizer=("random_base",))


def _wall():
    # :457-468
    return ScenarioSpec(
        goal_low=(0.45, -0.6, 0.1), goal_high=(0.7, -0.1, 0.3),
        neutral_joints=(0.94551719, 0.65262327, 0.12742699, -1.74347465,
                        -0.16996126, 1.97424632, 0.88058222),
        cuboids=((0.2, 0.05, 0.3),),
        cuboid_positions=((0.0, 0.0, 0.1),))


def _wall_h(half_height: float):
    """Training-only wall variant with a reduced wall height.

    The canonical wall (z half-extent 0.3, top at z=0.4) defeats both sparse
    exploration and the NEO prior (local minimum behind the wall), and the
    random-start recipe fails for it: IK'd goal-side starts leave the arm
    wrapped ~5 cm from the wall, so nearly every training episode collides
    within a few steps.  Instead we curriculum over the OBSTACLE: a low wall
    is easy to arc over from the canonical fixed start, and the policy
    adapts its arc upward as the wall is raised (stages wall_h1 -> wall_h2
    -> wall).  Goal region, start pose, and everything else stay canonical
    (reach_ao.py:457-468)."""
    return replace(_wall(), cuboids=((0.2, 0.05, half_height),))


def _showcase():
    # :724-767 — three spheres in a shell, purely visual scenario
    return ScenarioSpec(spheres=(0.05, 0.05, 0.05),
                        obstacle_sampler=("goal_hollow", 0.4, 0.95))


_TUNNEL_NEUTRAL = (-1.0, -0.3, 0.0, -2.2, 0.0, 2.0, np.pi / 4)
_BENCH_GOAL = dict(goal_low=(0.5, -0.3, 0.0), goal_high=(0.85, 0.3, 0.3))


def _benchmark_scenarios():
    # create_scenario_* for asset-backed scenes (reach_ao.py:308-516)
    s = {}
    s["narrow_tunnel"] = ScenarioSpec(
        neutral_joints=_TUNNEL_NEUTRAL,
        goal_low=(0.55, 0.2, 0.2), goal_high=(0.75, 0.4, 0.75),
        static_scenario="narrow_tunnel", randomize_robot_pose=True,
        pose_randomizer=("ik_range", (0.0, -0.6, 0.2), (0.5, -0.5, 0.7)))
    s["tunnel"] = ScenarioSpec(
        neutral_joints=_TUNNEL_NEUTRAL,
        goal_low=(0.55, 0.2, 0.2), goal_high=(0.75, 0.4, 0.75),
        static_scenario="tunnel")
    s["workshop"] = ScenarioSpec(
        neutral_joints=(0.00887326, -0.05377409, -0.03621967, -1.9094068,
                        0.08791409, 2.00265486, 0.76681184),
        goal_low=(-0.7, -0.7, 0.4), goal_high=(0.1, -0.4, 0.7),
        static_scenario="workshop")
    s["workshop2"] = replace(
        s["workshop"], randomize_robot_pose=True,
        pose_randomizer=("ik_range", (-0.5, -0.6, 0.6), (0.2, -0.3, 0.7)),
        goal_low=(0.5, -0.15, 0.4), goal_high=(0.6, 0.15, 0.5))
    s["workshop3"] = s["workshop"]
    s["industrial"] = ScenarioSpec(
        goal_low=(0.5, -0.1, 0.55), goal_high=(0.6, 0.1, 0.75),
        static_scenario="industrial", randomize_robot_pose=True,
        pose_randomizer=("ik_range", (-0.5, -0.8, 0.4), (0.2, -0.4, 0.7)))
    s["kasys"] = ScenarioSpec(
        goal_low=(1.4, -0.15, 0.45), goal_high=(1.7, 0.12, 0.6),
        static_scenario="kasys")
    s["library"] = ScenarioSpec(
        neutral_joints=(0.0, 0.12001979, 0.0, -1.64029458, 0.02081271, 3.1, 0.77979846),
        goal_low=(0.2, -0.3, 0.0), goal_high=(0.7, 0.3, 0.6),
        static_scenario="library")
    s["library1"] = replace(
        s["library"],
        neutral_joints=(-2.961, -0.031, -0.212, -1.603, 0.008, 3.087, 0.775),
        goal_low=(0.5, -0.3, 0.0), goal_high=(0.85, 0.3, 0.3))
    s["library2"] = replace(
        s["library"], goal_low=(-0.7, -0.4, 0.4), goal_high=(-0.55, 0.4, 0.85))
    s["bookshelves"] = ScenarioSpec(
        goal_low=(0.6, -0.35, 0.2), goal_high=(0.7, 0.35, 0.8),
        static_scenario="bookshelves")
    # warehouse loads the tabletop2 assets — reference quirk (reach_ao.py:470-476)
    s["warehouse"] = ScenarioSpec(static_scenario="tabletop2", **_BENCH_GOAL)
    s["countertop"] = ScenarioSpec(static_scenario="countertop", **_BENCH_GOAL)
    s["kitchen"] = ScenarioSpec(static_scenario="kitchen", **_BENCH_GOAL)
    s["raised_shelves"] = ScenarioSpec(static_scenario="raised_shelves", **_BENCH_GOAL)
    s["tabletop"] = ScenarioSpec(static_scenario="tabletop", **_BENCH_GOAL)
    s["tabletop2"] = ScenarioSpec(static_scenario="tabletop2", **_BENCH_GOAL)
    return s


def get_scenario(name: str) -> ScenarioSpec:
    """Scenario registry (reach_ao.py:229-266), incl. 'name-N' variants.

    A ``<scene>_rs`` suffix yields a random-start training variant of any
    registered scene: the start pose is IK'd to a point sampled from the
    scene's own goal distribution (the trick the reference hand-writes per
    scene as robot_pose_randomizer, reach_ao.py:310-317,364-372,395-400).
    Used as stage 1 of a two-stage fine-tune curriculum on scenes whose
    fixed start pose otherwise never explores past the obstacles; the
    canonical scene (fixed start) remains the benchmark environment.
    """
    if name.endswith("_rs"):
        spec = get_scenario(name[:-3])
        return replace(spec, randomize_robot_pose=True,
                       pose_randomizer=("ik_goal",))
    m = re.fullmatch(r"(.+)_p(\d{1,2})", name)
    if m:
        # start-pose-probability curriculum variant: '<scene>_p25' is
        # <scene> with only 25% of episodes starting from a randomized
        # pose (the rest start neutral).  Stage axis for hard
        # pose-randomized scenes, like the wall_h* height curriculum.
        spec = get_scenario(m.group(1))
        return replace(spec, pose_randomize_prob=int(m.group(2)) / 100.0)
    parts = name.split("-")
    base = parts[0]
    n = int(parts[1]) if len(parts) > 1 else 3
    if base == "wangexp_3":  # reference default string; equals wangexp-3
        base, n = "wangexp", 3
    simple = {
        "reach1": _reach1, "reach2": _reach2, "reach3": _reach3,
        "reachao1": _reachao1, "reachao2": _reachao2, "reachao3": _reachao3,
        "reachao_rand": _reachao_rand,
        "reachao_rand_start": _reachao_rand_start,
        "reachao_rand_shape": _reachao_rand_shape,
        "wall": _wall, "showcase": _showcase,
        "wall_h1": lambda: _wall_h(0.1), "wall_h15": lambda: _wall_h(0.15),
        "wall_h22": lambda: _wall_h(0.22), "wall_h2": lambda: _wall_h(0.2),
    }
    if base in simple:
        return simple[base]()
    if base == "wang":
        return _wang(n)
    if base == "wangexp":
        return _wangexp(n)
    bench = _benchmark_scenarios()
    if base in bench:
        return bench[base]
    raise ValueError(f"Scenario {name} not found!")  # reach_ao.py:262-264


def _load_static_boxes(name: Optional[str]):
    if name is None:
        return np.zeros((0, 6), np.float32)
    with open(_ASSET_PATH) as f:
        data = json.load(f)["scenarios"]
    if name not in data:
        return np.zeros((0, 6), np.float32)
    return np.asarray(data[name]["boxes"], np.float32).reshape(-1, 6)


# ---------------------------------------------------------------------------
# samplers (pure, key-driven)
# ---------------------------------------------------------------------------

def sample_hollow_sphere(key, rmin, rmax, upper=False, front=False,
                         three_quarter=False):
    """Uniform point in a spherical shell (reach_ao.py:1188-1211)."""
    k1, k2, k3 = jax.random.split(key, 3)
    if front:
        phi = jax.random.uniform(k1, minval=-0.5 * jnp.pi, maxval=0.5 * jnp.pi)
    elif three_quarter:
        phi = jax.random.uniform(k1, minval=-0.75 * jnp.pi, maxval=0.75 * jnp.pi)
    else:
        phi = jax.random.uniform(k1, minval=0.0, maxval=2 * jnp.pi)
    theta = jax.random.uniform(k2, minval=0.0,
                               maxval=(0.5 if upper else 1.0) * jnp.pi)
    r = jnp.cbrt(jax.random.uniform(k3, minval=rmin ** 3, maxval=rmax ** 3))
    return jnp.array([r * jnp.sin(theta) * jnp.cos(phi),
                      r * jnp.sin(theta) * jnp.sin(phi),
                      r * jnp.cos(theta)])


def sample_inside_torus(key, R=0.5, r=0.05, front_half_only=False):
    """reach_ao.py:1213-1236 (z shifted +0.5)."""
    k1, k2, k3 = jax.random.split(key, 3)
    if front_half_only:
        theta = jax.random.uniform(k1, minval=-0.5 * jnp.pi, maxval=0.5 * jnp.pi)
    else:
        theta = jax.random.uniform(k1, minval=0.0, maxval=2 * jnp.pi)
    phi = jax.random.uniform(k2, minval=0.0, maxval=2 * jnp.pi)
    rad = r * jnp.sqrt(jax.random.uniform(k3))
    x = (R + rad * jnp.cos(phi)) * jnp.cos(theta)
    y = (R + rad * jnp.cos(phi)) * jnp.sin(theta)
    z = rad * jnp.sin(phi)
    return jnp.array([x, y, z + 0.5])


# ---------------------------------------------------------------------------
# the task
# ---------------------------------------------------------------------------

class ReachAO(Task):
    check_collision = True
    terminate_on_success = True

    N_CANDIDATES = 32      # fixed rejection-sampling budget per draw
    POSE_CANDIDATES = 8

    def __init__(self, robot: PandaRobot, scenario: str = "wangexp_3",
                 config: Optional[TrainConfig] = None,
                 ee_error_threshold: float = 0.05,
                 speed_threshold: float = 0.5,
                 capacity: Optional[int] = None):
        self.config = config or TrainConfig()
        self.spec = get_scenario(scenario)
        self.scenario_name = scenario
        self.robot = robot
        self.ee_error_threshold = float(ee_error_threshold)
        self.ee_speed_threshold = float(speed_threshold)
        self.randomize_robot_pose = (self.spec.randomize_robot_pose
                                     or self.config.randomize_robot_pose)
        self.truncate_on_collision = self.config.truncate_on_collision
        self.terminate_on_success = self.config.terminate_on_success
        # moving obstacles: reset samples velocities (below) and the engine
        # integrates them each substep (reference sets base velocities and
        # PyBullet integrates, reach_ao.py:104, 997-1001, 1091-1095)
        self.moving_obstacles = bool(
            getattr(self.config, "randomize_obstacle_velocity", False))
        self.obstacle_obs = self.config.task_observations.get("obstacles",
                                                              "vectors+closest_per_link")
        self.prior = self.config.task_observations.get("prior")
        # Distance cap applied to the observation's per-link distances only
        # (rewards keep raw values).  The reference feeds raw
        # max_distance=999.0 readings into the policy net (reach_ao.py:907)
        # — on scenes where Bullet's convex blindness yields 999s for buried
        # links (its "wall" stage), those inputs blow up a resumed critic.
        # Default keeps reference parity; fine-tunes may set e.g. 2.0.
        self.obs_max_distance = float(
            self.config.task_observations.get("max_distance", 999.0))

        # scene: plane + big table (reach_ao.py:268-290)
        self.scene = build_scene([], 2.0, 1.3, 0.4, 0.0)

        # obstacle roster: dynamic spheres + cuboids, then static scenario boxes
        spec = self.spec
        self.n_spheres = len(spec.spheres)
        self.n_cuboids = len(spec.cuboids)
        self.static_boxes = _load_static_boxes(spec.static_scenario)
        self.n_dynamic = self.n_spheres + self.n_cuboids
        # `capacity` pads the obstacle arrays beyond this scenario's natural
        # roster (extra slots stay inactive at 99.9) so states from different
        # scenarios share one shape — the multi-scene mixture env (below)
        # selects scenarios per env under lax.switch, which requires it.
        self.n_obstacles = max(self.n_dynamic + len(self.static_boxes), 1,
                               capacity or 0)

        ngroup = robot.model.ngroup
        self.obs_vec_dim = 3 * ngroup  # 27 for the 9 collision links
        self.past_obs_dim = self.obs_vec_dim

        # neutral override (scenarios set robot.neutral_joint_values)
        robot.neutral[:7] = np.asarray(spec.neutral_joints, np.float32)

    # -------------------------------------------------- initial obstacle state
    def _init_obstacles(self, state):
        spec = self.spec
        no = state.obstacle_pos.shape[0]
        pos = np.full((no, 3), 99.9, np.float32)
        size = np.full((no, 3), 1e-3, np.float32)
        typ = np.zeros(no, np.int32)
        active = np.zeros(no, bool)
        i = 0
        for r in spec.spheres:
            pos[i] = spec.obstacle_init
            size[i] = (r, r, r)
            typ[i] = OBS_SPHERE
            active[i] = True
            i += 1
        for j, h in enumerate(spec.cuboids):
            pos[i] = (spec.cuboid_positions[j] if j < len(spec.cuboid_positions)
                      else spec.obstacle_init)
            size[i] = h
            typ[i] = OBS_BOX
            active[i] = True
            i += 1
        for b in self.static_boxes:
            pos[i] = b[:3]
            size[i] = b[3:]
            typ[i] = OBS_BOX
            active[i] = True
            i += 1
        return state.replace(
            obstacle_pos=jnp.asarray(pos), obstacle_size=jnp.asarray(size),
            obstacle_type=jnp.asarray(typ), obstacle_active=jnp.asarray(active),
            obstacle_vel=jnp.zeros((no, 3)))

    # ------------------------------------------------------------- distances
    def _point_obstacle_dist(self, state, p, radius):
        """Distance of a probe sphere to every obstacle (negative overlap)."""
        no = state.obstacle_pos.shape[0]
        d_s = jnp.linalg.norm(state.obstacle_pos - p, axis=-1) \
            - state.obstacle_size[:, 0] - radius
        d_b, _, _, _ = C.sphere_box_distance(
            jnp.broadcast_to(p, (no, 3)), radius, state.obstacle_pos,
            jnp.broadcast_to(jnp.eye(3), (no, 3, 3)), state.obstacle_size)
        d = jnp.where(state.obstacle_type == OBS_BOX, d_b, d_s)
        return jnp.where(state.obstacle_active, d, 999.0)

    def _probe_vs_robot(self, fk, p, radius):
        model = self.robot.model
        cap_p0, cap_p1 = K.capsule_endpoints_world(model, fk)
        d, _, _ = C.capsule_sphere_distance(
            cap_p0, cap_p1, model.cap_radius,
            jnp.broadcast_to(p, cap_p0.shape), radius)
        return jnp.min(d)

    def _probe_vs_table(self, p, radius):
        d, _, _, _ = C.sphere_box_distance(
            p, radius, self.scene.table_center, jnp.eye(3), self.scene.table_half)
        return d

    def _obstacle_vs_robot(self, fk, pos, size, typ):
        model = self.robot.model
        cap_p0, cap_p1 = K.capsule_endpoints_world(model, fk)
        ncap = cap_p0.shape[0]
        d_s, _, _ = C.capsule_sphere_distance(
            cap_p0, cap_p1, model.cap_radius,
            jnp.broadcast_to(pos, (ncap, 3)), size[0])
        d_b, _, _, _ = C.capsule_box_distance(
            cap_p0, cap_p1, model.cap_radius,
            jnp.broadcast_to(pos, (ncap, 3)),
            jnp.broadcast_to(jnp.eye(3), (ncap, 3, 3)),
            jnp.broadcast_to(size, (ncap, 3)))
        return jnp.min(jnp.where(typ == OBS_BOX, d_b, d_s))

    def _obstacle_vs_table(self, pos, size, typ):
        # sphere vs table box; boxes approximated by bounding sphere for the
        # placement margin test (cheap, conservative within ~|size|)
        r = jnp.where(typ == OBS_BOX, jnp.linalg.norm(size), size[0])
        d, _, _, _ = C.sphere_box_distance(
            pos, r, self.scene.table_center, jnp.eye(3), self.scene.table_half)
        return d

    def _obstacle_vs_obstacles(self, state, idx, pos, size, typ):
        """Distance of a candidate obstacle to all *other* obstacles."""
        r_self = jnp.where(typ == OBS_BOX, jnp.linalg.norm(size), size[0])
        d = self._point_obstacle_dist(state, pos, r_self)
        return jnp.where(jnp.arange(d.shape[0]) == idx, 999.0, d)

    # ------------------------------------------------------------- samplers
    def _sample_goal_one(self, key, state, fk):
        kind = self.spec.goal_sampler[0]
        if kind == "hollow":
            _, rmin, rmax, upper, front, tq = self.spec.goal_sampler
            return sample_hollow_sphere(key, rmin, rmax, upper, front, tq)
        return jax.random.uniform(
            key, (3,), minval=jnp.asarray(self.spec.goal_low),
            maxval=jnp.asarray(self.spec.goal_high))

    def _sample_obstacle_one(self, key, state, fk, goal):
        """One obstacle-position draw (reach_ao.py:610-644 mixtures)."""
        kind = self.spec.obstacle_sampler[0]
        ee = self.robot.ee_position(fk)
        if kind == "wang":
            # sample_obstacle_wang (reach_ao.py:620-633)
            kr, k1, k2, k3 = jax.random.split(key, 4)
            rand = jax.random.uniform(kr)
            near_goal = goal + sample_hollow_sphere(k1, 0.1, 0.5)
            near_ee = ee + sample_hollow_sphere(k2, 0.1, 0.4)
            # "near base" anchors at link 0's position (reach_ao.py:633)
            base = K.site_com_position(self.robot.model, fk, 0)
            near_base = base + sample_hollow_sphere(k3, 0.3, 0.6, True)
            return jnp.where(rand > 0.3, near_goal,
                             jnp.where(rand > 0.1, near_ee, near_base))
        if kind == "experimental":
            # sample_obstacle_experimental (reach_ao.py:635-644)
            kr, ks = jax.random.split(key)
            rand = jax.random.uniform(kr)
            s = sample_hollow_sphere(ks, 0.1, 0.5)
            return jnp.where(rand > 0.5, goal + s, ee + s)
        if kind == "wang_paper":
            # create_scenario_wang's sampler (reach_ao.py:650-658)
            kr, k1, k2 = jax.random.split(key, 3)
            rand = jax.random.uniform(kr)
            near_goal = goal + sample_hollow_sphere(k1, 0.2, 0.6)
            near_ee = ee + sample_hollow_sphere(k2, 0.2, 0.4)
            return jnp.where(rand > 0.3, near_goal, near_ee)
        if kind == "goal_hollow":
            _, rmin, rmax = self.spec.obstacle_sampler
            return sample_hollow_sphere(key, rmin, rmax)
        # default: goal-range uniform (reach_ao.py:78, 1183-1186)
        return jax.random.uniform(
            key, (3,), minval=jnp.asarray(self.spec.goal_low),
            maxval=jnp.asarray(self.spec.goal_high))

    # --------------------------------------------------------- robot posing
    def reset_robot(self, env, state, key):
        q, qd = env.robot.reset_q()
        state = state.replace(q=q, qd=qd, ctrl_target=q)
        if not self.randomize_robot_pose or self.spec.pose_randomizer is None:
            return state
        prob = self.spec.pose_randomize_prob
        if prob >= 1.0:
            q_new = self._randomize_pose(env, state, key)
        else:
            # start-pose curriculum: randomize only a fraction of episodes
            # (key split gated on prob so prob=1.0 scenes keep their streams)
            k_gate, k_pose = jax.random.split(key)
            take = jax.random.bernoulli(k_gate, prob)
            q_new = jnp.where(take, self._randomize_pose(env, state, k_pose), q)
        return state.replace(q=q_new, ctrl_target=q_new)

    def _randomize_pose(self, env, state, key):
        """Pose randomizers (reach_ao.py:782-817, 1238-1241)."""
        model = env.robot.model
        kind = self.spec.pose_randomizer[0]
        q0 = jnp.asarray(env.robot.neutral)

        if kind == "random_base":
            # set_random_robot_base (reach_ao.py:1238-1241)
            j0 = jax.random.uniform(key, minval=pc.JOINT_LIM_MIN[0],
                                    maxval=pc.JOINT_LIM_MAX[0])
            return q0.at[0].set(j0)

        def ik_to(target, k=None):
            return K.dls_ik(model, env.robot.ee_site, target, q0=q0, n_iters=30)

        if kind == "torus":
            front = self.spec.pose_randomizer[1]
            # rejection: 0.4 <= z_ee <= 0.6 (set_robot_random_pose :806-817)
            keys = jax.random.split(key, self.POSE_CANDIDATES)
            targets = jax.vmap(lambda k: sample_inside_torus(
                k, front_half_only=front))(keys)
            qs = jax.vmap(ik_to)(targets)
            zs = jax.vmap(lambda q: K.site_com_position(
                model, K.fk_world(model, q), env.robot.ee_site)[2])(qs)
            ok = (zs >= 0.4) & (zs <= 0.6)
            idx = jnp.argmax(ok)
            return jnp.where(jnp.any(ok), qs[idx], q0)
        if kind == "ik_goal":
            target = self._sample_goal_one(key, state,
                                           K.fk_world(model, state.q))
            return ik_to(target)
        if kind == "ik_sphere":
            _, rmin, rmax = self.spec.pose_randomizer
            target = sample_hollow_sphere(key, rmin, rmax, upper=True)
            return ik_to(target)
        if kind == "ik_range":
            _, low, high = self.spec.pose_randomizer
            target = jax.random.uniform(key, (3,), minval=jnp.asarray(low),
                                        maxval=jnp.asarray(high))
            return ik_to(target)
        return q0

    # ----------------------------------------------------------------- reset
    def reset(self, env, state, key):
        spec = self.spec
        state = self._init_obstacles(state)
        (k_sizes, k_goal1, k_obs, k_goal2, k_robot, k_vel,
         k_num) = jax.random.split(key, 7)
        model = env.robot.model

        # random-size cuboids (reach_ao.py:968-979, 1084-1089)
        if spec.random_size_cuboids and self.n_cuboids:
            ks = jax.random.split(k_sizes, self.n_cuboids)
            sizes = jnp.stack([
                0.2 * jax.random.dirichlet(ks[j], jnp.ones(3))
                for j in range(self.n_cuboids)])
            osize = state.obstacle_size
            for j in range(self.n_cuboids):
                osize = osize.at[self.n_spheres + j].set(sizes[j])
            state = state.replace(obstacle_size=osize)

        fk = K.fk_world(model, state.q)

        # goal pass 1: vs table+robot, margin 0.1 (reach_ao.py:981-982, 1101-1129)
        if self.config.fixed_target is None:
            state = self._set_coll_free_goal(state, fk, k_goal1, margin=0.1,
                                             include_obstacles=False)
        else:
            state = state.replace(goal=jnp.asarray(self.config.fixed_target,
                                                   jnp.float32))

        if spec.randomize_obstacle_position:
            # (reach_ao.py:984-985)
            state = self._set_coll_free_obs(state, fk, k_obs, margin=0.03)
        elif self.config.fixed_target is None:
            # static obstacles: re-sample goal vs everything, margin 0.03 (:986-989)
            state = self._set_coll_free_goal(state, fk, k_goal2, margin=0.03,
                                             include_obstacles=True)

        # collision-free robot pose fix-up (:991-992, 1035-1060)
        if self.randomize_robot_pose and spec.pose_randomizer is not None:
            fixed = self._set_coll_free_robot(env, state, k_robot)
            if spec.pose_randomize_prob < 1.0:
                # pose-probability curriculum: episodes gated to a neutral
                # start must stay neutral (obstacles were already sampled
                # clear of that pose), not be re-randomized by the fix-up
                neutral = jnp.asarray(env.robot.neutral)
                was_rand = jnp.any(jnp.abs(state.q - neutral) > 1e-7)
                state = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(was_rand, a, b), fixed, state)
            else:
                state = fixed

        if getattr(self.config, "randomize_obstacle_velocity", False):
            vel = jax.random.uniform(k_vel, (state.obstacle_vel.shape[0], 3),
                                     minval=-0.2, maxval=0.2)  # :151-152, 1091-1095
            state = state.replace(obstacle_vel=jnp.where(
                state.obstacle_active[:, None], vel, 0.0))

        if spec.random_num_obs:
            state = self._set_random_num_obs(state, k_num)

        # prime link distances + past-observation stack (:1028-1033)
        fk = K.fk_world(model, state.q)
        gd, gpc, gpo = group_obstacle_distances(model, fk, state)
        state = state.replace(link_obstacle_dist=gd)
        vec = self._vector_obs(gd, gpc, gpo)
        state = state.replace(past_obs=jnp.tile(vec, (3, 1)))
        return state

    def _set_coll_free_goal(self, state, fk, key, margin, include_obstacles):
        """Masked rejection sampling of the goal with the dummy probe sphere
        r=0.05 (reach_ao.py:284-290, 1101-1129); fallback: ee position."""
        keys = jax.random.split(key, self.N_CANDIDATES)
        cands = jax.vmap(lambda k: self._sample_goal_one(k, state, fk))(keys)

        def valid(p):
            ok = self._probe_vs_robot(fk, p, 0.05) > margin
            ok &= self._probe_vs_table(p, 0.05) > margin
            if include_obstacles:
                ok &= jnp.min(self._point_obstacle_dist(state, p, 0.05)) > margin
            return ok

        mask = jax.vmap(valid)(cands)
        idx = jnp.argmax(mask)
        ee = self.robot.ee_position(fk)
        goal = jnp.where(jnp.any(mask), cands[idx], ee)
        return state.replace(goal=goal)

    def _set_coll_free_obs(self, state, fk, key, margin):
        """Sequential per-obstacle masked rejection sampling
        (reach_ao.py:1131-1167)."""
        keys = jax.random.split(key, self.n_dynamic)
        safety = self.config.safety_distance
        for i in range(self.n_dynamic):
            size = state.obstacle_size[i]
            typ = state.obstacle_type[i]
            cand_keys = jax.random.split(keys[i], self.N_CANDIDATES)
            cands = jax.vmap(lambda k: self._sample_obstacle_one(
                k, state, fk, state.goal))(cand_keys)

            def valid(p):
                ok = self._obstacle_vs_robot(fk, p, size, typ) > margin + safety
                ok &= self._obstacle_vs_table(p, size, typ) > margin
                r_probe = jnp.where(typ == OBS_BOX, jnp.linalg.norm(size), size[0])
                ok &= (jnp.linalg.norm(state.goal - p) - 0.05 - r_probe) > margin
                if not self.spec.allow_overlapping_obstacles:
                    ok &= jnp.min(self._obstacle_vs_obstacles(
                        state, i, p, size, typ)) > 0.0
                    # boundary: within ~1 m of the origin probe (:1158-1161)
                    ok &= (jnp.linalg.norm(p) - 0.05 - r_probe) <= 1.0
                return ok

            mask = jax.vmap(valid)(cands)
            idx = jnp.argmax(mask)
            pos = jnp.where(jnp.any(mask), cands[idx], cands[0])
            state = state.replace(
                obstacle_pos=state.obstacle_pos.at[i].set(pos))
        return state

    def _set_coll_free_robot(self, env, state, key):
        """Re-randomize the pose until clear of obstacles; fallback neutral
        (reach_ao.py:1035-1060)."""
        margin = 0.05
        keys = jax.random.split(key, self.POSE_CANDIDATES)
        model = env.robot.model

        def clear(q):
            fk = K.fk_world(model, q)
            gd, _, _ = group_obstacle_distances(model, fk, state)
            # the reference rejects via check_collided(), which tests the
            # TABLE too (reach_ao.py:896-900) — without it, torus/ik-sampled
            # poses frequently start penetrating the table and every episode
            # truncates at t=0 with the collision penalty
            td = group_table_distances(model, fk, self.scene)
            return (jnp.min(gd) > margin) & (jnp.min(td) > 0.0)

        qs = [state.q] + [self._randomize_pose(env, state, keys[j])
                          for j in range(self.POSE_CANDIDATES - 1)]
        qs = jnp.stack(qs)
        ok = jax.vmap(clear)(qs)
        idx = jnp.argmax(ok)
        q = jnp.where(jnp.any(ok), qs[idx], jnp.asarray(env.robot.neutral))
        return state.replace(q=q, qd=jnp.zeros_like(state.qd), ctrl_target=q)

    def _set_random_num_obs(self, state, key):
        """Teleport a random subset of dynamic obstacles far away
        (reach_ao.py:1062-1082)."""
        lo, hi = self.spec.sample_size_obs
        k1, k2 = jax.random.split(key)
        n_keep = jax.random.randint(k1, (), lo, max(hi, lo + 1))
        perm = jax.random.permutation(k2, self.n_dynamic)
        n_total = self.n_dynamic
        n_move = jnp.clip(n_total - n_keep, 0, n_total)
        move_rank = jnp.zeros(n_total, jnp.int32).at[perm].set(
            jnp.arange(n_total, dtype=jnp.int32))
        move = move_rank < n_move
        far = jnp.array([99.9, 99.9, -99.9])
        pos = state.obstacle_pos
        for i in range(self.n_dynamic):
            pos = pos.at[i].set(jnp.where(move[i], far, pos[i]))
        return state.replace(obstacle_pos=pos)

    # ------------------------------------------------------------------ obs
    def _vector_obs(self, gd, gpc, gpo):
        """Unit vectors link->closest obstacle per group (reach_ao.py:943-959)."""
        return jax.vmap(unit_vector)(gpc, gpo).reshape(-1)

    def pre_obs(self, env, state, fk):
        """Refresh per-link distances + past-vector stack before obs assembly
        (reference updates these inside get_obs, reach_ao.py:902-928)."""
        gd, gpc, gpo = group_obstacle_distances(env.robot.model, fk, state)
        state = state.replace(link_obstacle_dist=gd)
        if self.obstacle_obs in ("vectors", "vectors+past"):
            vec = self._vector_obs(gd, gpc, gpo)
            past = jnp.concatenate([state.past_obs[1:], vec[None]], axis=0)
            state = state.replace(past_obs=past)
        return state

    def task_obs(self, env, state, fk):
        if self.n_obstacles == 0:
            return jnp.ones(self.obs_vec_dim)  # reach_ao.py:904
        gd, gpc, gpo = group_obstacle_distances(env.robot.model, fk, state)
        mode = self.obstacle_obs
        gd_o = jnp.minimum(gd, self.obs_max_distance)
        if mode == "closest_per_link":
            out = gd_o
        elif mode == "closest":
            out = jnp.min(gd_o)[None]
        elif mode == "vectors":
            out = state.past_obs[-1]
        elif mode == "vectors+past":
            out = state.past_obs.reshape(-1)
        else:  # "vectors+closest_per_link" (default)
            out = jnp.concatenate([gd_o, self._vector_obs(gd, gpc, gpo)])
        if self.prior is not None:
            out = jnp.concatenate([out, self._prior_action(env, state, fk)])
        return out

    def _prior_action(self, env, state, fk):
        from panda_gym_tpu.ops.neo import compute_action_neo
        return compute_action_neo(env.robot.model, env.robot.ee_site,
                                  state, fk, state.goal)

    def achieved_goal(self, env, state, fk):
        return env.robot.ee_position(fk)

    # ------------------------------------------------------- success/reward
    def is_success(self, env, achieved, desired, state):
        d = distance(achieved, desired)
        if self.config.goal_condition == "halt":
            # latch once both error and speed drop below thresholds
            # (reach_ao.py:1253-1257)
            fk = K.fk_world(env.robot.model, state.q, state.qd)
            speed = jnp.linalg.norm(env.robot.ee_velocity(fk))
            reached = (d < self.ee_error_threshold) & (speed < self.ee_speed_threshold)
            new = state.goal_reached | reached
            return new, state.replace(goal_reached=new)
        return d < self.ee_error_threshold

    def is_truncated(self, env, state):
        if not self.truncate_on_collision:
            return jnp.asarray(False)  # reach_ao.py:84-86
        return state.is_collided  # :1263-1264

    def make_step_post_batched(self, env):
        """Batch-native obs/reward assembly (see _make_step_post_batched)."""
        return _make_step_post_batched(self, env)

    def reward_aux(self, env, state):
        """State-dependent reward terms, stored per transition so HER can
        relabel every reward type exactly: [collided, ee_speed, effort, jerk,
        obstacle_penalty] (terms of reach_ao.py:1308-1383)."""
        fk = K.fk_world(env.robot.model, state.q, state.qd)
        ee_speed = jnp.linalg.norm(env.robot.ee_velocity(fk))
        effort = jnp.linalg.norm(state.cur_jacc)
        jerk = jnp.linalg.norm(state.cur_jerk)
        obst_pen = jnp.sum(jnp.maximum(0.0, 1.0 - state.link_obstacle_dist / 0.05))
        return jnp.stack([state.is_collided.astype(jnp.float32), ee_speed,
                          effort, jerk, obst_pen])

    def reward_from_aux(self, env, achieved, desired, aux):
        return self._reward(achieved, desired, collided=aux[0],
                            ee_speed=aux[1], effort=aux[2], jerk=aux[3],
                            obst_pen=aux[4])

    def compute_reward(self, env, achieved, desired, state, fk):
        """The 6 reward functions (reach_ao.py:1308-1383)."""
        if fk is None:  # HER relabel path through the gym adapter
            return self.reward_from_aux(env, achieved, desired,
                                        self.reward_aux(env, state))
        ee_speed = jnp.linalg.norm(env.robot.ee_velocity(fk))
        effort = jnp.linalg.norm(state.cur_jacc)
        jerk = jnp.linalg.norm(state.cur_jerk)
        obst_pen = jnp.sum(jnp.maximum(0.0, 1.0 - state.link_obstacle_dist / 0.05))
        return self._reward(achieved, desired,
                            collided=state.is_collided.astype(jnp.float32),
                            ee_speed=ee_speed, effort=effort, jerk=jerk,
                            obst_pen=obst_pen)

    def _reward(self, achieved, desired, *, collided, ee_speed, effort, jerk,
                obst_pen):
        cfg = self.config
        ee_error = distance(achieved, desired)
        rt = cfg.reward_type
        if rt == "sparse":
            if cfg.goal_condition == "reach":
                e = ee_error + collided  # no reward if collided (:1319)
                reward = -1.0 + (e < self.ee_error_threshold).astype(jnp.float32)
            else:
                reward = (1 - ((ee_error < self.ee_error_threshold)
                               & (ee_speed < self.ee_speed_threshold))).astype(jnp.float32)
        elif rt == "wang":
            distance_reward = 10e-3 * ee_error ** 2 + jnp.log(ee_error ** 2 + 10e-4)
            reward = -(distance_reward + 0.1 * obst_pen).astype(jnp.float32)
        elif rt == "kumar_her":
            if cfg.goal_condition == "reach":
                reward = -((ee_error > self.ee_error_threshold) * jerk).astype(jnp.float32)
            else:
                reward = ((ee_error < self.ee_error_threshold)
                          & (ee_speed < self.ee_speed_threshold)).astype(jnp.float32) - jerk
        elif rt == "kumar_optim":
            reward = -(ee_error > self.ee_error_threshold).astype(jnp.float32) - effort
        elif rt == "kumar":
            distance_reward = jnp.exp(-20.0 * ee_error ** 2)
            reward = (distance_reward - 0.005 * effort - 0.1 * obst_pen).astype(jnp.float32)
        else:
            # the reference's dense fallback references undefined factors
            # (reach_ao.py:1363-1371, broken); we implement it with unit factors
            reward = -(effort + ee_error + 100.0 * collided).astype(jnp.float32)

        if self.truncate_on_collision and rt in ("sparse", "kumar_her", "kumar_optim"):
            reward = reward + collided * cfg.collision_reward  # :1376-1377
        return reward


# ---------------------------------------------------------------------------
# env factory + gym class (panda_tasks.py:132-159)
# ---------------------------------------------------------------------------

def make_reach_ao_core(scenario: str = "reachao1",
                       config: Optional[TrainConfig] = None,
                       ee_error_threshold: float = 0.05,
                       speed_threshold: float = 0.1,
                       capacity: Optional[int] = None) -> RobotTaskEnv:
    config = config or TrainConfig()
    if "+" in scenario:
        return make_reach_ao_mixture_core(
            scenario.split("+"), config=config,
            ee_error_threshold=ee_error_threshold,
            speed_threshold=speed_threshold)
    robot = PandaRobot(PandaConfig(
        block_gripper=True, control_type=config.control_type,
        obs_type=tuple(config.obs_type), action_limiter=config.action_limiter,
        base_position=(0.0, 0.0, 0.0)))
    task = ReachAO(robot, scenario=scenario, config=config,
                   ee_error_threshold=ee_error_threshold,
                   speed_threshold=speed_threshold, capacity=capacity)
    return RobotTaskEnv(robot, task,
                        terminate_on_success=config.terminate_on_success,
                        n_substeps=config.n_substeps)


class _MixtureReachAOEnv(RobotTaskEnv):
    """Multi-scene ReachAO: each env instance draws a scenario at reset.

    The TPU-native replacement for the reference's serial curriculum over
    scenes (setup_training.py:233-307 trains one scene at a time, so the
    policy forgets earlier scenes): every scenario's obstacle arrays are
    padded to one shared capacity, so a single batched step covers all
    scenes and each reset picks one per env under lax.switch — a rollout of
    N envs trains on all scenes simultaneously and the replay buffer stays
    mixed by construction.  Physics/obs/reward machinery is identical across
    scenarios (shared config); only reset differs.
    """

    def __init__(self, cores):
        self._cores = cores
        base = cores[0]
        super().__init__(base.robot, base.task,
                         terminate_on_success=base.terminate_on_success,
                         n_substeps=base.n_substeps)

    def reset(self, key):
        k_sel, k_reset = jax.random.split(key)
        sid = jax.random.randint(k_sel, (), 0, len(self._cores))
        return jax.lax.switch(sid, [c.reset for c in self._cores], k_reset)


def make_reach_ao_mixture_core(scenarios, config: Optional[TrainConfig] = None,
                               ee_error_threshold: float = 0.05,
                               speed_threshold: float = 0.1) -> RobotTaskEnv:
    """Uniform mixture over `scenarios` (oversample a scene by repeating its
    name).  Exposed through make_reach_ao_core via '+'-joined scenario names,
    e.g. --stages "reachao1+wall+tunnel"."""
    config = config or TrainConfig()

    def natural_capacity(name: str) -> int:
        spec = get_scenario(name)
        return max(len(spec.spheres) + len(spec.cuboids)
                   + len(_load_static_boxes(spec.static_scenario)), 1)

    capacity = max(natural_capacity(s) for s in scenarios)
    cores = [make_reach_ao_core(s, config=config,
                                ee_error_threshold=ee_error_threshold,
                                speed_threshold=speed_threshold,
                                capacity=capacity)
             for s in scenarios]
    return _MixtureReachAOEnv(cores)


class PandaReachAOEnv(GymAdapter):
    def __init__(self, render: bool = False, ee_error_threshold: float = 0.05,
                 speed_threshold: float = 0.1, scenario: str = "reachao1",
                 config: Optional[TrainConfig] = None, **kw):
        super().__init__(make_reach_ao_core(
            scenario=scenario, config=config,
            ee_error_threshold=ee_error_threshold,
            speed_threshold=speed_threshold))


# ---------------------------------------------------------------------------
# batch-native post-step (obs/reward assembly without per-env vmap)
# ---------------------------------------------------------------------------

def _make_step_post_batched(task: "ReachAO", env: RobotTaskEnv):
    """Batched equivalent of RobotTaskEnv._step_post for ReachAO.

    The vmapped per-env obs path (fk_world + two group_obstacle_distances
    calls with argmin/gather reductions) leaves TPU lanes idle; this
    assembles the identical observations/rewards in batch-last component
    form (ops/scalarized.py).  Returns None when a feature needs the
    per-env fallback (the NEO prior observation)."""
    from panda_gym_tpu.ops import scalarized as S
    from panda_gym_tpu.ops.scalarized_collision import (
        _cap_radius_col, _obstacle_comps, group_obstacle_closest,
        obstacle_distance_sweep, stack_caps,
    )

    if task.prior is not None:
        return None

    robot = env.robot
    mc = S.consts_from_model(robot.model)
    ndof, ngroup = mc.ndof, mc.ngroup
    n_obstacles = task.n_obstacles
    mode = task.obstacle_obs
    obs_type = robot.config.obs_type
    n_arm = robot.n_arm
    ee_site = robot.ee_site

    def post(states):
        B = states.q.shape[0]
        q = tuple(states.q[:, d] for d in range(ndof))
        qd = tuple(states.qd[:, d] for d in range(ndof))
        Rs, ps, oms, vs, _ = S.fk_full(mc, q, qd)
        ee_p, ee_v = S.site_com_pos_vel(mc, Rs, ps, oms, vs, ee_site)
        ee_pos = jnp.stack(ee_p, axis=-1)
        ee_vel = jnp.stack(ee_v, axis=-1)

        # per-group distances + closest point pairs
        p0s, p1s = S.capsule_endpoints(mc, Rs, ps)
        P0, P1 = stack_caps(p0s), stack_caps(p1s)
        opos, osize, is_box, active = _obstacle_comps(states, n_obstacles)
        D, PC, PO = obstacle_distance_sweep(
            mc, P0, P1, _cap_radius_col(mc), opos, osize, is_box, active,
            n_obstacles, 999.0, with_points=True)
        best = group_obstacle_closest(mc, D, PC, PO, 999.0)
        gd = jnp.stack([best[g][0] for g in range(ngroup)], axis=-1)  # (B,G)

        # unit vectors link -> closest obstacle point (utils.unit_vector)
        vec_parts = []
        for g in range(ngroup):
            _, pc_g, po_g = best[g]
            v = S.vsub(po_g, pc_g)
            n = jnp.sqrt(jnp.maximum(S.vdot(v, v), 0.0))
            pos_n = jnp.where(n > 0, n, 1.0)
            vec_parts += [jnp.where(n > 0, v[k] / pos_n, 0.0)
                          for k in range(3)]
        vec = jnp.stack(vec_parts, axis=-1)  # (B, 3*G), group-major

        states = states.replace(steps=states.steps + 1,
                                link_obstacle_dist=gd)
        if mode in ("vectors", "vectors+past"):
            past = jnp.concatenate(
                [states.past_obs[:, 1:], vec[:, None, :]], axis=1)
            states = states.replace(past_obs=past)

        # robot obs (panda.py:264-288 ordering)
        parts = []
        if "ee" in obs_type:
            parts += [ee_pos, ee_vel]
        if "js" in obs_type:
            parts += [states.q[:, :n_arm], states.qd[:, :n_arm]]
        robot_obs = jnp.concatenate(parts, axis=-1)

        # task obs per obstacle-observation mode (reach_ao.py:902-941)
        gd_o = jnp.minimum(gd, task.obs_max_distance)
        if mode == "closest_per_link":
            t_obs = gd_o
        elif mode == "closest":
            t_obs = jnp.min(gd_o, axis=-1, keepdims=True)
        elif mode == "vectors":
            t_obs = states.past_obs[:, -1]
        elif mode == "vectors+past":
            t_obs = states.past_obs.reshape(B, -1)
        else:  # "vectors+closest_per_link"
            t_obs = jnp.concatenate([gd_o, vec], axis=-1)

        achieved = ee_pos
        desired = states.goal
        obs = {
            "observation": jnp.concatenate(
                [robot_obs, t_obs], axis=-1).astype(jnp.float32),
            "achieved_goal": achieved.astype(jnp.float32),
            "desired_goal": desired.astype(jnp.float32),
        }

        d = distance(achieved, desired)
        ee_speed = jnp.linalg.norm(ee_vel, axis=-1)
        if task.config.goal_condition == "halt":
            reached = (d < task.ee_error_threshold) & \
                (ee_speed < task.ee_speed_threshold)
            success = states.goal_reached | reached
            states = states.replace(goal_reached=success)
        else:
            success = d < task.ee_error_threshold
        terminated = success if env.terminate_on_success \
            else jnp.zeros(B, bool)
        truncated = states.is_collided if task.truncate_on_collision \
            else jnp.zeros(B, bool)

        reward = task._reward(
            achieved, desired,
            collided=states.is_collided.astype(jnp.float32),
            ee_speed=ee_speed,
            effort=jnp.linalg.norm(states.cur_jacc, axis=-1),
            jerk=jnp.linalg.norm(states.cur_jerk, axis=-1),
            obst_pen=jnp.sum(jnp.maximum(0.0, 1.0 - gd / 0.05), axis=-1),
        ).astype(jnp.float32)
        info = {"is_success": success, "is_truncated": truncated}
        return states, obs, reward, terminated, truncated, info

    return post
