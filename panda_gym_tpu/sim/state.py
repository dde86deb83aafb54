"""EnvState / SceneParams pytrees — the entire simulation state of one env.

This is the TPU-native replacement for PyBullet's C++-side world state
(bodies registry + joint states + saved states, reference pybullet.py:55,
79-102): a flat pytree of arrays that jit/vmap/shard natively.  Snapshot =
copy of the pytree; save/restore (core.py:310-336) becomes trivial value
semantics.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

# body shapes
SHAPE_BOX = 0
SHAPE_SPHERE = 1
SHAPE_CYLINDER = 2

# obstacle shapes (ReachAO)
OBS_SPHERE = 0
OBS_BOX = 1

# Bullet's default convex collision margin: getClosestPoints yields no points
# for penetrations deeper than this, so the reference's collision checks are
# blind to them (see engine.make_physics_step.substep predicate comment).
DEEP_PENETRATION_BLIND = 0.04


@struct.dataclass
class SceneParams:
    """Static scene description (per env class, shared across the batch).

    Mirrors what the reference builds imperatively in task._create_scene
    (e.g. reach.py:31-50, push.py:30-48): a table box whose top is z=0, a
    ground plane at plane_z, and a fixed roster of dynamic bodies.
    """

    # dynamic bodies (objects); nb static via array sizes
    body_shape: jnp.ndarray     # (nb,) int32
    body_size: jnp.ndarray      # (nb, 3) box: half extents; sphere: (r,-,-);
    #                             cylinder: (r, half_h, -)
    body_mass: jnp.ndarray      # (nb,)
    body_mu: jnp.ndarray        # (nb,) lateral friction
    body_inertia: jnp.ndarray   # (nb, 3) diagonal inertia in body frame
    body_samples: jnp.ndarray   # (nb, K, 4) contact sample points: xyz + radius
    body_sample_mask: jnp.ndarray  # (nb, K) 1.0 active

    # static world
    table_half: jnp.ndarray     # (3,)
    table_center: jnp.ndarray   # (3,)
    table_mu: jnp.ndarray       # () lateral friction of the table (PyBullet default 0.5)
    plane_z: jnp.ndarray        # () ground plane height (reference: -0.4)

    nb: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class EnvState:
    """Complete per-env simulation + task state (one env; vmap for batches)."""

    # robot
    q: jnp.ndarray              # (ndof,)
    qd: jnp.ndarray             # (ndof,)
    ctrl_target: jnp.ndarray    # (ndof,) motor target (position or velocity)

    # dynamic bodies
    body_pos: jnp.ndarray       # (nb, 3)
    body_quat: jnp.ndarray      # (nb, 4) xyzw
    body_vel: jnp.ndarray       # (nb, 3)
    body_ang: jnp.ndarray       # (nb, 3) world angular velocity

    # ReachAO obstacles (fixed capacity, active mask)
    obstacle_pos: jnp.ndarray   # (no, 3)
    obstacle_vel: jnp.ndarray   # (no, 3)
    obstacle_size: jnp.ndarray  # (no, 3) sphere: (r,-,-); box: half extents
    obstacle_type: jnp.ndarray  # (no,) int32
    obstacle_active: jnp.ndarray  # (no,) bool

    # task
    goal: jnp.ndarray           # (goal_dim,)
    key: jnp.ndarray            # PRNG key
    steps: jnp.ndarray          # () int32 episode step counter
    is_collided: jnp.ndarray    # () bool (ReachAO per-substep check, reach_ao.py:182-188)
    goal_reached: jnp.ndarray   # () bool ("halt" goal condition latch, reach_ao.py:1253-1257)

    # action bookkeeping (panda.py:87-95, 167-172)
    prev_action: jnp.ndarray    # (na,)
    recent_action: jnp.ndarray  # (na,)
    action_count: jnp.ndarray   # () int32 — 0: none yet, 1: one action, ...
    cur_jvel: jnp.ndarray       # (7,) current_joint_velocity
    prev_jvel: jnp.ndarray      # (7,)
    cur_jacc: jnp.ndarray       # (7,)
    prev_jacc: jnp.ndarray      # (7,)
    cur_jerk: jnp.ndarray       # (7,)

    # per-link closest obstacle distances cache (reach_ao.py:111, updated by
    # the substep collision check, consumed by compute_reward :1312)
    link_obstacle_dist: jnp.ndarray  # (ngroup,)

    # stack of past obstacle observations ("vectors+past", reach_ao.py:919-923)
    past_obs: jnp.ndarray       # (3, obs_vec_dim) rolling buffer


def make_empty_bodies(nb: int):
    return dict(
        body_pos=jnp.zeros((nb, 3)),
        body_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (nb, 1)),
        body_vel=jnp.zeros((nb, 3)),
        body_ang=jnp.zeros((nb, 3)),
    )


# ---------------------------------------------------------------------------
# scene construction helpers (host-side, numpy)
# ---------------------------------------------------------------------------

def _shape_inertia(shape: int, size, mass: float):
    """Diagonal inertia PyBullet derives from the collision shape."""
    x, y, z = size
    if shape == SHAPE_BOX:
        return mass / 3.0 * np.array([y * y + z * z, x * x + z * z, x * x + y * y])
    if shape == SHAPE_SPHERE:
        r = x
        return np.full(3, 0.4 * mass * r * r)
    # cylinder, axis z: r = x, half height = y
    r, hh = x, y
    ixy = mass * (3 * r * r + (2 * hh) ** 2) / 12.0
    return np.array([ixy, ixy, 0.5 * mass * r * r])


def _shape_samples(shape: int, size, k: int = 12):
    """Contact sample points (local xyz + point radius), padded to k."""
    x, y, z = size
    pts = []
    if shape == SHAPE_BOX:
        eps = 0.002  # rounded corners for smooth penalty contact
        for sx in (-1, 1):
            for sy in (-1, 1):
                for sz in (-1, 1):
                    pts.append((sx * (x - eps), sy * (y - eps), sz * (z - eps), eps))
    elif shape == SHAPE_SPHERE:
        pts.append((0.0, 0.0, 0.0, x))
    else:  # cylinder rim: 6 bottom + 6 top points
        r, hh = x, y
        for sz in (-1, 1):
            for i in range(6):
                a = 2 * np.pi * i / 6
                pts.append((r * np.cos(a), r * np.sin(a), sz * hh, 0.0))
    pts = pts[:k]
    mask = [1.0] * len(pts) + [0.0] * (k - len(pts))
    while len(pts) < k:
        pts.append((0.0, 0.0, 0.0, 0.0))
    return np.asarray(pts, dtype=np.float32), np.asarray(mask, dtype=np.float32)


def build_scene(
    bodies,
    table_length: float,
    table_width: float,
    table_height: float,
    table_x_offset: float = 0.0,
    table_mu: float = 0.5,
    plane_z: float = -0.4,
) -> SceneParams:
    """bodies: list of dicts(shape, size, mass, mu).

    Table geometry matches create_table (pybullet.py:780-817): top at z=0,
    centered in y, box center at (x_offset, 0, -height/2).
    """
    nb = len(bodies)
    if nb == 0:
        bodies = [dict(shape=SHAPE_SPHERE, size=(0.0, 0.0, 0.0), mass=1.0, mu=0.5)]
    shp = np.array([b["shape"] for b in bodies], dtype=np.int32)
    size = np.array([b["size"] for b in bodies], dtype=np.float32)
    mass = np.array([b["mass"] for b in bodies], dtype=np.float32)
    mu = np.array([b.get("mu", 0.5) for b in bodies], dtype=np.float32)
    inertia = np.stack([_shape_inertia(int(s), sz, m) for s, sz, m in zip(shp, size, mass)])
    samples, masks = zip(*[_shape_samples(int(s), sz) for s, sz in zip(shp, size)])
    # HOST-side (numpy) leaves, deliberately: SceneParams is static per env
    # class and only ever read — inside jit the numpy constants fold into
    # the graph for free, while the batched physics BUILDERS read them with
    # np.asarray at trace time.  When these were device (jnp) arrays, every
    # builder call paid a device->host transfer through the TPU tunnel —
    # the round-4/5 "compile stall" wedge was tracing blocked on exactly
    # that transfer (scalarized_collision.py np.asarray(scene.table_*)).
    return SceneParams(
        body_shape=np.asarray(shp),
        body_size=np.asarray(size, np.float32),
        body_mass=np.asarray(mass, np.float32),
        body_mu=np.asarray(mu, np.float32),
        body_inertia=np.asarray(inertia, dtype=np.float32),
        body_samples=np.stack(samples).astype(np.float32),
        body_sample_mask=np.stack(masks).astype(np.float32),
        table_half=np.array([table_length, table_width, table_height], np.float32) / 2,
        table_center=np.array([table_x_offset, 0.0, -table_height / 2], np.float32),
        table_mu=np.float32(table_mu),
        plane_z=np.float32(plane_z),
        nb=nb,
    )
