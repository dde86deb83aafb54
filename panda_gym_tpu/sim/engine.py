"""Substepped physics engine: the TPU-native stepSimulation.

Replaces the reference's `for _ in range(n_substeps): stepSimulation()` loop
(pybullet.py:68-71) and the ReachAO collision-checking override
(reach_ao.py:182-198) with a single pure function compiled under lax.scan:

    state' = physics_step(state)

Per substep: robot FK -> contact forces (bodies vs ground/robot/bodies) ->
free-body semi-implicit Euler -> kinematic obstacle advance -> per-substep
collision check (sticky flag + early-freeze, matching step_check_collision's
break) -> motor-driven robot substep.

Everything is per-env; batch with vmap over EnvState.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from panda_gym_tpu.math.transforms import quat_integrate, quat_to_mat
from panda_gym_tpu.models.chain import ChainModel
from panda_gym_tpu.ops import contact as C
from panda_gym_tpu.ops import dynamics as D
from panda_gym_tpu.ops import kinematics as K
from panda_gym_tpu.sim.state import (
    DEEP_PENETRATION_BLIND, EnvState, SceneParams, OBS_BOX, OBS_SPHERE,
    SHAPE_BOX, SHAPE_CYLINDER, SHAPE_SPHERE,
)

GRAVITY = jnp.array([0.0, 0.0, -9.81])  # pybullet.py:54
TIMESTEP = 1.0 / 500.0                  # pybullet.py:50


def _ground_height(scene: SceneParams, xy):
    """Table top (z=0) inside the table footprint, else the plane.

    The reference's table top is at z=0 (create_table, pybullet.py:780-817)
    and the backup plane at plane_z (create_plane calls, e.g. reach.py:32).
    """
    dx = jnp.abs(xy[..., 0] - scene.table_center[0])
    dy = jnp.abs(xy[..., 1] - scene.table_center[1])
    on_table = (dx <= scene.table_half[0]) & (dy <= scene.table_half[1])
    return jnp.where(on_table, 0.0, scene.plane_z)


def _body_ground_forces(scene: SceneParams, b: int, pos, R, vel, ang):
    """Penalty forces from the body's contact samples vs the ground."""
    samples = scene.body_samples[b]          # (K, 4)
    mask = scene.body_sample_mask[b]         # (K,)
    pts_local = samples[:, :3]
    rad = samples[:, 3]
    p_w = pos + pts_local @ R.T              # (K, 3)
    v_pt = vel + jnp.cross(ang, p_w - pos)
    gz = _ground_height(scene, p_w[:, :2])
    depth = gz - (p_w[:, 2] - rad)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), p_w.shape)
    mu = scene.body_mu[b] * scene.table_mu
    f = C.penalty_force(depth, n, v_pt, mu) * mask[:, None]
    force = jnp.sum(f, axis=0)
    torque = jnp.sum(jnp.cross(p_w - pos, f), axis=0)
    return force, torque


def _robot_body_contact(model, fk, cap_p0, cap_p1, scene, b, pos, R, vel, ang):
    """Robot collision capsules vs one dynamic body.

    Returns (force_on_body, torque_on_body, tau_ext_on_robot).
    PyBullet resolves this symmetrically; here the robot side receives the
    reaction as a generalised torque (J^T f), which is what lets the
    position-servo arm push objects and the gripper squeeze without
    tunnelling (fingers stall when their effort clamp balances the contact).
    """
    ncap = cap_p0.shape[0]
    shape = scene.body_shape[b]
    size = scene.body_size[b]
    rc = model.cap_radius

    # capsule vs sphere and capsule vs box; cylinders are approximated by
    # their bounding box for robot contact (puck-pushing in Slide).
    d_s, pc_s, pb_s = C.capsule_sphere_distance(cap_p0, cap_p1, rc, pos, size[0])
    # normal = capsule-axis -> sphere-center direction; (pb_s - pc_s) equals
    # n*dist so normalizing it flips the normal exactly when dist < 0 (the
    # only case with nonzero penalty force), turning repulsion into suction
    n_s = pos - C.closest_on_segment(cap_p0, cap_p1, pos)
    n_s = n_s / jnp.maximum(jnp.linalg.norm(n_s, axis=-1, keepdims=True), 1e-9)
    half_box = jnp.where(shape == SHAPE_BOX, size,
                         jnp.array([size[0], size[0], size[1]]))
    d_b, pc_b, pb_b, n_b = C.capsule_box_distance(
        cap_p0, cap_p1, rc, pos, jnp.broadcast_to(R, (ncap, 3, 3)), half_box)
    is_sphere = shape == SHAPE_SPHERE
    dist = jnp.where(is_sphere, d_s, d_b)
    p_contact = jnp.where(is_sphere, 0.5 * (pc_s + pb_s), 0.5 * (pc_b + pb_b))
    # normal pointing from robot INTO body
    n_hat = jnp.where(is_sphere, n_s, -n_b)

    depth = -dist
    # contact point velocities
    body_caps = model.cap_body  # (ncap,)
    safe = jnp.maximum(body_caps, 0)
    om_c = jnp.where((body_caps >= 0)[:, None], fk.om[safe], 0.0)
    v_c = jnp.where((body_caps >= 0)[:, None], fk.v[safe], 0.0)
    p_c = jnp.where((body_caps >= 0)[:, None], fk.p[safe], 0.0)
    v_cap_pt = v_c + jnp.cross(om_c, p_contact - p_c)
    v_body_pt = vel + jnp.cross(ang, p_contact - pos)
    v_rel = v_body_pt - v_cap_pt

    mu = scene.body_mu[b] * 1.0  # robot links: friction 1.0 (panda.py:69-70)
    f = C.penalty_force(depth, n_hat, v_rel, mu)          # (ncap, 3) on body
    force = jnp.sum(f, axis=0)
    torque = jnp.sum(jnp.cross(p_contact - pos, f), axis=0)

    # reaction on the robot: tau_ext = sum_i J_i^T (-f_i)
    tau_ext = jnp.zeros(model.ndof)
    for i in range(ncap):
        bi = model.cap_body_tuple[i]
        if bi < 0:
            continue
        J_v, _ = K.point_jacobian(model, fk, p_contact[i], bi)
        tau_ext = tau_ext + J_v.T @ (-f[i])
    return force, torque, tau_ext


def _body_body_forces(scene, a, b, pos_a, R_a, vel_a, ang_a, pos_b, R_b, vel_b, ang_b):
    """Contact of body a's sample points against body b's volume (box/sphere).

    Symmetric force pair; used by Stack's two cubes (stack.py:36-63).
    """
    samples = scene.body_samples[a]
    mask = scene.body_sample_mask[a]
    rad = samples[:, 3]
    p_w = pos_a + samples[:, :3] @ R_a.T
    shape_b = scene.body_shape[b]
    size_b = scene.body_size[b]
    K_ = p_w.shape[0]

    d_box, p_s, p_bx, n_box = C.sphere_box_distance(
        p_w, rad, pos_b, jnp.broadcast_to(R_b, (K_, 3, 3)), size_b)
    delta = p_w - pos_b
    dn = jnp.linalg.norm(delta, axis=-1)
    n_sph = delta / jnp.maximum(dn, 1e-9)[:, None]
    d_sph = dn - size_b[0] - rad
    is_sphere = shape_b == SHAPE_SPHERE
    dist = jnp.where(is_sphere, d_sph, d_box)
    # normal from b's surface toward a's point; force on A acts along +n_ba
    n_ba = jnp.where(is_sphere, n_sph, n_box)
    depth = -dist
    v_pt_a = vel_a + jnp.cross(ang_a, p_w - pos_a)
    v_pt_b = vel_b + jnp.cross(ang_b, p_w - pos_b)
    v_rel = v_pt_a - v_pt_b
    mu = scene.body_mu[a] * scene.body_mu[b]
    f_a = C.penalty_force(depth, n_ba, v_rel, mu) * mask[:, None]
    force_a = jnp.sum(f_a, axis=0)
    torque_a = jnp.sum(jnp.cross(p_w - pos_a, f_a), axis=0)
    force_b = -force_a
    torque_b = jnp.sum(jnp.cross(p_w - pos_b, -f_a), axis=0)
    return force_a, torque_a, force_b, torque_b


def group_obstacle_distances(model: ChainModel, fk, state: EnvState,
                             max_distance: float = 999.0):
    """Min distance per collision-link group vs all active obstacles, plus the
    closest surface point pair per group.

    Functional replacement for pyb_utils CollisionDetector
    .compute_distances_per_link (consumed reach_ao.py:902-959) — groups are
    the 9 non-excluded links (reach_ao.py:98-99).
    """
    cap_p0, cap_p1 = K.capsule_endpoints_world(model, fk)
    ncap = cap_p0.shape[0]
    no = state.obstacle_pos.shape[0]

    p0 = cap_p0[:, None, :]
    p1 = cap_p1[:, None, :]
    rc = model.cap_radius[:, None]
    opos = state.obstacle_pos[None, :, :]
    osize = state.obstacle_size[None, :, :]

    d_s, pc_s, po_s = C.capsule_sphere_distance(
        jnp.broadcast_to(p0, (ncap, no, 3)), jnp.broadcast_to(p1, (ncap, no, 3)),
        jnp.broadcast_to(rc, (ncap, no)), jnp.broadcast_to(opos, (ncap, no, 3)),
        jnp.broadcast_to(osize[..., 0], (ncap, no)))
    eye = jnp.broadcast_to(jnp.eye(3), (ncap, no, 3, 3))
    d_b, pc_b, po_b, _ = C.capsule_box_distance(
        jnp.broadcast_to(p0, (ncap, no, 3)), jnp.broadcast_to(p1, (ncap, no, 3)),
        jnp.broadcast_to(rc, (ncap, no)), jnp.broadcast_to(opos, (ncap, no, 3)),
        eye, jnp.broadcast_to(osize, (ncap, no, 3)))

    is_box = (state.obstacle_type == OBS_BOX)[None, :]
    dist = jnp.where(is_box, d_b, d_s)                      # (ncap, no)
    pc = jnp.where(is_box[..., None], pc_b, pc_s)
    po = jnp.where(is_box[..., None], po_b, po_s)
    # Bullet's convex-convex queries (box obstacles vs link hulls) return no
    # points for penetrations deeper than the collision margin, so the
    # reference sees max_distance for them — in observations AND in
    # check_collided (its "wall" stage buries link1/2 in a cuboid and stays
    # trainable only because of this).  Sphere queries are analytic in Bullet
    # and always report, so spheres keep their negative distances.
    dist = jnp.where(is_box & (dist <= -DEEP_PENETRATION_BLIND),
                     max_distance, dist)
    dist = jnp.where(state.obstacle_active[None, :], dist, max_distance)

    # reduce to per-group minimum
    ngroup = model.ngroup
    # model constants are host numpy; promote for tracer-safe indexing
    group = jnp.asarray(model.cap_group)                     # (ncap,)
    flat_d = dist.reshape(-1)
    flat_pc = pc.reshape(-1, 3)
    flat_po = po.reshape(-1, 3)
    cap_idx = jnp.repeat(jnp.arange(ncap), no)
    g_of_flat = group[cap_idx]
    group_d = []
    group_pc = []
    group_po = []
    for g in range(ngroup):
        m = g_of_flat == g
        # non-group entries strictly worse than max_distance so the argmin
        # lands on the group's own first candidate even when every candidate
        # is inactive (keeps per-env and batched paths bit-identical)
        dg = jnp.where(m, flat_d, max_distance + 1.0)
        i = jnp.argmin(dg)
        group_d.append(dg[i])
        group_pc.append(flat_pc[i])
        group_po.append(flat_po[i])
    return (jnp.stack(group_d), jnp.stack(group_pc), jnp.stack(group_po))


def group_table_distances(model: ChainModel, fk, scene: SceneParams,
                          skip_groups: Tuple[int, ...] = (0,),
                          max_distance: float = 999.0):
    """Distance of each collision group to the table box.

    The reference ignores panda_link0 and panda_link1 here
    (check_collided's ignore_link, reach_ao.py:898).  Our groups are the
    reference's robot.link_names = joint child links (core.py:43-48), which
    never contain link0 — so only group 0 (panda_link1) is skipped."""
    cap_p0, cap_p1 = K.capsule_endpoints_world(model, fk)
    ncap = cap_p0.shape[0]
    d, _, _, _ = C.capsule_box_distance(
        cap_p0, cap_p1, model.cap_radius,
        jnp.broadcast_to(scene.table_center, (ncap, 3)),
        jnp.broadcast_to(jnp.eye(3), (ncap, 3, 3)),
        jnp.broadcast_to(scene.table_half, (ncap, 3)))
    # convex-convex deep-penetration blindness (see group_obstacle_distances)
    d = jnp.where(d <= -DEEP_PENETRATION_BLIND, max_distance, d)
    out = []
    for g in range(model.ngroup):
        if g in skip_groups:
            out.append(jnp.asarray(max_distance))
            continue
        sel = [i for i in range(ncap) if model.cap_group_tuple[i] == g]
        if not sel:
            out.append(jnp.asarray(max_distance))
        else:
            out.append(jnp.min(jnp.stack([d[i] for i in sel])))
    return jnp.stack(out)


def make_physics_step(
    model: ChainModel,
    scene: SceneParams,
    *,
    n_substeps: int = 20,
    ctrl_mode: int = D.CTRL_POSITION,
    robot_contact: bool = False,
    body_pairs: Sequence[Tuple[int, int]] = (),
    check_collision: bool = False,
    collision_safety_distance: float = 0.0,
    freeze_on_collision: bool = True,
    has_bodies: bool = True,
    moving_obstacles: bool = False,
    timestep: float = TIMESTEP,
    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81),
    effort=None,
    warm_start=None,
):
    """Build the jit-able physics step: n_substeps of `timestep` (pybullet
    dt semantics, pybullet.py:63-71; defaults 20 x 1/500 s).  `effort`
    optionally overrides the per-joint motor force clamp (the facade's
    control_joints forces argument, pybullet.py:437-463).

    warm_start: carry the motor-LCP active set across substeps vs the cold
    3-refinement solve per substep.  Default mirrors the task's BATCHED
    path so per-env and batched trajectories stay bit-equal: cold for
    check_collision configs (where cold also measures faster —
    ops/scalarized_collision.py), warm otherwise.  PANDA_LCP_WARM
    overrides (dynamics.lcp_warm_default)."""
    if warm_start is None:
        warm_start = D.lcp_warm_default(not check_collision)
    dt = timestep
    grav = jnp.asarray(gravity)
    nb = scene.nb

    need_fk = (has_bodies and nb > 0 and robot_contact) or check_collision

    def substep(state: EnvState, warm=None):
        fk = K.fk_world(model, state.q, state.qd) if need_fk else None
        tau_ext = jnp.zeros(model.ndof)

        if has_bodies and nb > 0:
            Rs = [quat_to_mat(state.body_quat[b]) for b in range(nb)]
            forces = [jnp.zeros(3) for _ in range(nb)]
            torques = [jnp.zeros(3) for _ in range(nb)]
            for b in range(nb):
                f, t = _body_ground_forces(
                    scene, b, state.body_pos[b], Rs[b],
                    state.body_vel[b], state.body_ang[b])
                forces[b] += f
                torques[b] += t
            if robot_contact:
                cap_p0, cap_p1 = K.capsule_endpoints_world(model, fk)
                for b in range(nb):
                    f, t, te = _robot_body_contact(
                        model, fk, cap_p0, cap_p1, scene, b,
                        state.body_pos[b], Rs[b],
                        state.body_vel[b], state.body_ang[b])
                    forces[b] += f
                    torques[b] += t
                    tau_ext = tau_ext + te
            for (a, b) in body_pairs:
                fa, ta, fb, tb = _body_body_forces(
                    scene, a, b, state.body_pos[a], Rs[a], state.body_vel[a],
                    state.body_ang[a], state.body_pos[b], Rs[b],
                    state.body_vel[b], state.body_ang[b])
                forces[a] += fa
                torques[a] += ta
                forces[b] += fb
                torques[b] += tb

            # integrate free bodies (semi-implicit Euler)
            new_pos, new_quat, new_vel, new_ang = [], [], [], []
            for b in range(nb):
                m = scene.body_mass[b]
                v = state.body_vel[b] + dt * (forces[b] / m + grav)
                p = state.body_pos[b] + dt * v
                I_w = Rs[b] @ jnp.diag(scene.body_inertia[b]) @ Rs[b].T
                om = state.body_ang[b]
                om = om + dt * jnp.linalg.solve(
                    I_w, torques[b] - jnp.cross(om, I_w @ om))
                qt = quat_integrate(state.body_quat[b], om, dt)
                new_pos.append(p)
                new_quat.append(qt)
                new_vel.append(v)
                new_ang.append(om)
            body_pos = jnp.stack(new_pos)
            body_quat = jnp.stack(new_quat)
            body_vel = jnp.stack(new_vel)
            body_ang = jnp.stack(new_ang)
        else:
            body_pos, body_quat = state.body_pos, state.body_quat
            body_vel, body_ang = state.body_vel, state.body_ang

        # kinematic obstacles
        if moving_obstacles:
            obstacle_pos = state.obstacle_pos + dt * state.obstacle_vel
        else:
            obstacle_pos = state.obstacle_pos

        # robot substep (warm-started active set carried across substeps;
        # dynamics.py motor_substep warm contract)
        q, qd, warm = D.motor_substep(
            model, state.q, state.qd, state.ctrl_target, dt, ctrl_mode,
            gravity=gravity, tau_ext=tau_ext, effort=effort, warm=warm,
            return_warm=True)

        new_state = state.replace(
            q=q, qd=qd, body_pos=body_pos, body_quat=body_quat,
            body_vel=body_vel, body_ang=body_ang, obstacle_pos=obstacle_pos)

        if check_collision:
            fk2 = K.fk_world(model, q, qd)
            gd, _, _ = group_obstacle_distances(model, fk2,
                                                new_state.replace(obstacle_pos=obstacle_pos))
            td = group_table_distances(model, fk2, scene)
            # Group 0 (panda_link1) is skipped in the predicate: the
            # reference never collision-checks link0 (absent from
            # link_names, core.py:43-48) and ignores link1 for the table
            # (reach_ao.py:898); link1's distances stay in the observations
            # (gd keeps all groups).  Deep box penetrations were already
            # mapped to max_distance upstream (Bullet convex-margin
            # blindness, see group_obstacle_distances).
            collided = (jnp.min(gd[1:]) <= collision_safety_distance) | (
                jnp.min(td) <= collision_safety_distance)
            new_state = new_state.replace(
                is_collided=state.is_collided | collided,
                link_obstacle_dist=gd,
            )
            if freeze_on_collision:
                # reproduce step_check_collision's early break
                # (reach_ao.py:182-188): once collided, later substeps no-op —
                # including link_obstacle_dist, which keeps the values from
                # the colliding substep (not a phantom advanced pose)
                new_state = jax.tree_util.tree_map(
                    lambda old, new: jnp.where(state.is_collided, old, new),
                    state.replace(is_collided=new_state.is_collided),
                    new_state,
                )
        return new_state, warm

    def physics_step(state: EnvState) -> EnvState:
        if not warm_start:
            # cold 3-refinement solve per substep, no carry — matches the
            # cold batched paths (collision configs) bit-for-bit
            def body_cold(s, _):
                s2, _w = substep(s, None)
                return s2, None

            out, _ = jax.lax.scan(body_cold, state, None,
                                  length=n_substeps)
            return out

        # Cold pre-solve: run the full active-set LCP once on the initial
        # system and keep only the converged set as the warm seed; every
        # substep in the scan then runs one warm refinement.  On converged
        # sets with tau_ext=0 the first substep is bit-identical to the
        # old cold-3 path (the warm solve repeats the cold pass's final
        # masked system); under contact tau_ext the seed ignores the
        # contact torque, so a set transition it causes lands one substep
        # late (same transient as any warm set change).  This structure is
        # shared by the warm batched paths so per-env and batched
        # trajectories stay bit-equal.
        _, _, warm0 = D.motor_substep(
            model, state.q, state.qd, state.ctrl_target, dt, ctrl_mode,
            gravity=gravity, effort=effort, return_warm=True)

        def body(carry, _):
            s, w = carry
            s2, w2 = substep(s, w)
            return (s2, w2), None

        (out, _), _ = jax.lax.scan(body, (state, warm0), None,
                                   length=n_substeps)
        return out

    return physics_step


def make_batched_physics_step(
    model: ChainModel,
    scene: SceneParams,
    *,
    n_substeps: int = 20,
    ctrl_mode: int = D.CTRL_POSITION,
    robot_contact: bool = False,
    body_pairs: Sequence[Tuple[int, int]] = (),
    check_collision: bool = False,
    collision_safety_distance: float = 0.0,
    freeze_on_collision: bool = True,
    has_bodies: bool = True,
    moving_obstacles: bool = False,
):
    """Batch-native physics step over a batched EnvState, or None.

    For configurations whose per-substep work is robot-only (no free bodies,
    no contact, no per-substep collision check — Reach & friends), the motor
    dynamics run in batch-last scalarized layout (ops/scalarized.py): every
    spatial component is a (B,) vector across the full VPU instead of a
    3-lane slice, ~8x faster than vmap of the per-env path on TPU.  Returns
    None when the configuration needs the general per-env substep (callers
    fall back to vmap(make_physics_step(...))).
    """
    import os

    from panda_gym_tpu.ops import scalarized as S

    if has_bodies and scene.nb > 0:
        if check_collision or moving_obstacles:
            return None  # no task combines free bodies with these; vmap path
        from panda_gym_tpu.ops.scalarized_contact import (
            make_batched_contact_physics,
        )
        return make_batched_contact_physics(
            model, scene, n_substeps=n_substeps, dt=TIMESTEP,
            ctrl_mode=ctrl_mode, robot_contact=robot_contact,
            body_pairs=tuple(body_pairs))

    if check_collision:
        # ReachAO configuration: per-substep collision checking, batched
        # (ops/scalarized_collision.py). n_obstacles comes from the state at
        # call time, so wrap lazily.
        from panda_gym_tpu.ops.scalarized_collision import (
            make_batched_collision_physics,
        )

        cache = {}

        def physics_step_collision(states: EnvState) -> EnvState:
            no = states.obstacle_pos.shape[1]
            if no not in cache:
                cache[no] = make_batched_collision_physics(
                    model, scene,
                    n_substeps=n_substeps, dt=TIMESTEP, ctrl_mode=ctrl_mode,
                    n_obstacles=no,
                    collision_safety_distance=collision_safety_distance,
                    freeze_on_collision=freeze_on_collision,
                    moving_obstacles=moving_obstacles)
            return cache[no](states)

        return physics_step_collision

    use_pallas = (jax.default_backend() not in ("cpu",)
                  and not os.environ.get("PANDA_GYM_TPU_NO_PALLAS"))
    if use_pallas:
        from panda_gym_tpu.ops.pallas_dynamics import make_pallas_motor_steps
        motor = make_pallas_motor_steps(
            model, n_substeps=n_substeps, dt=TIMESTEP, ctrl_mode=ctrl_mode)
    else:
        motor = S.make_batched_motor_steps(
            model, n_substeps=n_substeps, dt=TIMESTEP, ctrl_mode=ctrl_mode)

    def physics_step_batched(states: EnvState) -> EnvState:
        q, qd = motor(states.q, states.qd, states.ctrl_target)
        upd = dict(q=q, qd=qd)
        if moving_obstacles:
            upd["obstacle_pos"] = (
                states.obstacle_pos
                + (n_substeps * TIMESTEP) * states.obstacle_vel)
        return states.replace(**upd)

    return physics_step_batched
