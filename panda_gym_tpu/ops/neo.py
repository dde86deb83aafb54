"""NEO reactive QP controller — the analytical motion-planner prior.

Pure-JAX re-implementation of Panda.compute_action_neo
(/root/reference/panda_gym/envs/robots/panda.py:319-429), which builds the
NEO QP (Haviland & Corke 2021) from roboticstoolbox pieces and solves it with
Gurobi.  Here every piece is native:

  * p_servo        -> desired EE twist from the pose error,
  * jacobe         -> geometric Jacobian rotated into the EE frame,
  * jacobm         -> manipulability Jacobian via jax.grad of the Yoshikawa
                      index (replaces rtb's analytic jacobm),
  * joint_velocity_damper / link_collision_damper -> inequality rows,
  * Gurobi         -> fixed-iteration ADMM (ops/qp.py), vmappable so the
                      prior can run for thousands of envs per step.

Variables x = [qd(7); slack(6)]; config defaults mirror panda.py:321-331.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from panda_gym_tpu.models import panda_constants as pc
from panda_gym_tpu.ops import contact as C
from panda_gym_tpu.ops import kinematics as K
from panda_gym_tpu.ops.qp import solve_qp_admm
from panda_gym_tpu.sim.state import OBS_BOX

DEFAULT_CONFIG = dict(
    velocity_gain=0.5,
    threshold_error=0.05,
    gain_control_minimization=0.01,
    min_angle_joint=0.05,
    min_angle_joint_damp_active=0.9,
    min_dist_obstacle=0.05,
    min_dist_obstacle_damp_active=0.3,
    damp_gain=1.0,
)

_BIG = 1e6


def _rotvec(R):
    """Rotation matrix -> axis*angle vector."""
    cos = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    angle = jnp.arccos(cos)
    axis = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    s = jnp.maximum(2.0 * jnp.sin(angle), 1e-8)
    return axis / s * angle


def p_servo(R_cur, p_cur, R_des, p_des, gain: float):
    """Position-based servoing twist in the current EE frame (rtb p_servo)."""
    R_err = R_cur.T @ R_des
    e_t = R_cur.T @ (p_des - p_cur)
    e_r = _rotvec(R_err)
    return gain * jnp.concatenate([e_t, e_r])


def compute_action_neo(model, ee_site: int, state, fk, target,
                       config: Optional[Dict] = None, n_arm: int = 7):
    """Collision-avoiding joint-velocity command toward `target` (world xyz).

    Mirrors compute_action_neo's QP assembly (panda.py:345-429):
    Q = diag(Y*I_n, (1/e) I_6); Aeq = [Je I6] x = v; joint-limit and
    per-obstacle velocity dampers as inequality rows; lb/ub = +-qdlim, +-10.
    """
    cfg = dict(DEFAULT_CONFIG)
    if config:
        cfg.update(config)
    ps = cfg["min_angle_joint"]
    pi_ = cfg["min_angle_joint_damp_active"]
    ds = cfg["min_dist_obstacle"]
    di = cfg["min_dist_obstacle_damp_active"]
    xi = cfg["damp_gain"]
    gain = cfg["velocity_gain"]
    Y = cfg["gain_control_minimization"]

    q = state.q[:n_arm]
    n = n_arm

    # EE pose + desired pose (keep current orientation, move to target;
    # the reference fkine's a neutral-pose orientation — panda.py:352-356;
    # using the current orientation yields the same translational servo)
    R_e, p_e = K.site_frame(model, fk, ee_site)
    v = p_servo(R_e, K.site_com_position(model, fk, ee_site), R_e, target, gain)

    # spatial error (panda.py:364): |t_err| + |rpy_err|, here |rotvec|
    e = jnp.sum(jnp.abs(v / gain))
    e = jnp.maximum(e, 1e-4)

    # EE-frame jacobian (jacobe)
    x_ee = K.site_com_position(model, fk, ee_site)
    J_v, J_w = K.point_jacobian(model, fk, x_ee, model.site_body_tuple[ee_site])
    Je = jnp.concatenate([R_e.T @ J_v[:, :n], R_e.T @ J_w[:, :n]], axis=0)

    # manipulability jacobian via autodiff (rtb jacobm, panda.py:415)
    def manip(qq):
        fkq = K.fk_world(model, state.q.at[:n].set(qq))
        xq = K.site_com_position(model, fkq, ee_site)
        Jq, _ = K.point_jacobian(model, fkq, xq, model.site_body_tuple[ee_site])
        Jq = Jq[:, :n]
        return jnp.sqrt(jnp.maximum(jnp.linalg.det(Jq @ Jq.T), 1e-12))

    jacobm = jax.grad(manip)(q)

    nv = n + 6
    Q = jnp.eye(nv) * Y
    Q = Q.at[n:, n:].set((1.0 / e) * jnp.eye(6))
    c = jnp.concatenate([-jacobm, jnp.zeros(6)])

    # ----- rows: equality [Je I6] x = v
    A_eq = jnp.concatenate([Je, jnp.eye(6)], axis=1)          # (6, nv)
    l_eq = u_eq = v

    # ----- joint-limit velocity dampers (rtb joint_velocity_damper)
    qlo = jnp.asarray(pc.JOINT_LIM_MIN)
    qhi = jnp.asarray(pc.JOINT_LIM_MAX)
    rho_lo = q - qlo
    rho_hi = qhi - q
    lo_active = rho_lo <= pi_
    hi_active = rho_hi <= pi_
    A_lo = -jnp.eye(n)
    b_lo = jnp.where(lo_active, xi * (rho_lo - ps) / (pi_ - ps), _BIG)
    A_hi = jnp.eye(n)
    b_hi = jnp.where(hi_active, xi * (rho_hi - ps) / (pi_ - ps), _BIG)
    A_j = jnp.concatenate([A_lo, A_hi], axis=0)
    A_j = jnp.concatenate([A_j, jnp.zeros((2 * n, 6))], axis=1)
    u_j = jnp.concatenate([b_lo, b_hi])
    l_j = jnp.full(2 * n, -_BIG)

    # ----- obstacle velocity dampers (link_collision_damper_pybullet)
    # one row per (collision capsule, obstacle): d_dot <= xi (d - ds)/(di - ds)
    cap_p0, cap_p1 = K.capsule_endpoints_world(model, fk)
    ncap = cap_p0.shape[0]
    no = state.obstacle_pos.shape[0]
    p0 = jnp.broadcast_to(cap_p0[:, None], (ncap, no, 3))
    p1 = jnp.broadcast_to(cap_p1[:, None], (ncap, no, 3))
    rc = jnp.broadcast_to(model.cap_radius[:, None], (ncap, no))
    opos = jnp.broadcast_to(state.obstacle_pos[None], (ncap, no, 3))
    osize = jnp.broadcast_to(state.obstacle_size[None], (ncap, no, 3))
    d_s, pc_s, po_s = C.capsule_sphere_distance(p0, p1, rc, opos, osize[..., 0])
    d_b, pc_b, po_b, _ = C.capsule_box_distance(
        p0, p1, rc, opos, jnp.broadcast_to(jnp.eye(3), (ncap, no, 3, 3)), osize)
    is_box = (state.obstacle_type == OBS_BOX)[None, :]
    dist = jnp.where(is_box, d_b, d_s)
    pcap = jnp.where(is_box[..., None], pc_b, pc_s)
    pobs = jnp.where(is_box[..., None], po_b, po_s)
    dist = jnp.where(state.obstacle_active[None, :], dist, _BIG)

    n_hat = pobs - pcap
    n_hat = n_hat / jnp.maximum(jnp.linalg.norm(n_hat, axis=-1, keepdims=True), 1e-9)

    rows = []
    ups = []
    for i in range(ncap):
        bi = model.cap_body_tuple[i]
        if bi < 0 or model.cap_group_tuple[i] < 0:
            continue
        for o in range(no):
            Jp, _ = K.point_jacobian(model, fk, pcap[i, o], bi)
            # d_dot = n^T (v_point); constrain approach speed
            row = n_hat[i, o] @ Jp[:, :n]
            active = dist[i, o] <= di
            rows.append(jnp.where(active, row, jnp.zeros(n)))
            ups.append(jnp.where(active,
                                 xi * (dist[i, o] - ds) / (di - ds), _BIG))
    if rows:
        A_o = jnp.stack(rows)
        A_o = jnp.concatenate([A_o, jnp.zeros((A_o.shape[0], 6))], axis=1)
        u_o = jnp.stack(ups)
        l_o = jnp.full(A_o.shape[0], -_BIG)
    else:
        A_o = jnp.zeros((1, nv))
        u_o = jnp.full(1, _BIG)
        l_o = jnp.full(1, -_BIG)

    # ----- bounds as rows: lb <= x <= ub (panda.py:417-419)
    qdlim = jnp.asarray(pc.QDLIM[:n])
    A_b = jnp.eye(nv)
    l_b = jnp.concatenate([-qdlim, -10.0 * jnp.ones(6)])
    u_b = jnp.concatenate([qdlim, 10.0 * jnp.ones(6)])

    A = jnp.concatenate([A_eq, A_j, A_o, A_b], axis=0)
    l = jnp.concatenate([l_eq, l_j, l_o, l_b])
    u = jnp.concatenate([u_eq, u_j, u_o, u_b])

    x, _ = solve_qp_admm(Q, c, A, l, u)
    return x[:n]
