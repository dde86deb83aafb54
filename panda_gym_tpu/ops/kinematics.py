"""Forward kinematics, Jacobians and damped-least-squares IK for ChainModel.

Replaces the reference's PyBullet FK queries (pybullet.py:249-299
getLinkState) and calculateInverseKinematics (pybullet.py:465-493), and the
roboticstoolbox twin (panda.py:220-224 rtb_ik, :314-317 manipulability).

All functions are single-instance and pure; batch with jax.vmap, compile with
jax.jit.  Loops are unrolled over the (static, tiny) dof count so XLA sees a
straight-line program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from panda_gym_tpu.models.chain import ChainModel, JOINT_PRISMATIC, JOINT_REVOLUTE


def _axis_angle_mat(axis, angle):
    """Rodrigues rotation matrix about a (constant) unit axis."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, y, z = axis[0], axis[1], axis[2]
    C = 1.0 - c
    return jnp.array(
        [
            [c + x * x * C, x * y * C - z * s, x * z * C + y * s],
            [y * x * C + z * s, c + y * y * C, y * z * C - x * s],
            [z * x * C - y * s, z * y * C + x * s, c + z * z * C],
        ]
    )


class FK(NamedTuple):
    """World-frame kinematics of each dof body (stacked over dofs)."""

    R: jnp.ndarray      # (ndof, 3, 3) body frame rotation
    p: jnp.ndarray      # (ndof, 3) body frame origin (== joint anchor)
    a: jnp.ndarray      # (ndof, 3) joint axis in world frame
    om: jnp.ndarray     # (ndof, 3) body angular velocity (world coords)
    v: jnp.ndarray      # (ndof, 3) velocity of body-frame origin (world)


def fk_world(model: ChainModel, q, qd=None) -> FK:
    """Forward position (and optional velocity) kinematics, world frame."""
    if qd is None:
        qd = jnp.zeros_like(q)
    Rs, ps, as_, oms, vs = [], [], [], [], []
    for d in range(model.ndof):
        pd = model.parent_tuple[d]
        if pd < 0:
            R_par, p_par = jnp.eye(3), model.base_pos
            om_par, v_par = jnp.zeros(3), jnp.zeros(3)
        else:
            R_par, p_par, om_par, v_par = Rs[pd], ps[pd], oms[pd], vs[pd]
        R_f = R_par @ model.X_R[d]
        p_f = R_par @ model.X_p[d] + p_par
        a_w = R_f @ model.axis[d]
        if model.jtype_tuple[d] == JOINT_REVOLUTE:
            R_b = R_f @ _axis_angle_mat(model.axis[d], q[d])
            p_b = p_f
            om_b = om_par + a_w * qd[d]
            v_b = v_par + jnp.cross(om_par, p_b - p_par)
        else:
            R_b = R_f
            p_b = p_f + a_w * q[d]
            om_b = om_par
            v_b = v_par + jnp.cross(om_par, p_b - p_par) + a_w * qd[d]
        Rs.append(R_b)
        ps.append(p_b)
        as_.append(a_w)
        oms.append(om_b)
        vs.append(v_b)
    return FK(jnp.stack(Rs), jnp.stack(ps), jnp.stack(as_),
              jnp.stack(oms), jnp.stack(vs))


def _site_base(model: ChainModel, fk: FK, s: int):
    b = model.site_body_tuple[s]
    if b < 0:
        return jnp.eye(3), model.base_pos, jnp.zeros(3), jnp.zeros(3)
    return fk.R[b], fk.p[b], fk.om[b], fk.v[b]


def site_frame(model: ChainModel, fk: FK, s: int):
    """World pose (R, p) of URDF link frame s (PyBullet link index)."""
    R_b, p_b, _, _ = _site_base(model, fk, s)
    return R_b @ model.site_R[s], R_b @ model.site_p[s] + p_b


def site_com_position(model: ChainModel, fk: FK, s: int):
    """World CoM of link s — PyBullet getLinkState()[0] semantics
    (pybullet.py:249-260)."""
    R_s, p_s = site_frame(model, fk, s)
    return R_s @ model.site_com[s] + p_s


def site_com_velocity(model: ChainModel, fk: FK, s: int):
    """World CoM linear velocity of link s — getLinkState()[6] semantics
    (pybullet.py:275-286)."""
    R_b, p_b, om_b, v_b = _site_base(model, fk, s)
    x = site_com_position(model, fk, s)
    return v_b + jnp.cross(om_b, x - p_b)


def site_angular_velocity(model: ChainModel, fk: FK, s: int):
    _, _, om_b, _ = _site_base(model, fk, s)
    return om_b


def all_site_com_positions(model: ChainModel, fk: FK):
    return jnp.stack([site_com_position(model, fk, s) for s in range(model.nsite)])


def capsule_endpoints_world(model: ChainModel, fk: FK):
    """World endpoints of every collision capsule: (ncap, 3) x2."""
    ncap = model.cap_p0.shape[0]
    body = model.cap_body  # (ncap,)
    # gather body frames; body == -1 means base
    safe = jnp.maximum(body, 0)
    R_b = jnp.where((body >= 0)[:, None, None], fk.R[safe], jnp.eye(3))
    p_b = jnp.where((body >= 0)[:, None], fk.p[safe], model.base_pos)
    p0 = jnp.einsum("nij,nj->ni", R_b, model.cap_p0) + p_b
    p1 = jnp.einsum("nij,nj->ni", R_b, model.cap_p1) + p_b
    return p0, p1


def point_jacobian(model: ChainModel, fk: FK, x, body: int):
    """Geometric Jacobian (6, ndof) of world point x rigidly attached to dof
    body `body`: rows [linear; angular] stacked as (J_v; J_w)."""
    cols_v, cols_w = [], []
    # support set of `body` on a chain/tree: walk ancestors (static structure)
    support = [False] * model.ndof
    b = body
    while b >= 0:
        support[b] = True
        b = model.parent_tuple[b]
    for d in range(model.ndof):
        if not support[d]:
            cols_v.append(jnp.zeros(3))
            cols_w.append(jnp.zeros(3))
        elif model.jtype_tuple[d] == JOINT_REVOLUTE:
            cols_v.append(jnp.cross(fk.a[d], x - fk.p[d]))
            cols_w.append(fk.a[d])
        else:
            cols_v.append(fk.a[d])
            cols_w.append(jnp.zeros(3))
    return jnp.stack(cols_v, axis=1), jnp.stack(cols_w, axis=1)


def ee_jacobian(model: ChainModel, ee_site: int, q):
    """(J_v, J_w) at the EE site CoM for the current q."""
    fk = fk_world(model, q)
    x = site_com_position(model, fk, ee_site)
    body = model.site_body_tuple[ee_site]
    return point_jacobian(model, fk, x, body)


def manipulability(model: ChainModel, ee_site: int, q, n_arm: int = 7):
    """Yoshikawa translational manipulability sqrt(det(Jv Jv^T)) — replaces
    rtb .manipulability(axes="trans") (panda.py:314-317)."""
    J_v, _ = ee_jacobian(model, ee_site, q)
    J = J_v[:, :n_arm]
    return jnp.sqrt(jnp.maximum(jnp.linalg.det(J @ J.T), 0.0))


def _quat_err_vec(R_cur, quat_target):
    """Rotation error as a 3-vector (axis*angle, small-angle form)."""
    from panda_gym_tpu.math.transforms import quat_to_mat
    R_t = quat_to_mat(quat_target)
    # orientation error: 0.5 * sum_i cur_i x target_i (classic resolved-rate)
    e = 0.5 * (
        jnp.cross(R_cur[:, 0], R_t[:, 0])
        + jnp.cross(R_cur[:, 1], R_t[:, 1])
        + jnp.cross(R_cur[:, 2], R_t[:, 2])
    )
    return e


def dls_ik(
    model: ChainModel,
    ee_site: int,
    target_pos,
    target_quat=None,
    q0=None,
    n_iters: int = 30,
    damping: float = 0.05,
    n_arm: int = 7,
    step_clip: float = 0.5,
):
    """Damped-least-squares IK to a world position (+ optional orientation).

    Functional replacement for PyBullet calculateInverseKinematics
    (pybullet.py:465-493) and rtb ik_lm_chan (panda.py:220-224).  Fixed
    iteration count -> jit/vmap friendly.  Only the first ``n_arm`` dofs move.
    """
    if q0 is None:
        q0 = jnp.zeros(model.ndof)
    lam2 = damping * damping

    def body(_, q):
        fk = fk_world(model, q)
        x = site_com_position(model, fk, ee_site)
        body_idx = model.site_body_tuple[ee_site]
        J_v, J_w = point_jacobian(model, fk, x, body_idx)
        e_p = target_pos - x
        if target_quat is None:
            J = J_v[:, :n_arm]
            e = e_p
        else:
            R_s, _ = site_frame(model, fk, ee_site)
            e_r = _quat_err_vec(R_s, target_quat)
            J = jnp.concatenate([J_v, J_w], axis=0)[:, :n_arm]
            e = jnp.concatenate([e_p, e_r])
        JJt = J @ J.T + lam2 * jnp.eye(J.shape[0])
        dq = J.T @ jnp.linalg.solve(JJt, e)
        dq = jnp.clip(dq, -step_clip, step_clip)
        q_arm = jnp.clip(q[:n_arm] + dq, model.q_lo[:n_arm], model.q_hi[:n_arm])
        return q.at[:n_arm].set(q_arm)

    return jax.lax.fori_loop(0, n_iters, body, q0)
