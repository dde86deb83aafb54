"""Batch-last contact physics: Push/Slide/PickAndPlace/Stack/Flip substeps.

Batched equivalent of engine.substep for the has_bodies configuration:
penalty contact between free rigid bodies, the ground (plane + table), and
the robot's collision capsules — including the generalized reaction torque
J^T f on the arm that lets the position-servo push objects and the gripper
squeeze (engine.py:_robot_body_contact).

Layout follows ops/scalarized.py: every scalar component is a (B,) or
(K, B)/(ncap, B) array with model/scene constants folded at trace time
(sample tables, masses, inertias, friction, shapes are all static per
compiled task). Numerics mirror engine.py/_body_* + ops/contact.py
penalty_force exactly; quaternion updates mirror math/transforms.py.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from panda_gym_tpu.models.chain import ChainModel
from panda_gym_tpu.ops import scalarized as S
from panda_gym_tpu.ops.scalarized_collision import (
    _inside_normal, _point_box_closest, closest_on_segment,
)
from panda_gym_tpu.sim.state import SHAPE_BOX, SHAPE_SPHERE

EPS = 1e-9
GRAVITY_Z = -9.81          # engine.py GRAVITY (pybullet.py:54)
KN, DN, V_EPS = 8000.0, 120.0, 2e-3   # contact.py:penalty_force defaults


# ---------------------------------------------------------------------------
# quaternion components (x, y, z, w) — mirrors math/transforms.py
# ---------------------------------------------------------------------------

def quat_to_mat(q):
    x, y, z, w = q
    xx, yy, zz = S.mul(x, x), S.mul(y, y), S.mul(z, z)
    xy, xz, yz = S.mul(x, y), S.mul(x, z), S.mul(y, z)
    wx, wy, wz = S.mul(w, x), S.mul(w, y), S.mul(w, z)
    two = 2.0
    return (
        (S.sub(1.0, S.mul(two, S.add(yy, zz))),
         S.mul(two, S.sub(xy, wz)), S.mul(two, S.add(xz, wy))),
        (S.mul(two, S.add(xy, wz)),
         S.sub(1.0, S.mul(two, S.add(xx, zz))), S.mul(two, S.sub(yz, wx))),
        (S.mul(two, S.sub(xz, wy)), S.mul(two, S.add(yz, wx)),
         S.sub(1.0, S.mul(two, S.add(xx, yy)))),
    )


def quat_mul(q1, q2):
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return (
        S.add(S.add(S.mul(w1, x2), S.mul(x1, w2)),
              S.sub(S.mul(y1, z2), S.mul(z1, y2))),
        S.add(S.sub(S.mul(w1, y2), S.mul(x1, z2)),
              S.add(S.mul(y1, w2), S.mul(z1, x2))),
        S.add(S.add(S.mul(w1, z2), S.mul(x1, y2)),
              S.sub(S.mul(z1, w2), S.mul(y1, x2))),
        S.sub(S.sub(S.mul(w1, w2), S.mul(x1, x2)),
              S.add(S.mul(y1, y2), S.mul(z1, z2))),
    )


def quat_integrate(q, om, dt: float):
    """transforms.quat_integrate: q' = normalize(exp(0.5 om dt) ⊗ q)."""
    angle = jnp.sqrt(jnp.maximum(S.vdot(om, om), 0.0))
    safe = jnp.where(angle > 1e-9, angle, 1.0)
    axis = tuple(om[i] / safe for i in range(3))
    half = 0.5 * dt * angle
    s, c = jnp.sin(half), jnp.cos(half)
    dq = (S.mul(axis[0], s), S.mul(axis[1], s), S.mul(axis[2], s), c)
    qn = quat_mul(dq, q)
    inv_n = 1.0 / jnp.sqrt(jnp.maximum(
        S.add(S.add(S.mul(qn[0], qn[0]), S.mul(qn[1], qn[1])),
              S.add(S.mul(qn[2], qn[2]), S.mul(qn[3], qn[3]))), EPS))
    return tuple(S.mul(inv_n, qn[i]) for i in range(4))


# ---------------------------------------------------------------------------
# penalty contact (contact.py:penalty_force, component form)
# ---------------------------------------------------------------------------

def penalty_force(depth, n, v_rel, mu: float):
    pen = jnp.maximum(depth, 0.0)
    v_n = S.vdot(v_rel, n)
    fn = jnp.maximum(KN * pen - DN * v_n * (pen > 0), 0.0)
    v_t = S.vsub(v_rel, tuple(S.mul(v_n, n[i]) for i in range(3)))
    vt_norm = jnp.sqrt(jnp.maximum(S.vdot(v_t, v_t), 0.0))
    ft_mag = mu * fn * jnp.minimum(vt_norm / V_EPS, 1.0)
    inv = 1.0 / jnp.maximum(vt_norm, EPS)
    return tuple(S.add(S.mul(fn, n[i]), -ft_mag * v_t[i] * inv)
                 for i in range(3))


# ---------------------------------------------------------------------------
# oriented capsule-box distance (for robot vs rotated body boxes)
# ---------------------------------------------------------------------------

def capsule_box_closest_oriented(p0, p1, rc, center, Rb, half):
    """contact.py:capsule_box_distance with a per-env rotation Rb (mat3 of
    scalar comps); returns (dist, point on capsule, point on box, world
    normal box->capsule)."""
    to_local = lambda x: S.mtv(Rb, S.vsub(x, center))
    a, b = to_local(p0), to_local(p1)
    x = S.vscale(0.5, S.vadd(a, b))
    for _ in range(4):
        cb, _ = _point_box_closest(x, half)
        x = closest_on_segment(a, b, cb)
    cb, sd = _point_box_closest(x, half)
    delta = S.vsub(cb, x)
    d = jnp.sqrt(jnp.maximum(S.vdot(delta, delta), 0.0))
    safe = jnp.maximum(d, EPS)
    outside = sd > 0
    n_in = _inside_normal(x, half)
    n_loc = tuple(jnp.where(outside, -delta[i] / safe, n_in[i])
                  for i in range(3))
    dist = S.sub(sd, rc)
    n_w = S.mv(Rb, n_loc)
    pc = S.vsub(S.vadd(S.mv(Rb, x), center),
                tuple(S.mul(rc, n_w[i]) for i in range(3)))
    pb = S.vadd(S.mv(Rb, cb), center)
    return dist, pc, pb, n_w


# ---------------------------------------------------------------------------
# the batched physics step
# ---------------------------------------------------------------------------

def make_batched_contact_physics(
    model: ChainModel,
    scene,
    *,
    n_substeps: int,
    dt: float,
    ctrl_mode: int,
    robot_contact: bool,
    body_pairs: Sequence[Tuple[int, int]] = (),
    warm_start=None,
):
    """Batched equivalent of engine.make_physics_step for tasks with free
    rigid bodies (no per-substep collision check).

    warm_start: LCP active-set carry vs cold per-substep solve (see
    dynamics.LCP_WARM_START); None -> that global default."""
    from panda_gym_tpu.ops.dynamics import LCP_WARM_START
    if warm_start is None:
        warm_start = LCP_WARM_START
    mc = S.consts_from_model(model)
    ndof = mc.ndof
    nb = int(scene.nb)
    g = lambda a: np.asarray(a, np.float64)

    # static scene tables -> Python consts
    samples = g(scene.body_samples)           # (nb, K, 4)
    sample_mask = g(scene.body_sample_mask)   # (nb, K)
    body_mass = [float(x) for x in g(scene.body_mass)]
    body_inertia = [S.cvec(v) for v in g(scene.body_inertia)]   # diag
    body_mu = [float(x) for x in g(scene.body_mu)]
    body_shape = [int(x) for x in np.asarray(scene.body_shape)]
    body_size = [S.cvec(v) for v in g(scene.body_size)]
    table_mu = float(np.asarray(scene.table_mu))
    table_center = S.cvec(g(scene.table_center))
    table_half = S.cvec(g(scene.table_half))
    plane_z = float(np.asarray(scene.plane_z))

    ncap = len(mc.cap_body)
    cap_bodies = mc.cap_body
    # static ancestor-support matrix for J^T f (kinematics.point_jacobian)
    support = np.zeros((ndof, ncap), bool)
    for i, cb in enumerate(cap_bodies):
        b = cb
        while b >= 0:
            support[b, i] = True
            b = mc.parent[b]

    def ground_height(px, py):
        """engine._ground_height: table top z=0 inside the footprint, else
        the backup plane."""
        on_table = (jnp.abs(px - table_center[0]) <= table_half[0]) & \
                   (jnp.abs(py - table_center[1]) <= table_half[1])
        return jnp.where(on_table, 0.0, plane_z)

    def body_ground_forces(b, pos, R, vel, ang):
        """engine._body_ground_forces over (K, B) sample components."""
        K = samples.shape[1]
        pts = samples[b, :, :3]                  # const (K,3)
        rad = jnp.asarray(samples[b, :, 3:4], jnp.float32)   # (K,1)
        mask = jnp.asarray(sample_mask[b][:, None], jnp.float32)
        # world sample points: p_w[i] = pos[i] + sum_j R[i][j] * pts[:, j]
        # -> (K, B) comps
        p_w = []
        for i in range(3):
            acc = None
            for j in range(3):
                term = S.mul(jnp.asarray(pts[:, j:j + 1], jnp.float32), R[i][j])
                acc = term if acc is None else S.add(acc, term)
            p_w.append(S.add(acc, pos[i]))
        p_w = tuple(p_w)                          # (K, B) comps
        rel = tuple(S.sub(p_w[i], pos[i]) for i in range(3))
        v_pt = S.vadd(vel, S.vcross(ang, rel))
        gz = ground_height(p_w[0], p_w[1])
        depth = S.sub(gz, S.sub(p_w[2], rad))
        n = (0.0, 0.0, 1.0)
        mu = body_mu[b] * table_mu
        f = penalty_force(depth, n, v_pt, mu)
        f = tuple(S.mul(mask, f[i]) for i in range(3))
        force = tuple(jnp.sum(f[i], axis=0) for i in range(3))
        trq = S.vcross(rel, f)
        torque = tuple(jnp.sum(trq[i], axis=0) for i in range(3))
        return force, torque

    def robot_body_contact(b, fkR, fkp, fkom, fkv, fkaw, P0, P1, RC,
                           pos, R, vel, ang):
        """engine._robot_body_contact over (ncap, B) components."""
        shape = body_shape[b]
        size = body_size[b]
        if shape == SHAPE_SPHERE:
            cp = closest_on_segment(P0, P1, pos)
            delta = S.vsub(pos, cp)
            dist_c = jnp.sqrt(jnp.maximum(S.vdot(delta, delta), 0.0))
            safe = jnp.maximum(dist_c, EPS)
            n_cs = tuple(delta[i] / safe for i in range(3))  # capsule->sphere
            dist = S.sub(S.sub(dist_c, RC), size[0])
            pc = S.vadd(cp, tuple(S.mul(RC, n_cs[i]) for i in range(3)))
            pb = S.vsub(pos, tuple(S.mul(size[0], n_cs[i]) for i in range(3)))
            p_contact = tuple(S.mul(0.5, S.add(pc[i], pb[i])) for i in range(3))
            # normal = capsule-axis -> sphere-center direction (matches
            # engine._robot_body_contact; the earlier pb - pc normalization
            # flipped sign under penetration)
            n_hat = n_cs
        else:
            half = size if shape == SHAPE_BOX else (size[0], size[0], size[1])
            dist, pc, pb, n_w = capsule_box_closest_oriented(
                P0, P1, RC, pos, R, half)
            p_contact = tuple(S.mul(0.5, S.add(pc[i], pb[i])) for i in range(3))
            n_hat = tuple(-n_w[i] for i in range(3))   # robot INTO body

        depth = -dist
        # capsule contact-point velocity from its supporting body
        def per_cap(vals3, default=0.0):
            """stack per-dof comps into (ncap, 1)-gathered (ncap, B) comps."""
            out = []
            for i in range(3):
                rows = []
                for c in range(ncap):
                    bb = cap_bodies[c]
                    rows.append(vals3[bb][i] if bb >= 0 else None)
                # all rows share shape (B,); None -> zeros, floats broadcast
                ref = next(r for r in rows
                           if r is not None and not S._is_c(r))
                rows = [jnp.zeros_like(ref) if r is None else
                        (jnp.full_like(ref, r) if S._is_c(r) else r)
                        for r in rows]
                out.append(jnp.stack(rows))
            return tuple(out)

        om_c = per_cap(fkom)
        v_c = per_cap(fkv)
        p_c = per_cap(fkp)
        v_cap = S.vadd(v_c, S.vcross(om_c, S.vsub(p_contact, p_c)))
        v_body = S.vadd(vel, S.vcross(ang, S.vsub(p_contact, pos)))
        v_rel = S.vsub(v_body, v_cap)

        mu = body_mu[b] * 1.0       # robot links: friction 1.0 (panda.py:69-70)
        f = penalty_force(depth, n_hat, v_rel, mu)           # (ncap,B) on body
        force = tuple(jnp.sum(f[i], axis=0) for i in range(3))
        trq = S.vcross(S.vsub(p_contact, pos), f)
        torque = tuple(jnp.sum(trq[i], axis=0) for i in range(3))

        # reaction on the robot: tau[d] = sum_i J_i[:,d] . (-f_i)
        tau_ext = []
        for d in range(ndof):
            m_col = jnp.asarray(support[d][:, None], jnp.float32)  # (ncap,1)
            a_d = fkaw[d]      # vec3 of (B,)
            if mc.revolute[d]:
                arm = tuple(S.sub(p_contact[i], fkp[d][i]) for i in range(3))
                col = S.vcross(a_d, arm)     # broadcasts (B,) x (ncap,B)
            else:
                col = a_d
            contrib = S.vdot(col, tuple(-f[i] for i in range(3)))
            tau_ext.append(jnp.sum(m_col * contrib, axis=0))
        return force, torque, tau_ext

    def body_body_forces(a_idx, b_idx, pos_a, R_a, vel_a, ang_a,
                         pos_b, R_b, vel_b, ang_b):
        """engine._body_body_forces: a's sample points vs b's volume."""
        pts = samples[a_idx, :, :3]
        rad = jnp.asarray(samples[a_idx, :, 3:4], jnp.float32)
        mask = jnp.asarray(sample_mask[a_idx][:, None], jnp.float32)
        p_w = []
        for i in range(3):
            acc = None
            for j in range(3):
                term = S.mul(jnp.asarray(pts[:, j:j + 1], jnp.float32),
                             R_a[i][j])
                acc = term if acc is None else S.add(acc, term)
            p_w.append(S.add(acc, pos_a[i]))
        p_w = tuple(p_w)

        shape_b = body_shape[b_idx]
        size_b = body_size[b_idx]
        if shape_b == SHAPE_SPHERE:
            delta = S.vsub(p_w, pos_b)
            dn = jnp.sqrt(jnp.maximum(S.vdot(delta, delta), 0.0))
            safe = jnp.maximum(dn, EPS)
            n_ba = tuple(delta[i] / safe for i in range(3))
            dist = S.sub(S.sub(dn, size_b[0]), rad)
        else:
            # sphere-point vs oriented box (contact.py:sphere_box_distance)
            x = S.mtv(R_b, S.vsub(p_w, pos_b))
            cb, sd = _point_box_closest(x, size_b)
            delta = S.vsub(x, cb)
            d_abs = jnp.maximum(jnp.abs(sd), EPS)
            out_n = tuple(delta[i] / d_abs for i in range(3))
            n_in = _inside_normal(x, size_b)
            n_loc = tuple(jnp.where(sd > 0, out_n[i], n_in[i])
                          for i in range(3))
            n_ba = S.mv(R_b, n_loc)
            dist = S.sub(sd, rad)
        depth = -dist
        v_pt_a = S.vadd(vel_a, S.vcross(ang_a, S.vsub(p_w, pos_a)))
        v_pt_b = S.vadd(vel_b, S.vcross(ang_b, S.vsub(p_w, pos_b)))
        v_rel = S.vsub(v_pt_a, v_pt_b)
        mu = body_mu[a_idx] * body_mu[b_idx]
        f_a = penalty_force(depth, n_ba, v_rel, mu)
        f_a = tuple(S.mul(mask, f_a[i]) for i in range(3))
        force_a = tuple(jnp.sum(f_a[i], axis=0) for i in range(3))
        trq_a = S.vcross(S.vsub(p_w, pos_a), f_a)
        torque_a = tuple(jnp.sum(trq_a[i], axis=0) for i in range(3))
        force_b = tuple(-force_a[i] for i in range(3))
        trq_b = S.vcross(S.vsub(p_w, pos_b), tuple(-f_a[i] for i in range(3)))
        torque_b = tuple(jnp.sum(trq_b[i], axis=0) for i in range(3))
        return force_a, torque_a, force_b, torque_b

    def physics_step(states):
        tgt = tuple(states.ctrl_target[:, d] for d in range(ndof))
        RC = jnp.asarray(np.asarray(mc.cap_radius, np.float32)[:, None])

        def body_fn(carry, _):
            qc, qdc, bpos, bquat, bvel, bang, w = carry
            fkR, fkp, fkom, fkv, fkaw = S.fk_full(mc, qc, qdc) \
                if robot_contact else (None,) * 5

            Rs = [quat_to_mat(bquat[b]) for b in range(nb)]
            forces = [(0.0, 0.0, 0.0)] * nb
            torques = [(0.0, 0.0, 0.0)] * nb
            tau_ext = [0.0] * ndof

            for b in range(nb):
                f, t = body_ground_forces(b, bpos[b], Rs[b], bvel[b], bang[b])
                forces[b] = S.vadd(forces[b], f)
                torques[b] = S.vadd(torques[b], t)

            if robot_contact:
                p0s, p1s = S.capsule_endpoints(mc, fkR, fkp)
                from panda_gym_tpu.ops.scalarized_collision import stack_caps
                P0, P1 = stack_caps(p0s), stack_caps(p1s)
                for b in range(nb):
                    f, t, te = robot_body_contact(
                        b, fkR, fkp, fkom, fkv, fkaw, P0, P1, RC,
                        bpos[b], Rs[b], bvel[b], bang[b])
                    forces[b] = S.vadd(forces[b], f)
                    torques[b] = S.vadd(torques[b], t)
                    tau_ext = [S.add(tau_ext[d], te[d]) for d in range(ndof)]

            for (a, b) in body_pairs:
                fa, ta, fb, tb = body_body_forces(
                    a, b, bpos[a], Rs[a], bvel[a], bang[a],
                    bpos[b], Rs[b], bvel[b], bang[b])
                forces[a] = S.vadd(forces[a], fa)
                torques[a] = S.vadd(torques[a], ta)
                forces[b] = S.vadd(forces[b], fb)
                torques[b] = S.vadd(torques[b], tb)

            # integrate free bodies (engine.substep semi-implicit Euler)
            n_pos, n_quat, n_vel, n_ang = [], [], [], []
            for b in range(nb):
                m = body_mass[b]
                v = tuple(S.add(bvel[b][i], dt * (
                    S.mul(1.0 / m, forces[b][i])
                    + (GRAVITY_Z if i == 2 else 0.0)))
                    for i in range(3))
                p = S.vadd(bpos[b], S.vscale(dt, v))
                # I_w = R diag(I) R^T; its inverse is R diag(1/I) R^T —
                # Cramer/cofactor solves lose all f32 precision here
                # (det ~ prod(I) ~ 1e-12 for the 2 cm cubes)
                Idiag = body_inertia[b]
                RI = tuple(tuple(S.mul(Idiag[j], Rs[b][i][j])
                                 for j in range(3)) for i in range(3))
                I_w = S.mm(RI, S.mT(Rs[b]))
                om = bang[b]
                rhs = S.vsub(torques[b], S.vcross(om, S.mv(I_w, om)))
                # x = R diag(1/I) R^T rhs
                y = S.mtv(Rs[b], rhs)
                y = tuple(S.mul(1.0 / max(Idiag[j], 1e-12), y[j])
                          for j in range(3))
                om = S.vadd(om, S.vscale(dt, S.mv(Rs[b], y)))
                qt = quat_integrate(bquat[b], om, dt)
                n_pos.append(p)
                n_quat.append(qt)
                n_vel.append(v)
                n_ang.append(om)

            # warm-started LCP (active set carried across substeps). The
            # cold pre-scan seed below ignores tau_ext, so when contact
            # torque shifts a motor across its cap the set correction
            # lands one substep late (the warm refinement updates the set
            # AFTER its solve) — a documented 1-substep lag, the same
            # transient the warm chain has at any set transition; the
            # per-env engine path seeds identically (engine.physics_step)
            # so batched and per-env trajectories still match.
            if warm_start:
                q_new, qd_new, w2 = S.motor_substep(mc, list(qc), list(qdc),
                                                    list(tgt), dt, ctrl_mode,
                                                    tau_ext=tau_ext, warm=w)
            else:
                q_new, qd_new = S.motor_substep(mc, list(qc), list(qdc),
                                                list(tgt), dt, ctrl_mode,
                                                tau_ext=tau_ext)
                w2 = w   # dead carry in cold mode
            return (tuple(q_new), tuple(qd_new), tuple(n_pos), tuple(n_quat),
                    tuple(n_vel), tuple(n_ang), w2), None

        q0 = tuple(states.q[:, d] for d in range(ndof))
        qd0 = tuple(states.qd[:, d] for d in range(ndof))
        if warm_start:
            _, _, warm0 = S.motor_substep(mc, list(q0), list(qd0),
                                          list(tgt), dt, ctrl_mode,
                                          return_warm=True)
        else:
            zero = [jnp.zeros_like(q0[d]) for d in range(ndof)]
            warm0 = (tuple(z.astype(bool) for z in zero), tuple(zero))
        carry0 = (
            q0, qd0,
            tuple(tuple(states.body_pos[:, b, k] for k in range(3))
                  for b in range(nb)),
            tuple(tuple(states.body_quat[:, b, k] for k in range(4))
                  for b in range(nb)),
            tuple(tuple(states.body_vel[:, b, k] for k in range(3))
                  for b in range(nb)),
            tuple(tuple(states.body_ang[:, b, k] for k in range(3))
                  for b in range(nb)),
            warm0,
        )
        (qc, qdc, bpos, bquat, bvel, bang, _), _ = jax.lax.scan(
            body_fn, carry0, None, length=n_substeps)

        pack = lambda t, k: jnp.stack(
            [jnp.stack([t[b][i] for i in range(k)], axis=-1)
             for b in range(nb)], axis=1)
        return states.replace(
            q=jnp.stack(qc, axis=-1), qd=jnp.stack(qdc, axis=-1),
            body_pos=pack(bpos, 3), body_quat=pack(bquat, 4),
            body_vel=pack(bvel, 3), body_ang=pack(bang, 3),
        )

    return physics_step
