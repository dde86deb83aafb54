"""Articulated rigid-body dynamics for ChainModel (Featherstone, body frame).

Replaces PyBullet's stepSimulation for the robot (reference pybullet.py:68-71)
with a pure-JAX implementation:

  * bias forces  C(q, qd)·qd + G(q)  via the recursive Newton-Euler algorithm,
  * joint-space mass matrix M(q) via the composite-rigid-body algorithm,
  * one semi-implicit Euler substep at 1/500 s with PyBullet's motor
    semantics: POSITION_CONTROL drives each joint toward the velocity
    kp · (q_target − q) / dt (PyBullet positionGain default 0.1), realised by
    an inverse-dynamics torque clamped to the per-joint force limit
    (pybullet.py:437-463 control_joints; panda.py:63 joint_forces).

Everything is single-env; batch with vmap.  The dof count is tiny (7 or 9) so
all recursions are unrolled; under vmap they become batched (B,3,3)x(B,3)
ops, which XLA fuses into a handful of VPU kernels.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from panda_gym_tpu.models.chain import ChainModel, JOINT_REVOLUTE

# ---------------------------------------------------------------------------
# spatial-vector helpers; a motion vector is a pair (omega, v), a force
# vector a pair (n, f), all expressed in some body frame about its origin.
# ---------------------------------------------------------------------------


def _joint_X(model: ChainModel, d: int, q):
    """Child-body frame pose (R, p) in parent-body coords for dof d at q."""
    from panda_gym_tpu.ops.kinematics import _axis_angle_mat

    if model.jtype_tuple[d] == JOINT_REVOLUTE:
        R = model.X_R[d] @ _axis_angle_mat(model.axis[d], q)
        p = model.X_p[d]
    else:
        R = model.X_R[d]
        p = model.X_p[d] + R @ (model.axis[d] * q)
    return R, p


def _motion_to_child(R, p, om, v):
    """Motion (om, v@parent-origin, parent coords) -> child coords @ child origin."""
    Rt = R.T
    return Rt @ om, Rt @ (v + jnp.cross(om, p))


def _force_to_parent(R, p, n, f):
    """Force (n@child-origin, child coords) -> parent coords @ parent origin."""
    f_p = R @ f
    n_p = R @ n + jnp.cross(p, f_p)
    return n_p, f_p


def _inertia_mul(m, c, I_o, om, v):
    """Spatial inertia (m, com c, I about origin) applied to motion (om, v)."""
    n = I_o @ om + m * jnp.cross(c, v)
    f = m * (v + jnp.cross(om, c))
    return n, f


def _inertia_to_parent(R, p, m, c, I_o):
    """Express spatial inertia given in child frame in the parent frame."""
    c_p = R @ c + p
    # I about child com, rotated to parent coords
    sk_c = _skew3(c)
    I_com = I_o - m * (sk_c @ sk_c.T)
    I_com_p = R @ I_com @ R.T
    sk_cp = _skew3(c_p)
    I_o_p = I_com_p + m * (sk_cp @ sk_cp.T)
    return m, c_p, I_o_p


def _skew3(v):
    z = jnp.zeros(())
    return jnp.array([
        [z, -v[2], v[1]],
        [v[2], z, -v[0]],
        [-v[1], v[0], z],
    ])


# ---------------------------------------------------------------------------
# RNEA: inverse dynamics tau = ID(q, qd, qdd) including gravity
# ---------------------------------------------------------------------------

def rnea(model: ChainModel, q, qd, qdd, gravity=(0.0, 0.0, -9.81)):
    """Recursive Newton-Euler in body coordinates (Featherstone alg. 5.1).

    With qdd = 0 this yields the bias force C(q,qd)qd + G(q).
    """
    g = jnp.asarray(gravity)
    ndof = model.ndof
    Xs = []          # (R, p) child-in-parent per dof
    v_om, v_v = [], []
    a_om, a_v = [], []
    f_n, f_f = [], []

    for d in range(ndof):
        R, p = _joint_X(model, d, q[d])
        Xs.append((R, p))
        pd = model.parent_tuple[d]
        if pd < 0:
            om_p, v_p = jnp.zeros(3), jnp.zeros(3)
            aom_p, av_p = jnp.zeros(3), -g  # gravity trick: base accel = -g
        else:
            om_p, v_p = v_om[pd], v_v[pd]
            aom_p, av_p = a_om[pd], a_v[pd]

        om_i, v_i = _motion_to_child(R, p, om_p, v_p)
        aom_i, av_i = _motion_to_child(R, p, aom_p, av_p)

        ax = model.axis[d]
        if model.jtype_tuple[d] == JOINT_REVOLUTE:
            s_om, s_v = ax, jnp.zeros(3)
        else:
            s_om, s_v = jnp.zeros(3), ax

        vj_om, vj_v = s_om * qd[d], s_v * qd[d]
        om_i = om_i + vj_om
        v_i = v_i + vj_v
        # a_i += S qdd + v x S qd   (motion cross product)
        aom_i = aom_i + s_om * qdd[d] + jnp.cross(om_i, vj_om)
        av_i = av_i + s_v * qdd[d] + jnp.cross(om_i, vj_v) + jnp.cross(v_i, vj_om)

        # f_i = I a + v x* (I v)
        m, c, I_o = model.mass[d], model.com[d], model.inertia[d]
        hn, hf = _inertia_mul(m, c, I_o, om_i, v_i)
        fn_i, ff_i = _inertia_mul(m, c, I_o, aom_i, av_i)
        fn_i = fn_i + jnp.cross(om_i, hn) + jnp.cross(v_i, hf)
        ff_i = ff_i + jnp.cross(om_i, hf)

        v_om.append(om_i); v_v.append(v_i)
        a_om.append(aom_i); a_v.append(av_i)
        f_n.append(fn_i); f_f.append(ff_i)

    tau = [None] * ndof
    for d in reversed(range(ndof)):
        ax = model.axis[d]
        if model.jtype_tuple[d] == JOINT_REVOLUTE:
            tau[d] = jnp.dot(ax, f_n[d])
        else:
            tau[d] = jnp.dot(ax, f_f[d])
        pd = model.parent_tuple[d]
        if pd >= 0:
            R, p = Xs[d]
            n_p, f_p = _force_to_parent(R, p, f_n[d], f_f[d])
            f_n[pd] = f_n[pd] + n_p
            f_f[pd] = f_f[pd] + f_p
    return jnp.stack(tau)


def bias_force(model: ChainModel, q, qd, gravity=(0.0, 0.0, -9.81)):
    return rnea(model, q, qd, jnp.zeros_like(q), gravity)


# ---------------------------------------------------------------------------
# CRBA: joint-space mass matrix
# ---------------------------------------------------------------------------

def crba(model: ChainModel, q):
    """Composite-rigid-body algorithm (Featherstone alg. 6.2)."""
    ndof = model.ndof
    Xs = [(_joint_X(model, d, q[d])) for d in range(ndof)]

    # composite inertias, child-to-parent sweep
    Ic = [(model.mass[d], model.com[d], model.inertia[d]) for d in range(ndof)]
    for d in reversed(range(ndof)):
        pd = model.parent_tuple[d]
        if pd >= 0:
            R, p = Xs[d]
            m_c, c_c, I_c = _inertia_to_parent(R, p, *Ic[d])
            m_p, c_p, I_p = Ic[pd]
            m_t = m_p + m_c
            c_t = jnp.where(m_t > 0, (m_p * c_p + m_c * c_c) / jnp.maximum(m_t, 1e-12), 0.0)
            Ic[pd] = (m_t, c_t, I_p + I_c)

    # build M entry-wise and stack (no scatters — friendlier to XLA fusion)
    entries = [[None] * ndof for _ in range(ndof)]
    for d in range(ndof):
        ax = model.axis[d]
        if model.jtype_tuple[d] == JOINT_REVOLUTE:
            s_om, s_v = ax, jnp.zeros(3)
        else:
            s_om, s_v = jnp.zeros(3), ax
        # F = Ic[d] * S_d, expressed in frame d
        Fn, Ff = _inertia_mul(*Ic[d], s_om, s_v)
        entries[d][d] = jnp.dot(s_om, Fn) + jnp.dot(s_v, Ff)
        j = d
        while model.parent_tuple[j] >= 0:
            R, p = Xs[j]
            Fn, Ff = _force_to_parent(R, p, Fn, Ff)
            j = model.parent_tuple[j]
            axj = model.axis[j]
            if model.jtype_tuple[j] == JOINT_REVOLUTE:
                Mdj = jnp.dot(axj, Fn)
            else:
                Mdj = jnp.dot(axj, Ff)
            entries[d][j] = Mdj
            entries[j][d] = Mdj
    zero = jnp.zeros(())
    rows = [jnp.stack([e if e is not None else zero for e in row])
            for row in entries]
    return jnp.stack(rows)


# ---------------------------------------------------------------------------
# One physics substep with PyBullet motor semantics
# ---------------------------------------------------------------------------

# PyBullet's default positionGain for POSITION_CONTROL motors.
POSITION_GAIN = 0.1

# Active-set refinements for the coupled motor box-LCP.  Bullet solves the
# same LCP by sequential impulse (50 iterations); a direct masked solve is
# cheaper and EXACT once the active set stabilises.  Operating envelope
# (tests/test_motor_lcp.py): along real rollouts the 3-refinement cold
# solve satisfies the box-LCP KKT conditions to solver precision; on
# synthetic decorrelated states with extreme v_des the set can cycle
# (where PGS — LCP_MODE="pgs" — remains globally convergent).  The engine
# paths warm-start the set across substeps (see engine.make_physics_step),
# paying the cold 3-refinement price once per policy step.
import os as _os

MOTOR_LCP_ITERS = max(1, int(_os.environ.get("PANDA_MOTOR_LCP_ITERS", "3")))
# refinements per substep when warm-starting from the previous substep's
# active set (Bullet warm-starts its sequential-impulse solver the same
# way): the set rarely changes between 1/500 s substeps, so one masked
# solve from the carried set reproduces the cold-3 solution wherever the
# cold solve converged (tests/test_motor_lcp.py pins this down).
MOTOR_LCP_WARM_ITERS = max(
    1, int(_os.environ.get("PANDA_MOTOR_LCP_WARM_ITERS", "1")))

# Whether the batched physics paths carry the warm active set across
# substeps (cold pre-solve + 1 warm refinement/substep) or run the cold
# 3-refinement solve per substep with no carry.  Both are exact along real
# rollouts (tests/test_motor_lcp.py); which is FASTER is path-dependent —
# measured per task on the real chip in BENCH_TASKS.json (round 5: warm
# wins the contact-free reach path; cold wins the collision paths, where
# the carried set serializes against the collision sweep).  Each step
# builder bakes its measured winner as the path default;
# PANDA_LCP_WARM=0/1 overrides ALL paths for A/B without code changes.
LCP_WARM_START = _os.environ.get("PANDA_LCP_WARM", "1") != "0"


def lcp_warm_default(path_default: bool) -> bool:
    """Path default unless PANDA_LCP_WARM is set explicitly in the env."""
    if "PANDA_LCP_WARM" in _os.environ:
        return LCP_WARM_START
    return path_default

# Motor LCP solver selection: "exact" (masked active-set, default) or
# "pgs" (Bullet-emulating sequential impulse with PGS_ITERS sweeps —
# PyBullet's numSolverIterations default is 50).  The exact solve is the
# converged answer; "pgs" reproduces Bullet's partially-converged golden
# values for cross-engine parity fixtures (test/pybullet_test.py:156-187).
LCP_MODE = "exact"
PGS_ITERS = 50


def set_lcp_mode(mode: str, pgs_iters=None) -> None:
    """Switch the motor-LCP solver ("exact" / "pgs") safely.

    LCP_MODE/PGS_ITERS are read at TRACE time: flipping the bare globals
    after a jitted caller has compiled silently no-ops for that caller (the
    cached executable keeps the old branch — ADVICE r4).  This setter flips
    the globals AND drops every cached jax compilation, so the next call of
    any jitted engine path re-traces under the new mode.
    """
    global LCP_MODE, PGS_ITERS
    if mode not in ("exact", "pgs"):
        raise ValueError(f"unknown LCP mode {mode!r} (exact|pgs)")
    if pgs_iters is not None:
        PGS_ITERS = int(pgs_iters)
    if mode != LCP_MODE:
        LCP_MODE = mode
        import jax

        jax.clear_caches()

CTRL_POSITION = 0
CTRL_VELOCITY = 1


def _motor_pgs(M, qd_free, v_des, cap, iters: int):
    """Sequential-impulse (projected Gauss-Seidel) motor solve, Bullet's
    btMultiBodyConstraintSolver scheme: one velocity-constraint row per
    motor, impulse accumulated and clamped to ±cap, delta-velocities
    propagated through M^-1 columns, rows swept in joint order."""
    n = qd_free.shape[-1]
    Minv = jnp.linalg.inv(M)
    inv_diag = 1.0 / jnp.diagonal(Minv)

    def sweep(_, carry):
        v, p = carry
        for j in range(n):
            dp = (v_des[j] - v[j]) * inv_diag[j]
            p_new = jnp.clip(p[j] + dp, -cap[j], cap[j])
            dp = p_new - p[j]
            p = p.at[j].set(p_new)
            v = v + Minv[:, j] * dp
        return v, p

    v, _ = jax.lax.fori_loop(0, iters, sweep,
                             (qd_free, jnp.zeros_like(qd_free)))
    return v


def motor_substep(
    model: ChainModel,
    q,
    qd,
    target,
    dt: float,
    control_mode: int,
    gravity=(0.0, 0.0, -9.81),
    position_gain: float = POSITION_GAIN,
    tau_ext=None,
    effort=None,
    warm=None,
    return_warm: bool = False,
):
    """One semi-implicit Euler substep of the motor-driven chain.

    control_mode CTRL_POSITION: desired joint velocity = kp·(target − q)/dt
    (PyBullet velocity-level position servo); CTRL_VELOCITY: desired joint
    velocity = target.  Each motor is a joint-velocity constraint with an
    impulse cap effort·dt; all motors form one coupled box-LCP
    (btMultiBodyJointMotor constraints under Bullet's sequential-impulse
    solver), solved here EXACTLY by a masked active-set method: saturated
    motors contribute ±cap impulses, free motors reach v_des exactly, and
    the two sets are found by a few masked Cholesky refinements.  The
    reference's golden link-velocity values pin this down
    (test/pybullet_test.py:156-187: a saturated motor must not bleed its
    torque demand into held neighbours the way a one-shot clamp does).

    Warm starting: pass ``warm=(sat, sign)`` (the previous substep's active
    set and impulse signs) to run MOTOR_LCP_WARM_ITERS refinements from
    that set instead of MOTOR_LCP_ITERS from the unconstrained-pass
    estimate; with ``return_warm=True`` (or warm given) returns
    ``(q, qd, (sat, sign))`` for the next substep's carry.
    """
    if control_mode == CTRL_POSITION:
        v_des = position_gain * (target - q) / dt
    else:
        v_des = target
    # Bullet maxCoordinateVelocity clamp (100 rad/s default; URDF
    # maxVelocity is NOT applied by PyBullet — see ChainModel.vel_limit)
    v_des = jnp.clip(v_des, -model.vel_limit, model.vel_limit)

    bias = bias_force(model, q, qd, gravity)
    M = crba(model, q)
    if tau_ext is None:
        tau_ext = jnp.zeros_like(q)
    # per-call force clamp (setJointMotorControlArray forces argument,
    # pybullet.py:437-463); defaults to the model's URDF efforts
    eff = model.effort if effort is None else effort

    # Index-unrolled factor/solve: batched LAPACK-style cholesky is the TPU
    # bottleneck for these tiny matrices (see ops/linalg.py).
    from panda_gym_tpu.ops.linalg import cholesky_solve_unrolled
    n = q.shape[-1]
    # free velocity: one substep under bias/external forces, motors off
    qd_free = qd + dt * cholesky_solve_unrolled(M, tau_ext - bias)
    cap = eff * dt
    eye = jnp.eye(n, dtype=q.dtype)
    Mqf = M @ qd_free

    if LCP_MODE == "pgs":
        qd_new = _motor_pgs(M, qd_free, v_des, cap, PGS_ITERS)
        q_new = q + qd_new * dt
        q_clamped = jnp.clip(q_new, model.q_lo, model.q_hi)
        at_limit = q_clamped != q_new
        qd_new = jnp.where(at_limit, 0.0, qd_new)
        if warm is not None or return_warm:
            x = M @ (qd_new - qd_free)
            return q_clamped, qd_new, (jnp.abs(x) >= cap * (1 - 1e-6),
                                       jnp.where(x >= 0.0, 1.0, -1.0))
        return q_clamped, qd_new

    if warm is None:
        # unconstrained pass: impulse needed for every motor to hit v_des
        x = M @ v_des - Mqf
        sat = jnp.abs(x) > cap
        c = jnp.clip(x, -cap, cap)
        n_iters = MOTOR_LCP_ITERS
    else:
        sat, sign = warm
        c = sign * cap
        n_iters = MOTOR_LCP_WARM_ITERS
    u = v_des
    x = None
    for _ in range(n_iters):
        # rows S (saturated): M_SS u_S = c_S + (M qd_free)_S - M_SF v_des_F
        # rows F (free):      u_F = v_des_F
        pair = jnp.outer(sat, sat)
        A = jnp.where(pair, M, eye)
        rhs = jnp.where(sat,
                        c + Mqf - M @ jnp.where(sat, 0.0, v_des),
                        v_des)
        u = cholesky_solve_unrolled(A, rhs)
        x = M @ u - Mqf
        # a saturated motor stays saturated while its velocity deficit still
        # pushes into the cap; a free motor saturates when its required
        # impulse exceeds the cap
        deficit = v_des - u
        sat = (sat & (deficit * c >= 0.0)) | (~sat & (jnp.abs(x) > cap))
        c = jnp.clip(x, -cap, cap)

    qd_new = u
    q_new = q + qd_new * dt

    # joint limits: clamp position, kill velocity pushing further out
    q_clamped = jnp.clip(q_new, model.q_lo, model.q_hi)
    at_limit = q_clamped != q_new
    qd_new = jnp.where(at_limit, 0.0, qd_new)
    if warm is not None or return_warm:
        sign_out = jnp.where(x >= 0.0, 1.0, -1.0)
        return q_clamped, qd_new, (sat, sign_out)
    return q_clamped, qd_new
