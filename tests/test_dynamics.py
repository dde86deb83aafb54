"""Dynamics correctness: CRBA/RNEA cross-validation, gravity = grad(V),
energy conservation, and PyBullet motor semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panda_gym_tpu.models.panda import make_panda_model, NEUTRAL_ARM, EE_SITE
from panda_gym_tpu.ops import dynamics as D
from panda_gym_tpu.ops import kinematics as K


@pytest.fixture(scope="module")
def model():
    return make_panda_model()


def test_mass_matrix_matches_rnea_columns(model):
    """M columns = ID(q, 0, e_i) with zero gravity (textbook identity)."""
    q = jnp.asarray(NEUTRAL_ARM)
    M = D.crba(model, q)
    cols = []
    for i in range(7):
        e = jnp.zeros(7).at[i].set(1.0)
        cols.append(D.rnea(model, q, jnp.zeros(7), e, gravity=(0, 0, 0)))
    M_rnea = jnp.stack(cols, axis=1)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M_rnea), atol=1e-4)


def test_mass_matrix_spd(model):
    q = jnp.asarray(NEUTRAL_ARM) + 0.2
    M = np.asarray(D.crba(model, q))
    np.testing.assert_allclose(M, M.T, atol=1e-5)
    assert (np.linalg.eigvalsh(M) > 0).all()


def _potential(model, q):
    fk = K.fk_world(model, q)
    V = 0.0
    for d in range(model.ndof):
        com_w = fk.R[d] @ model.com[d] + fk.p[d]
        V += model.mass[d] * 9.81 * com_w[2]
    return V


def test_gravity_bias_is_potential_gradient(model):
    """At zero velocity, bias force == dV/dq (for any configuration)."""
    for q0 in (NEUTRAL_ARM, NEUTRAL_ARM * 0.5, np.zeros(7)):
        q = jnp.asarray(q0, dtype=jnp.float32)
        g_bias = D.bias_force(model, q, jnp.zeros(7))
        g_auto = jax.grad(lambda qq: _potential(model, qq))(q)
        np.testing.assert_allclose(np.asarray(g_bias), np.asarray(g_auto),
                                   atol=1e-3)


def test_coriolis_consistency_autodiff(model):
    """Full inverse dynamics must equal d/dt(dL/dqd) - dL/dq (Lagrange)."""
    q = jnp.asarray(NEUTRAL_ARM)
    qd = jnp.asarray([0.3, -0.5, 0.2, 0.4, -0.3, 0.1, 0.2])
    qdd = jnp.asarray([0.1, 0.2, -0.1, 0.3, 0.0, -0.2, 0.1])

    tau = D.rnea(model, q, qd, qdd)

    M = D.crba(model, q)
    dM = jax.jacfwd(lambda qq: D.crba(model, qq))(q)  # (n,n,n)
    g = jax.grad(lambda qq: _potential(model, qq))(q)
    # tau = M qdd + dM/dq:qd qd - 1/2 qd^T dM/dq qd + g
    Mdot = jnp.einsum("ijk,k->ij", dM, qd)
    c = Mdot @ qd - 0.5 * jnp.einsum("jki,j,k->i", dM, qd, qd)
    tau_lagrange = M @ qdd + c + g
    np.testing.assert_allclose(np.asarray(tau), np.asarray(tau_lagrange),
                               atol=2e-3)


def test_energy_conservation_passive(model):
    """Zero torque, no limits hit: E = T + V approximately conserved."""
    dt = 1.0 / 2000.0
    q = jnp.asarray(NEUTRAL_ARM, dtype=jnp.float32)
    qd = jnp.zeros(7)

    def energy(q, qd):
        M = D.crba(model, q)
        return 0.5 * qd @ M @ qd + _potential(model, q)

    @jax.jit
    def substep(carry, _):
        q, qd = carry
        bias = D.bias_force(model, q, qd)
        M = D.crba(model, q)
        qdd = jnp.linalg.solve(M, -bias)
        qd2 = qd + qdd * dt
        q2 = q + qd2 * dt
        return (q2, qd2), None

    e0 = float(energy(q, qd))
    (q, qd), _ = jax.lax.scan(substep, (q, qd), None, length=400)
    e1 = float(energy(q, qd))
    assert abs(e1 - e0) < 0.05 * max(1.0, abs(e0)), (e0, e1)


def test_position_motor_holds_against_gravity(model):
    """POSITION_CONTROL with target = current q holds the arm (within force
    limits) — PyBullet motors gravity-compensate (pybullet.py:437-455)."""
    dt = 1.0 / 500.0
    q = jnp.asarray(NEUTRAL_ARM, dtype=jnp.float32)
    qd = jnp.zeros(7)
    target = q

    @jax.jit
    def run(q, qd):
        def sub(carry, _):
            q, qd = carry
            q, qd = D.motor_substep(model, q, qd, target, dt, D.CTRL_POSITION)
            return (q, qd), None
        (q, qd), _ = jax.lax.scan(sub, (q, qd), None, length=100)
        return q, qd

    q2, qd2 = run(q, qd)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-3)
    np.testing.assert_allclose(np.asarray(qd2), 0.0, atol=1e-2)


def test_velocity_motor_reaches_target_velocity(model):
    """A small velocity target is reached exactly in one substep; a large one
    saturates at the effort clamp and converges over a few substeps."""
    dt = 1.0 / 500.0
    q = jnp.asarray(NEUTRAL_ARM, dtype=jnp.float32)
    qd = jnp.zeros(7)
    target = jnp.full(7, 0.02)
    q2, qd2 = D.motor_substep(model, q, qd, target, dt, D.CTRL_VELOCITY)
    np.testing.assert_allclose(np.asarray(qd2), 0.02, atol=1e-4)

    target = jnp.full(7, 0.5)
    q, qd = jnp.asarray(NEUTRAL_ARM, dtype=jnp.float32), jnp.zeros(7)
    for _ in range(20):
        q, qd = D.motor_substep(model, q, qd, target, dt, D.CTRL_VELOCITY)
    np.testing.assert_allclose(np.asarray(qd), 0.5, atol=0.05)


def test_position_motor_tracking_rate(model):
    """Within force limits the position servo moves each joint by
    kp*(target-q) per substep (v_des = kp*err/dt integrated for dt)."""
    dt = 1.0 / 500.0
    q = jnp.asarray(NEUTRAL_ARM, dtype=jnp.float32)
    # error must be tiny for the required accel (kp*err/dt^2) to stay within
    # the effort clamps — for larger errors the servo correctly saturates,
    # exactly as PyBullet's golden joint test shows (test/pybullet_test.py:
    # 189-203: q reaches 0.063, far short of the unclamped 0.263).
    err = 1e-4
    target = q + err
    q2, qd2 = D.motor_substep(model, q, jnp.zeros(7), target, dt, D.CTRL_POSITION)
    np.testing.assert_allclose(np.asarray(q2 - q), 0.1 * err, rtol=2e-2)


def test_joint_limit_clamp(model):
    dt = 1.0 / 500.0
    q = np.asarray(model.q_hi) - 1e-4
    q = jnp.asarray(q)
    qd = jnp.full(7, 10.0)  # huge outward velocity
    q2, qd2 = D.motor_substep(model, q, qd, q + 1.0, dt, D.CTRL_POSITION)
    assert (np.asarray(q2) <= np.asarray(model.q_hi) + 1e-6).all()


@pytest.mark.slow
def test_scalarized_batched_matches_per_env(model):
    """Batch-last scalarized motor dynamics (ops/scalarized.py) must be
    numerically equivalent to the per-env Featherstone path over a full
    20-substep policy step."""
    from panda_gym_tpu.ops import scalarized as S

    dt = 1.0 / 500.0
    B = 16
    rng = np.random.default_rng(7)
    lo, hi = np.asarray(model.q_lo), np.asarray(model.q_hi)
    q = jnp.asarray(rng.uniform(lo, hi, (B, model.ndof)), jnp.float32)
    qd = jnp.asarray(rng.normal(0, 0.5, (B, model.ndof)), jnp.float32)
    tgt = jnp.asarray(np.asarray(q) + rng.normal(0, 0.05, (B, model.ndof)),
                      jnp.float32)

    def per_env(q, qd, tgt):
        # warm-chain structure matching engine.make_physics_step (cold
        # pre-solve seeds the active set, every substep refines warm)
        _, _, w0 = D.motor_substep(model, q, qd, tgt, dt, D.CTRL_POSITION,
                                   return_warm=True)

        def body(c, _):
            q, qd, w = c
            q, qd, w = D.motor_substep(model, q, qd, tgt, dt,
                                       D.CTRL_POSITION, warm=w)
            return (q, qd, w), None
        (q, qd, _), _ = jax.lax.scan(body, (q, qd, w0), None, length=20)
        return q, qd

    q1, qd1 = jax.jit(jax.vmap(per_env))(q, qd, tgt)
    step = S.make_batched_motor_steps(model, n_substeps=20, dt=dt,
                                      ctrl_mode=S.CTRL_POSITION)
    q2, qd2 = jax.jit(step)(q, qd, tgt)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qd1), np.asarray(qd2), atol=2e-3)


@pytest.mark.slow
def test_batched_step_matches_vmap_step():
    """core.batched_step (batch-native physics) vs vmap(core.step)."""
    from panda_gym_tpu.envs.panda_tasks import make_reach_core

    core = make_reach_core()
    assert core.physics_step_batched is not None
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    states, obs = jax.jit(jax.vmap(core.reset))(keys)
    rng = np.random.default_rng(1)
    for _ in range(3):
        actions = jnp.asarray(rng.uniform(-1, 1, (8, core.robot.action_dim)),
                              jnp.float32)
        s1, o1, r1, t1, tr1, _ = jax.jit(jax.vmap(core.step))(states, actions)
        s2, o2, r2, t2, tr2, _ = jax.jit(core.batched_step)(states, actions)
        np.testing.assert_allclose(np.asarray(o1["observation"]),
                                   np.asarray(o2["observation"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
        assert (np.asarray(t1) == np.asarray(t2)).all()
        states = s2


@pytest.mark.slow
def test_batched_contact_step_matches_vmap_step():
    """Batched contact physics (ops/scalarized_contact.py) vs vmap(core.step)
    on a free-body task: forces, J^T reaction, and body integration must all
    agree with the per-env reference path."""
    from panda_gym_tpu.envs.panda_tasks import make_core

    core = make_core("push")
    assert core.physics_step_batched is not None
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    states, _ = jax.jit(jax.vmap(core.reset))(keys)
    rng = np.random.default_rng(1)
    for _ in range(3):
        actions = jnp.asarray(rng.uniform(-1, 1, (8, core.robot.action_dim)),
                              jnp.float32)
        s1, o1, r1, t1, tr1, _ = jax.jit(jax.vmap(core.step))(states, actions)
        s2, o2, r2, t2, tr2, _ = jax.jit(core.batched_step)(states, actions)
        np.testing.assert_allclose(np.asarray(o1["observation"]),
                                   np.asarray(o2["observation"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
        assert (np.asarray(t1) == np.asarray(t2)).all()
        states = s2


@pytest.mark.slow
def test_batched_ee_ik_matches_vmap_step():
    """Batched DLS-IK set_action (ops/scalarized.py:dls_ik_batched) vs the
    vmap'd per-env path for "ee" control — the IK targets and resulting
    trajectories must agree."""
    from panda_gym_tpu.envs.panda_tasks import make_reach_core

    core = make_reach_core(control_type="ee")
    assert core.set_action_batched is not None
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    states, _ = jax.jit(jax.vmap(core.reset))(keys)
    rng = np.random.default_rng(1)
    for _ in range(3):
        actions = jnp.asarray(rng.uniform(-1, 1, (8, core.robot.action_dim)),
                              jnp.float32)
        s1, o1, r1, *_ = jax.jit(jax.vmap(core.step))(states, actions)
        s2, o2, r2, *_ = jax.jit(core.batched_step)(states, actions)
        np.testing.assert_allclose(np.asarray(o1["observation"]),
                                   np.asarray(o2["observation"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(s1.q), np.asarray(s2.q),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
        states = s2


@pytest.mark.slow
def test_pallas_kernel_matches_scalarized(model):
    """The Pallas motor kernel (interpret mode on CPU) must reproduce the
    scalarized batched path it wraps."""
    from panda_gym_tpu.ops import scalarized as S
    from panda_gym_tpu.ops.pallas_dynamics import make_pallas_motor_steps

    dt = 1.0 / 500.0
    B = 24  # deliberately not a multiple of 128: exercises padding
    rng = np.random.default_rng(11)
    lo, hi = np.asarray(model.q_lo), np.asarray(model.q_hi)
    q = jnp.asarray(rng.uniform(lo, hi, (B, model.ndof)), jnp.float32)
    qd = jnp.asarray(rng.normal(0, 0.5, (B, model.ndof)), jnp.float32)
    tgt = jnp.asarray(np.asarray(q) + rng.normal(0, 0.05, (B, model.ndof)),
                      jnp.float32)

    f_s = jax.jit(S.make_batched_motor_steps(
        model, n_substeps=5, dt=dt, ctrl_mode=S.CTRL_POSITION))
    f_p = make_pallas_motor_steps(
        model, n_substeps=5, dt=dt, ctrl_mode=S.CTRL_POSITION, interpret=True)
    q1, qd1 = f_s(q, qd, tgt)
    q2, qd2 = f_p(q, qd, tgt)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qd1), np.asarray(qd2), atol=2e-3)


def test_robot_sphere_contact_repels(model):
    """A sphere body penetrating a robot capsule receives a force pushing it
    AWAY from the capsule axis (regression: normalize(pb-pc) equals
    n*sign(dist), which inverted the normal exactly under penetration)."""
    from panda_gym_tpu.sim import engine
    from panda_gym_tpu.sim.state import build_scene

    scene = build_scene([dict(shape=1, size=(0.06, 0.06, 0.06), mass=1.0,
                              mu=0.5)],
                        table_length=1.1, table_width=0.7, table_height=0.4)
    q = jnp.zeros(model.ndof).at[:7].set(jnp.asarray(NEUTRAL_ARM))
    fk = K.fk_world(model, q, jnp.zeros(model.ndof))
    p0, p1 = K.capsule_endpoints_world(model, fk)
    # place the sphere just inside capsule 0's surface, offset along +x
    seg_mid = 0.5 * (p0[0] + p1[0])
    r_sphere = 0.06
    pen = 0.01
    pos = seg_mid + jnp.array([float(model.cap_radius[0]) + r_sphere - pen,
                               0.0, 0.0])
    force, _, tau = engine._robot_body_contact(
        model, fk, p0, p1, scene, 0, pos, jnp.eye(3), jnp.zeros(3),
        jnp.zeros(3))
    force = np.asarray(force)
    assert force[0] > 0.0, f"sphere must be pushed away (+x), got {force}"
    assert np.isfinite(np.asarray(tau)).all()
