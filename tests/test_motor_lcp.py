"""Exactness of the coupled motor box-LCP solve (ops/dynamics.py).

Round-4 characterization: the masked active-set refinement is EXACT on the
engine's operating envelope (states reachable by the motor-driven chain
under clipped env actions) but can cycle on synthetic decorrelated states
with extreme v_des — measured over=5.4 cap units at amp=0.8 random
targets, while 50-sweep PGS (globally convergent for this SPD box-QP)
reaches the true solution.  These tests pin down what the engine actually
guarantees:

  * KKT exactness along real rollouts (the distribution training/eval/
    goldens run on),
  * agreement of the Bullet-emulating PGS mode with the exact solve,
  * the warm-started solve (active set carried across substeps,
    sim/engine.py / ops/scalarized.py round-4 structure) matching the cold
    solve where the cold solve converged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panda_gym_tpu.models.panda import make_panda_model
from panda_gym_tpu.ops import dynamics as D
from panda_gym_tpu.ops.linalg import cholesky_solve_unrolled

DT = 1.0 / 500.0


@pytest.fixture(scope="module")
def model():
    return make_panda_model(base_position=(0.0, 0.0, 0.0))


def _kkt(model, q, qd, target, qd_new):
    """(cap violation, free-motor tracking error) of the box-LCP KKT
    conditions at solution qd_new; joint-limit-clamped states excluded by
    the caller."""
    v_des = jnp.clip(D.POSITION_GAIN * (target - q) / DT,
                     -model.vel_limit, model.vel_limit)
    bias = D.bias_force(model, q, qd)
    M = D.crba(model, q)
    qd_free = qd + DT * cholesky_solve_unrolled(M, -bias)
    cap = model.effort * DT
    x = M @ (qd_new - qd_free)
    at_cap = jnp.abs(jnp.abs(x) - cap) < 1e-3 * jnp.maximum(cap, 1.0)
    over = jnp.max(jnp.maximum(jnp.abs(x) - cap, 0.0))
    free_err = jnp.max(jnp.where(at_cap, 0.0, jnp.abs(qd_new - v_des)))
    return over, free_err


def test_lcp_exact_on_rollout_distribution(model):
    """Along a real Reach rollout with extreme random actions, every
    substep's motor solve satisfies the box-LCP KKT conditions — the
    'exact solve' claim, stated on the distribution it holds for."""
    from panda_gym_tpu.envs.panda_tasks import make_core

    core = make_core("reach")
    B = 64
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, _ = jax.jit(jax.vmap(core.reset))(keys)
    step = jax.jit(core.batched_step)

    def kkt_batch(q, qd, target):
        def one(q1, qd1, t1):
            q2, qd2 = D.motor_substep(model, q1, qd1, t1, DT,
                                      D.CTRL_POSITION)
            over, fe = _kkt(model, q1, qd1, t1, qd2)
            qn = q1 + qd2 * DT
            clamped = jnp.any(
                jnp.clip(qn, model.q_lo, model.q_hi) != qn)
            return (jnp.where(clamped, 0.0, over),
                    jnp.where(clamped, 0.0, fe))
        return jax.vmap(one)(q, qd, target)

    kkt_j = jax.jit(kkt_batch)
    key = jax.random.PRNGKey(7)
    worst = (0.0, 0.0)
    for _ in range(20):
        key, k = jax.random.split(key)
        actions = jax.random.uniform(
            k, (B, core.robot.action_dim), minval=-1.0, maxval=1.0)
        states, *_ = step(states, actions)
        ov, fe = kkt_j(states.q, states.qd, states.ctrl_target)
        worst = (max(worst[0], float(jnp.max(ov))),
                 max(worst[1], float(jnp.max(fe))))
    over, free_err = worst
    assert over < 1e-4, f"impulse cap violated by {over}"
    assert free_err < 1e-3, f"free motor missed v_des by {free_err}"


def test_warm_start_properties(model):
    """The warm-started chain (cold pre-solve seeds the set, then one
    refinement per substep — the round-4 engine structure).

    Exact property: a warm refinement from a converged set reproduces the
    cold solve bit-for-bit (the first substep after the pre-solve).  Chain
    property: when the active set transitions mid-chain (a motor
    desaturating), the warm chain lags the cold-3 chain by one substep —
    both are legitimate discretizations (Bullet's sequential impulse
    warm-starts the same way); the transient stays bounded and both chains
    settle to the same servo equilibrium.  Per-substep KKT exactness along
    warm rollouts is covered by test_lcp_exact_on_rollout_distribution;
    golden parity by tests/test_bullet_goldens.py."""
    q0 = jnp.zeros(model.ndof)
    qd0 = jnp.zeros(model.ndof)
    tgt = q0.at[5].set(0.3)

    # (a) warm-from-converged-set == cold (to fp rounding: the warm rhs
    # uses sign*cap where the cold loop uses clip(x) = +-cap up to 1 ulp)
    qc, qdc = D.motor_substep(model, q0, qd0, tgt, DT, D.CTRL_POSITION)
    _, _, w = D.motor_substep(model, q0, qd0, tgt, DT, D.CTRL_POSITION,
                              return_warm=True)
    qw, qdw, _ = D.motor_substep(model, q0, qd0, tgt, DT, D.CTRL_POSITION,
                                 warm=w)
    np.testing.assert_allclose(np.asarray(qw), np.asarray(qc), atol=1e-7)
    np.testing.assert_allclose(np.asarray(qdw), np.asarray(qdc), atol=1e-5)

    # (b) bounded transient + common equilibrium over a long chain
    def chains(steps):
        q_c, qd_c = q0, qd0
        for _ in range(steps):
            q_c, qd_c = D.motor_substep(model, q_c, qd_c, tgt, DT,
                                        D.CTRL_POSITION)
        q_w, qd_w = q0, qd0
        _, _, wv = D.motor_substep(model, q_w, qd_w, tgt, DT,
                                   D.CTRL_POSITION, return_warm=True)
        for _ in range(steps):
            q_w, qd_w, wv = D.motor_substep(model, q_w, qd_w, tgt, DT,
                                            D.CTRL_POSITION, warm=wv)
        return (q_c, qd_c), (q_w, qd_w)

    (qc20, qdc20), (qw20, qdw20) = chains(20)
    assert np.abs(np.asarray(qw20) - np.asarray(qc20)).max() < 5e-3
    assert np.abs(np.asarray(qdw20) - np.asarray(qdc20)).max() < 0.2

    (qc_eq, qdc_eq), (qw_eq, qdw_eq) = chains(400)
    np.testing.assert_allclose(np.asarray(qw_eq), np.asarray(qc_eq),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(qdw_eq), np.asarray(qdc_eq),
                               atol=1e-3)


def test_pgs_mode_agrees_with_exact(model):
    """Bullet-emulating PGS-50 (LCP_MODE='pgs') converges to the exact
    active-set answer on the golden scenario — the round-4 finding that
    ruled iteration count out as the golden-parity gap."""
    q = jnp.zeros(model.ndof)
    qd = jnp.zeros(model.ndof)
    target = q.at[5].set(0.3)

    q_e, qd_e = D.motor_substep(model, q, qd, target, DT, D.CTRL_POSITION)
    try:
        # set_lcp_mode (not a bare global write) drops cached compilations
        # so jitted callers cannot keep the stale branch (ADVICE r4)
        D.set_lcp_mode("pgs")
        q_p, qd_p = D.motor_substep(model, q, qd, target, DT,
                                    D.CTRL_POSITION)
    finally:
        D.set_lcp_mode("exact")
    np.testing.assert_allclose(np.asarray(qd_p), np.asarray(qd_e), atol=2e-4)
    np.testing.assert_allclose(np.asarray(q_p), np.asarray(q_e), atol=1e-6)
