"""Kinematics correctness: FK structure, Jacobian vs autodiff, IK roundtrip.

The reference validated FK against PyBullet golden values
(test/pybullet_test.py:124-136); PyBullet is not available here, so we verify
against independent mathematical ground truths: analytic frame composition at
zero pose, autodiff Jacobians, and IK fixed-point consistency.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panda_gym_tpu.models.panda import make_panda_model, EE_SITE, NEUTRAL_ARM
from panda_gym_tpu.ops import kinematics as K


@pytest.fixture(scope="module")
def model():
    return make_panda_model()


@pytest.fixture(scope="module")
def model9():
    return make_panda_model(gripper="prismatic")


def test_zero_pose_joint_origins(model):
    """At q=0 the joint anchors must equal the cumulative URDF origins."""
    fk = K.fk_world(model, jnp.zeros(7))
    p = np.asarray(fk.p)
    # panda.urdf joint origins: j1 z=0.333; j2,j3 chain: link2 at same point,
    # link3 offset (0,-0.316,0) in link2 frame (rotated -pi/2 about x) -> world +z
    np.testing.assert_allclose(p[0], [0, 0, 0.333], atol=1e-6)
    np.testing.assert_allclose(p[1], [0, 0, 0.333], atol=1e-6)
    np.testing.assert_allclose(p[2], [0, 0, 0.649], atol=1e-5)  # 0.333+0.316
    np.testing.assert_allclose(p[3], [0.0825, 0, 0.649], atol=1e-5)
    np.testing.assert_allclose(p[4], [0, 0, 1.033], atol=1e-5)  # 0.649+0.384
    np.testing.assert_allclose(p[5], [0, 0, 1.033], atol=1e-5)
    np.testing.assert_allclose(p[6], [0.088, 0, 1.033], atol=1e-5)


def test_zero_pose_hand_sites(model):
    """Sites distal of joint7 (fixed chain) at q=0."""
    fk = K.fk_world(model, jnp.zeros(7))
    # link8 frame: link7 + 0.107 z (panda.urdf:364)
    _, p8 = K.site_frame(model, fk, 7)
    np.testing.assert_allclose(np.asarray(p8), [0.088, 0, 1.033 - 0.107], atol=1e-5)
    # at q=0, joint7 frame z-axis points along -z (alternating +-pi/2 x-rotations)
    # so +0.107 in frame z goes down in world z.
    # grasptarget: ee + 0.105 z in the same (flipped) frame
    _, pg = K.site_frame(model, fk, 12)
    np.testing.assert_allclose(np.asarray(pg), [0.088, 0, 1.033 - 0.107 - 0.105], atol=1e-5)


def test_neutral_ee_position_sane(model):
    """EE (link 11 CoM) at the reference neutral pose must be in front of and
    above the base, within the Panda's 0.855 m reach."""
    fk = K.fk_world(model, jnp.asarray(NEUTRAL_ARM))
    ee = np.asarray(K.site_com_position(model, fk, EE_SITE))
    r = np.linalg.norm(ee)
    assert 0.2 < r < 0.855, ee
    assert ee[2] > 0.0, ee
    assert abs(ee[1]) < 0.05, ee  # neutral pose is in the xz plane


def test_jacobian_matches_autodiff(model):
    q = jnp.asarray(NEUTRAL_ARM) + 0.1

    def pos(q):
        fk = K.fk_world(model, q)
        return K.site_com_position(model, fk, EE_SITE)

    J_ad = jax.jacfwd(pos)(q)
    fk = K.fk_world(model, q)
    x = K.site_com_position(model, fk, EE_SITE)
    J_v, _ = K.point_jacobian(model, fk, x, model.site_body_tuple[EE_SITE])
    np.testing.assert_allclose(np.asarray(J_ad), np.asarray(J_v), atol=1e-5)


def test_velocity_kinematics_matches_jacobian(model):
    q = jnp.asarray(NEUTRAL_ARM)
    qd = jnp.asarray([0.1, -0.2, 0.3, 0.1, -0.1, 0.2, -0.3])
    fk = K.fk_world(model, q, qd)
    v_ee = K.site_com_velocity(model, fk, EE_SITE)
    x = K.site_com_position(model, fk, EE_SITE)
    J_v, _ = K.point_jacobian(model, fk, x, model.site_body_tuple[EE_SITE])
    np.testing.assert_allclose(np.asarray(v_ee), np.asarray(J_v @ qd), atol=1e-5)


def test_ik_roundtrip(model):
    q0 = jnp.asarray(NEUTRAL_ARM)
    for tgt in ([0.4, 0.1, 0.4], [0.3, -0.2, 0.5], [0.5, 0.0, 0.3]):
        tgt = jnp.asarray(tgt, dtype=jnp.float32)
        qi = K.dls_ik(model, EE_SITE, tgt, q0=q0, n_iters=60)
        fk = K.fk_world(model, qi)
        err = np.linalg.norm(np.asarray(K.site_com_position(model, fk, EE_SITE)) - np.asarray(tgt))
        assert err < 5e-3, (tgt, err)


def test_ik_respects_joint_limits(model):
    qi = K.dls_ik(model, EE_SITE, jnp.array([0.9, 0.0, 0.1]), q0=jnp.asarray(NEUTRAL_ARM), n_iters=60)
    qi = np.asarray(qi)
    assert (qi >= np.asarray(model.q_lo) - 1e-6).all()
    assert (qi <= np.asarray(model.q_hi) + 1e-6).all()


def test_manipulability_positive(model):
    m = K.manipulability(model, EE_SITE, jnp.asarray(NEUTRAL_ARM))
    assert float(m) > 1e-4


def test_prismatic_gripper_moves_fingers(model9):
    assert model9.ndof == 9
    q = jnp.zeros(9).at[8].set(0.04)
    fk = K.fk_world(model9, q)
    # right finger (site 11) moves along the hand's -y axis when opening
    p_closed = K.site_com_position(model9, K.fk_world(model9, jnp.zeros(9)), 11)
    p_open = K.site_com_position(model9, fk, 11)
    d = np.linalg.norm(np.asarray(p_open) - np.asarray(p_closed))
    np.testing.assert_allclose(d, 0.04, atol=1e-5)


def test_vmap_fk(model):
    qs = jnp.tile(jnp.asarray(NEUTRAL_ARM), (16, 1))

    @jax.jit
    def ee_batch(qs):
        def one(q):
            fk = K.fk_world(model, q)
            return K.site_com_position(model, fk, EE_SITE)
        return jax.vmap(one)(qs)

    out = ee_batch(qs)
    assert out.shape == (16, 3)
    assert np.allclose(np.asarray(out[0]), np.asarray(out[15]))


def test_collision_capsules_match_urdf_union():
    """The URDF's collision blocks are cylinder + end spheres centered at the
    cylinder end planes; the exact union is a capsule whose segment is the
    bare cylinder axis (regression: lengths were extended by 2r, reaching
    one radius past the true surface at each end).  panda.urdf:52-69 etc."""
    import numpy as np

    from panda_gym_tpu.models.panda_constants import COLLISION_CAPSULES

    def seg(link, i=0):
        p0, p1, r = COLLISION_CAPSULES[link][i]
        return np.asarray(p0), np.asarray(p1), r

    p0, p1, r = seg("panda_link1")
    np.testing.assert_allclose(sorted([p0[2], p1[2]]), [-0.333, -0.05],
                               atol=1e-9)
    assert r == 0.06
    p0, p1, r = seg("panda_link2")
    np.testing.assert_allclose(sorted([p0[2], p1[2]]), [-0.06, 0.06],
                               atol=1e-9)
    p0, p1, r = seg("panda_link5", 1)          # thin offset capsule
    np.testing.assert_allclose(sorted([p0[2], p1[2]]), [-0.20, -0.06],
                               atol=1e-9)
    assert r == 0.025
    p0, p1, r = seg("panda_hand")              # axis along y after rpy
    np.testing.assert_allclose(sorted([p0[1], p1[1]]), [-0.05, 0.05],
                               atol=1e-9)
