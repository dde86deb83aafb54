"""3D rotation / rigid-transform primitives for the TPU-native panda-gym engine.

Conventions (chosen to match the reference's PyBullet API surface, see
/root/reference/panda_gym/pybullet.py:194-223):
  * quaternions are stored ``(x, y, z, w)`` (PyBullet layout),
  * euler angles are extrinsic XYZ (roll, pitch, yaw), matching
    ``pybullet.getEulerFromQuaternion`` / URDF ``rpy`` attributes,
  * rotation matrices are world_R_body (column vectors = body axes in world).

Everything is pure jnp, float32 by default, and shaped so that ``jax.vmap``
broadcasts over leading batch axes without special-casing.
"""
from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions  (x, y, z, w)
# ---------------------------------------------------------------------------

QUAT_IDENTITY = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q1, q2):
    """Hamilton product q1 ⊗ q2 in (x, y, z, w) layout."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_rotate_inv(q, v):
    return quat_rotate(quat_conj(q), v)


def quat_from_axis_angle(axis, angle):
    """axis: (..., 3) unit vector, angle: (...)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def quat_to_mat(q):
    """Quaternion -> 3x3 rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m):
    """3x3 rotation matrix -> quaternion (x, y, z, w).

    Branch-free Shepperd-style selection (safe under jit/vmap).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # four candidate (unnormalized) quaternions, one per dominant component
    qw = jnp.stack([m21 - m12, m02 - m20, m10 - m01,
                    1.0 + m00 + m11 + m22], axis=-1)
    qx = jnp.stack([1.0 + m00 - m11 - m22, m10 + m01, m02 + m20,
                    m21 - m12], axis=-1)
    qy = jnp.stack([m10 + m01, 1.0 - m00 + m11 - m22, m21 + m12,
                    m02 - m20], axis=-1)
    qz = jnp.stack([m02 + m20, m21 + m12, 1.0 - m00 - m11 + m22,
                    m10 - m01], axis=-1)

    trace = m00 + m11 + m22
    cond = jnp.stack([m00, m11, m22, trace], axis=-1)
    best = jnp.argmax(cond, axis=-1)
    cands = jnp.stack([qx, qy, qz, qw], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(
        cands, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    return quat_normalize(q)


def quat_from_euler(rpy):
    """Extrinsic XYZ euler (roll, pitch, yaw) -> quaternion (x, y, z, w).

    Matches pybullet.getQuaternionFromEuler (used by the reference when a
    3-vector orientation is passed, pybullet.py:362-363).
    """
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_euler(q):
    """Quaternion -> extrinsic XYZ euler (roll, pitch, yaw).

    Matches pybullet.getEulerFromQuaternion semantics
    (reference pybullet.py:218 get_base_rotation "euler").
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)

    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_integrate(q, omega, dt):
    """Integrate body angular velocity (world frame) over dt.

    q_{t+1} = exp(0.5 * omega * dt) ⊗ q_t   (world-frame omega, as PyBullet's
    resetBaseVelocity/getBaseVelocity use world-frame angular velocity).
    """
    angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    axis = omega / jnp.where(angle > 1e-9, angle, 1.0)
    dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
    return quat_normalize(quat_mul(dq, q))


# ---------------------------------------------------------------------------
# Rigid transforms as (R, p) pairs — R: (...,3,3), p: (...,3)
# ---------------------------------------------------------------------------

def rt_compose(Ra, pa, Rb, pb):
    """(Ra,pa) ∘ (Rb,pb): first apply b in a's frame."""
    return Ra @ Rb, pa + jnp.einsum("...ij,...j->...i", Ra, pb)


def rt_apply(R, p, v):
    return jnp.einsum("...ij,...j->...i", R, v) + p


def rt_inv(R, p):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, p)


def skew(v):
    """(...,3) -> (...,3,3) cross-product matrix."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )
