"""Analytic primitive geometry: distances, closest points, penalty contact.

Replaces PyBullet's GJK-based getClosestPoints / contact solve for the
primitive shapes the reference actually uses: spheres, boxes (cuboids),
cylinders, the table box, and the robot's capsule decomposition
(pyb_utils CollisionDetector consumed at reach_ao.py:896-900, 902-959;
contact dynamics consumed by Push/Slide/PickAndPlace/Stack/Flip).

All functions are batched-friendly pure jnp; shapes:
  capsule  = (p0, p1, r)      segment + radius
  sphere   = (c, r)           degenerate capsule
  box      = (center, R, half) oriented box
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-9


def closest_on_segment(p0, p1, x):
    """Closest point to x on segment [p0, p1] (leading batch dims ok)."""
    d = p1 - p0
    t = jnp.sum((x - p0) * d, axis=-1) / jnp.maximum(jnp.sum(d * d, axis=-1), EPS)
    t = jnp.clip(t, 0.0, 1.0)
    return p0 + t[..., None] * d


def segment_segment_closest(p0, p1, q0, q1):
    """Closest point pair between two segments (Ericson, real-time CD 5.1.9)."""
    d1 = p1 - p0
    d2 = q1 - q0
    r = p0 - q0
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    s = jnp.where(denom > EPS, jnp.clip((b * f - c * e) / jnp.maximum(denom, EPS), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, EPS)
    t_clamped = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_clamped - c) / jnp.maximum(a, EPS), 0.0, 1.0)
    cp = p0 + s[..., None] * d1
    cq = q0 + t_clamped[..., None] * d2
    return cp, cq


def capsule_sphere_distance(p0, p1, rc, center, rs):
    """Surface distance + closest surface points (on capsule, on sphere)."""
    cp = closest_on_segment(p0, p1, center)
    delta = center - cp
    d = jnp.linalg.norm(delta, axis=-1)
    n = delta / jnp.maximum(d, EPS)[..., None]  # capsule -> sphere
    rc = jnp.asarray(rc)
    rs = jnp.asarray(rs)
    dist = d - rc - rs
    point_on_capsule = cp + n * rc[..., None]
    point_on_sphere = center - n * rs[..., None]
    return dist, point_on_capsule, point_on_sphere


def point_box_closest(x_local, half):
    """Closest point on an axis-aligned box (local frame) to x_local and the
    signed distance (negative inside)."""
    clamped = jnp.clip(x_local, -half, half)
    outside = x_local - clamped
    d_out = jnp.linalg.norm(outside, axis=-1)
    # inside: distance to nearest face (negative), closest point on that face
    face_gap = half - jnp.abs(x_local)          # (...,3) >= 0 when inside
    k = jnp.argmin(face_gap, axis=-1)
    min_gap = jnp.min(face_gap, axis=-1)
    sign = jnp.sign(jnp.take_along_axis(x_local, k[..., None], axis=-1))[..., 0]
    sign = jnp.where(sign == 0, 1.0, sign)
    # build the inside closest point: replace coordinate k by +-half_k
    onehot = jnp.eye(3)[k]
    half_k = jnp.take_along_axis(half * jnp.ones_like(x_local), k[..., None], axis=-1)[..., 0]
    inside_pt = x_local * (1 - onehot) + (sign * half_k)[..., None] * onehot
    is_inside = d_out <= EPS
    closest = jnp.where(is_inside[..., None], inside_pt, clamped)
    dist = jnp.where(is_inside, -min_gap, d_out)
    return closest, dist


def capsule_box_distance(p0, p1, rc, center, Rb, half, n_iter: int = 4):
    """Surface distance + closest points between a capsule and an oriented box.

    Fixed-point iteration: alternate closest-point projections between the
    segment and the box surface (converges for convex pairs; n_iter static).
    """
    Rt = jnp.swapaxes(Rb, -1, -2)
    to_local = lambda x: jnp.einsum("...ij,...j->...i", Rt, x - center)
    to_world = lambda x: jnp.einsum("...ij,...j->...i", Rb, x) + center

    rc = jnp.asarray(rc)
    a, b = to_local(p0), to_local(p1)
    x = 0.5 * (a + b)
    for _ in range(n_iter):
        cb, _ = point_box_closest(x, half)
        x = closest_on_segment(a, b, cb)
    cb, sd = point_box_closest(x, half)
    delta = cb - x
    d = jnp.linalg.norm(delta, axis=-1)
    outside = sd > 0
    n_loc = jnp.where(
        outside[..., None],
        -delta / jnp.maximum(d, EPS)[..., None],   # box -> segment
        _inside_normal(x, half),
    )
    dist = sd - rc
    # closest surface points
    p_on_capsule = to_world(x) - jnp.einsum("...ij,...j->...i", Rb, n_loc) * rc[..., None]
    p_on_box = to_world(cb)
    n_world = jnp.einsum("...ij,...j->...i", Rb, n_loc)  # points from box toward capsule
    return dist, p_on_capsule, p_on_box, n_world


def _inside_normal(x_local, half):
    """Outward normal of the nearest face for a point inside the box."""
    face_gap = half - jnp.abs(x_local)
    k = jnp.argmin(face_gap, axis=-1)
    sign = jnp.sign(jnp.take_along_axis(x_local, k[..., None], axis=-1))[..., 0]
    sign = jnp.where(sign == 0, 1.0, sign)
    return jnp.eye(3)[k] * sign[..., None]



def sphere_box_distance(center_s, rs, center_b, Rb, half):
    Rt = jnp.swapaxes(Rb, -1, -2)
    x = jnp.einsum("...ij,...j->...i", Rt, center_s - center_b)
    cb, sd = point_box_closest(x, half)
    n_loc = jnp.where(
        (sd > 0)[..., None],
        (x - cb) / jnp.maximum(jnp.abs(sd), EPS)[..., None],
        _inside_normal(x, half),
    )
    rs = jnp.asarray(rs)
    n_world = jnp.einsum("...ij,...j->...i", Rb, n_loc)
    p_on_box = jnp.einsum("...ij,...j->...i", Rb, cb) + center_b
    p_on_sphere = center_s - n_world * rs[..., None]
    return sd - rs, p_on_sphere, p_on_box, n_world


# ---------------------------------------------------------------------------
# Penalty contact force
# ---------------------------------------------------------------------------

def penalty_force(depth, normal, v_rel, mu, kn=8000.0, dn=120.0, v_eps=2e-3):
    """Spring-damper normal force + regularised Coulomb friction.

    depth > 0 means penetration; normal points from surface A into B (force
    applied to B).  v_rel = velocity of B relative to A at the contact point.
    Returns the force on B.
    """
    pen = jnp.maximum(depth, 0.0)
    v_n = jnp.sum(v_rel * normal, axis=-1)
    fn = jnp.maximum(kn * pen - dn * v_n * (pen > 0), 0.0)
    v_t = v_rel - v_n[..., None] * normal
    vt_norm = jnp.linalg.norm(v_t, axis=-1)
    # saturated viscous friction: |ft| <= mu*fn, linear for small slip
    ft_mag = mu * fn * jnp.minimum(vt_norm / v_eps, 1.0)
    ft = -ft_mag[..., None] * v_t / jnp.maximum(vt_norm, EPS)[..., None]
    return fn[..., None] * normal + ft
