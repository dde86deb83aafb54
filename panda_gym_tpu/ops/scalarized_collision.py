"""Batch-last collision checking: the ReachAO substep hot loop.

The reference's centerpiece task checks robot<->obstacle and robot<->table
distances after EVERY physics substep and truncates on contact
(reach_ao.py:182-198 step_check_collision; pyb_utils CollisionDetector).
vmapping the per-env formulation (engine.py:substep with check_collision)
leaves TPU lanes ~2% utilised and strews tiny gather/argmin kernels across
the substep — measured ~5.5k env-steps/s at B=1024.

Layout here: every spatial component is an (ncap, B) array — capsules on the
sublane axis, the env batch on the 128-lane axis — so one distance
evaluation covers all 18 capsules of the whole batch in a handful of VPU
ops.  Model constants fold at trace time (ops/scalarized.py conventions).

Numerics mirror ops/contact.py exactly (same 4-iteration fixed point for
capsule-box, same argmin tie-breaking as engine.group_obstacle_distances) so
the batched path is trajectory-equivalent to the per-env one.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from panda_gym_tpu.models.chain import ChainModel
from panda_gym_tpu.ops import scalarized as S
from panda_gym_tpu.sim.state import DEEP_PENETRATION_BLIND, OBS_BOX

EPS = 1e-9


# ---------------------------------------------------------------------------
# geometry in component form (mirrors ops/contact.py; shapes broadcast, the
# canonical use is (ncap, B) capsule components against (B,) obstacle comps)
# ---------------------------------------------------------------------------

def closest_on_segment(p0, p1, x):
    """contact.py:closest_on_segment, component form."""
    d = S.vsub(p1, p0)
    t = S.div(S.vdot(S.vsub(x, p0), d), jnp.maximum(S.vdot(d, d), EPS))
    t = jnp.clip(t, 0.0, 1.0)
    return S.vadd(p0, S.vscale(t, d))


def capsule_sphere_closest(p0, p1, rc, center, rs, with_points: bool = True):
    """Distance (+ closest surface points) — contact.py:
    capsule_sphere_distance."""
    cp = closest_on_segment(p0, p1, center)
    delta = S.vsub(center, cp)
    d = jnp.sqrt(jnp.maximum(S.vdot(delta, delta), 0.0))
    dist = S.sub(S.sub(d, rc), rs)
    if not with_points:
        return dist, None, None
    safe = jnp.maximum(d, EPS)
    n = tuple(delta[i] / safe for i in range(3))
    pc = S.vadd(cp, tuple(S.mul(rc, n[i]) for i in range(3)))
    po = S.vsub(center, tuple(S.mul(rs, n[i]) for i in range(3)))
    return dist, pc, po


def _point_box_closest(x, half):
    """contact.py:point_box_closest (axis-aligned local frame), component
    form; returns (closest point, signed distance)."""
    cl = tuple(jnp.clip(x[i], -half[i], half[i]) for i in range(3))
    out = S.vsub(x, cl)
    d_out = jnp.sqrt(jnp.maximum(S.vdot(out, out), 0.0))
    gap = tuple(S.sub(half[i], jnp.abs(x[i])) for i in range(3))
    # argmin over the 3 gaps, first-index tie-break (jnp.argmin semantics)
    kx = (gap[0] <= gap[1]) & (gap[0] <= gap[2])
    ky = (~kx) & (gap[1] <= gap[2])
    kz = (~kx) & (~ky)
    min_gap = jnp.minimum(jnp.minimum(gap[0], gap[1]), gap[2])
    sign = tuple(jnp.where(jnp.sign(x[i]) == 0, 1.0, jnp.sign(x[i]))
                 for i in range(3))
    ks = (kx, ky, kz)
    inside_pt = tuple(jnp.where(ks[i], S.mul(sign[i], half[i]), x[i])
                      for i in range(3))
    is_inside = d_out <= EPS
    closest = tuple(jnp.where(is_inside, inside_pt[i], cl[i]) for i in range(3))
    dist = jnp.where(is_inside, -min_gap, d_out)
    return closest, dist


def _inside_normal(x, half):
    gap = tuple(S.sub(half[i], jnp.abs(x[i])) for i in range(3))
    kx = (gap[0] <= gap[1]) & (gap[0] <= gap[2])
    ky = (~kx) & (gap[1] <= gap[2])
    kz = (~kx) & (~ky)
    ks = (kx, ky, kz)
    sign = tuple(jnp.where(jnp.sign(x[i]) == 0, 1.0, jnp.sign(x[i]))
                 for i in range(3))
    return tuple(jnp.where(ks[i], sign[i], 0.0) for i in range(3))


def capsule_box_closest(p0, p1, rc, center, half, n_iter: int = 4,
                        with_points: bool = True):
    """Distance (+ closest surface points), axis-aligned box
    (contact.py:capsule_box_distance with Rb = I)."""
    a = S.vsub(p0, center)
    b = S.vsub(p1, center)
    x = S.vscale(0.5, S.vadd(a, b))
    for _ in range(n_iter):
        cb, _ = _point_box_closest(x, half)
        x = closest_on_segment(a, b, cb)
    cb, sd = _point_box_closest(x, half)
    dist = S.sub(sd, rc)
    if not with_points:
        return dist, None, None
    delta = S.vsub(cb, x)
    d = jnp.sqrt(jnp.maximum(S.vdot(delta, delta), 0.0))
    safe = jnp.maximum(d, EPS)
    outside = sd > 0
    n_in = _inside_normal(x, half)
    n_loc = tuple(jnp.where(outside, -delta[i] / safe, n_in[i])
                  for i in range(3))
    pc = tuple(S.sub(S.add(x[i], center[i]), S.mul(rc, n_loc[i]))
               for i in range(3))
    po = S.vadd(cb, center)
    return dist, pc, po


# ---------------------------------------------------------------------------
# stacked capsule tables + per-obstacle distance sweeps
# ---------------------------------------------------------------------------

def stack_caps(comps_per_cap):
    """[per-cap vec3 of (B,)] -> vec3 of (ncap, B).

    Base-link capsule components constant-fold to Python floats
    (ops/scalarized.py); broadcast those against the batch."""
    ncap = len(comps_per_cap)
    ref = next(c for v in comps_per_cap for c in v if not S._is_c(c))

    def as_arr(c):
        return jnp.full_like(ref, c) if S._is_c(c) else c

    return tuple(jnp.stack([as_arr(comps_per_cap[i][k]) for i in range(ncap)])
                 for k in range(3))


def _cap_radius_col(mc) -> jnp.ndarray:
    return jnp.asarray(np.asarray(mc.cap_radius, np.float32)[:, None])


def _obstacle_comps(states, n_obstacles: int):
    """Per-obstacle component views of the batched EnvState obstacle arrays."""
    opos = [tuple(states.obstacle_pos[:, j, k] for k in range(3))
            for j in range(n_obstacles)]
    osize = [tuple(states.obstacle_size[:, j, k] for k in range(3))
             for j in range(n_obstacles)]
    is_box = [states.obstacle_type[:, j] == OBS_BOX
              for j in range(n_obstacles)]
    active = [states.obstacle_active[:, j] for j in range(n_obstacles)]
    return opos, osize, is_box, active


def obstacle_distance_sweep(mc, P0, P1, RC, opos, osize, is_box, active,
                            n_obstacles: int, max_distance: float,
                            with_points: bool):
    """All capsule x obstacle distances (and closest points).

    Returns D (no, ncap, B) and, with points, PC/PO as vec3 of
    (no, ncap, B)."""
    ds, pcs, pos_ = [], [], []
    for j in range(n_obstacles):
        d_s, pc_s, po_s = capsule_sphere_closest(
            P0, P1, RC, opos[j], osize[j][0], with_points)
        d_b, pc_b, po_b = capsule_box_closest(
            P0, P1, RC, opos[j], osize[j], with_points=with_points)
        d = jnp.where(is_box[j], d_b, d_s)
        # Bullet convex-margin blindness for box obstacles (see
        # engine.group_obstacle_distances): deep penetrations read as far.
        d = jnp.where(is_box[j] & (d <= -DEEP_PENETRATION_BLIND),
                      max_distance, d)
        d = jnp.where(active[j], d, max_distance)
        ds.append(d)
        if with_points:
            pcs.append(tuple(jnp.where(is_box[j], pc_b[k], pc_s[k])
                             for k in range(3)))
            pos_.append(tuple(jnp.where(is_box[j], po_b[k], po_s[k])
                              for k in range(3)))
    D = jnp.stack(ds)
    if not with_points:
        return D, None, None
    PC = tuple(jnp.stack([pcs[j][k] for j in range(n_obstacles)])
               for k in range(3))
    PO = tuple(jnp.stack([pos_[j][k] for j in range(n_obstacles)])
               for k in range(3))
    return D, PC, PO


def _group_rows(mc) -> List[List[int]]:
    rows = [[] for _ in range(mc.ngroup)]
    for i, g in enumerate(mc.cap_group):
        if g >= 0:
            rows[g].append(i)
    return rows


def group_min_distances(mc, D, max_distance: float):
    """Per-group min over capsules x obstacles; D is (no, ncap, B).

    Static row slices + elementwise-minimum chains — no sublane gathers
    (dynamic row gathers cost lane shuffles on TPU)."""
    from functools import reduce
    out = []
    for rows in _group_rows(mc):
        if not rows:
            out.append(jnp.full(D.shape[-1], max_distance))
        else:
            m = reduce(jnp.minimum, [D[:, i, :] for i in rows])
            out.append(jnp.min(m, axis=0))
    return out  # list of (B,)


def group_obstacle_closest(mc, D, PC, PO, max_distance: float):
    """Per-group (min distance, closest point pair); candidate ordering is
    cap-major / obstacle-minor within the group's own capsules — matching
    engine.group_obstacle_distances' flat argmin tie-break."""
    B = D.shape[-1]
    best = []
    for rows in _group_rows(mc):
        if not rows:
            z = jnp.zeros(B)
            best.append((jnp.full(B, max_distance), (z, z, z), (z, z, z)))
            continue
        r = jnp.asarray(rows)
        cand = jnp.transpose(D[:, r, :], (1, 0, 2)).reshape(-1, B)
        idx = jnp.argmin(cand, axis=0)[None]          # (1, B)
        d = jnp.take_along_axis(cand, idx, axis=0)[0]
        pc, po = [], []
        for k in range(3):
            ck = jnp.transpose(PC[k][:, r, :], (1, 0, 2)).reshape(-1, B)
            ok = jnp.transpose(PO[k][:, r, :], (1, 0, 2)).reshape(-1, B)
            pc.append(jnp.take_along_axis(ck, idx, axis=0)[0])
            po.append(jnp.take_along_axis(ok, idx, axis=0)[0])
        best.append((d, tuple(pc), tuple(po)))
    return best


def table_group_distances(mc, P0, P1, RC, table_center, table_half,
                          skip_groups: Tuple[int, ...],
                          max_distance: float):
    """Per-group min distance to the (constant, axis-aligned) table box."""
    from functools import reduce
    d, _, _ = capsule_box_closest(P0, P1, RC, table_center, table_half,
                                  with_points=False)             # (ncap, B)
    # convex-convex deep-penetration blindness (see
    # engine.group_obstacle_distances)
    d = jnp.where(d <= -DEEP_PENETRATION_BLIND, max_distance, d)
    out = []
    for g, rows in enumerate(_group_rows(mc)):
        if g in skip_groups or not rows:
            out.append(jnp.full(d.shape[-1], max_distance))
        else:
            out.append(reduce(jnp.minimum, [d[i] for i in rows]))
    return out


# ---------------------------------------------------------------------------
# batched ReachAO-style physics step
# ---------------------------------------------------------------------------

def make_batched_collision_physics(
    model: ChainModel,
    scene,
    *,
    n_substeps: int,
    dt: float,
    ctrl_mode: int,
    n_obstacles: int,
    collision_safety_distance: float = 0.0,
    freeze_on_collision: bool = True,
    moving_obstacles: bool = False,
    skip_table_groups: Tuple[int, ...] = (0,),
    max_distance: float = 999.0,
    warm_start=None,
):
    """Batched equivalent of engine.make_physics_step for the
    check_collision configuration (no free bodies): operates on a batched
    EnvState, returns a new batched EnvState.

    warm_start: LCP active-set carry across substeps vs the cold
    3-refinement solve per substep.  Both are exact
    (tests/test_motor_lcp.py); speed is path-dependent.  Default False for
    THIS path: round-5 same-session A/B on the real chip measured the cold
    solve decisively faster here (reachao1 2.71M vs 1.93M steps/s,
    reachao2 1.14M vs 0.97M — BENCH_TASKS.json) because the carried
    boolean set serializes against the per-substep collision sweep while
    the inline cold refinements fuse.  PANDA_LCP_WARM=0/1 in the env
    overrides every path for A/B."""
    from panda_gym_tpu.ops.dynamics import lcp_warm_default
    if warm_start is None:
        warm_start = lcp_warm_default(False)
    mc = S.consts_from_model(model)
    ndof = mc.ndof
    ngroup = mc.ngroup
    table_center = S.cvec(np.asarray(scene.table_center))
    table_half = S.cvec(np.asarray(scene.table_half))

    def physics_step(states):
        tgt = tuple(states.ctrl_target[:, d] for d in range(ndof))
        opos0, osize, is_box, active = _obstacle_comps(states, n_obstacles)
        ovel = [tuple(states.obstacle_vel[:, j, k] for k in range(3))
                for j in range(n_obstacles)]
        RC = _cap_radius_col(mc)

        def body(carry, _):
            qc, qdc, opos, collided, link_d, w = carry
            # robot substep (motor semantics) + kinematic obstacle advance,
            # exactly as engine.substep orders them; the LCP active set is
            # warm-started across substeps (seeded by a cold pre-scan
            # solve of the first substep's system, so iteration 1 of the
            # scan refines from an already-converged set)
            if warm_start:
                q_new, qd_new, w2 = S.motor_substep(mc, list(qc), list(qdc),
                                                    list(tgt), dt, ctrl_mode,
                                                    warm=w)
            else:
                q_new, qd_new = S.motor_substep(mc, list(qc), list(qdc),
                                                list(tgt), dt, ctrl_mode)
                w2 = w   # dead carry in cold mode
            if moving_obstacles:
                opos_new = [S.vadd(opos[j], S.vscale(dt, ovel[j]))
                            for j in range(n_obstacles)]
            else:
                opos_new = list(opos)

            # collision check on the moved robot + moved obstacles
            Rs, ps = S.fk_positions(mc, q_new)
            p0s, p1s = S.capsule_endpoints(mc, Rs, ps)
            P0, P1 = stack_caps(p0s), stack_caps(p1s)
            D, _, _ = obstacle_distance_sweep(
                mc, P0, P1, RC, opos_new, osize, is_box, active,
                n_obstacles, max_distance, with_points=False)
            gd = group_min_distances(mc, D, max_distance)
            td = table_group_distances(mc, P0, P1, RC, table_center,
                                       table_half, skip_table_groups,
                                       max_distance)
            # Predicate matches engine.substep (see comment there): skip
            # group 0 (panda_link1); deep box penetrations already read as
            # far upstream (Bullet convex-margin blindness) — link1
            # distances remain in the per-link observation vector.
            min_all = jnp.min(jnp.stack(list(gd[1:]) + list(td)), axis=0)
            collided_step = min_all <= collision_safety_distance
            new_collided = collided | collided_step

            if freeze_on_collision:
                # engine.substep freeze semantics (reach_ao.py:182-188 early
                # break): once collided, q/qd/obstacles stop evolving and
                # link distances keep the colliding-substep values rather
                # than ones from a phantom advanced pose.
                frz = collided
                q_out = tuple(jnp.where(frz, qc[d], q_new[d])
                              for d in range(ndof))
                qd_out = tuple(jnp.where(frz, qdc[d], qd_new[d])
                               for d in range(ndof))
                opos_out = [tuple(jnp.where(frz, opos[j][k], opos_new[j][k])
                                  for k in range(3))
                            for j in range(n_obstacles)]
                link_d_out = tuple(jnp.where(frz, link_d[g], gd[g])
                                   for g in range(ngroup))
            else:
                q_out, qd_out = tuple(q_new), tuple(qd_new)
                opos_out = opos_new
                link_d_out = tuple(gd)
            return (q_out, qd_out, tuple(opos_out), new_collided,
                    link_d_out, w2), None

        q0 = tuple(states.q[:, d] for d in range(ndof))
        qd0 = tuple(states.qd[:, d] for d in range(ndof))
        if warm_start:
            # cold pre-scan solve: discard the state, keep the converged
            # active set as the scan's initial warm carry (bit-identical
            # first substep)
            _, _, warm0 = S.motor_substep(mc, list(q0), list(qd0),
                                          list(tgt), dt, ctrl_mode,
                                          return_warm=True)
        else:
            zero = [jnp.zeros_like(q0[d]) for d in range(ndof)]
            warm0 = (tuple(z.astype(bool) for z in zero), tuple(zero))
        carry0 = (
            q0, qd0,
            tuple(tuple(states.obstacle_pos[:, j, k] for k in range(3))
                  for j in range(n_obstacles)),
            states.is_collided,
            tuple(states.link_obstacle_dist[:, g] for g in range(ngroup)),
            warm0,
        )
        (qc, qdc, opos, collided, link_d, _), _ = jax.lax.scan(
            body, carry0, None, length=n_substeps)

        obstacle_pos = jnp.stack(
            [jnp.stack(list(opos[j]), axis=-1) for j in range(n_obstacles)],
            axis=1)
        return states.replace(
            q=jnp.stack(qc, axis=-1),
            qd=jnp.stack(qdc, axis=-1),
            obstacle_pos=obstacle_pos,
            is_collided=collided,
            link_obstacle_dist=jnp.stack(link_d, axis=-1),
        )

    return physics_step
