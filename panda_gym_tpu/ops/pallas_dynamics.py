"""Pallas TPU kernel for the substepped motor dynamics.

Runs the identical scalar-component Featherstone trace as
``ops/scalarized.py`` *inside one Pallas kernel*: each spatial component is
an (BT/128, 128) VMEM tile and all ``n_substeps`` substeps execute on-chip
with q/qd never leaving VMEM — no per-substep HBM roundtrip or kernel-launch
boundary, unlike the lax.scan formulation where XLA materialises the carry
every iteration.

Layout: inputs are transposed to (ndof, B) so the batch rides the lane axis;
the grid tiles the batch, one TensorCore program per BT-wide slab.

This is the framework's hottest op: 20 substeps of ~3k fused VPU
instructions per policy step of every Reach-family env (reference
pybullet.py:68-71 stepSimulation loop).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from panda_gym_tpu.models.chain import ChainModel
from panda_gym_tpu.ops import scalarized as S

LANES = 128
DEFAULT_TILE = 1024  # envs per program: (8, 128) f32 tiles per component


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_pallas_motor_steps(model: ChainModel, *, n_substeps: int, dt: float,
                            ctrl_mode: int, tile: int = DEFAULT_TILE,
                            interpret: bool = False):
    """Same contract as scalarized.make_batched_motor_steps: (B, ndof) ->
    (B, ndof) after n_substeps of PyBullet-motor-semantics dynamics."""
    mc = S.consts_from_model(model)
    ndof = mc.ndof

    def kernel(q_ref, qd_ref, tgt_ref, q_out, qd_out):
        sub = q_ref.shape[1] // LANES
        shape = (sub, LANES)
        comp = lambda ref, d: ref[d, :].reshape(shape)
        tgt = tuple(comp(tgt_ref, d) for d in range(ndof))

        # cold pre-solve seeds the warm active set; all substeps run one
        # warm refinement — same structure as every other physics path.
        # Mosaic cannot loop-carry i1 vectors (scf.for fails to legalize on
        # vector<8x128xi1>), so the saturation mask crosses the fori_loop
        # boundary as f32 0/1 and is re-thresholded inside the body.
        q0 = [comp(q_ref, d) for d in range(ndof)]
        qd0 = [comp(qd_ref, d) for d in range(ndof)]
        _, _, (sat0, sign0) = S.motor_substep(
            mc, list(q0), list(qd0), list(tgt), dt, ctrl_mode,
            return_warm=True)
        to_f = lambda sat: tuple(
            jnp.where(s, 1.0, 0.0).astype(jnp.float32) for s in sat)

        def body(_, carry):
            qc, qdc, sat_f, sign = carry
            sat = tuple(s > 0.5 for s in sat_f)
            q2, qd2, (sat2, sign2) = S.motor_substep(
                mc, list(qc), list(qdc), list(tgt), dt, ctrl_mode,
                warm=(sat, sign))
            return tuple(q2), tuple(qd2), to_f(sat2), sign2

        qc, qdc, _, _ = jax.lax.fori_loop(
            0, n_substeps, body,
            (tuple(q0), tuple(qd0), to_f(sat0), tuple(sign0)))
        for d in range(ndof):
            q_out[d, :] = qc[d].reshape(-1)
            qd_out[d, :] = qdc[d].reshape(-1)

    @functools.partial(jax.jit, static_argnames=())
    def step(q, qd, target):
        B = q.shape[0]
        bt = min(tile, _round_up(B, LANES))
        Bp = _round_up(B, bt)
        pad = Bp - B

        def prep(x):
            x = x.astype(jnp.float32).T            # (ndof, B)
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad)))
            return x

        qT, qdT, tT = prep(q), prep(qd), prep(target)
        grid = (Bp // bt,)
        spec = pl.BlockSpec((ndof, bt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        q2, qd2 = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec, spec, spec],
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((ndof, Bp), jnp.float32),
                       jax.ShapeDtypeStruct((ndof, Bp), jnp.float32)),
            interpret=interpret,
        )(qT, qdT, tT)
        return q2[:, :B].T, qd2[:, :B].T

    return step
