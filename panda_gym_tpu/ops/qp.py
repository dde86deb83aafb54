"""Dense OSQP-style ADMM solver for small QPs, jit/vmap-friendly.

Replaces qpsolvers+Gurobi (panda.py:422 solve_qp(..., solver="gurobi")) for
the NEO controller's 13-variable QP.  Fixed iteration count -> static
control flow; one (n x n) Cholesky factorization per solve; everything
batches under vmap, which is how thousands of per-env priors run on-chip.

Problem form:   minimize   1/2 x^T Q x + c^T x
                subject to l <= A x <= u        (equalities: l == u)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_qp_admm(Q, c, A, l, u, n_iters: int = 60, rho: float = 0.1,
                  sigma: float = 1e-6, alpha: float = 1.6):
    """OSQP ADMM iteration (Stellato et al. 2020) with fixed rho.

    Returns (x, residual_norm).
    """
    n = Q.shape[-1]
    m = A.shape[-2]
    At = jnp.swapaxes(A, -1, -2)
    K = Q + sigma * jnp.eye(n) + rho * (At @ A)

    from panda_gym_tpu.ops.linalg import cholesky_solve_unrolled

    def cho_solve(b):
        return cholesky_solve_unrolled(K, b)

    x0 = jnp.zeros(n)
    z0 = jnp.zeros(m)
    y0 = jnp.zeros(m)

    def body(carry, _):
        x, z, y = carry
        rhs = sigma * x - c + At @ (rho * z - y)
        x_new = cho_solve(rhs)
        Ax = A @ x_new
        z_tilde = alpha * Ax + (1 - alpha) * z
        z_new = jnp.clip(z_tilde + y / rho, l, u)
        y_new = y + rho * (z_tilde - z_new)
        return (x_new, z_new, y_new), None

    (x, z, y), _ = jax.lax.scan(body, (x0, z0, y0), None, length=n_iters)
    resid = jnp.linalg.norm(jnp.clip(A @ x, l, u) - A @ x)
    return x, resid
