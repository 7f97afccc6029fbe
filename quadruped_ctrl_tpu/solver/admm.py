"""Batched ADMM QP solver (OSQP/JCQP-style operator splitting).

Solves  min 0.5 x'Hx + g'x  s.t.  l <= Ax <= u.

The splitting, relaxation, and per-constraint-type rho selection follow the
JCQP spec (reference src/JCQP/QpProblem.cpp:276-368, QpProblem.h:15-27):
equality rows (|u-l|<tol) get rho*rho_equality_scale, effectively-unbounded
rows get rho_infty, others rho. The KKT system is solved via the Schur
complement normal equations K = H + sigma*I + A' diag(rho) A with a single
Cholesky factorization per problem, reused across iterations — on TPU this is
one batched Cholesky + two batched triangular solves per iteration, all MXU
work with static shapes.

Two interfaces:
* `admm_dense`   — generic dense-A solver (the JCQP-equivalent component,
                   also the differential-test subject);
* `admm_mpc`     — MPC-specialized: A is the friction pyramid, applied
                   structurally (never materialized), K assembled from
                   3x3 Gram blocks.

A fixed iteration count keeps batches divergence-free; `kkt_residuals` gives
an optimality certificate for tests/telemetry.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from quadruped_ctrl_tpu.config import MPCConfig, SolverConfig
from quadruped_ctrl_tpu.mpc import formation

_HI = lax.Precision.HIGHEST


def constraint_rho(cfg: SolverConfig, l, u):
    """Per-row penalty: equality / infinite / inequality (QpProblem.cpp:276-291)."""
    infinite = (l < -cfg.infty) | (u > cfg.infty)
    equality = jnp.abs(u - l) < cfg.eql_tol
    return jnp.where(
        infinite,
        cfg.rho_infty,
        jnp.where(equality, cfg.rho * cfg.rho_equality_scale, cfg.rho),
    )


def _iterate(cfg: SolverConfig, kkt_chol, apply_a, apply_at, g, l, u, rho, n_iter):
    """Shared ADMM loop. apply_a: x->Ax, apply_at: y->A'y (flat vectors)."""
    alpha = cfg.over_relax_alpha
    sigma = cfg.sigma
    inv_rho = 1.0 / rho

    def tri_solve(rhs):
        t = lax.linalg.triangular_solve(
            kkt_chol, rhs[:, None], left_side=True, lower=True, transpose_a=False
        )
        t = lax.linalg.triangular_solve(
            kkt_chol, t, left_side=True, lower=True, transpose_a=True
        )
        return t[:, 0]

    x0 = jnp.zeros(g.shape, dtype=g.dtype)
    z0 = jnp.zeros(l.shape, dtype=g.dtype)
    y0 = jnp.zeros(l.shape, dtype=g.dtype)

    def body(carry, _):
        x, z, y = carry
        rhs = sigma * x - g + apply_at(rho * z - y)
        x_t = tri_solve(rhs)
        z_t = apply_a(x_t)
        x_new = alpha * x_t + (1.0 - alpha) * x
        z_relax = alpha * z_t + (1.0 - alpha) * z
        z_new = jnp.clip(z_relax + inv_rho * y, l, u)
        y_new = y + rho * (z_relax - z_new)
        return (x_new, z_new, y_new), None

    (x, z, y), _ = lax.scan(body, (x0, z0, y0), None, length=n_iter)
    return x, z, y


def kkt_residuals(hess, grad, a_mat, l, u, x, y):
    """(primal, dual) infinity-norm residuals (QpProblem.cpp:calcAndDisplayResidual)."""
    ax = a_mat @ x
    primal = jnp.max(jnp.maximum(ax - u, 0.0) + jnp.maximum(l - ax, 0.0))
    dual = jnp.max(jnp.abs(hess @ x + grad + a_mat.T @ y))
    return primal, dual


def admm_dense(
    cfg: SolverConfig, hess, grad, a_mat, l, u, iterations: int | None = None
):
    """Generic dense-constraint ADMM solve. Returns (x, z, y)."""
    n_iter = cfg.iterations if iterations is None else iterations
    rho = constraint_rho(cfg, l, u)
    k = hess + cfg.sigma * jnp.eye(hess.shape[0], dtype=hess.dtype)
    k = k + jnp.matmul(a_mat.T * rho[None, :], a_mat, precision=_HI)
    chol = jnp.linalg.cholesky(k)
    return _iterate(
        cfg,
        chol,
        lambda v: a_mat @ v,
        lambda w: a_mat.T @ w,
        grad,
        l,
        u,
        rho,
        n_iter,
    )


def admm_mpc(
    cfg: SolverConfig,
    cfg_mpc: MPCConfig,
    hess,            # (12h,12h)
    grad,            # (12h,)
    gait_table,      # (h,4) contact flags in {0,1}
    iterations: int | None = None,
):
    """MPC-specialized solve with the structural friction pyramid.

    Swing feet (gait=0) have fz bounds [0,0]: an equality row whose
    rho*rho_equality_scale penalty pins fz (and via the pyramid rows fx, fy)
    to zero — the bound-masking equivalent of the reference's swing-variable
    elimination (SolverMPC.cpp:441-525). Returns forces x (12h,).
    """
    n_iter = cfg.iterations if iterations is None else iterations
    h = gait_table.shape[0]
    n = 12 * h
    dtype = hess.dtype

    l3, u3 = formation.pyramid_bounds(cfg_mpc, gait_table.astype(dtype))
    l = l3.reshape(-1)
    u = u3.reshape(-1)
    rho = constraint_rho(cfg, l, u)

    gram = formation.pyramid_gram(cfg_mpc, rho.reshape(h, 4, 5))  # (h,4,3,3)
    k = hess + cfg.sigma * jnp.eye(n, dtype=dtype)
    k4 = k.reshape(h * 4, 3, h * 4, 3)
    idx = jnp.arange(h * 4)
    k4 = k4.at[idx, :, idx, :].add(gram.reshape(h * 4, 3, 3))
    k = k4.reshape(n, n)
    chol = jnp.linalg.cholesky(k)

    def apply_a(v):
        return formation.pyramid_apply(cfg_mpc, v.reshape(h, 4, 3)).reshape(-1)

    def apply_at(w):
        return formation.pyramid_apply_t(cfg_mpc, w.reshape(h, 4, 5)).reshape(-1)

    x, _, _ = _iterate(cfg, chol, apply_a, apply_at, grad, l, u, rho, n_iter)
    return x
