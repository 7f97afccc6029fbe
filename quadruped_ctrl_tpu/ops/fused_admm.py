"""Pallas TPU kernel: the entire batched MPC QP solve in one VMEM-resident
program.

The XLA path (solver/admm.py:admm_mpc_batched) streams the (B,n,n) KKT
inverse from HBM on every one of the 250 ADMM iterations (~118 MB/iteration
at B=2048, n=120 — ~30 GB of traffic) and materializes (B,n,n) penalty
matrices for every polish round. This kernel keeps one G-block of systems
entirely in VMEM: per system it

  1. builds K = H + sigma*I + A' diag(rho) A            (2 matmuls)
  2. Jacobi-prescales and inverts via scaled mixed-precision Newton-Schulz
     (the ops/ns_inverse.py schedule, inlined)
  3. runs `n_iter` over-relaxed ADMM iterations: all matvecs are VPU
     broadcast-reduces against the VMEM-resident inverse
  4. runs `polish_rounds` active-set polish rounds, each building and
     NS-inverting its penalty matrix in VMEM (solver/admm.py semantics:
     AL dual correction, wrong-sign drops, violated-row adds,
     least-infeasible iterate tracking)

HBM traffic per system: read H (n^2), A (shared), vectors; write x (n).
Everything else never leaves VMEM.

Shapes are padded to the (N=128 variables, M=256 constraint rows) tile:
one packed pair of stance-compressed trot scenarios is n=120, m=200.
Row/column conventions inside the kernel: x-space vectors are (1,N) rows,
constraint-space vectors are (M,1) columns; K and its inverse are symmetric,
so both matvec directions are axis-0/axis-1 broadcast-reduces and no
transposes are ever needed.

Semantics match solver/admm.py exactly (same splitting, relaxation,
rho classification consumed via the precomputed rho vector, same polish);
differential-tested against the XLA path and the f64 oracle in
tests/test_fused_admm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quadruped_ctrl_tpu.ops.ns_inverse import _mm3, _split, mu_schedule

N = 128   # padded variable count
M = 256   # padded constraint-row count
G = 8     # systems per grid step

_HI = jax.lax.Precision.HIGHEST


def _ns_inverse_inline(ks, mus, n_quad: int, n_hi: int):
    """Scaled mixed-precision NS inverse of a Jacobi-scaled (N,N) SPD matrix
    (ops/ns_inverse.py:_kernel_scaled, as straight-line code)."""
    eye = jnp.eye(N, dtype=jnp.float32)
    k_hi, k_lo = _split(ks)
    alpha = 1.0 / jnp.max(jnp.sum(jnp.abs(ks), axis=-1))
    x = alpha * eye

    for mu in mus:
        kx = _mm3(k_hi, k_lo, x)
        x_hi, x_lo = _split(x)
        x = mu * _mm3(x_hi, x_lo, 2.0 * eye - mu * kx)

    def quad_body(_, x):
        kx = _mm3(k_hi, k_lo, x)
        x_hi, x_lo = _split(x)
        return _mm3(x_hi, x_lo, 2.0 * eye - kx)

    x = jax.lax.fori_loop(0, n_quad, quad_body, x)

    def hi_body(_, x):
        kx = jax.lax.dot_general(ks, x, (((1,), (0,)), ((), ())),
                                 precision=_HI,
                                 preferred_element_type=jnp.float32)
        return jax.lax.dot_general(x, 2.0 * eye - kx, (((1,), (0,)), ((), ())),
                                   precision=_HI,
                                   preferred_element_type=jnp.float32)

    return jax.lax.fori_loop(0, n_hi, hi_body, x)


def _inverse_of(k, mus, n_quad, n_hi):
    """Jacobi-prescale + NS + unscale: full inverse of SPD k (N,N)."""
    eye = jnp.eye(N, dtype=jnp.float32)
    diag = jnp.sum(k * eye, axis=0, keepdims=True)           # (1,N)
    d = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
    ks = k * d * d.reshape(N, 1)
    x = _ns_inverse_inline(ks, mus, n_quad, n_hi)
    return x * d * d.reshape(N, 1)                           # K^-1 (exact scale)


V = 8     # vector-lane padding: matvecs run as (.,.)@(.,V) MXU dots
          # (Mosaic wants >= 8 columns; the MXU cost is weight-load-bound,
          # so the 7 redundant columns are free)


def _kernel(mus, n_quad, n_hi, n_iter, polish_rounds, sigma, alpha_rx,
            w_act, act_tol, infty,
            a_ref, at_ref, hess_ref, grad_ref, l_ref, u_ref, rho_ref, out_ref):
    a_mat = a_ref[:]                                         # (M,N), shared
    at_mat = at_ref[:]                                       # (N,M), shared
    eye = jnp.eye(N, dtype=jnp.float32)

    def dot(mat, vec):
        """MXU matvec: (R,C)@(C,V) -> (R,V)."""
        return jax.lax.dot_general(mat, vec, (((1,), (0,)), ((), ())),
                                   precision=_HI,
                                   preferred_element_type=jnp.float32)

    def matvec_sym(mat, vec):
        return dot(mat, vec)                                 # (N,V)

    def apply_a(vec):
        """A @ x: (N,V) -> (M,V)."""
        return dot(a_mat, vec)

    def apply_at(vec):
        """A' @ w: (M,V) -> (N,V)."""
        return dot(at_mat, vec)

    def gram(col):
        """A' diag(w) A for w: (M,V) column (col 0 meaningful) -> (N,N)."""
        aw = a_mat * col[:, 0:1]                             # (M,N)
        return jax.lax.dot_general(aw, a_mat, (((0,), (0,)), ((), ())),
                                   precision=_HI,
                                   preferred_element_type=jnp.float32)

    for g in range(G):
        hess = hess_ref[g]                                   # (N,N)
        grad = jnp.broadcast_to(grad_ref[g].reshape(N, 1), (N, V))
        l = jnp.broadcast_to(l_ref[g].reshape(M, 1), (M, V))
        u = jnp.broadcast_to(u_ref[g].reshape(M, 1), (M, V))
        rho = jnp.broadcast_to(rho_ref[g].reshape(M, 1), (M, V))
        inv_rho = 1.0 / rho
        finite_u = u < infty

        k0 = hess + sigma * eye + gram(rho)
        inv0 = _inverse_of(k0, mus, n_quad, n_hi)

        # ---- ADMM iterations (solver/admm.py:_iterate) ----
        def body(_, carry):
            x, z, y = carry
            rhs = sigma * x - grad + apply_at(rho * z - y)
            x_t = matvec_sym(inv0, rhs)
            z_t = apply_a(x_t)
            x_new = alpha_rx * x_t + (1.0 - alpha_rx) * x
            z_relax = alpha_rx * z_t + (1.0 - alpha_rx) * z
            z_new = jnp.clip(z_relax + inv_rho * y, l, u)
            y_new = y + rho * (z_relax - z_new)
            return (x_new, z_new, y_new)

        init = (jnp.zeros((N, V), jnp.float32),
                jnp.zeros((M, V), jnp.float32),
                jnp.zeros((M, V), jnp.float32))
        x, z, y = jax.lax.fori_loop(0, n_iter, body, init)

        # ---- active-set polish (solver/admm.py:_polish) ----
        def viol(vec):
            av = apply_a(vec)
            per = jnp.maximum(l - av, jnp.where(finite_u, av - u, -1.0))
            return jnp.max(per[:, 0])

        lo = (z - l) < act_tol
        hi = finite_u & ((u - z) < act_tol)
        y_al = jnp.where(lo | hi, y, 0.0)
        best_x = x
        best_v = jnp.maximum(viol(x), 0.0)

        for _ in range(polish_rounds):
            act = lo | hi
            bound = jnp.where(lo, l, jnp.where(hi & finite_u, u, 0.0))
            w = jnp.where(act, w_act, 0.0)
            kp = hess + sigma * eye + gram(w)
            invp = _inverse_of(kp, mus, n_quad, n_hi)
            y_act = jnp.where(act, y_al, 0.0)
            b = -grad + apply_at(w * bound - y_act)
            x_p = matvec_sym(invp, b)
            for _r in range(2):                              # iterative refinement
                r = b - matvec_sym(kp, x_p)
                x_p = x_p + matvec_sym(invp, r)
            ax = apply_a(x_p)
            y_new = y_act + w * (ax - bound)
            finite_p = jnp.all(jnp.isfinite(x_p[:, 0]))
            v_p = jnp.where(finite_p, viol(x_p), jnp.inf)
            take = v_p < best_v
            best_x = jnp.where(take, x_p, best_x)
            best_v = jnp.minimum(v_p, best_v)
            lo = (lo & (y_new <= 1e-9)) | (ax < l - 1e-6)
            hi = (hi & (y_new >= -1e-9)) | (finite_u & (ax > u + 1e-6))
            y_al = jnp.where(lo | hi, y_new, 0.0)

        final = best_x if polish_rounds > 0 else x
        out_ref[g] = final[:, 0]


def fused_admm_solve(a_dense, hess, grad, l, u, rho, *,
                     mus_a0=1e-5, n_scaled=9, n_quad=2, n_hi=2,
                     n_iter=250, polish_rounds=4, sigma=1e-6,
                     alpha_rx=1.6, w_act=1e4, act_tol=1e-4, infty=1e10,
                     interpret=False):
    """Solve B box-pyramid QPs fully in VMEM.

    a_dense: (M,N) shared padded constraint matrix (zero rows as padding).
    hess: (B,N,N) padded with identity diagonal on padding dims.
    grad: (B,N); l,u,rho: (B,M) with padding rows l=u=0, rho=1.
    Returns x: (B,N). B must be a multiple of G (pad with identity systems).
    """
    b = hess.shape[0]
    assert b % G == 0 and hess.shape[-1] == N and a_dense.shape == (M, N)
    total_ns = (n_scaled + n_quad + n_hi) * (1 + polish_rounds)
    kernel = functools.partial(
        _kernel, mu_schedule(mus_a0, n_scaled), n_quad, n_hi, n_iter,
        polish_rounds, sigma, alpha_rx, w_act, act_tol, infty,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // G,),
        in_specs=[
            pl.BlockSpec((M, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (total_ns * 2 + 2 * (1 + polish_rounds)) * N**3
            + 2 * b * n_iter * (2 * M * N + N * N),
            bytes_accessed=b * (N * N + 3 * M + 2 * N) * 4 + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_dense, a_dense.T, hess, grad, l, u, rho)
