"""Pallas TPU kernel: fused packed condensed-MPC formation.

Builds the stance-compressed, block-diagonally PACKED QP cost
    H_pair = 2 (bq_pair' bq_pair + alpha I),   g_pair = 2 bq_pair' r_pair
for `pack` scenarios per system directly in VMEM — the role of the
reference's dense qH/qg assembly (SolverMPC.cpp:395-399) for the packed
solver layout (pipeline.solve_packed_batch).

Why a kernel (SURVEY.md §7 step 9 named the formation the first Pallas
target next to the ADMM iterate): the XLA path materializes the
(B,h,13,n_c) stacked prediction matrix bq in HBM (~128 MB at the bench
shape), re-reads it for the Gram and gradient contractions, and then
re-streams the per-scenario Hessians once more to embed them block-
diagonally — ~0.5 GB of HBM for ~8 GFLOP of MXU work, measured 1.6 % of
the MXU bound. Here each pair's bq never leaves VMEM: the kernel receives
only the tiny per-scenario operands (the sqrt-S-scaled nilpotent B-family,
the stance selection matrix, the weighted reference residual), expands bq
with the static Toeplitz polynomial coefficients, and emits the packed
(n_pair, n_pair) Hessian + gradient with one MXU Gram per pair.

Inputs (per scenario, batch leading):
  bfam_s (B, 3, 13, 12)  — sqrt(w)-scaled [Bdt, N Bdt, N^2 Bdt]
                            (formation._nil_family, rows p scaled)
  smat   (B, 12, n_c)    — stance selection kron I3: smat[(f,z),(c,j,z')]
                            = sel[c,j,f] * (z==z')
  r      (B, 13h)        — (A^k x0 - x_d) * sqrt(step_mask) * sqrt(w),
                            (x,p) row order
  smask  (B, h)          — sqrt(step_mask) (row scaling of bq)

Outputs (per packed system): hess (B/pack, n_pair, n_pair),
grad (B/pack, n_pair) with n_pair = pack * n_c, n_c = 3*ms*h.

The Toeplitz coefficients phi_m(x-c) (formation._phi_polys) are baked in
as compile-time constants. All matmuls run at HIGHEST f32 precision —
bit-comparable to the XLA reference path up to reassociation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST
_DN = (((1,), (0,)), ((), ()))


def pair_tile(n_pair: int) -> int:
    """Kernel lane tile for an n_pair-variable packed system (cf.
    ns_inverse.pad_sizes): 128 or 256."""
    if n_pair <= 128:
        return 128
    assert n_pair <= 256, f"packed system size {n_pair} exceeds 256"
    return 256


def _kernel(h: int, ms: int, pack: int, gp: int, alpha: float,
            bfam_ref, smat_ref, r_ref, smask_ref,
            hess_ref, grad_ref, sc_ref, rp_ref):
    """gp pairs per program, pair p fully independent (its own scratch
    slice), so the MXU ops of different pairs pipeline.

    sc_ref: (gp, pack*rows_s, npad) — pair p's block-diagonal bq with each
    scenario's 13h rows padded to a sublane-aligned rows_s stride (the pad
    rows stay zero and drop out of the Gram). rp_ref: (gp, 8, pack*rows_s)
    — row 0 holds the stacked weighted residual r_pair."""
    n_c = 3 * ms * h
    n_pair = pack * n_c
    rows = 13 * h
    rows_s = (sc_ref.shape[-2]) // pack
    # iota-built operators (Pallas kernels cannot capture array constants):
    # T tiles the (13, n_c) u vertically h times (row r picks u[r % 13]);
    # Tx looks rows up by step (row r -> one-hot of r // 13, zero on pad
    # rows, which also masks them out of bq); the P_m are the Toeplitz
    # polynomial coefficients phi_m(x(row) - step(lane)).
    # Toeplitz coefficients phi_m(k), k = x - step(lane): computed from an
    # iota (Pallas kernels cannot capture array constants). step(lane) =
    # lane // (3*ms) for the (c, j, z) column order.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_c), 1)
    cstep = (lane // (3 * ms)).astype(jnp.float32)
    eyep = jnp.eye(n_pair, dtype=jnp.float32)

    sc_ref[:] = jnp.zeros(sc_ref.shape, jnp.float32)
    rp_ref[:] = jnp.zeros(rp_ref.shape, jnp.float32)
    for g in range(gp):
        for i in range(pack):
            idx = g * pack + i
            # u_m = bfam_s[m] @ smat: (13,12)@(12,n_c), the one-hot stance
            # selection as an MXU contraction (lane gathers are slower)
            us = [
                jax.lax.dot_general(
                    bfam_ref[idx, m], smat_ref[idx], _DN,
                    precision=_HI, preferred_element_type=jnp.float32,
                )
                for m in range(3)
            ]
            # bq rows for step x: sum_m phi_m(x-c) * u_m, scaled by
            # sqrt(step_mask[x]); written into the pair's diagonal block
            for x in range(h):
                mx = smask_ref[idx, x, 0]
                k = float(x) - cstep
                tri = (k >= 0.0).astype(jnp.float32)
                bqx = (tri * us[0]
                       + (k * tri) * us[1]
                       + (0.5 * k * (k - 1.0) * tri) * us[2])
                sc_ref[g, i * rows_s + x * 13: i * rows_s + (x + 1) * 13,
                       i * n_c: (i + 1) * n_c] = mx * bqx
            rp_ref[g, 0, i * rows_s: i * rows_s + rows] = r_ref[idx, 0]
        # one Gram per pair: H = 2 (bq_pair' bq_pair + alpha I). bf16x3
        # (3 MXU passes, ~1e-6 relative — the NS kernels' trick) instead of
        # HIGHEST (6 passes): the Gram is this kernel's FLOP bulk, and the
        # downstream solver Jacobi-prescales + iteratively refines, so 1e-6
        # on H is far below the solve's own floor.
        bq = sc_ref[g]
        bq_hi = bq.astype(jnp.bfloat16)
        bq_lo = (bq - bq_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dt_ = (((0,), (0,)), ((), ()))
        kw = dict(precision=jax.lax.Precision.DEFAULT,
                  preferred_element_type=jnp.float32)
        mm = jax.lax.dot_general(bq_hi, bq_hi, dt_, **kw)
        mm += jax.lax.dot_general(bq_hi, bq_lo, dt_, **kw)
        mm += jax.lax.dot_general(bq_lo, bq_hi, dt_, **kw)
        gv = jax.lax.dot_general(
            rp_ref[g, 0:1, :], bq, _DN,
            precision=_HI, preferred_element_type=jnp.float32,
        )
        hess_ref[g] = 2.0 * mm[:n_pair, :n_pair] + (2.0 * alpha) * eyep
        grad_ref[g, 0] = 2.0 * gv[0, :n_pair]


def form_packed_pallas(bfam_s, smat, r, smask, h: int, ms: int, pack: int,
                       alpha: float, interpret: bool = False):
    """Packed QP cost via the fused VMEM formation kernel.

    bfam_s (B,3,13,12), smat (B,12,n_c), r (B,13h), smask (B,h); B must be
    divisible by pack. Returns (hess (B/pack, n_pair, n_pair),
    grad (B/pack, n_pair))."""
    b = bfam_s.shape[0]
    n_c = 3 * ms * h
    n_pair = pack * n_c
    rows = 13 * h
    rows_s = -(-rows // 8) * 8      # per-scenario sublane-aligned row stride
    npad = pair_tile(n_pair)
    assert b % pack == 0
    n_sys = b // pack
    gp = 8 if npad <= 128 else 4
    pad_sys = (-n_sys) % gp
    smask_c = smask[..., None]                               # (B, h, 1)
    r3 = r[:, None, :]                                       # (B, 1, 13h)
    if pad_sys:
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad_sys * pack,) + a.shape[1:], a.dtype)], axis=0)
        bfam_s, smat, r3, smask_c = map(zpad, (bfam_s, smat, r3, smask_c))
        n_sys_p = n_sys + pad_sys
    else:
        n_sys_p = n_sys

    hess, grad = pl.pallas_call(
        functools.partial(_kernel, h, ms, pack, gp, alpha),
        grid=(n_sys_p // gp,),
        in_specs=[
            pl.BlockSpec((gp * pack, 3, 13, 12), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gp * pack, 12, n_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gp * pack, 1, rows), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gp * pack, h, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((gp, n_pair, n_pair), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gp, 1, n_pair), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_sys_p, n_pair, n_pair), jnp.float32),
            jax.ShapeDtypeStruct((n_sys_p, 1, n_pair), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((gp, pack * rows_s, npad), jnp.float32),
            pltpu.VMEM((gp, 8, pack * rows_s), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_sys_p * 2 * (pack * rows_s) * npad * npad,
            bytes_accessed=n_sys_p * (pack * (468 + 12 * n_c + rows + h)
                                      + n_pair * n_pair + n_pair) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bfam_s, smat, r3, smask_c)
    return hess[:n_sys], grad[:n_sys, 0, :]
