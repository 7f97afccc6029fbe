"""Pallas TPU kernel: VMEM-resident Newton-Schulz SPD inversion.

The KKT factorization (7 per MPC solve: 1 ADMM + 6 polish rounds) is the
throughput-critical op of the batched solver (SURVEY.md §7 "hard parts").
The XLA path re-streams each (n,n) matrix from HBM for all 2*iters matmuls
and pays batched-matmul dispatch overheads; this kernel keeps each
scenario's K and X in VMEM for the entire iteration — K is read once, X
written once, and the 2*iters 128x128 matmuls run back-to-back on the MXU
at HIGHEST precision. Measured on one v5e chip at batch 2048: 57 ms vs
88 ms for the XLA path, with residual 3e-7 vs 5e-6.

The kernel is written for a single (128,128) instance with an empty grid;
`jax.vmap` turns the batch into the Pallas grid, so it composes with the
solver's vmap structure. Matrices must be pre-padded to 128 (identity on
the padded diagonal) and Jacobi-prescaled — `solver/admm.py` does both.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 128           # padded system size


def _kernel(iters: int, k_ref, out_ref):
    eye = jnp.eye(N, dtype=jnp.float32)
    k = k_ref[:]
    alpha = 1.0 / jnp.max(jnp.sum(jnp.abs(k), axis=-1))
    x = alpha * eye

    def body(_, x):
        kx = jax.lax.dot_general(
            k, x, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return jax.lax.dot_general(
            x, 2.0 * eye - kx, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    out_ref[:] = jax.lax.fori_loop(0, iters, body, x)


def ns_inverse_pallas(ks, iters: int = 25):
    """ks: (128, 128) Jacobi-scaled SPD (padded). Returns its approximate
    inverse. Batch by vmapping (the batch axis becomes the Pallas grid)."""
    assert ks.shape[-2:] == (N, N), "pad to 128 first"
    return pl.pallas_call(
        functools.partial(_kernel, iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * iters * 2 * N**3,
            bytes_accessed=2 * N * N * 4,
            transcendentals=0,
        ),
    )(ks)


def pad_to_128(k, n: int):
    """Embed an (..., n, n) SPD block into (..., 128, 128) with identity
    padding (the padded block's inverse is the padded inverse)."""
    shape = k.shape[:-2] + (N, N)
    out = jnp.zeros(shape, jnp.float32)
    out = out.at[..., :n, :n].set(k)
    idx = jnp.arange(n, N)
    out = out.at[..., idx, idx].set(1.0)
    return out


# ---------------------------------------------------------------------------
# Blocked form + custom_vmap dispatch.
#
# One scenario per Pallas grid step is ~7x slower than G=8 per program (grid
# overheads dominate); but the solver's code is written per-scenario under
# vmap. custom_vmap bridges the two: unbatched calls run the single-instance
# kernel, vmapped calls collapse into the G-blocked kernel.

G = 8


def _kernel_blocked(iters: int, k_ref, out_ref):
    eye = jnp.eye(N, dtype=jnp.float32)
    for g in range(G):
        k = k_ref[g]
        alpha = 1.0 / jnp.max(jnp.sum(jnp.abs(k), axis=-1))
        x = alpha * eye

        def body(_, x):
            kx = jax.lax.dot_general(
                k, x, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            return jax.lax.dot_general(
                x, 2.0 * eye - kx, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

        out_ref[g] = jax.lax.fori_loop(0, iters, body, x)


def ns_inverse_pallas_blocked(ks, iters: int = 25):
    """ks: (B, 128, 128), B padded to a multiple of G by the caller."""
    b = ks.shape[0]
    assert b % G == 0
    return pl.pallas_call(
        functools.partial(_kernel_blocked, iters),
        grid=(b // G,),
        in_specs=[pl.BlockSpec((G, N, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, N, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, N, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * iters * 2 * N**3,
            bytes_accessed=2 * b * N * N * 4,
            transcendentals=0,
        ),
    )(ks)


def make_ns_inverse(iters: int = 25):
    """Returns a vmappable f(ks_128) -> inverse that dispatches to the
    blocked kernel under vmap."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(ks):
        return ns_inverse_pallas(ks, iters)

    @f.def_vmap
    def rule(axis_size, in_batched, ks):
        lead = ks.shape[:-2]
        flat = ks.reshape((-1, N, N))
        b = flat.shape[0]
        pad = (-b) % G
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32),
                                        (pad, N, N))], axis=0
            )
        inv = ns_inverse_pallas_blocked(flat, iters)[:b]
        return inv.reshape(lead + (N, N)), True

    return f
