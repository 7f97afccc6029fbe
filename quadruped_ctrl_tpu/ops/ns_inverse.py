"""Pallas TPU kernel: VMEM-resident Newton-Schulz SPD inversion.

The KKT factorization (5 per cold MPC solve: 2 ADMM-phase incl. the
adaptive-rho refactorization + 3 polish rounds) is the throughput-critical
op of the batched solver (SURVEY.md §7 "hard parts").
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

N = 128           # default padded system size (n <= 128, e.g. packed h=10)
N_BIG = 256       # large tile (128 < n <= 256, e.g. the full h=16 problem)


def pad_sizes(n: int) -> int:
    """Smallest supported kernel tile for an n-variable system. Lane
    dimensions must be multiples of 128 on TPU, so the tiles are 128/256."""
    if n <= N:
        return N
    assert n <= N_BIG, f"system size {n} exceeds the {N_BIG} kernel tile"
    return N_BIG


def _kernel(iters: int, k_ref, out_ref):
    eye = jnp.eye(k_ref.shape[-1], dtype=jnp.float32)
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


def ns_inverse_pallas(ks, iters: int = 25, interpret: bool = False):
    """ks: (n_pad, n_pad) Jacobi-scaled SPD (padded to a supported tile).
    Returns its approximate inverse. Batch by vmapping (the batch axis
    becomes the Pallas grid)."""
    npad = ks.shape[-1]
    assert ks.shape[-2:] in ((N, N), (N_BIG, N_BIG)), "pad to 128/256 first"
    return pl.pallas_call(
        functools.partial(_kernel, iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, npad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * iters * 2 * npad**3,
            bytes_accessed=2 * npad * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ks)


def pad_to(k, n: int, n_pad: int | None = None):
    """Embed an (..., n, n) SPD block into (..., n_pad, n_pad) with identity
    padding (the padded block's inverse is the padded inverse)."""
    n_pad = pad_sizes(n) if n_pad is None else n_pad
    shape = k.shape[:-2] + (n_pad, n_pad)
    out = jnp.zeros(shape, jnp.float32)
    out = out.at[..., :n, :n].set(k)
    idx = jnp.arange(n, n_pad)
    out = out.at[..., idx, idx].set(1.0)
    return out


def pad_to_128(k, n: int):
    return pad_to(k, n, N)


# ---------------------------------------------------------------------------
# Blocked form + custom_vmap dispatch.
#
# One scenario per Pallas grid step is ~7x slower than G=8 per program (grid
# overheads dominate); but the solver's code is written per-scenario under
# vmap. custom_vmap bridges the two: unbatched calls run the single-instance
# kernel, vmapped calls collapse into the G-blocked kernel.

G = 8


def _kernel_blocked(iters: int, k_ref, out_ref):
    eye = jnp.eye(k_ref.shape[-1], dtype=jnp.float32)
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


def ns_inverse_pallas_blocked(ks, iters: int = 25, interpret: bool = False):
    """ks: (B, n_pad, n_pad), B padded to a multiple of G by the caller."""
    b, npad = ks.shape[0], ks.shape[-1]
    assert b % G == 0
    return pl.pallas_call(
        functools.partial(_kernel_blocked, iters),
        grid=(b // G,),
        in_specs=[pl.BlockSpec((G, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, npad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * iters * 2 * npad**3,
            bytes_accessed=2 * b * npad * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ks)


# ---------------------------------------------------------------------------
# Mixed-precision scaled Newton-Schulz.
#
# Two orthogonal accelerations over the plain HIGHEST-precision kernel,
# together ~2x (37.9 ms vs 76.7 ms at batch 2048 on one v5e, same 1.4e-4
# residual):
#
# 1. *bf16x3 matmuls.* HIGHEST f32 on the MXU costs 6 bf16 passes; splitting
#    each operand into bf16 hi+lo parts and summing the three significant
#    cross products (hi*hi + hi*lo + lo*hi) costs 3 passes at ~1e-6 relative
#    error. NS is self-correcting, so all but the last couple of iterations
#    tolerate this; a short HIGHEST tail then squares the error down to the
#    f32 floor. (Pure bf16 diverges: cond ~4e3 times bf16's 0.8% rounding
#    exceeds the ||I - KX|| < 1 convergence region.)
#
# 2. *Scaled iterations.* Cold-start NS spends most iterations doubling the
#    smallest eigenvalue of KX toward 1 (residual 1-a -> (1-a)^2, i.e.
#    a -> 2a). With the spectrum in [a, 1], the scaled step
#    X <- mu X (2I - mu K X), mu = 2/(1+a), maps the interval to
#    [~4a/(1+a)^2, 1] — the lower bound *quadruples* per iteration. A fixed
#    mu schedule derived from a worst-case a0 (underestimating a0 is safe,
#    merely suboptimal) reaches the quadratic phase in half the iterations:
#    9 scaled + 2 quadratic bf16x3 + 2 HIGHEST = 13 total vs 25.

_BF16 = jnp.bfloat16


def _split(a):
    """f32 -> (bf16 hi, bf16 lo) with a ~= hi + lo."""
    hi = a.astype(_BF16)
    lo = (a - hi.astype(jnp.float32)).astype(_BF16)
    return hi, lo


def _mm3(a_hi, a_lo, b):
    """bf16x3 matmul (XLA's Precision.HIGH, which Pallas doesn't expose):
    3 MXU passes with f32 accumulation, ~1e-6 relative error.

    precision is pinned to DEFAULT: bf16 operands with an inherited HIGHEST
    contract precision (e.g. under jax.default_matmul_precision("highest"))
    are a Mosaic compile error ("Bad lhs type") — and single-pass IS the
    point of the bf16 split."""
    b_hi, b_lo = _split(b)
    dn = (((1,), (0,)), ((), ()))
    kw = dict(precision=jax.lax.Precision.DEFAULT,
              preferred_element_type=jnp.float32)
    acc = jax.lax.dot_general(a_hi, b_hi, dn, **kw)
    acc += jax.lax.dot_general(a_hi, b_lo, dn, **kw)
    acc += jax.lax.dot_general(a_lo, b_hi, dn, **kw)
    return acc


def mu_schedule(a0: float, n_scaled: int):
    """Fixed scaling factors for the interval-[a,1] phase (host-side floats;
    baked into the kernel as constants)."""
    mus = []
    a = a0
    for _ in range(n_scaled):
        mu = 2.0 / (1.0 + a)
        mus.append(mu)
        a = min(mu * a * (2.0 - mu * a), mu * (2.0 - mu))
    return mus


def _kernel_scaled_il(mus, n_quad: int, n_hi: int, gil: int, k_ref, out_ref):
    """Interleaved scaled NS kernel: the NS step is the OUTER loop and `gil`
    systems the inner, fully unrolled — every MXU op in a group of gil is
    independent, so the systolic pipeline never stalls on the dependent-
    matmul chain that serializes a per-system loop (measured 2.07x). gil is
    bounded by scoped VMEM (16M): 8 at the 128 tile; 2 at 256 (gil=8 needs
    27.5M, gil=4 misses the limit by 180K)."""
    eye = jnp.eye(k_ref.shape[-1], dtype=jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    kw = dict(precision=jax.lax.Precision.HIGHEST,
              preferred_element_type=jnp.float32)
    for base in range(0, G, gil):
        gs = range(base, base + gil)
        ks = [k_ref[g] for g in gs]
        khl = [_split(k) for k in ks]
        xs = [
            (1.0 / jnp.max(jnp.sum(jnp.abs(k), axis=-1))) * eye for k in ks
        ]
        for mu in mus:                        # scaled, bf16x3
            kxs = [_mm3(khl[i][0], khl[i][1], xs[i]) for i in range(gil)]
            xhl = [_split(x) for x in xs]
            xs = [
                mu * _mm3(xhl[i][0], xhl[i][1], 2.0 * eye - mu * kxs[i])
                for i in range(gil)
            ]
        for _ in range(n_quad):               # quadratic, bf16x3
            kxs = [_mm3(khl[i][0], khl[i][1], xs[i]) for i in range(gil)]
            xhl = [_split(x) for x in xs]
            xs = [
                _mm3(xhl[i][0], xhl[i][1], 2.0 * eye - kxs[i])
                for i in range(gil)
            ]
        for _ in range(n_hi):                 # quadratic, HIGHEST tail
            kxs = [jax.lax.dot_general(ks[i], xs[i], dn, **kw)
                   for i in range(gil)]
            xs = [
                jax.lax.dot_general(xs[i], 2.0 * eye - kxs[i], dn, **kw)
                for i in range(gil)
            ]
        for i, g in enumerate(gs):
            out_ref[g] = xs[i]


def ns_inverse_pallas_scaled(ks, a0: float = 1e-5, n_scaled: int = 9,
                             n_quad: int = 2, n_hi: int = 1,
                             interpret: bool = False):
    """Scaled mixed-precision NS inverse. ks: (B, n_pad, n_pad)
    Jacobi-prescaled SPD, B a multiple of G, n_pad in {128, 256}. Handles
    condition numbers up to ~1/a0; the defaults match the production
    polish-grade schedule (SolverConfig.ns_scaled/quad/hi_iters — a second
    HIGHEST squaring measurably does not move the bf16x3-limited residual
    floor, see config.py:ns_hi_iters).

    Runs the INTERLEAVED kernel (_kernel_scaled_il): NS-step-outer /
    system-inner unrolling keeps groups of G independent MXU ops in flight,
    2.07x the per-system-sequential variant (6.2 ms vs 12.8 ms at B=2048,
    identical residual) whose dependent-matmul chains stall the systolic
    pipeline."""
    b, npad = ks.shape[0], ks.shape[-1]
    assert b % G == 0
    total = n_scaled + n_quad + n_hi
    gil = G if npad <= 128 else 2
    return pl.pallas_call(
        functools.partial(_kernel_scaled_il, mu_schedule(a0, n_scaled),
                          n_quad, n_hi, gil),
        grid=(b // G,),
        in_specs=[pl.BlockSpec((G, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, npad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * total * 2 * npad**3,
            bytes_accessed=2 * b * npad * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ks)


# ---------------------------------------------------------------------------
# Guard-free warm NS refinement.
#
# The polish's Woodbury path (solver/admm.py) builds an APPROXIMATE inverse
# M of each round's updated KKT system from the stored round-0 inverse plus
# a rank-r active-set correction. M is algebraically exact but f32
# cancellation leaves a STRUCTURED error whose NS residual ||I - K M|| was
# measured ~0.2 for constraint ADDITIONS (removals diverge — see the
# solver's add-only clamping note). That is the contract: the init's NS
# residual must be < 1; each iteration then squares it, so quad+hi reaches
# near the cold schedule's floor in 2 iterations instead of 12. (An
# elementwise-relative error bound is NOT sufficient: 1e-2 relative at
# cond 1e4 is NS residual ~1e-2*cond >> 1, which rightly diverges — the
# kernel is guard-free, unlike ns_inverse_pallas_warm, so callers must
# guarantee the residual bound structurally.)


def _kernel_refine(n_quad: int, n_hi: int, gil: int, k_ref, init_ref,
                   out_ref):
    """Interleaved warm NS: `gil` systems' independent MXU ops in flight per
    step (see _kernel_scaled_il)."""
    eye = jnp.eye(k_ref.shape[-1], dtype=jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    kw = dict(precision=jax.lax.Precision.HIGHEST,
              preferred_element_type=jnp.float32)
    for base in range(0, G, gil):
        gs = range(base, base + gil)
        ks = [k_ref[g] for g in gs]
        khl = [_split(k) for k in ks]
        xs = [init_ref[g] for g in gs]
        for _ in range(n_quad):                # quadratic, bf16x3
            kxs = [_mm3(khl[i][0], khl[i][1], xs[i]) for i in range(gil)]
            xhl = [_split(x) for x in xs]
            xs = [
                _mm3(xhl[i][0], xhl[i][1], 2.0 * eye - kxs[i])
                for i in range(gil)
            ]
        for _ in range(n_hi):                  # quadratic, HIGHEST tail
            kxs = [jax.lax.dot_general(ks[i], xs[i], dn, **kw)
                   for i in range(gil)]
            xs = [
                jax.lax.dot_general(xs[i], 2.0 * eye - kxs[i], dn, **kw)
                for i in range(gil)
            ]
        for i, g in enumerate(gs):
            out_ref[g] = xs[i]


def ns_inverse_pallas_refine(ks, init, n_quad: int = 1, n_hi: int = 1,
                             interpret: bool = False):
    """Warm NS refinement: ks, init (B, n_pad, n_pad), B a multiple of G,
    init in the SAME Jacobi scaling as ks with residual ||I - ks init||
    comfortably < 1 (the caller's Woodbury correction guarantees this up to
    its f32 floor). Returns the refined inverse."""
    b, npad = ks.shape[0], ks.shape[-1]
    assert b % G == 0
    # 256 tile: TWO double-buffered (G,256,256) inputs + one output leave
    # no scoped-VMEM headroom for a gil=2 working set at multi-step grids
    # (same failure class as the round-4 scaled_build crash — caught by
    # cli kernels-smoke); gil=1 fits
    gil = G if npad <= 128 else 1
    return pl.pallas_call(
        functools.partial(_kernel_refine, n_quad, n_hi, gil),
        grid=(b // G,),
        in_specs=[pl.BlockSpec((G, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, npad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (n_quad + n_hi) * 2 * npad**3,
            bytes_accessed=3 * b * npad * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ks, init)


# ---------------------------------------------------------------------------
# Warm-started NS with an in-kernel divergence guard.
#
# STATUS: correct but NOT on any production path. Measured on v5e at
# B=2048/128: warm 14.2 ms vs cold 12.9 ms — Mosaic executes BOTH sides of
# a per-system data-dependent conditional (lax.cond lowers to
# compute-and-select; pl.when regions measured identically), so the cold
# fallback is always paid and the guard matmul is pure overhead. Kept (with
# interpret-mode tests) as the candidate for hardware/toolchains where
# scalar branches genuinely skip work.
#
# A nearby system's (rescaled) inverse is a quadratic-phase starting point:
# r0 = ||I - K X0|| < guard means each bf16x3 iteration squares r down, so
# 3 quadratic + 1 HIGHEST iterations reach the schedule floor at ~40% of the
# cold mu-schedule's MXU passes. Per-system guard: if r0 >= `guard` (the
# active set changed too much — polish rounds — or rho moved a decade —
# adaptive-rho refactorizations), that system falls back to the FULL cold
# schedule in-branch, so the result is always factorization-grade.

def _kernel_warm(mus, n_quad: int, n_hi: int, n_wquad: int, n_whi: int,
                 guard: float, k_ref, init_ref, out_ref):
    npad = k_ref.shape[-1]
    eye = jnp.eye(npad, dtype=jnp.float32)

    def hi_iter(k, x):
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

    for g in range(G):
        k = k_ref[g]
        x0 = init_ref[g]
        k_hi, k_lo = _split(k)
        kx0 = _mm3(k_hi, k_lo, x0)
        r0 = jnp.max(jnp.sum(jnp.abs(eye - kx0), axis=-1))

        def quad_body(_, x):
            kx = _mm3(k_hi, k_lo, x)
            x_hi, x_lo = _split(x)
            return _mm3(x_hi, x_lo, 2.0 * eye - kx)

        # pl.when regions (not lax.cond: Mosaic lowers that to computing
        # BOTH branches + select, which costs MORE than cold — measured
        # 14.2 ms vs 12.9 cold at B=2048)
        @pl.when(r0 < guard)
        def _warm():
            x0_hi, x0_lo = _split(x0)
            x = _mm3(x0_hi, x0_lo, 2.0 * eye - kx0)   # reuses kx0
            x = jax.lax.fori_loop(0, n_wquad - 1, quad_body, x)
            out_ref[g] = jax.lax.fori_loop(
                0, n_whi, lambda _, xx: hi_iter(k, xx), x)

        @pl.when(r0 >= guard)
        def _cold():
            alpha = 1.0 / jnp.max(jnp.sum(jnp.abs(k), axis=-1))
            x = alpha * eye
            for mu in mus:
                kx = _mm3(k_hi, k_lo, x)
                x_hi, x_lo = _split(x)
                x = mu * _mm3(x_hi, x_lo, 2.0 * eye - mu * kx)
            x = jax.lax.fori_loop(0, n_quad, quad_body, x)
            out_ref[g] = jax.lax.fori_loop(
                0, n_hi, lambda _, xx: hi_iter(k, xx), x)


def ns_inverse_pallas_warm(ks, init, a0: float = 1e-5, n_scaled: int = 9,
                           n_quad: int = 2, n_hi: int = 1,
                           n_wquad: int = 3, n_whi: int = 1,
                           guard: float = 0.5, interpret: bool = False):
    """Warm-started scaled NS inverse. ks, init: (B, n_pad, n_pad); init in
    the SAME Jacobi scaling as ks (callers rescale across scalings). Systems
    whose init fails the divergence guard run the full cold schedule."""
    b, npad = ks.shape[0], ks.shape[-1]
    assert b % G == 0
    total = n_scaled + n_quad + n_hi
    return pl.pallas_call(
        functools.partial(_kernel_warm, mu_schedule(a0, n_scaled), n_quad,
                          n_hi, n_wquad, n_whi, guard),
        grid=(b // G,),
        in_specs=[pl.BlockSpec((G, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, npad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * total * 2 * npad**3,
            bytes_accessed=3 * b * npad * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ks, init)


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
        npad = ks.shape[-1]
        flat = ks.reshape((-1, npad, npad))
        b = flat.shape[0]
        pad = (-b) % G
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.broadcast_to(jnp.eye(npad, dtype=jnp.float32),
                                        (pad, npad, npad))], axis=0
            )
        inv = ns_inverse_pallas_blocked(flat, iters)[:b]
        return inv.reshape(lead + (npad, npad)), True

    return f


# ---------------------------------------------------------------------------
# Fused K-build + scaled NS factorization.
#
# Profiled on v5e (dbg, B=2048/n=120): the XLA-side KKT ASSEMBLY — the
# (B,n,n) gram-block broadcast, the hess_n add, jnp.diagonal, the Jacobi
# prescale, and the 128-tile pad — costs ~4.0 ms, as much as the entire
# mixed-precision NS schedule it feeds (~4.1 ms), and it runs once per
# factorization (2 ADMM-phase + 3 polish rounds = 5 per cold solve). Here
# the kernel receives the PADDED hess_n + sigma I once per solve plus the
# tiny per-build gram blocks (B, 9, h*nf), and builds K, Jacobi-prescales,
# and factorizes entirely in VMEM: per build the HBM traffic drops from
# ~6 full (B,n,n) streams to one read of hp (+ ks/d writes when the
# caller's solves need refinement against K).

def _kernel_scaled_build_il(mus, n_quad: int, n_hi: int, gil: int,
                            nblk: int, emit_ks: bool, hp_ref, g9_ref,
                            *out_refs):
    """Per system: K = hp + blockdiag3(gram), ks = D K D (Jacobi), then the
    interleaved scaled NS schedule (see _kernel_scaled_il).

    g9_ref[g]: (9, nblk) gram components in (z*3+z', block) order, where
    block d covers variables 3d..3d+2 (h*nf force blocks). The expansion to
    (n, n) uses iota masks + one (9, nblk)@(nblk, npad) matmul — no gathers.

    With `emit_ks` the scaled K is written out alongside the inverse (the
    caller's iterative-refinement matvecs then read it from HBM); without
    it only (inv, d_row) are emitted and the caller reconstructs K matvecs
    from hp + the gram blocks. At the 256 tile the extra double-buffered
    (G,256,256) output is what pushed the kernel over the 16M scoped-VMEM
    limit (BENCH_r04 crash), so 256 runs emit_ks=False.
    """
    if emit_ks:
        inv_ref, ks_ref, d_ref = out_refs
    else:
        inv_ref, d_ref = out_refs
    npad = hp_ref.shape[-1]
    eye = jnp.eye(npad, dtype=jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    kw = dict(precision=jax.lax.Precision.HIGHEST,
              preferred_element_type=jnp.float32)
    # iota-built masks (shared across systems). The z-pattern masks are
    # rank-1: (npad,1) row-phase selectors x (1,npad) column vectors — the
    # six full (npad,npad) z-masks of the round-4 kernel were ~1.5M of
    # resident scratch that the 256 tile cannot afford.
    rd = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 0)
    cd = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
    blockmask = ((rd // 3) == (cd // 3)).astype(jnp.float32)
    rz = jax.lax.broadcasted_iota(jnp.int32, (npad, 1), 0) % 3
    cz = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1) % 3
    rowsel = [(rz == z).astype(jnp.float32) for z in range(3)]    # (npad,1)
    colsel = [(cz == z).astype(jnp.float32) for z in range(3)]    # (1,npad)
    # E[d, a] = (a//3 == d): expands per-block values to lanes
    ed = jax.lax.broadcasted_iota(jnp.int32, (nblk, npad), 0)
    ea = jax.lax.broadcasted_iota(jnp.int32, (nblk, npad), 1)
    e_exp = ((ea // 3) == ed).astype(jnp.float32)

    for base in range(0, G, gil):
        gs = range(base, base + gil)
        kss = []
        ds_row = []
        for g in gs:
            gexp = jax.lax.dot_general(g9_ref[g], e_exp, dn, **kw)  # (9,npad)
            # delta[r,c] = gexp[3*(r%3)+(c%3), c]: per row-phase z, the
            # column vector m_z[c] = gexp[3z+(c%3), c] broadcast to rows
            delta = jnp.zeros((npad, npad), jnp.float32)
            for z in range(3):
                m_z = (colsel[0] * gexp[3 * z + 0][None, :]
                       + colsel[1] * gexp[3 * z + 1][None, :]
                       + colsel[2] * gexp[3 * z + 2][None, :])   # (1,npad)
                delta = delta + rowsel[z] * m_z
            k = hp_ref[g] + blockmask * delta
            dcol = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(k * eye, axis=1, keepdims=True), 1e-30))   # (npad,1)
            drow = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(k * eye, axis=0, keepdims=True), 1e-30))   # (1,npad)
            ks = k * dcol * drow
            kss.append(ks)
            ds_row.append(drow)
        khl = [_split(k) for k in kss]
        xs = [
            (1.0 / jnp.max(jnp.sum(jnp.abs(k), axis=-1))) * eye for k in kss
        ]
        for mu in mus:                        # scaled, bf16x3
            kxs = [_mm3(khl[i][0], khl[i][1], xs[i]) for i in range(gil)]
            xhl = [_split(x) for x in xs]
            xs = [
                mu * _mm3(xhl[i][0], xhl[i][1], 2.0 * eye - mu * kxs[i])
                for i in range(gil)
            ]
        for _ in range(n_quad):               # quadratic, bf16x3
            kxs = [_mm3(khl[i][0], khl[i][1], xs[i]) for i in range(gil)]
            xhl = [_split(x) for x in xs]
            xs = [
                _mm3(xhl[i][0], xhl[i][1], 2.0 * eye - kxs[i])
                for i in range(gil)
            ]
        for _ in range(n_hi):                 # quadratic, HIGHEST tail
            kxs = [jax.lax.dot_general(kss[i], xs[i], dn, **kw)
                   for i in range(gil)]
            xs = [
                jax.lax.dot_general(xs[i], 2.0 * eye - kxs[i], dn, **kw)
                for i in range(gil)
            ]
        for i, g in enumerate(gs):
            inv_ref[g] = xs[i]
            if emit_ks:
                ks_ref[g] = kss[i]
            d_ref[g, 0] = ds_row[i][0]


def ns_inverse_pallas_scaled_build(hp, g9, a0: float = 1e-5,
                                   n_scaled: int = 9, n_quad: int = 2,
                                   n_hi: int = 1, emit_ks: bool | None = None,
                                   interpret: bool = False):
    """Fused K-build + scaled NS inverse.

    hp: (B, n_pad, n_pad) hess_n + sigma I, 128/256-padded with identity
    diagonal on the pad; g9: (B, 9, nblk) gram blocks (pyramid_gram output
    transposed to component-major). B a multiple of G. Returns
    (inv, ks, d_row) with d_row (B, 1, n_pad) the Jacobi scale; inv and ks
    are in the scaled space (K^-1 = d inv d, as _batched_solver uses them).

    `emit_ks` defaults to True at the 128 tile and False at 256: the second
    double-buffered (G,256,256) output put the kernel ~5M over the 16M
    scoped-VMEM limit at production batch (the BENCH_r04 crash); without it
    ks is returned as None and callers reconstruct K matvecs from (hp, g9)
    on the XLA side (_batched_solver_fused does).
    """
    b, npad = hp.shape[0], hp.shape[-1]
    nblk = g9.shape[-1]
    assert b % G == 0
    if emit_ks is None:
        emit_ks = npad <= 128
    total = n_scaled + n_quad + n_hi
    gil = G if npad <= 128 else 2
    big_spec = pl.BlockSpec((G, npad, npad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((G, 1, npad), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    big_shape = jax.ShapeDtypeStruct((b, npad, npad), jnp.float32)
    d_shape = jax.ShapeDtypeStruct((b, 1, npad), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel_scaled_build_il, mu_schedule(a0, n_scaled),
                          n_quad, n_hi, gil, nblk, emit_ks),
        grid=(b // G,),
        in_specs=[big_spec,
                  pl.BlockSpec((G, 9, nblk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=((big_spec, big_spec, d_spec) if emit_ks
                   else (big_spec, d_spec)),
        out_shape=((big_shape, big_shape, d_shape) if emit_ks
                   else (big_shape, d_shape)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * total * 2 * npad**3,
            bytes_accessed=(3 if emit_ks else 2) * b * npad * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(hp, g9)
    if emit_ks:
        return out
    inv, d_row = out
    return inv, None, d_row


# ---------------------------------------------------------------------------
# Schur-split inverse for 128 < n <= 192 (ADMM-grade systems only).
#
# The 256 lane tile costs 8x the per-matmul MXU flops of the 128 tile, yet
# the h=16 lanes' logical systems are only 144 (ms=3 midband) or 192 vars.
# For the WELL-CONDITIONED ADMM-phase K (measured Jacobi-scaled cond 14..213
# at the adaptive-rho clip floor, config.py:160-167 — NOT the polish-round
# K, whose w_act=1e4 active-set weighting reaches cond ~1e5+ and keeps the
# full 256 path) a 2x2 block factorization at the 128 boundary is both
# faster and at least as accurate:
#
#   K = [[A, B], [B', D]],  A (128,128), D (m,m), m = n-128 in {16, 64}
#   K^-1 assembled from  A^-1 (128-tile Pallas NS kernel),
#   S = D - B' A^-1 B (m x m Schur complement, SPD, cond(S) <= cond(K) by
#   eigenvalue interlacing), S^-1 (tiny batched XLA NS — m^3 flops are
#   negligible), then ONE plain-XLA NS scrub iteration at the logical n to
#   square away the f32 assembly cancellation.
#
# Measured on v5e at B=2048, ADMM schedule, vs ns_inverse_pallas_scaled at
# the 256 tile (experiments/schur_split_probe.py -> SCHUR_PROBE_r05.json):
#   n=144: 13.5 ms vs 31.9 ms (2.37x), resid 2.4e-5 vs 2.9e-5
#   n=192: 23.2 ms vs 33.6 ms (1.45x), resid 2.6e-5 vs 3.3e-5
# and at cond 1e3 (~5x margin over the measured worst case) the scrubbed
# residual is 3.5e-4 / 3.1e-4 — better than the 256-tile kernel's own
# 1.3e-3 / 3.4e-3 there. Without the scrub the assembly error is ~cond*eps
# (1.4e-3 at cond 213), and at polish conditioning (1e5+) it exceeds the
# NS convergence region entirely — hence the ADMM-grade-only gate.

def _xla_ns_small(ss, iters: int):
    """Batched tiny-block NS inverse in plain XLA ((B, m, m), m <= 64).

    The m^3 matmuls are far below a lane tile — total flops are negligible
    next to the 128-tile kernel call, so MXU efficiency is irrelevant here.
    """
    m = ss.shape[-1]
    eye = jnp.eye(m, dtype=ss.dtype)
    d = jax.lax.rsqrt(
        jnp.maximum(jnp.diagonal(ss, axis1=-2, axis2=-1), 1e-30))
    sshat = ss * d[:, :, None] * d[:, None, :]
    alpha = 1.0 / jnp.max(jnp.sum(jnp.abs(sshat), axis=-1), axis=-1)
    x = alpha[:, None, None] * jnp.broadcast_to(eye, sshat.shape)

    def body(x, _):
        kx = jnp.matmul(sshat, x, precision=jax.lax.Precision.HIGHEST)
        return jnp.matmul(x, 2.0 * eye - kx, precision=jax.lax.Precision.HIGHEST), None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x * d[:, :, None] * d[:, None, :]


def ns_inverse_schur_scaled(ks, a0: float = 5e-4, n_scaled: int = 6,
                            n_quad: int = 2, n_hi: int = 1,
                            n_small: int = 13, n_scrub: int = 1,
                            interpret: bool = False):
    """Schur-split NS inverse of Jacobi-scaled SPD ks (B, n, n),
    128 < n <= 192. Returns the (B, n, n) inverse at the LOGICAL size (no
    256 padding). See the block comment above for the algorithm, the
    accuracy contract (ADMM-grade conditioning only), and measured numbers.
    Any batch size (G-pads the A block internally)."""
    b, n = ks.shape[0], ks.shape[-1]
    assert 128 < n <= 192, n
    a = ks[:, :128, :128]
    bb = ks[:, :128, 128:]
    dd = ks[:, 128:, 128:]
    pad_b = (-b) % G
    if pad_b:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(128, dtype=jnp.float32),
                                 (pad_b, 128, 128))], axis=0)
    # pass interpret only when set, so a test monkeypatch that pins the
    # kernel entry points to interpret mode is not overridden
    kw = {"interpret": True} if interpret else {}
    ainv = ns_inverse_pallas_scaled(a, a0, n_scaled, n_quad, n_hi, **kw)[:b]
    aib = jnp.matmul(ainv, bb, precision=jax.lax.Precision.HIGHEST)
    s = dd - jnp.matmul(bb.transpose(0, 2, 1), aib, precision=jax.lax.Precision.HIGHEST)
    sinv = _xla_ns_small(s, n_small)
    aib_sinv = jnp.matmul(aib, sinv, precision=jax.lax.Precision.HIGHEST)
    tl = ainv + jnp.matmul(aib_sinv, aib.transpose(0, 2, 1),
                           precision=jax.lax.Precision.HIGHEST)
    x = jnp.concatenate([
        jnp.concatenate([tl, -aib_sinv], axis=2),
        jnp.concatenate([-aib_sinv.transpose(0, 2, 1), sinv], axis=2),
    ], axis=1)
    eye = jnp.eye(n, dtype=ks.dtype)
    for _ in range(n_scrub):
        kx = jnp.matmul(ks, x, precision=jax.lax.Precision.HIGHEST)
        x = jnp.matmul(x, 2.0 * eye - kx, precision=jax.lax.Precision.HIGHEST)
    return x
