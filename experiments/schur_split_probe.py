"""Probe: Schur-complement factorization for 128 < n <= 192 systems.

The h=16 lanes (192-var full, 144-var ms=3 midband) currently factorize in
the 256 NS lane tile, paying 8x the per-matmul MXU flops of the 128 tile
(BENCH_r05_builder.json h16 lanes; TPU_LANE_r05.txt: 26.45 ms vs 54.47 ms
single-dispatch incl ~20 ms transport). Idea: split the Jacobi-scaled SPD
K = [[A, B], [B^T, D]] at 128 — NS-invert A in the 128 tile (Pallas), form
the m x m Schur complement S = D - B^T A^-1 B (m = n-128 in {16, 64}),
invert S with a tiny XLA-side NS (batched m x m matmuls, trivial flops),
assemble K^-1 blockwise, and optionally scrub the f32 assembly error with
a 2-iteration 256-tile refine (ns_inverse_pallas_refine).

Compares, at B=2048 on the real chip (bench.py chained-reps methodology):
  a) current: pad to 256, ns_inverse_pallas_scaled          (baseline)
  b) schur:   128-tile NS + XLA Schur assembly              (no scrub)
  c) schur+r: b) + ns_inverse_pallas_refine(quad=1, hi=1)   (scrubbed)
and reports max-over-batch NS residual ||I - K X||_inf plus the refine=2
solve error vs float64 ground truth for each.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from quadruped_ctrl_tpu.ops import ns_inverse as NI

_HI = lax.Precision.HIGHEST


def spd_batch(seed, b, n, cond):
    """Jacobi-scaled (unit-diagonal) SPD batch with condition ~cond."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((b, n, n)))
    lam = np.exp(np.linspace(0.0, np.log(cond), n))[None, :] * (
        1.0 + 0.1 * rng.random((b, n))
    )
    k = np.einsum("bij,bj,bkj->bik", q, lam, q)
    d = 1.0 / np.sqrt(np.diagonal(k, axis1=-2, axis2=-1))
    ks = k * d[:, :, None] * d[:, None, :]
    return jnp.asarray(ks.astype(np.float32)), k, d


def xla_ns_small(ss, iters=13):
    """Tiny-block NS inverse in plain XLA (batched (B,m,m) matmuls)."""
    m = ss.shape[-1]
    eye = jnp.eye(m, dtype=ss.dtype)
    d = lax.rsqrt(jnp.maximum(jnp.diagonal(ss, axis1=-2, axis2=-1), 1e-30))
    sshat = ss * d[:, :, None] * d[:, None, :]
    alpha = 1.0 / jnp.max(jnp.sum(jnp.abs(sshat), axis=-1), axis=-1)
    x = alpha[:, None, None] * jnp.broadcast_to(eye, sshat.shape)

    def body(x, _):
        kx = jnp.matmul(sshat, x, precision=_HI)
        return jnp.matmul(x, 2.0 * eye - kx, precision=_HI), None

    x, _ = lax.scan(body, x, None, length=iters)
    return x * d[:, :, None] * d[:, None, :]


def schur_inverse(ks, n, scrub: bool, schedule=None, xscrub: int = 0):
    """ks: (B, n, n) Jacobi-scaled SPD, 128 < n <= 192 -> (B, n, n) inverse."""
    b = ks.shape[0]
    a = ks[:, :128, :128]
    bb = ks[:, :128, 128:]
    dd = ks[:, 128:, 128:]
    if schedule is None:
        ainv = NI.ns_inverse_pallas_scaled(a)
    else:
        ainv = NI.ns_inverse_pallas_scaled(a, *schedule)
    aib = jnp.matmul(ainv, bb, precision=_HI)
    s = dd - jnp.matmul(bb.transpose(0, 2, 1), aib, precision=_HI)
    sinv = xla_ns_small(s)
    aib_sinv = jnp.matmul(aib, sinv, precision=_HI)
    tl = ainv + jnp.matmul(aib_sinv, aib.transpose(0, 2, 1), precision=_HI)
    top = jnp.concatenate([tl, -aib_sinv], axis=2)
    bot = jnp.concatenate([-aib_sinv.transpose(0, 2, 1), sinv], axis=2)
    x = jnp.concatenate([top, bot], axis=1)
    if scrub:
        ksp = NI.pad_to(ks, n, 256)
        xp = NI.pad_to(x, n, 256)
        x = NI.ns_inverse_pallas_refine(ksp, xp, n_quad=1, n_hi=1)[:, :n, :n]
    if xscrub:
        x = xla_scrub(ks, x, xscrub)
    return x


def current_inverse(ks, n, schedule=None):
    ksp = NI.pad_to(ks, n, 256)
    if schedule is None:
        return NI.ns_inverse_pallas_scaled(ksp)[:, :n, :n]
    return NI.ns_inverse_pallas_scaled(ksp, *schedule)[:, :n, :n]


def xla_scrub(ks, x, iters):
    """NS iterations in plain XLA at the logical size (no 256 padding)."""
    eye = jnp.eye(ks.shape[-1], dtype=ks.dtype)

    def body(x, _):
        kx = jnp.matmul(ks, x, precision=_HI)
        return jnp.matmul(x, 2.0 * eye - kx, precision=_HI), None

    x, _ = lax.scan(body, x, None, length=iters)
    return x


def timed(fn, ks, n_reps=24):
    def body(k, _):
        x = fn(k)
        # rep-to-rep dependency defeats elision; perturbation is tiny and
        # symmetric so the iterate stays SPD
        k = k + 1e-12 * (x + x.transpose(0, 2, 1))
        return k, None

    def chained(k):
        k, _ = lax.scan(body, k, None, length=n_reps)
        return jnp.sum(k)

    jf = jax.jit(chained)
    np.asarray(jf(ks))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jf(ks))
        times.append(time.perf_counter() - t0)
    return min(times) / n_reps


def resid_and_solve_err(ks, x, k_np, d_np):
    r = np.abs(np.eye(ks.shape[-1]) - np.asarray(ks, np.float64) @
               np.asarray(x, np.float64)).sum(-1).max()
    # refine=2 solve error vs f64 ground truth (what the solver consumes)
    ks64 = np.asarray(ks, np.float64)
    rng = np.random.default_rng(3)
    bvec = rng.standard_normal((ks.shape[0], ks.shape[-1]))
    xs = np.asarray(x, np.float64) @ bvec[..., None]
    for _ in range(2):
        res = bvec[..., None] - ks64 @ xs
        xs = xs + np.asarray(x, np.float64) @ res
    exact = np.linalg.solve(ks64, bvec[..., None])
    serr = np.abs(xs - exact).max() / np.abs(exact).max()
    return r, serr


def main():
    b, b_acc = 2048, 64
    # ADMM-phase short schedule (config.py ns_admm_*): the systems Schur
    # targets have measured Jacobi-scaled cond 14..213 (config.py:160-167);
    # polish-round systems (cond ~1e5+) keep the full 256 path regardless.
    adm = (5e-4, 6, 2, 1)
    out = {"backend": jax.default_backend(), "b": b, "b_acc": b_acc,
           "cases": {}}
    for n in (144, 192):
        for cond in (213.0, 1e3):
            ks, k_np, d_np = spd_batch(0, b_acc, n, cond=cond)
            # timing batch: tiled copies — NS iteration counts are static,
            # so values don't change the timing, only shapes do
            ks_t = jnp.tile(ks, (b // b_acc, 1, 1))
            row = {}
            for name, fn in [
                ("cur256_admm", lambda k: current_inverse(k, n, adm)),
                ("schur_admm", lambda k: schur_inverse(k, n, False, adm)),
                ("schur_x1", lambda k: schur_inverse(k, n, False, adm, 1)),
                ("schur_x2", lambda k: schur_inverse(k, n, False, adm, 2)),
            ]:
                x = jax.jit(fn)(ks)
                r, serr = resid_and_solve_err(ks, x, k_np, d_np)
                t = timed(jax.jit(fn), ks_t)
                row[name] = {"ms": round(t * 1e3, 3), "ns_resid": float(r),
                             "solve_rel_err": float(serr)}
                print(f"n={n:3d} cond={cond:6.0f} {name:12s} {t*1e3:8.3f} ms"
                      f"  resid={r:.3e}  solve_err={serr:.3e}", flush=True)
            out["cases"][f"n={n}_cond={int(cond)}"] = row
    import json
    print(json.dumps(out))
    with open("experiments/SCHUR_PROBE_r05.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
