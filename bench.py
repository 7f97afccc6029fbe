#!/usr/bin/env python
"""Benchmark: batched MPC solves/s on one chip (10-step horizon), with
per-phase speed-of-light accounting.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "phases"}.
Baseline target: 10,000 solves/s/chip (BASELINE.md).

Each "solve" is the full reference-equivalent MPC pipeline for one scenario:
SRB linearization, exact nilpotent discretization, condensed A_qp/B_qp
stacking, stance-compressed H/g assembly (the reference's swing-variable
elimination as a static one-hot contraction), pair-packed block-diagonal
KKT systems, ADMM iterations + active-set polish rounds, i.e. everything
between update_problem_data_floats and get_solution in the reference
(convexMPC_interface.cpp:121-180).

Phase accounting (SURVEY.md §5 tracing / §7 step 9): the pipeline is timed
at four nested configurations and differenced into formation / factorize /
iterate / polish phases. For each phase an analytic FLOP/byte model (the
same arithmetic the CostEstimates encode) gives the bound it should be
limited by on this chip (v5e: ~197 TFLOP/s bf16 with f32 accum per-pass
equivalent, ~819 GB/s HBM) and the % of that bound attained.

Timing methodology: the repetitions are chained *inside* one jit (each rep's
inputs depend on the previous rep's forces, defeating any elision), and the
final scalar is fetched to the host — `block_until_ready` alone does not
guarantee completion under remote-tunnel TPU transports. The rep counts are
chosen so the tunnel's FIXED per-call transport cost (measured ~23 ms for a
trivial chained program on this container's remote v5e, the same 2-RPC
round trip LATENCY.json records as transport_2rpc_p50; a locally-attached
chip pays ~none of it) amortizes to <2% of each lane's measurement — at the
round-4 rep counts (8 / 4) it inflated every per-rep time by ~3-6 ms, which
understated the flagship lane by ~7%.
"""

import json
import os
import sys
import time

import jax

# persistent XLA compilation cache (see bench_latency.py)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.mpc import pipeline

# v5e single-chip peaks (public spec); used only for % -of-bound reporting
PEAK_BF16_TFLOPS = 394.0     # bf16 MXU
PEAK_F32_TFLOPS = PEAK_BF16_TFLOPS / 6.0   # HIGHEST f32 = 6 bf16 passes
PEAK_HBM_GBS = 819.0


def timed(fn, inputs, n_reps):
    def body(inp, _):
        forces = fn(inp)
        inp = inp.replace(
            v_world=inp.v_world + 1e-9 * jnp.mean(forces, axis=(1, 2))
        )
        return inp, None

    def chained(inp):
        inp, _ = lax.scan(body, inp, None, length=n_reps)
        return jnp.sum(inp.v_world)

    jf = jax.jit(chained)
    np.asarray(jf(inputs))  # compile + warm up
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jf(inputs))
        times.append(time.perf_counter() - t0)
    return min(times) / n_reps


def main():
    # Lane-resilient structure (round-4 lesson: the h=16 lane's compile
    # failure erased the whole round's perf record). Every lane runs in its
    # own try/except; per-lane progress goes to stderr as it lands, and the
    # final single JSON line on stdout is ALWAYS printed, carrying nulls +
    # error strings for any lane that failed.
    lane_errors = {}

    def lane(name, fn):
        try:
            out = fn()
            print(f"# lane {name}: ok", file=sys.stderr, flush=True)
            return out
        except Exception as e:  # noqa: BLE001 — record and keep going
            lane_errors[name] = f"{type(e).__name__}: {str(e)[:400]}"
            print(f"# lane {name}: FAIL {lane_errors[name]}",
                  file=sys.stderr, flush=True)
            return None

    cfg = default_config()
    h = 10
    batch = 4096
    n_reps = 48
    iters = cfg.solver.iterations
    polish = cfg.solver.polish_rounds
    inputs = pipeline.random_inputs(jax.random.PRNGKey(0), batch, h)

    t_full = lane("h10_full", lambda: timed(
        lambda i: pipeline.solve_packed_batch(cfg, i), inputs, n_reps))
    t_nopol = lane("h10_nopolish", lambda: timed(
        lambda i: pipeline.solve_packed_batch(cfg, i, polish_rounds=0),
        inputs, n_reps))
    iter_min = 2 * (cfg.solver.rho_adapt + 1)
    t_form_fact = lane("h10_form_fact", lambda: timed(
        lambda i: pipeline.solve_packed_batch(cfg, i, iterations=iter_min,
                                              polish_rounds=0),
        inputs, n_reps))
    t_form_meas = lane("h10_form_only", lambda: timed(
        lambda i: pipeline.solve_packed_batch(cfg, i, form_only=True),
        inputs, n_reps))

    # A/B: the fused K-build+NS factorization kernel vs the two-step
    # (XLA assemble -> NS kernel) path, via the _FUSED_BUILD escape hatch
    def ab_two_step():
        from quadruped_ctrl_tpu.solver import admm
        admm._FUSED_BUILD = False
        try:
            return timed(lambda i: pipeline.solve_packed_batch(cfg, i),
                         inputs, n_reps)
        finally:
            admm._FUSED_BUILD = True

    t_two_step = lane("h10_two_step_build", ab_two_step)

    # ---- analytic per-phase FLOP/byte models (per full batch) ----
    ms, pack = 2, 2                     # stance compression + pair packing
    n_c = 3 * ms * h                    # 60 compressed vars / scenario
    npad = 128                          # packed KKT tile (2 x 60 -> 128)
    mp_ = 256                           # padded constraint rows
    sysN = batch // pack                # packed systems
    ns_admm = (cfg.solver.ns_admm_scaled_iters + cfg.solver.ns_quad_iters
               + cfg.solver.ns_hi_iters)   # short ADMM-phase schedule
    ns_pol = (cfg.solver.ns_scaled_iters + cfg.solver.ns_quad_iters
              + cfg.solver.ns_hi_iters)    # full polish-grade schedule

    # formation: dominated by bq.T @ (S bq) — (13h x n_c)^T (13h x n_c)
    flops_form = batch * 2 * (13 * h) * n_c * n_c * 2
    bytes_form = batch * (13 * h * n_c * 2 + n_c * n_c) * 4
    # factorize: NS kernels, 2 MXU passes/iter, VMEM-resident (HBM: K in,
    # X out); 2 ADMM-phase factorizations (cold + adaptive-rho)
    flops_fact = 2 * sysN * ns_admm * 2 * 2 * npad**3
    bytes_fact = 2 * sysN * 2 * npad * npad * 4
    # iterate: inverse matvec streams the bf16 inverse from HBM; f32 tail 4B
    n_lo = iters - min(cfg.solver.f32_tail_iters, iters)
    n_hi_i = iters - n_lo
    flops_iter = iters * sysN * 2 * (npad**2 + 2 * npad * mp_)
    bytes_iter = sysN * npad * npad * (2 * n_lo + 4 * n_hi_i)
    # polish: per round one full-schedule factorization + one f32 refine
    # solve (3 matvecs) + bound algebra
    flops_pol_fact = polish * sysN * ns_pol * 2 * 2 * npad**3
    bytes_pol_fact = polish * sysN * 2 * npad * npad * 4
    flops_pol = polish * sysN * 2 * 3 * npad**2
    bytes_pol = polish * sysN * 3 * npad * npad * 4

    def phase(name, t, flops, bts, bound):
        attained = (flops / 1e12 / t / PEAK_F32_TFLOPS if bound == "mxu-f32"
                    else bts / 1e9 / t / PEAK_HBM_GBS)
        return {
            "name": name,
            "ms": round(t * 1e3, 2),
            "gflops": round(flops / 1e9, 1),
            "gbytes": round(bts / 1e9, 3),
            "bound": bound,
            "attained_pct": round(100 * attained, 1),
        }

    phases = None
    if None not in (t_full, t_nopol, t_form_fact, t_form_meas):
        t_iter = max(t_nopol - t_form_fact, 1e-9)
        # formation is measured directly (form_only); factorize is the
        # remainder of the measured formation+factorize bucket
        t_form = t_form_meas
        t_fact = max(t_form_fact - t_form, 1e-9)
        t_pol = max(t_full - t_nopol, 1e-9)
        phases = [
            phase("formation", t_form, flops_form, bytes_form, "mxu-f32"),
            phase("factorize(NS)", t_fact, flops_fact, bytes_fact,
                  "mxu-f32"),
            phase("iterate(ADMM)", t_iter, flops_iter, bytes_iter, "hbm"),
            phase("polish+fact", t_pol, flops_pol + flops_pol_fact,
                  bytes_pol + bytes_pol_fact, "hbm"),
        ]

    # h=16 lane: the aio mode-1 horizon cap (ConvexMPCLocomotion.cpp:174-233).
    # Two shapes: the worst case (mid-speed bands, 3-4 stance feet -> no
    # swing elimination, 192-var systems on the 256 tile), and the fast-trot
    # band (>1.4 m/s reshaped trot is 2-stance -> compressed 96-var,
    # pair-packed to 192)
    h16, b16 = 16, 2048
    inputs16 = pipeline.random_inputs(jax.random.PRNGKey(1), b16, h16)
    t16 = lane("h16_full", lambda: timed(
        lambda i: pipeline.solve_packed_batch(cfg, i, max_stance=4, pack=1),
        inputs16, 16))
    t16t = lane("h16_trot", lambda: timed(
        lambda i: pipeline.solve_packed_batch(cfg, i, max_stance=2, pack=2),
        inputs16, 16))
    # mid-band lane: the aio walking->trot morph band (0.2 < v <= 0.4,
    # ConvexMPCLocomotion.cpp:174-233) is a 3-STANCE h=16 gait, so it
    # compresses to ms=3 (144-var systems on the 256 kernel tile) instead
    # of running uncompressed 192-var
    v_band = 0.3
    o2 = int(np.floor(h16 * 1.25 * v_band))
    o3 = int(np.floor(h16 * (1.25 * v_band + 0.5)))
    dwt = int(np.floor(h16 * (-1.25 * v_band + 1.0)))
    offs = np.array([0, h16 // 2, o2, o3])
    steps = np.arange(h16)[:, None]
    tbl = (((steps - offs[None, :]) % h16) < dwt).astype(np.float32)
    # every step must have <= 3 stance feet (the ms=3 compression is only
    # exact then) and >= 1 (a zero-stance step has no variables)
    assert tbl.sum(axis=1).max() <= 3 and (tbl.sum(1) >= 1).all()
    inputs16m = inputs16.replace(
        gait_table=jnp.broadcast_to(jnp.asarray(tbl), (b16, h16, 4))
    )
    t16m = lane("h16_midband", lambda: timed(
        lambda i: pipeline.solve_packed_batch(cfg, i, max_stance=3, pack=1),
        inputs16m, 16))

    def rate(total, t):
        return round(total / t, 1) if t else None

    solves_per_s = (batch / t_full) if t_full else None
    print(
        json.dumps(
            {
                "metric": "mpc_solves_per_s_per_chip",
                "value": round(solves_per_s, 1) if solves_per_s else None,
                "unit": "solves/s (h=10, batch=4096, full pipeline)",
                "vs_baseline": (round(solves_per_s / 10000.0, 3)
                                if solves_per_s else None),
                "h16_solves_per_s": rate(b16, t16),
                "h16_unit": "solves/s (h=16, batch=2048, 192-var/256-tile)",
                "h16_trot_solves_per_s": rate(b16, t16t),
                "h16_trot_unit": "solves/s (h=16 fast-trot band, 2-stance "
                                 "compressed + pair-packed)",
                "h16_midband_solves_per_s": rate(b16, t16m),
                "h16_midband_unit": "solves/s (h=16 aio walking band, "
                                    "3-stance compressed, 144-var/256-tile)",
                "h16_midband_note": "ms=3 compression (192->144 vars) keeps "
                                    "the 256 NS tile (144 > 128-lane tile), "
                                    "so the factorization work is unchanged; "
                                    "the gain over uncompressed comes from "
                                    "the iterate/formation phases only",
                "fused_build_solves_per_s": rate(batch, t_full),
                "two_step_build_solves_per_s": rate(batch, t_two_step),
                "fused_build_note": "A/B of the fused K-build+NS Pallas "
                                    "kernel vs XLA-assemble + NS kernel "
                                    "(_FUSED_BUILD hatch), h=10 flagship "
                                    "shape",
                "phases": phases,
                "lane_errors": lane_errors or None,
            }
        )
    )


if __name__ == "__main__":
    main()
