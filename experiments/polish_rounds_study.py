"""Tuning study: can dual-informed polish seeding (polish_dual_seed_tol)
buy back a polish round?

The polish phase costs ~4.8 ms/round at the flagship shape (one cold
polish-grade factorization + solve each) — a third of the 14.4 ms
polish+fact phase (BENCH_r05_builder.json). config.py documents the
polish_rounds=3 floor: at 2 rounds one random-scenario pipeline case
missed the f64 oracle by 2.4 N (wrong active set). The dual-seed knob
(solver/admm.py:926) adds large-|y| rows to the round-0 working set,
aiming the first polish solve at the right active set so fewer refinement
rounds are needed.

Two gates, mirroring the committed tests:
  A. hard battery (tests/test_admm.py::test_hard_battery_cone_pushes,
     widened: 3 gait kinds x 4 seeds x 4 push levels = 48 cases, h=10,
     full 120-var problems) via admm_mpc_batched — report worst |x - x*|
     and worst step-0 error vs the f64 active-set oracle.
  B. pipeline random scenarios (tests/test_fused_admm.py gate): 64
     random_inputs through solve_packed_batch (stance-compressed +
     pair-packed, the bench path), step-0 forces vs the oracle on every
     scenario.

Run on the TPU backend to measure the production Pallas path; the CPU
backend exercises the XLA reference path with the same structure.

Usage: python experiments/polish_rounds_study.py [--quick]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import oracle  # tests/oracle.py
from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.mpc import formation, pipeline
from quadruped_ctrl_tpu.solver import admm


def battery_cases(h=10, seeds=(0, 1, 2, 3), pushes=(0.0, 40.0, 80.0, 120.0)):
    """(hess, grad, gait, x_true) stacked over 3 gait kinds x seeds x pushes."""
    cfg = default_config()
    MPC = cfg.mpc
    hs, gs, gts, xs = [], [], [], []
    pairs = {0: ([0, 3], [1, 2]), 2: ([0, 1], [2, 3])}
    for gait_kind in (0, 1, 2):
        for seed in seeds:
            for push in pushes:
                rng = np.random.default_rng(seed)
                r_feet = rng.uniform(-0.25, 0.25, (4, 3))
                r_feet[:, 2] = -0.28
                yaw = float(rng.uniform(-0.5, 0.5))
                a_ct, b_ct = oracle.ct_ss_mats(
                    np.array(MPC.inertia), MPC.mass, r_feet, yaw, 0.0)
                _, _, a_qp, b_qp = oracle.c2qp(a_ct, b_ct, 0.026, h)
                x0 = np.concatenate(
                    [rng.uniform(-0.05, 0.05, 3), [0, 0, 0.28],
                     rng.uniform(-0.2, 0.2, 3), rng.uniform(-0.4, 0.4, 3),
                     [-9.8]])
                traj = np.tile(
                    np.array([0, 0, yaw, 0, 0, 0.25, 0, 0, 0, 0.4, 0, 0.0]),
                    (h, 1))
                hess, grad = oracle.qp_cost(
                    a_qp, b_qp, np.array(MPC.weights), MPC.alpha, x0, traj, h)
                th = rng.uniform(0, 2 * np.pi)
                grad = grad + np.tile(
                    [push * np.cos(th), push * np.sin(th), 0.0] * 4, h)
                gait = np.zeros((h, 4))
                if gait_kind == 1:
                    gait[:] = 1
                else:
                    a_pair, b_pair = pairs[gait_kind]
                    for i in range(h):
                        gait[i, a_pair if (i // (h // 2)) % 2 == 0
                             else b_pair] = 1
                x_true = oracle.solve_mpc_qp_exact(
                    hess, grad, gait, MPC.mu, MPC.f_max)
                hs.append(hess); gs.append(grad); gts.append(gait)
                xs.append(x_true)
    return (np.stack(hs), np.stack(gs), np.stack(gts), np.stack(xs))


def run_battery(variants, quick=False):
    seeds = (0, 1) if quick else (0, 1, 2, 3)
    pushes = (0.0, 80.0) if quick else (0.0, 40.0, 80.0, 120.0)
    hess, grad, gait, x_true = battery_cases(seeds=seeds, pushes=pushes)
    b = hess.shape[0]
    print(f"# battery: {b} cases", file=sys.stderr, flush=True)
    out = {}
    for name, (pr, ds) in variants.items():
        cfg = default_config(**{
            "solver.polish_rounds": pr,
            "solver.polish_dual_seed_tol": ds,
        })
        t0 = time.perf_counter()
        x = np.asarray(jax.jit(
            lambda hh, gg, gt, c=cfg: admm.admm_mpc_batched(
                c.solver, c.mpc, hh, gg, gt)
        )(jnp.asarray(hess, jnp.float32), jnp.asarray(grad, jnp.float32),
          jnp.asarray(gait, jnp.float32)), np.float64)
        dt = time.perf_counter() - t0
        err = np.abs(x - x_true)
        step0 = err[:, :12]
        out[name] = {
            "worst": float(err.max()),
            "worst_step0": float(step0.max()),
            "q99": float(np.quantile(err, 0.99)),
            "n_cases_over_1N": int((err.max(axis=1) > 1.0).sum()),
            "compile+run_s": round(dt, 1),
        }
        print(f"# battery {name}: {out[name]}", file=sys.stderr, flush=True)
    return out


def run_pipeline_check(variants, quick=False):
    b = 32 if quick else 128
    inputs = pipeline.random_inputs(jax.random.PRNGKey(42), b, 10)
    cfg0 = default_config()
    want = []
    solvable = []
    for i in range(b):
        inp = jax.tree.map(lambda x, i=i: np.asarray(x[i]), inputs)
        a_ct, b_ct = oracle.ct_ss_mats(
            np.array(cfg0.mpc.inertia), cfg0.mpc.mass, inp.r_feet,
            inp.rpy[2], 0.0)
        _, _, a_qp, b_qp = oracle.c2qp(a_ct, b_ct, 0.026, 10)
        x0 = np.asarray(formation.build_x0(
            jnp.asarray(inp.rpy), jnp.asarray(inp.position),
            jnp.asarray(inp.omega_world), jnp.asarray(inp.v_world),
            cfg0.mpc.gravity))
        hess, grad = oracle.qp_cost(
            a_qp, b_qp, np.array(cfg0.mpc.weights), cfg0.mpc.alpha, x0,
            np.asarray(inp.traj)[:, :12], 10)
        try:
            x = oracle.solve_mpc_qp_exact(
                hess, grad, np.asarray(inp.gait_table), cfg0.mpc.mu,
                cfg0.mpc.f_max)
        except np.linalg.LinAlgError:
            continue            # oracle-side factorization failure; skip
        want.append(x.reshape(10, 4, 3)[0])
        solvable.append(i)
    want = np.stack(want)
    solvable = np.asarray(solvable)
    print(f"# pipeline: {len(solvable)}/{b} oracle scenarios solved",
          file=sys.stderr, flush=True)

    out = {}
    for name, (pr, ds) in variants.items():
        cfg = default_config(**{
            "solver.polish_rounds": pr,
            "solver.polish_dual_seed_tol": ds,
        })
        f = np.asarray(jax.jit(
            lambda i, c=cfg: pipeline.solve_packed_batch(c, i))(inputs))
        err0 = np.abs(f[solvable, 0] - want)
        out[name] = {
            "step0_worst": float(err0.max()),
            "step0_q99": float(np.quantile(err0, 0.99)),
            "n_scen_over_0p7N": int((err0.max(axis=(1, 2)) > 0.7).sum()),
        }
        print(f"# pipeline {name}: {out[name]}", file=sys.stderr, flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    variants = {
        "pr3_ds0 (default)": (3, 0.0),
        "pr2_ds0": (2, 0.0),
        "pr2_ds0.01": (2, 0.01),
        "pr2_ds0.03": (2, 0.03),
        "pr2_ds0.1": (2, 0.1),
        "pr3_ds0.03": (3, 0.03),
    }
    res = {
        "backend": jax.default_backend(),
        "battery": run_battery(variants, args.quick),
        "pipeline_step0": run_pipeline_check(variants, args.quick),
    }
    line = json.dumps(res)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
