#!/usr/bin/env python
"""Benchmark: batched MPC solves/s on one chip (10-step horizon).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 10,000 solves/s/chip (BASELINE.md).

Each "solve" is the full reference-equivalent MPC pipeline for one scenario:
SRB linearization, 25x25 matrix-exponential discretization, condensed
A_qp/B_qp stacking, H/g assembly, 50 ADMM iterations + 6 polish rounds
(7 Cholesky factorizations of the 120x120 KKT), i.e. everything between
update_problem_data_floats and get_solution in the reference
(convexMPC_interface.cpp:121-180).
"""

import json
import time

import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.mpc import pipeline


def main():
    cfg = default_config()
    h = 10
    batch = 4096
    key = jax.random.PRNGKey(0)
    inputs = pipeline.random_inputs(key, batch, h)

    fn = jax.jit(lambda inp: pipeline.solve_batch(cfg, inp))
    # warm-up / compile
    out = fn(inputs)
    jax.block_until_ready(out)

    n_reps = 10
    t0 = time.perf_counter()
    for _ in range(n_reps):
        out = fn(inputs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    solves_per_s = batch * n_reps / dt
    print(
        json.dumps(
            {
                "metric": "mpc_solves_per_s_per_chip",
                "value": round(solves_per_s, 1),
                "unit": "solves/s (h=10, batch=4096, full pipeline)",
                "vs_baseline": round(solves_per_s / 10000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
