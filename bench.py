#!/usr/bin/env python
"""Benchmark: batched MPC solves/s on one chip (10-step horizon).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 10,000 solves/s/chip (BASELINE.md).

Each "solve" is the full reference-equivalent MPC pipeline for one scenario:
SRB linearization, exact nilpotent discretization, condensed A_qp/B_qp
stacking, stance-compressed H/g assembly (the reference's swing-variable
elimination as a static one-hot contraction), pair-packed block-diagonal
KKT systems, 100 ADMM iterations + 6 active-set polish rounds (7
Newton-Schulz KKT factorizations), i.e. everything between
update_problem_data_floats and get_solution in the reference
(convexMPC_interface.cpp:121-180).

Timing methodology: the repetitions are chained *inside* one jit (each rep's
inputs depend on the previous rep's forces, defeating any elision), and the
final scalar is fetched to the host — `block_until_ready` alone does not
guarantee completion under remote-tunnel TPU transports.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.mpc import pipeline


def chained_solves(cfg, inputs, n_reps):
    def body(inp, _):
        forces = pipeline.solve_packed_batch(cfg, inp)
        inp = inp.replace(
            v_world=inp.v_world + 1e-9 * jnp.mean(forces, axis=(1, 2))
        )
        return inp, None

    inp, _ = lax.scan(body, inputs, None, length=n_reps)
    return jnp.sum(inp.v_world)


def main():
    cfg = default_config()
    h = 10
    batch = 4096
    n_reps = 8
    inputs = pipeline.random_inputs(jax.random.PRNGKey(0), batch, h)

    fn = jax.jit(lambda inp: chained_solves(cfg, inp, n_reps))
    np.asarray(fn(inputs))  # compile + warm up

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(inputs))  # host fetch forces completion
        times.append(time.perf_counter() - t0)
    dt = min(times)

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
