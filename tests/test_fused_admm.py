"""Differential test: fused single-kernel Pallas solver vs the XLA path.

The fused kernel (ops/fused_admm.py) runs KKT build + NS factorization +
every ADMM iteration + every polish round VMEM-resident. It is opt-in
(slower than the XLA batched path on v5e — see mpc/pipeline.py) but must
stay solution-equivalent. TPU-only: Pallas TPU kernels don't run on the
CPU test backend, so this suite runs under the QCT_PLATFORM=tpu lane.

Both implementations are judged against the float64 active-set oracle
(ground truth), not only against each other: the two solvers may land
different sides of knife-edge active rows, which produces isolated force
diffs that say nothing about either being wrong (observed ~0.5 N on <1%
of elements while both sit within the oracle gate).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import oracle  # noqa: E402

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.mpc import formation, pipeline

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="Pallas TPU kernel; CPU runs the XLA path it is tested against",
)


def _oracle_step0(cfg, inp):
    a_ct, b_ct = oracle.ct_ss_mats(
        np.array(cfg.mpc.inertia), cfg.mpc.mass, inp.r_feet, inp.rpy[2], 0.0
    )
    _, _, a_qp, b_qp = oracle.c2qp(a_ct, b_ct, 0.026, 10)
    x0 = np.asarray(
        formation.build_x0(
            jnp.asarray(inp.rpy), jnp.asarray(inp.position),
            jnp.asarray(inp.omega_world), jnp.asarray(inp.v_world),
            cfg.mpc.gravity,
        )
    )
    hess, grad = oracle.qp_cost(
        a_qp, b_qp, np.array(cfg.mpc.weights), cfg.mpc.alpha, x0,
        np.asarray(inp.traj)[:, :12], 10,
    )
    x = oracle.solve_mpc_qp_exact(
        hess, grad, np.asarray(inp.gait_table), cfg.mpc.mu, cfg.mpc.f_max
    )
    return x.reshape(10, 4, 3)[0]


def test_fused_matches_xla_path_and_oracle():
    # the fused kernel runs a fixed-rho schedule; align the XLA path by
    # disabling its adaptive-rho events so both solve the same iteration
    cfg = default_config(**{"solver.rho_adapt": 0})
    inputs = pipeline.random_inputs(jax.random.PRNGKey(42), 64, 10)
    f_x = np.asarray(
        jax.jit(lambda i: pipeline.solve_packed_batch(cfg, i, use_fused=False))(inputs)
    )
    f_k = np.asarray(
        jax.jit(lambda i: pipeline.solve_packed_batch(cfg, i, use_fused=True))(inputs)
    )
    assert np.all(np.isfinite(f_k))

    # cross-consistency: bulk agreement; step-0 (the only forces the
    # controller consumes — reference get_solution(0) -> f_ff) gated
    # tightly, with the worst step-0 scenario verified against the oracle
    # below. Later-step forces only seed warm starts; isolated knife-edge
    # rows there can land on different pyramid faces between two correct
    # solvers (measured on v5e: q99 0.079, step-0 max 0.21, one mid-horizon
    # outlier 4.2 N in 64x10x12 — round-5 on-device recalibration)
    diff = np.abs(f_k - f_x)
    assert np.quantile(diff, 0.99) < 0.5, np.quantile(diff, 0.99)
    d0 = np.abs(f_k[:, 0] - f_x[:, 0])
    assert d0.max() < 1.0, d0.max()
    assert diff.max() < 8.0, diff.max()

    # ground truth: both implementations' step-0 forces (what the
    # controller consumes) within the oracle gate on a scenario sample,
    # INCLUDING the scenario where the two solvers disagree most
    checks = set(range(0, 64, 8)) | {int(d0.max(axis=(1, 2)).argmax())}
    for b in sorted(checks):
        inp = jax.tree.map(lambda x: np.asarray(x[b]), inputs)
        want = _oracle_step0(cfg, inp)
        np.testing.assert_allclose(f_x[b, 0], want, atol=0.7)
        np.testing.assert_allclose(f_k[b, 0], want, atol=0.7)
