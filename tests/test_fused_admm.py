"""Differential test: fused single-kernel Pallas solver vs the XLA path.

The fused kernel (ops/fused_admm.py) runs KKT build + NS factorization +
every ADMM iteration + every polish round VMEM-resident. It is opt-in
(slower than the XLA batched path on v5e — see mpc/pipeline.py) but must
stay solution-equivalent. TPU-only: Pallas TPU kernels don't run on the
CPU test backend, so this suite is exercised by the on-device benchmarks
and skipped under the CPU conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.mpc import pipeline

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="Pallas TPU kernel; CPU runs the XLA path it is tested against",
)


def test_fused_matches_xla_path():
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
    # identical QPs solved by two implementations; knife-edge active-set
    # rows may differ, so require near-agreement well inside control
    # tolerance rather than bitwise equality
    np.testing.assert_allclose(f_k, f_x, atol=0.5)
