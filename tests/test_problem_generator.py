"""Generated-problem differential tests (the JCQP main.cpp pattern): the
batched ADMM must match the float64 IPM on random controllable MPC QPs."""

import numpy as np
import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import SolverConfig
from quadruped_ctrl_tpu.solver import admm, ipm, problem_generator

SOL = SolverConfig()


def test_admm_matches_ipm_on_generated_problems():
    rng = np.random.default_rng(0)
    for _ in range(3):
        hess, grad, a_mat, l, u = problem_generator.random_mpc_qp(
            rng, n_states=8, n_controls=6, horizon=5
        )
        x_true = ipm.solve_qp_exact(hess, grad, a_mat, l, u)
        x, _, _ = jax.jit(
            lambda: admm.admm_dense(
                SOL,
                jnp.asarray(hess, jnp.float32),
                jnp.asarray(grad, jnp.float32),
                jnp.asarray(a_mat, jnp.float32),
                jnp.asarray(l, jnp.float32),
                jnp.asarray(u, jnp.float32),
                iterations=200,
                polish_rounds=6,
            )
        )()
        scale = max(1.0, np.abs(x_true).max())
        np.testing.assert_allclose(np.asarray(x), x_true, atol=5e-3 * scale)
