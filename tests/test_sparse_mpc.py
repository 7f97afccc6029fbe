"""Sparse (stage-wise) MPC path tests: with identical weights/friction, the
stage-wise and condensed formulations are the same QP in different variables
— their GRFs must agree (the two paths differential-test each other, like
the reference's dense/sparse pair)."""

import numpy as np
import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.mpc import pipeline, sparse

CFG = default_config()
H = 6


def test_sparse_matches_dense_formulation():
    inputs = pipeline.random_inputs(jax.random.PRNGKey(7), 3, H)
    dense_w = CFG.mpc.weights
    for b in range(3):
        inp = jax.tree.map(lambda x: x[b], inputs)
        f_dense = np.asarray(jax.jit(lambda i: pipeline.solve(CFG, i))(inp))
        f_sparse = np.asarray(
            jax.jit(
                lambda i: sparse.solve_sparse(
                    CFG, i, weights=dense_w, mu=CFG.mpc.mu, iterations=250,
                    polish_rounds=8,
                )
            )(inp)
        )
        # first-step forces agree between the two formulations. (ADMM leaves
        # the stage-wise problem's flat directions looser than the condensed
        # one; agreement is to ~10% of body weight, enough for the non-default
        # path. The dominant vertical forces match much tighter.)
        np.testing.assert_allclose(f_sparse[0][:, 2], f_dense[0][:, 2], atol=3.0)
        np.testing.assert_allclose(f_sparse[0], f_dense[0], atol=12.0)


def test_sparse_default_weights_run():
    inputs = pipeline.random_inputs(jax.random.PRNGKey(8), 1, H)
    inp = jax.tree.map(lambda x: x[0], inputs)
    f = np.asarray(jax.jit(lambda i: sparse.solve_sparse(CFG, i))(inp))
    assert np.isfinite(f).all()
    gait = np.asarray(inp.gait_table)
    # swing feet near zero, stance feet within the cone
    assert np.abs(f[gait == 0]).max() < 0.5
    fz = f[..., 2]
    assert fz.max() <= CFG.mpc.f_max + 0.5
    assert (np.abs(f[..., 0]) <= sparse.SPARSE_MU * fz + 0.5).all()
