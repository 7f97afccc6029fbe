"""MPC pipeline tests: full / stance-compressed / pair-packed paths must all
match the float64 IPM oracle on the same formation."""

import numpy as np
import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.mpc import pipeline
from tests import oracle

CFG = default_config()
H = 6


def _oracle_forces(inp):
    r_feet = np.asarray(inp.r_feet)
    yaw = float(inp.rpy[2])
    a_ct, b_ct = oracle.ct_ss_mats(
        np.array(CFG.mpc.inertia), CFG.mpc.mass, r_feet, yaw, float(inp.x_drag)
    )
    _, _, a_qp, b_qp = oracle.c2qp(a_ct, b_ct, CFG.dt_mpc, H)
    x0 = np.concatenate(
        [
            np.asarray(inp.rpy),
            np.asarray(inp.position),
            np.asarray(inp.omega_world),
            np.asarray(inp.v_world),
            [-9.8],
        ]
    )
    hess, grad = oracle.qp_cost(
        a_qp, b_qp, np.array(CFG.mpc.weights), CFG.mpc.alpha, x0,
        np.asarray(inp.traj)[:, :12], H,
    )
    gait = np.asarray(inp.gait_table)
    x = oracle.solve_mpc_qp_exact(hess, grad, gait, CFG.mpc.mu, CFG.mpc.f_max)
    return x.reshape(H, 4, 3)


def test_full_compressed_packed_match_oracle():
    inputs = pipeline.random_inputs(jax.random.PRNGKey(2), 4, H)
    f_full = np.asarray(jax.jit(lambda i: pipeline.solve_batch(CFG, i))(inputs))
    f_red = np.asarray(
        jax.jit(lambda i: pipeline.solve_compressed_batch(CFG, i, 2))(inputs)
    )
    f_pack = np.asarray(jax.jit(lambda i: pipeline.solve_packed_batch(CFG, i))(inputs))
    for b in range(4):
        inp = jax.tree.map(lambda x: x[b], inputs)
        want = _oracle_forces(inp)
        # step-0 forces are what the controller consumes
        np.testing.assert_allclose(f_full[b, 0], want[0], atol=0.7)
        np.testing.assert_allclose(f_red[b, 0], want[0], atol=0.7)
        np.testing.assert_allclose(f_pack[b, 0], want[0], atol=0.7)


def test_compressed_swing_forces_zero():
    inputs = pipeline.random_inputs(jax.random.PRNGKey(3), 2, H)
    f = np.asarray(jax.jit(lambda i: pipeline.solve_packed_batch(CFG, i))(inputs))
    gait = np.asarray(inputs.gait_table)
    assert np.abs(f[gait == 0]).max() < 1e-6  # structurally zero by scatter
