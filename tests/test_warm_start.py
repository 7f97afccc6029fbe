"""Temporal MPC warm starting (the qpOASES setToMPC hot-start role,
reference SolverMPC.cpp:530-532): the pre-polish ADMM iterate of each solve
is shifted by one gait segment and carried in LocomotionState; the next
solve starts from it and needs a fraction of the cold iteration budget."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.control import controller as ctrl
from quadruped_ctrl_tpu.mpc import pipeline, formation
from quadruped_ctrl_tpu.solver import admm
from tests.test_batched_mpc_path import _batched_states_ctx, CFG, BATCH


def _problem(h=10, batch=6):
    inputs = pipeline.random_inputs(jax.random.PRNGKey(3), batch, h)

    def form(inp):
        a_ct, b_ct = formation.srb_ct_dynamics(
            CFG.mpc, inp.r_feet, inp.rpy[2], inp.x_drag
        )
        adt, bdt = formation.discretize(a_ct, b_ct, CFG.dt_mpc)
        x0 = formation.build_x0(
            inp.rpy, inp.position, inp.omega_world, inp.v_world,
            CFG.mpc.gravity,
        )
        sm = jnp.ones((h,), jnp.float32)
        return formation.qp_cost_nil(CFG.mpc, adt, bdt, x0, inp.traj, sm)

    hess, grad = jax.vmap(form)(inputs)
    return hess, grad, inputs.gait_table


def test_warm_resolve_matches_cold_at_reduced_budget():
    hess, grad, gait = _problem()
    x_cold, warm = admm.admm_mpc_batched(
        CFG.solver, CFG.mpc, hess, grad, gait, iterations=120,
        return_warm=True,
    )
    # re-solving the SAME problem warm with a third of the budget must land
    # on the same polished solution
    x_warm = admm.admm_mpc_batched(
        CFG.solver, CFG.mpc, hess, grad, gait, iterations=40, warm=warm,
    )
    np.testing.assert_allclose(
        np.asarray(x_warm), np.asarray(x_cold), atol=0.2
    )


def test_zero_warm_is_cold_start():
    hess, grad, gait = _problem(batch=4)
    n, m = hess.shape[-1], gait.shape[1] * gait.shape[2] * 5
    zeros = (
        jnp.zeros((4, n), jnp.float32),
        jnp.zeros((4, m), jnp.float32),
        jnp.zeros((4, m), jnp.float32),
    )
    a = admm.admm_mpc_batched(CFG.solver, CFG.mpc, hess, grad, gait,
                              iterations=60)
    b = admm.admm_mpc_batched(CFG.solver, CFG.mpc, hess, grad, gait,
                              iterations=60, warm=zeros)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mpc_update_stores_shifted_warm():
    states, ctx = _batched_states_ctx()
    out = ctrl.mpc_update_batched(CFG, states, ctx, iterations=60)
    wx = np.asarray(out.core.locomotion.mpc_warm_x)
    assert np.isfinite(wx).all()
    assert np.abs(wx).max() > 0.0  # a real iterate was stored

    # a second solve from the warm state must not fail and must keep the
    # fail counter at zero
    out2 = ctrl.mpc_update_batched(CFG, out, ctx, iterations=40)
    assert int(np.asarray(out2.core.locomotion.mpc_fail_count).max()) == 0
    assert np.isfinite(np.asarray(out2.core.locomotion.fr_des)).all()


def test_failed_solve_resets_warm_store():
    states, ctx = _batched_states_ctx()
    bad_ctx = dict(ctx)
    bad_ctx["p_foot"] = jnp.full((BATCH, 4, 3), jnp.nan, jnp.float32)
    out = ctrl.mpc_update_batched(CFG, states, bad_ctx, iterations=8)
    assert int(np.asarray(out.core.locomotion.mpc_fail_count).min()) == 1
    np.testing.assert_array_equal(
        np.asarray(out.core.locomotion.mpc_warm_x), 0.0
    )
    np.testing.assert_array_equal(
        np.asarray(out.core.locomotion.mpc_warm_y), 0.0
    )
