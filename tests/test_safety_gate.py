"""Full four-check safety cascade wiring + solver-failure stale-solution hold.

Reference semantics under test:
* GaitCtrller.cpp:108-123 — the else-if cascade orientation -> pDes ->
  forceFeedForward -> jointLimit, each latching `_safetyCheck=false` and
  zeroing torques forever (GaitCtrller.cpp:130-142);
* SolverMPC.cpp:539-541 / convexMPC_interface.cpp:175-180 — a failed QP
  solve keeps the previous solution.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.control import controller as ctrl
from quadruped_ctrl_tpu.core.types import Command, Sensors

CFG = default_config()


def _sensors(quat=(0.0, 0.0, 0.0, 1.0), q=None):
    q = np.tile([0.0, -0.8, 1.6], 4) if q is None else q
    return Sensors(
        quat=jnp.asarray(quat, jnp.float32),
        gyro=jnp.zeros(3, jnp.float32),
        accelerometer=jnp.array([0.0, 0.0, 9.8], jnp.float32),
        q=jnp.asarray(q, jnp.float32),
        qd=jnp.zeros(12, jnp.float32),
    )


def _ticked(sensors=None, state=None):
    state = ctrl.init_state(CFG) if state is None else state
    cmd = Command.create(0.3, 0.0, 0.0, gait_type=9)
    return ctrl.control_tick(CFG, state, sensors or _sensors(), cmd)


def test_nominal_tick_keeps_safety_ok():
    state, ctx = _ticked()
    state, out = ctrl.leg_commands(CFG, state, ctx)
    assert bool(state.core.safety_ok)
    assert bool(jnp.any(out.tau != 0.0))


def test_orientation_check_trips():
    # ~0.6 rad roll > the 0.5 rad limit (SafetyChecker.cpp:20-28)
    quat = (np.sin(0.3), 0.0, 0.0, np.cos(0.3))
    state, ctx = _ticked(_sensors(quat=quat))
    assert not bool(state.core.safety_ok)
    state, out = ctrl.leg_commands(CFG, state, ctx)
    assert bool(jnp.all(out.tau == 0.0))


def test_joint_limit_check_trips():
    q = np.tile([0.0, -0.8, 1.6], 4)
    q[0] = 2.0  # abad beyond +-60 deg (SafetyChecker.cpp:127-170)
    state, ctx = _ticked(_sensors(q=q))
    assert not bool(state.core.safety_ok)
    state, out = ctrl.leg_commands(CFG, state, ctx)
    assert bool(jnp.all(out.tau == 0.0))


def test_p_des_foot_check_trips():
    state, ctx = _ticked()
    # stance feet command the carried trajectory point (swing_p_cur); plant
    # it 10 m away so the commanded leg-frame pDes leaves the reach box
    state = state.replace(swing_p_cur=jnp.full((4, 3), 10.0, jnp.float32))
    state, out = ctrl.leg_commands(CFG, state, ctx)
    assert not bool(state.core.safety_ok)
    assert bool(jnp.all(out.tau == 0.0))


def test_force_feedforward_check_trips():
    state, ctx = _ticked()
    loco = state.core.locomotion.replace(
        f_ff=jnp.full((4, 3), 1000.0, jnp.float32)  # beyond the +-350 N box
    )
    state = state.replace(core=state.core.replace(locomotion=loco))
    state, out = ctrl.leg_commands(CFG, state, ctx)
    assert not bool(state.core.safety_ok)
    assert bool(jnp.all(out.tau == 0.0))


def test_safety_latches_across_ticks():
    quat = (np.sin(0.3), 0.0, 0.0, np.cos(0.3))
    state, _ = _ticked(_sensors(quat=quat))
    assert not bool(state.core.safety_ok)
    # back to nominal orientation: the latch must hold
    state, ctx = _ticked(state=state)
    assert not bool(state.core.safety_ok)
    state, out = ctrl.leg_commands(CFG, state, ctx)
    assert bool(jnp.all(out.tau == 0.0))


def test_solution_ok_rejects_infeasible_and_nonfinite():
    h = CFG.mpc.h_max
    table = jnp.ones((h, 4), jnp.float32)
    good = jnp.zeros((h, 4, 3), jnp.float32).at[..., 2].set(20.0)
    assert bool(ctrl.solution_ok(CFG, good, table))
    # fz above the gait-scaled f_max bound
    over = good.at[..., 2].set(CFG.mpc.f_max + 10.0)
    assert not bool(ctrl.solution_ok(CFG, over, table))
    # force on a swing foot (bound 0) is infeasible
    swing_tbl = table.at[:, 0].set(0.0)
    assert not bool(ctrl.solution_ok(CFG, good, swing_tbl))
    # non-finite solve
    nan = good.at[0, 0, 0].set(jnp.nan)
    assert not bool(ctrl.solution_ok(CFG, nan, table))


def test_solver_failure_holds_previous_solution():
    state, ctx = _ticked()
    known = jnp.zeros((4, 3), jnp.float32).at[:, 2].set(22.5)
    loco = state.core.locomotion.replace(fr_des=known)
    state = state.replace(core=state.core.replace(locomotion=loco))

    # fault injection: poisoned foot positions -> NaN Hessian -> NaN solve
    bad_ctx = dict(ctx)
    bad_ctx["p_foot"] = jnp.full((4, 3), jnp.nan, jnp.float32)
    new = ctrl.mpc_update(CFG, state, bad_ctx, iterations=8)
    loco2 = new.core.locomotion
    assert int(loco2.mpc_fail_count) == 1
    np.testing.assert_array_equal(np.asarray(loco2.fr_des), np.asarray(known))
    assert bool(jnp.all(jnp.isfinite(loco2.f_ff)))

    # happy path: a real solve replaces the forces and does not count a fail
    new2 = ctrl.mpc_update(CFG, state, ctx, iterations=40)
    loco3 = new2.core.locomotion
    assert int(loco3.mpc_fail_count) == 0
    assert not np.allclose(np.asarray(loco3.fr_des), np.asarray(known))
