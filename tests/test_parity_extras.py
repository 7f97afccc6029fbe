"""Tests for the parity-completeness components (defined-but-unused in the
reference, provided here as working code)."""

import numpy as np
import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.control.desired_state import desired_state_trajectory
from quadruped_ctrl_tpu.core import rotations as rot
from quadruped_ctrl_tpu.estimation.cheater import cheater_estimate
from quadruped_ctrl_tpu.gait import gait


def test_mixed_frequency_gait():
    periods = jnp.array([10, 10, 12, 12], jnp.int32)
    duty = 0.5
    table = np.asarray(gait.mixed_mpc_table(jnp.asarray(0), 13, periods, duty, 12))
    assert table.shape == (12, 4)
    assert set(np.unique(table)) <= {0.0, 1.0}
    # each leg is in stance for duty_cycle of its own period
    for leg in range(4):
        period = int(periods[leg])
        assert table[:period, leg].mean() == duty
    ph = gait.mixed_phase_of(jnp.asarray(65), 13, periods)
    cs = np.asarray(gait.mixed_contact_state(ph, duty))
    ss = np.asarray(gait.mixed_swing_state(ph, duty))
    assert ((cs == 0) | (ss == 0)).all()
    st = np.asarray(gait.mixed_stance_time(0.026, periods, duty))
    sw = np.asarray(gait.mixed_swing_time(0.026, periods, duty))
    np.testing.assert_allclose(st + sw, 0.026 * np.asarray(periods), rtol=1e-6)


def test_cheater_estimate():
    q = rot.rpy_to_quat(jnp.array([0.0, 0.0, 0.5], jnp.float32))
    se = cheater_estimate(
        jnp.array([1.0, 2.0, 0.28], jnp.float32),
        q,
        jnp.array([0.5, 0.0, 0.0], jnp.float32),
        jnp.zeros(3, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(se.rpy)[2], 0.5, atol=1e-6)
    # v_body = rBody @ v_world rotates the world velocity into the body frame
    np.testing.assert_allclose(
        np.asarray(se.v_body),
        [0.5 * np.cos(0.5), -0.5 * np.sin(0.5), 0.0],
        atol=1e-6,
    )


def test_desired_state_trajectory_integrates_rates():
    s = jnp.zeros(12, jnp.float32).at[6].set(1.0).at[11].set(0.5)  # vx, yaw rate
    traj = np.asarray(desired_state_trajectory(s, jnp.full((10,), 0.1)))
    np.testing.assert_allclose(traj[-1, 0], 1.0, atol=1e-5)   # x advanced
    np.testing.assert_allclose(traj[-1, 5], 0.5, atol=1e-5)   # yaw advanced
