"""MPC reference-trajectory builder.

Re-derivation of the trajAll construction in
ConvexMPCLocomotion::updateMPCIfNeeded (reference
ConvexMPCLocomotion.cpp:498-590): standing holds the captured pose; otherwise
start from the desired world position (clamped to +-0.1 m of the actual) and
integrate the desired world velocity / yaw rate forward per MPC step.

Returns (h_max, 13) — the 12 reference entries plus the zero gravity-state
column — and the (possibly clamped) world_position_desired.
"""

from __future__ import annotations

import jax.numpy as jnp

from quadruped_ctrl_tpu.config import FrameworkConfig


def build_reference(
    cfg: FrameworkConfig,
    standing,                  # () bool: current_gait == 4
    stand_traj,                # (6,) [x,y,z,r,p,yaw]
    world_position_desired,    # (3,)
    position,                  # (3,) estimated
    rpy_comp,                  # (3,) [roll_comp, pitch_comp, -]
    yaw_des_true,              # ()
    yaw_turn_rate,             # ()
    v_des_world,               # (3,)
    h_max: int,
):
    dtype = position.dtype
    dt_mpc = cfg.dt_mpc
    max_err = 0.1

    x_start = jnp.clip(
        world_position_desired[0], position[0] - max_err, position[0] + max_err
    )
    y_start = jnp.clip(
        world_position_desired[1], position[1] - max_err, position[1] + max_err
    )
    wpd = world_position_desired.at[0].set(x_start).at[1].set(y_start)

    steps = jnp.arange(h_max, dtype=dtype)

    # moving branch (lines 533-577): step 0 holds, then integrates
    mv = jnp.zeros((h_max, 13), dtype=dtype)
    mv = mv.at[:, 0].set(rpy_comp[0])
    mv = mv.at[:, 1].set(rpy_comp[1])
    mv = mv.at[:, 2].set(yaw_des_true + steps * dt_mpc * yaw_turn_rate)
    mv = mv.at[:, 3].set(x_start + steps * dt_mpc * v_des_world[0])
    mv = mv.at[:, 4].set(y_start + steps * dt_mpc * v_des_world[1])
    mv = mv.at[:, 5].set(cfg.control.body_height)
    mv = mv.at[:, 8].set(yaw_turn_rate)
    mv = mv.at[:, 9].set(v_des_world[0])
    mv = mv.at[:, 10].set(v_des_world[1])

    # standing branch (lines 514-531)
    st_row = jnp.zeros((13,), dtype=dtype)
    st_row = st_row.at[2].set(stand_traj[5])
    st_row = st_row.at[3].set(stand_traj[0])
    st_row = st_row.at[4].set(stand_traj[1])
    st_row = st_row.at[5].set(cfg.control.body_height)
    st = jnp.broadcast_to(st_row, (h_max, 13))

    traj = jnp.where(standing, st, mv)
    wpd = jnp.where(standing, world_position_desired, wpd)
    return traj, wpd
