"""Actuator (motor electrical) model.

Re-derivation of the reference's ActuatorModel (src/Dynamics/ActuatorModel.h:
54-71): torque command -> motor current -> battery-voltage clamp ->
achievable torque, minus dry + viscous friction. Vectorized over all 12
joints; used by the articulated simulation mode to saturate commanded
torques realistically (the reference builds it but applies raw torques in
PyBullet — here it is actually wired in when enabled).
"""

from __future__ import annotations

import jax.numpy as jnp

from quadruped_ctrl_tpu.config import RobotConfig


def gear_ratios(robot: RobotConfig):
    return jnp.asarray(
        [robot.abad_gear_ratio, robot.hip_gear_ratio, robot.knee_gear_ratio] * 4,
        jnp.float32,
    )


def achievable_torque(robot: RobotConfig, tau_des, qd):
    """tau_des, qd: (12,) joint-space command and velocity -> (12,) torque.

    Mirrors ActuatorModel::getTorque: current from desired torque, clamp by
    what the battery voltage allows at this speed (back-EMF), clamp by the
    max motor torque, then subtract friction.
    """
    g = gear_ratios(robot)
    kt = robot.motor_kt
    r = robot.motor_r
    v_max = robot.battery_v
    tau_motor_max = robot.motor_tau_max

    tau_des_motor = tau_des / g                 # motor-side desired torque
    i_des = tau_des_motor / (kt * 1.5)          # q-axis current
    bemf = qd * g * kt * 2.0                    # back EMF voltage
    v_avail_pos = v_max - bemf
    v_avail_neg = -v_max - bemf
    i_max_pos = v_avail_pos / r
    i_max_neg = v_avail_neg / r
    i_act = jnp.clip(i_des, i_max_neg, i_max_pos)
    tau_motor = jnp.clip(kt * 1.5 * i_act, -tau_motor_max, tau_motor_max)
    tau_joint = tau_motor * g

    friction = (
        robot.joint_damping * qd
        + robot.joint_dry_friction * jnp.tanh(qd / 0.1)
    )
    return tau_joint - friction
