"""Vectorized safety checker.

Re-derivation of SafetyChecker (reference Controllers/SafetyChecker.cpp:19-278)
plus the latching failure semantics of GaitCtrller::TorqueCalculator
(GaitCtrller.cpp:108-142): any failed check latches `safety_ok=False` and the
controller outputs zero torques forever after (fail-safe, no recovery; an
explicit reset re-creates the state). Clamps are applied like the reference
(the checks modify the offending commands *and* flag failure).
"""

from __future__ import annotations

import jax.numpy as jnp

from quadruped_ctrl_tpu.config import RobotConfig, SafetyConfig


def check_orientation(cfg: SafetyConfig, rpy):
    """|roll|,|pitch| < 0.5 rad (SafetyChecker.cpp:20-28)."""
    return (jnp.abs(rpy[0]) < cfg.rpy_limit) & (jnp.abs(rpy[1]) < cfg.rpy_limit)


def check_p_des_foot(cfg: SafetyConfig, robot: RobotConfig, p_des):
    """Clamp desired foot positions to the reach box (SafetyChecker.cpp:34-121).

    p_des: (4,3). Returns (clamped, ok).
    """
    max_p = robot.max_leg_length * jnp.sin(cfg.max_foot_angle)
    xy = p_des[:, :2]
    xy_c = jnp.clip(xy, -max_p, max_p)
    z_c = jnp.maximum(p_des[:, 2], -robot.max_leg_length)
    clamped = jnp.concatenate([xy_c, z_c[:, None]], axis=1)
    ok = jnp.all(jnp.abs(xy) <= max_p) & jnp.all(p_des[:, 2] >= -robot.max_leg_length)
    return clamped, ok


def check_joint_limits(cfg: SafetyConfig, q):
    """Clamp joint angles (SafetyChecker.cpp:127-170). q: (4,3)."""
    lo = jnp.array([-cfg.max_abad_angle, cfg.min_hip_angle, cfg.min_knee_angle], q.dtype)
    hi = jnp.array([cfg.max_abad_angle, cfg.max_hip_angle, cfg.max_knee_angle], q.dtype)
    clamped = jnp.clip(q, lo[None, :], hi[None, :])
    ok = jnp.all((q >= lo[None, :]) & (q <= hi[None, :]))
    return clamped, ok


def check_force_feedforward(cfg: SafetyConfig, f_ff):
    """Clamp feedforward forces to +-350 N (SafetyChecker.cpp:176-275). f_ff: (4,3)."""
    lim = jnp.array(
        [cfg.max_lateral_force, cfg.max_lateral_force, cfg.max_vertical_force],
        f_ff.dtype,
    )
    clamped = jnp.clip(f_ff, -lim[None, :], lim[None, :])
    ok = jnp.all(jnp.abs(f_ff) <= lim[None, :])
    return clamped, ok
