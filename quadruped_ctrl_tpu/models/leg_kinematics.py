"""Analytic 3-DoF leg kinematics: FK, Jacobian, IK.

Re-derivation of the Mini-Cheetah leg geometry used by the reference
(LegController.cpp:203-287). All functions are vectorized over all 4 legs at
once, shape (4, 3) in/out, and are vmappable over a batch of robots.

Leg frame: origin at the ab/ad pivot, same orientation as the body frame.
Joint order per leg: [abad, hip, knee]. side_sign = (-1, +1, -1, +1) for
legs (FR, FL, HR, HL).
"""

from __future__ import annotations

import jax.numpy as jnp

from quadruped_ctrl_tpu.config import RobotConfig


def _link_lengths(robot: RobotConfig):
    return (
        robot.abad_link_length,
        robot.hip_link_length,
        robot.knee_link_length,
        robot.knee_link_y_offset,
    )


def leg_fk(robot: RobotConfig, q: jnp.ndarray) -> jnp.ndarray:
    """Foot position in each leg's hip frame. q: (..., 4, 3) -> (..., 4, 3).

    Matches reference computeLegJacobianAndPosition (LegController.cpp:237-243).
    """
    l1, l2, l3, l4 = _link_lengths(robot)
    side = jnp.asarray(robot.side_signs, dtype=q.dtype)
    s1, s2, s3 = jnp.sin(q[..., 0]), jnp.sin(q[..., 1]), jnp.sin(q[..., 2])
    c1, c2, c3 = jnp.cos(q[..., 0]), jnp.cos(q[..., 1]), jnp.cos(q[..., 2])
    c23 = c2 * c3 - s2 * s3
    s23 = s2 * c3 + c2 * s3
    px = l3 * s23 + l2 * s2
    py = (l1 + l4) * side * c1 + l3 * (s1 * c23) + l2 * c2 * s1
    pz = (l1 + l4) * side * s1 - l3 * (c1 * c23) - l2 * c1 * c2
    return jnp.stack([px, py, pz], axis=-1)


def leg_jacobian(robot: RobotConfig, q: jnp.ndarray) -> jnp.ndarray:
    """Foot Jacobian d p / d q. q: (..., 4, 3) -> (..., 4, 3, 3).

    Matches reference computeLegJacobianAndPosition (LegController.cpp:223-235).
    """
    l1, l2, l3, l4 = _link_lengths(robot)
    side = jnp.asarray(robot.side_signs, dtype=q.dtype)
    s1, s2, s3 = jnp.sin(q[..., 0]), jnp.sin(q[..., 1]), jnp.sin(q[..., 2])
    c1, c2, c3 = jnp.cos(q[..., 0]), jnp.cos(q[..., 1]), jnp.cos(q[..., 2])
    c23 = c2 * c3 - s2 * s3
    s23 = s2 * c3 + c2 * s3
    zero = jnp.zeros_like(s1)
    rows = [
        zero, l3 * c23 + l2 * c2, l3 * c23,
        l3 * c1 * c23 + l2 * c1 * c2 - (l1 + l4) * side * s1,
        -l3 * s1 * s23 - l2 * s1 * s2,
        -l3 * s1 * s23,
        l3 * s1 * c23 + l2 * c2 * s1 + (l1 + l4) * side * c1,
        l3 * c1 * s23 + l2 * c1 * s2,
        l3 * c1 * s23,
    ]
    jac = jnp.stack(rows, axis=-1)
    return jac.reshape(q.shape[:-1] + (3, 3))


def leg_ik(robot: RobotConfig, p_des: jnp.ndarray, knee_sign: float = 1.0) -> jnp.ndarray:
    """Joint angles for a desired hip-frame foot position (true FK inverse).

    p_des: (..., 4, 3) -> q: (..., 4, 3). Re-derived from the leg geometry;
    the abad solution and the knee cosine match the reference computeLegIK
    (LegController.cpp:255-287, incl. the out-of-domain D clamping), but the
    reference's hip angle uses atan2(-x, ...), which sign-flips x relative to
    its own FK — a latent bug it never notices because qDes is unused
    downstream. This version satisfies leg_fk(leg_ik(p)) == p.

    knee_sign=+1 selects the knee-forward branch used by the robot's crouch
    pose (q_knee ~ +1.6); -1 selects the reference's branch.
    """
    l1 = robot.abad_link_length + robot.knee_link_y_offset
    l2 = robot.hip_link_length
    l3 = robot.knee_link_length
    side = jnp.asarray(robot.side_signs, dtype=p_des.dtype)
    x, y, z = p_des[..., 0], p_des[..., 1], p_des[..., 2]

    d = (x * x + y * y + z * z - l1 * l1 - l2 * l2 - l3 * l3) / (2 * l2 * l3)
    d = jnp.clip(d, -0.99999, 0.99999)
    gamma = jnp.arctan2(knee_sign * jnp.sqrt(1.0 - d * d), d)

    u = jnp.sqrt(jnp.maximum(y * y + z * z - l1 * l1, 1e-12))
    q0 = jnp.arctan2(z, y) + jnp.arctan2(u, side * l1)
    alpha = jnp.arctan2(x, u) - jnp.arctan2(
        l3 * jnp.sin(gamma), l2 + l3 * jnp.cos(gamma)
    )
    return jnp.stack([q0, alpha, gamma], axis=-1)


def foot_velocity(jac: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
    """v = J @ qd per leg (LegController.cpp:106)."""
    return jnp.einsum("...ij,...j->...i", jac, qd)
