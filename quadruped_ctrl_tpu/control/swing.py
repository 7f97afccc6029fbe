"""Bezier swing trajectories and Raibert-style foot placement.

Re-derivations of FootSwingTrajectory (reference
Controllers/FootSwingTrajectory.cpp:16-37) and the foot-placement block of
ConvexMPCLocomotion::run (ConvexMPCLocomotion.cpp:297-371). Vectorized over
all 4 feet; vmappable over robots.
"""

from __future__ import annotations

import jax.numpy as jnp

from quadruped_ctrl_tpu.config import FrameworkConfig
from quadruped_ctrl_tpu.core.interpolation import (
    cubic_bezier,
    cubic_bezier_d1,
    cubic_bezier_d2,
)
from quadruped_ctrl_tpu.core.rotations import coordinate_rotation_z


def swing_trajectory(p0, pf, height, phase, swing_time):
    """Position/velocity/acceleration along the swing.

    p0, pf: (..., 3) liftoff / touchdown (world). phase in [0,1].
    x/y follow one cubic Bezier; z is two half-Beziers via an apex at
    p0.z + height (FootSwingTrajectory.cpp:17-37).
    Returns (p, v, a) each (..., 3).
    """
    phase = jnp.asarray(phase)
    ph = phase[..., None]
    st = jnp.asarray(swing_time)[..., None]
    p = cubic_bezier(p0, pf, ph)
    v = cubic_bezier_d1(p0, pf, ph) / st
    a = cubic_bezier_d2(p0, pf, ph) / (st * st)

    z0, zf = p0[..., 2], pf[..., 2]
    apex = z0 + height
    first = phase < 0.5
    x1 = phase * 2.0
    x2 = phase * 2.0 - 1.0
    stz = jnp.asarray(swing_time)
    zp = jnp.where(first, cubic_bezier(z0, apex, x1), cubic_bezier(apex, zf, x2))
    zv = jnp.where(
        first,
        cubic_bezier_d1(z0, apex, x1) * 2.0 / stz,
        cubic_bezier_d1(apex, zf, x2) * 2.0 / stz,
    )
    za = jnp.where(
        first,
        cubic_bezier_d2(z0, apex, x1) * 4.0 / (stz * stz),
        cubic_bezier_d2(apex, zf, x2) * 4.0 / (stz * stz),
    )
    p = p.at[..., 2].set(zp)
    v = v.at[..., 2].set(zv)
    a = a.at[..., 2].set(za)
    return p, v, a


def foot_placement(
    cfg: FrameworkConfig,
    hip_locations,       # (4,3) body-frame hip positions
    position,            # (3,) body position (world)
    r_body_t,            # (3,3) body->world rotation (rBody^T)
    v_world,             # (3,) body velocity (world)
    v_des_robot,         # (3,) desired body-frame velocity
    v_des_world,         # (3,)
    yaw_turn_rate,       # ()
    stance_times,        # (4,) seconds
    swing_time_remaining,  # (4,) seconds
):
    """Touchdown targets Pf for all 4 feet (ConvexMPCLocomotion.cpp:297-371).

    Hip projection (with yaw correction over half a stance), half-stance
    velocity feedforward, velocity-error term, and a capture-point omega
    cross-coupling term; xy clamped to +-p_rel_max, z = 0.
    """
    sw = cfg.swing
    side = jnp.asarray(cfg.robot.side_signs, dtype=position.dtype)
    offset = jnp.stack(
        [jnp.zeros(4, position.dtype), side * sw.side_offset_y, jnp.zeros(4, position.dtype)],
        axis=-1,
    )
    p_robot = hip_locations + offset
    v_abs = jnp.abs(v_des_robot[0])
    interleave = jnp.asarray(sw.interleave_y, dtype=position.dtype)
    p_robot = p_robot.at[:, 1].add(interleave * v_abs * sw.interleave_gain)

    rot = coordinate_rotation_z(-yaw_turn_rate * stance_times / 2.0)  # (4,3,3)
    p_yaw_corrected = jnp.einsum("fij,fj->fi", rot, p_robot)

    pf = position[None, :] + jnp.einsum(
        "ij,fj->fi",
        r_body_t,
        p_yaw_corrected + v_des_robot[None, :] * swing_time_remaining[:, None],
    )

    cap = sw.capture_point_factor * jnp.sqrt(jnp.maximum(position[2], 1e-6) / 9.81)
    pfx_rel = (
        v_world[0] * (0.5 + sw.bonus_swing) * stance_times
        + sw.vel_err_gain * (v_world[0] - v_des_world[0])
        + cap * (v_world[1] * yaw_turn_rate)
    )
    pfy_rel = (
        v_world[1] * 0.5 * stance_times
        + sw.vel_err_gain * (v_world[1] - v_des_world[1])
        + cap * (-v_world[0] * yaw_turn_rate)
    )
    pfx_rel = jnp.clip(pfx_rel, -sw.p_rel_max, sw.p_rel_max)
    pfy_rel = jnp.clip(pfy_rel, -sw.p_rel_max, sw.p_rel_max)

    pf = pf.at[:, 0].add(pfx_rel)
    pf = pf.at[:, 1].add(pfy_rel)
    pf = pf.at[:, 2].set(0.0)
    return pf
