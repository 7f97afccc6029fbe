"""Cheater (ground-truth pass-through) estimators.

Re-derivation of CheaterOrientationEstimator / CheaterPositionVelocityEstimator
(reference Controllers/OrientationEstimator.cpp:21-39,
PositionVelocityEstimator.cpp:229-241; registered only when cheater_mode,
which the reference never enables): bypass the sensor pipeline with simulator
ground truth — useful for isolating controller behavior from estimation
error in closed-loop studies.
"""

from __future__ import annotations

import jax.numpy as jnp

from quadruped_ctrl_tpu.core import rotations as rot
from quadruped_ctrl_tpu.core.types import StateEstimate


def cheater_estimate(position, quat_wxyz, v_world, omega_body,
                     a_body=None, contact_phase=None) -> StateEstimate:
    """Build a StateEstimate directly from ground truth."""
    r_body = rot.quat_to_rbody(quat_wxyz)
    a_body = jnp.zeros(3, jnp.float32) if a_body is None else a_body
    contact = (
        jnp.full((4,), 0.5, jnp.float32) if contact_phase is None else contact_phase
    )
    return StateEstimate(
        position=position,
        v_world=v_world,
        v_body=r_body @ v_world,
        orientation=quat_wxyz,
        r_body=r_body,
        rpy=rot.quat_to_rpy(quat_wxyz),
        omega_body=omega_body,
        omega_world=r_body.T @ omega_body,
        a_body=a_body,
        a_world=r_body.T @ a_body,
        contact_estimate=contact,
    )
