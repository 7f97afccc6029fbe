"""The closed-loop batched MPC fast path (`mpc_update_batched`) must agree
with the per-lane reference path (`vmap(mpc_update)`): same formation, same
ADMM splitting, different execution schedule (batch-explicit solver that
dispatches to the Pallas kernels on TPU). On CPU both run pure-XLA, and the
polish drives both to the same active set, so forces agree tightly."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.control import controller as ctrl
from quadruped_ctrl_tpu.core.types import Command, Sensors

CFG = default_config()
BATCH = 4


def _batched_states_ctx():
    key = jax.random.PRNGKey(0)

    def one(k):
        ks = jax.random.split(k, 4)
        q = jnp.tile(jnp.array([0.0, -0.8, 1.6], jnp.float32), (4,))
        q = q + jax.random.uniform(ks[0], (12,), jnp.float32, -0.05, 0.05)
        sensors = Sensors(
            quat=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
            gyro=jax.random.uniform(ks[1], (3,), jnp.float32, -0.1, 0.1),
            accelerometer=jnp.array([0.0, 0.0, 9.8], jnp.float32),
            q=q,
            qd=jax.random.uniform(ks[2], (12,), jnp.float32, -0.2, 0.2),
        )
        vx = jax.random.uniform(ks[3], (), jnp.float32, 0.0, 0.8)
        cmd = Command(
            vel=jnp.stack([vx, 0.0 * vx, 0.0 * vx]),
            gait_type=jnp.asarray(9, jnp.int32),
            robot_mode=jnp.asarray(0, jnp.int32),
        )
        state = ctrl.init_state(CFG)
        # a few ticks to land in a realistic mid-gait state
        for _ in range(3):
            state, ctx = ctrl.control_tick(CFG, state, sensors, cmd)
        return state, ctx

    return jax.vmap(one)(jax.random.split(key, BATCH))


def test_batched_matches_per_lane():
    states, ctx = _batched_states_ctx()
    per_lane = jax.vmap(
        lambda s, c: ctrl.mpc_update(CFG, s, c, iterations=120)
    )(states, ctx)
    batched = ctrl.mpc_update_batched(CFG, states, ctx, iterations=120)

    fr_a = np.asarray(per_lane.core.locomotion.fr_des)
    fr_b = np.asarray(batched.core.locomotion.fr_des)
    assert np.all(np.isfinite(fr_b))
    np.testing.assert_allclose(fr_b, fr_a, atol=0.15)

    np.testing.assert_allclose(
        np.asarray(batched.core.locomotion.f_ff),
        np.asarray(per_lane.core.locomotion.f_ff), atol=0.15,
    )
    # bookkeeping fields update identically
    np.testing.assert_allclose(
        np.asarray(batched.core.locomotion.world_position_desired),
        np.asarray(per_lane.core.locomotion.world_position_desired),
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(batched.core.locomotion.mpc_fail_count),
        np.asarray(per_lane.core.locomotion.mpc_fail_count),
    )


def test_batched_h_sol_10_matches_full_when_mpc_h_10():
    states, ctx = _batched_states_ctx()
    # force the sticky horizon to 10 (the reference demo's steady state)
    loco = states.core.locomotion.replace(
        mpc_h=jnp.full((BATCH,), 10, jnp.int32)
    )
    states = states.replace(core=states.core.replace(locomotion=loco))
    full = ctrl.mpc_update_batched(CFG, states, ctx, iterations=120)
    h10 = ctrl.mpc_update_batched(CFG, states, ctx, h_sol=10, iterations=120)
    np.testing.assert_allclose(
        np.asarray(h10.core.locomotion.fr_des),
        np.asarray(full.core.locomotion.fr_des), atol=0.15,
    )
