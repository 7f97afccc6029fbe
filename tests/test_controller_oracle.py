"""Controller-internals golden tests: the per-tick math (velocity filtering,
Raibert foot placement, reference trajectory) against independent NumPy
transliterations of the reference formulas (ConvexMPCLocomotion.cpp:76-114,
297-371, 498-577) — the controller-level counterpart of the solver's
differential tests."""

import numpy as np
import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.control import swing as swing_mod
from quadruped_ctrl_tpu.mpc.reference import build_reference

CFG = default_config()


def _rot_z(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def test_foot_placement_matches_reference_formula():
    rng = np.random.default_rng(0)
    for _ in range(5):
        yaw = rng.uniform(-1, 1)
        r_body_t = _rot_z(yaw)                       # body->world (yaw only)
        position = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), 0.27])
        v_world = rng.uniform(-0.5, 0.5, 3)
        v_des_robot = np.array([rng.uniform(0, 1), rng.uniform(-0.3, 0.3), 0.0])
        v_des_world = r_body_t @ v_des_robot
        yaw_rate = rng.uniform(-0.5, 0.5)
        stance_times = np.full(4, 0.182)
        swing_remaining = rng.uniform(0.01, 0.18, 4)

        got = np.asarray(
            jax.jit(
                lambda: swing_mod.foot_placement(
                    CFG,
                    jnp.asarray(CFG.robot.hip_locations()),
                    jnp.asarray(position, jnp.float32),
                    jnp.asarray(r_body_t, jnp.float32),
                    jnp.asarray(v_world, jnp.float32),
                    jnp.asarray(v_des_robot, jnp.float32),
                    jnp.asarray(v_des_world, jnp.float32),
                    jnp.asarray(yaw_rate, jnp.float32),
                    jnp.asarray(stance_times, jnp.float32),
                    jnp.asarray(swing_remaining, jnp.float32),
                )
            )()
        )

        # independent numpy transliteration (ConvexMPCLocomotion.cpp:297-371)
        hips = CFG.robot.hip_locations()
        side_sign = [-1, 1, -1, 1]
        interleave_y = [-0.08, 0.08, 0.02, -0.02]
        v_abs = abs(v_des_robot[0])
        for leg in range(4):
            p_rf = hips[leg] + np.array([0.0, side_sign[leg] * 0.065, 0.0])
            p_rf = p_rf.copy()
            p_rf[1] += interleave_y[leg] * v_abs * (-0.2)
            ang = -yaw_rate * stance_times[leg] / 2
            cz, sz = np.cos(ang), np.sin(ang)
            coord_rot = np.array([[cz, sz, 0], [-sz, cz, 0], [0, 0, 1]])
            p_yaw = coord_rot @ p_rf
            pf = position + r_body_t @ (p_yaw + v_des_robot * swing_remaining[leg])
            cap = 0.5 * np.sqrt(position[2] / 9.81)
            pfx = (
                v_world[0] * 0.5 * stance_times[leg]
                + 0.03 * (v_world[0] - v_des_world[0])
                + cap * (v_world[1] * yaw_rate)
            )
            pfy = (
                v_world[1] * 0.5 * stance_times[leg]
                + 0.03 * (v_world[1] - v_des_world[1])
                + cap * (-v_world[0] * yaw_rate)
            )
            pf[0] += np.clip(pfx, -0.3, 0.3)
            pf[1] += np.clip(pfy, -0.3, 0.3)
            pf[2] = 0.0
            np.testing.assert_allclose(got[leg], pf, atol=1e-5)


def test_reference_trajectory_matches_transliteration():
    rng = np.random.default_rng(1)
    h = 10
    wpd = np.array([0.5, -0.2, 0.7])
    position = np.array([0.45, -0.15, 0.26])
    rpy_comp = np.array([0.01, -0.02, 0.0])
    yaw_des_true = 0.3
    yaw_rate = 0.4
    v_des_world = np.array([0.5, 0.1, 0.0])
    traj, wpd_new = jax.jit(
        lambda: build_reference(
            CFG,
            jnp.asarray(False),
            jnp.zeros(6, jnp.float32),
            jnp.asarray(wpd, jnp.float32),
            jnp.asarray(position, jnp.float32),
            jnp.asarray(rpy_comp, jnp.float32),
            jnp.asarray(yaw_des_true, jnp.float32),
            jnp.asarray(yaw_rate, jnp.float32),
            jnp.asarray(v_des_world, jnp.float32),
            h,
        )
    )()
    traj = np.asarray(traj)

    # transliteration (ConvexMPCLocomotion.cpp:533-577)
    dt_mpc = CFG.dt_mpc
    x0 = np.clip(wpd[0], position[0] - 0.1, position[0] + 0.1)
    y0 = np.clip(wpd[1], position[1] - 0.1, position[1] + 0.1)
    want = np.zeros((h, 12))
    row = [rpy_comp[0], rpy_comp[1], yaw_des_true, x0, y0, 0.25, 0, 0,
           yaw_rate, v_des_world[0], v_des_world[1], 0]
    for i in range(h):
        want[i] = row
        if i > 0:
            want[i, 3] = want[i - 1, 3] + dt_mpc * v_des_world[0]
            want[i, 4] = want[i - 1, 4] + dt_mpc * v_des_world[1]
            want[i, 2] = want[i - 1, 2] + dt_mpc * yaw_rate
    np.testing.assert_allclose(traj[:, :12], want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wpd_new)[:2], [x0, y0], atol=1e-6)


def test_standing_trajectory_holds_captured_pose():
    h = 10
    stand_traj = jnp.asarray([0.3, -0.1, 0.21, 0.0, 0.0, 0.8], jnp.float32)
    traj, _ = jax.jit(
        lambda: build_reference(
            CFG,
            jnp.asarray(True),
            stand_traj,
            jnp.zeros(3, jnp.float32),
            jnp.zeros(3, jnp.float32),
            jnp.zeros(3, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            jnp.zeros(3, jnp.float32),
            h,
        )
    )()
    traj = np.asarray(traj)
    for i in range(h):
        np.testing.assert_allclose(
            traj[i, :6], [0, 0, 0.8, 0.3, -0.1, 0.25], atol=1e-6
        )
