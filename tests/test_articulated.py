"""Full-dynamics closed-loop tests: the controller must stand and trot when
driving the 18-DoF articulated model through actual joint torques (actuator
saturation + penalty ground contact) — the deepest end-to-end validation,
exercising the torque path the SRB engine bypasses."""

import numpy as np
import jax

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.core.types import Command
from quadruped_ctrl_tpu.models.floating_base import MiniCheetahModel
from quadruped_ctrl_tpu.sim import articulated as art
from quadruped_ctrl_tpu.sim.terrain import Terrain

CFG = default_config()
MODEL = MiniCheetahModel()


def test_passive_settle():
    import jax.numpy as jnp

    terr = Terrain.plane()
    st = art.articulated_init(CFG, MODEL, terr)
    q0 = st.q

    @jax.jit
    def tick(st):
        tau = 40.0 * (q0 - st.q) - 1.0 * st.qd
        return art.articulated_step(CFG, MODEL, st, tau, terr)

    for _ in range(400):
        st = tick(st)
    assert 0.2 < float(st.p[2]) < 0.3
    assert float(jnp.abs(st.qd).max()) < 0.5


def test_articulated_stand_and_trot():
    terr = Terrain.plane()
    cmd = Command.create(0.5, 0.0, 0.0, gait_type=9, robot_mode=0)
    state, sim, traj = art.run_articulated_session(
        CFG, terr, cmd, n_ticks=2200, model=MODEL
    )
    p = np.asarray(traj["p"])
    v = np.asarray(traj["v"])
    assert 0.22 < p[-500:, 2].mean() < 0.30
    assert abs(v[-800:, 0].mean() - 0.5) < 0.15
    assert bool(np.asarray(traj["safety"])[-1])
    # torques respect actuator-scale limits
    tau = np.asarray(traj["tau"])
    assert np.abs(tau).max() < 30.0


def test_sensors_qd_bounded_at_singular_leg():
    """Near knee full extension the leg Jacobian is singular; the damped
    solve must return bounded joint velocities, not inf/NaN (the reference
    clamps its IK inputs for the same reason, LegController.cpp:255-287)."""
    import jax.numpy as jnp

    from quadruped_ctrl_tpu.sim import engine
    from quadruped_ctrl_tpu.models import leg_kinematics as lk

    cfg = CFG
    sim = engine.sim_init(cfg, Terrain.plane())
    # stretch all legs straight down (q = 0 -> knee fully extended)
    q = jnp.zeros((4, 3), jnp.float32)
    foot_hip = lk.leg_fk(cfg.robot, q)
    hips = jnp.asarray(cfg.robot.hip_locations())
    foot_w = sim.p[None, :] + hips + foot_hip
    sim = sim.replace(
        foot_pos=foot_w,
        foot_vel=jnp.full((4, 3), 0.5, jnp.float32),  # moving feet
        p=sim.p + jnp.array([0.0, 0.0, 0.05], jnp.float32),
    )
    sens = engine.sensors_from_sim(cfg, sim)
    qd = np.asarray(sens.qd)
    assert np.isfinite(qd).all()
    assert np.abs(qd).max() < 1e4
