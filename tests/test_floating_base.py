import numpy as np
import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import RobotConfig
from quadruped_ctrl_tpu.models import leg_kinematics as lk
from quadruped_ctrl_tpu.models.floating_base import MiniCheetahModel

MODEL = MiniCheetahModel()
ROBOT = RobotConfig()


def _q(rng=None):
    if rng is None:
        return jnp.tile(jnp.array([0.0, -0.8, 1.6]), (4,)).reshape(12)
    q = np.zeros((4, 3), np.float32)
    q[:, 0] = rng.uniform(-0.4, 0.4, 4)
    q[:, 1] = rng.uniform(-1.0, -0.3, 4)
    q[:, 2] = rng.uniform(0.8, 2.0, 4)
    return jnp.asarray(q.reshape(12))


def test_foot_positions_match_leg_kinematics():
    for seed in [None, 1, 2]:
        rng = np.random.default_rng(seed) if seed else None
        q = _q(rng)
        feet = np.asarray(jax.jit(MODEL.foot_positions_base)(q))
        hips = ROBOT.hip_locations()
        want = hips + np.asarray(lk.leg_fk(ROBOT, q.reshape(4, 3)))
        np.testing.assert_allclose(feet, want, atol=1e-5)


def test_mass_matrix_spd_and_total_mass():
    q = _q(np.random.default_rng(3))
    m = np.asarray(jax.jit(MODEL.mass_matrix)(q), np.float64)
    np.testing.assert_allclose(m, m.T, atol=1e-5)
    eig = np.linalg.eigvalsh(m)
    assert eig.min() > 0
    # links + 12 x 0.055 kg geared rotors (MiniCheetah.h:84; the rotor
    # masses are why the SRB MPC uses m=9, RobotState.h:27)
    total_mass = 3.3 + 4 * (0.54 + 0.634 + 0.064) + 12 * 0.055
    np.testing.assert_allclose(np.diag(m[3:6, 3:6]), total_mass, rtol=1e-5)
    # no coupling between the three base translations
    np.testing.assert_allclose(m[3:6, 3:6] - np.diag(np.diag(m[3:6, 3:6])), 0,
                               atol=1e-6)


def test_gravity_torques():
    """At rest, the generalized bias must carry exactly the robot's weight
    through the base force rows (base z force = +m g with our sign choice)."""
    q = _q()
    h = np.asarray(
        jax.jit(lambda q: MODEL.bias_forces(q, jnp.zeros(12), jnp.zeros(6)))(q)
    )
    total_mass = 3.3 + 4 * (0.54 + 0.634 + 0.064) + 12 * 0.055
    np.testing.assert_allclose(h[5], total_mass * 9.81, rtol=1e-4)


def test_rnea_crba_consistency():
    """M(q) qdd + h(q, qd) must equal the generalized force that produced
    qdd via forward dynamics — CRBA and RNEA validate each other."""
    rng = np.random.default_rng(4)
    q = _q(rng)
    qd = jnp.asarray(rng.uniform(-1, 1, 12).astype(np.float32))
    base_vel = jnp.asarray(rng.uniform(-0.5, 0.5, 6).astype(np.float32))
    tau = jnp.asarray(rng.uniform(-3, 3, 12).astype(np.float32))

    qdd = jax.jit(
        lambda: MODEL.forward_dynamics(q, qd, base_vel, tau)
    )()
    m = jax.jit(MODEL.mass_matrix)(q)
    h = jax.jit(lambda: MODEL.bias_forces(q, qd, base_vel))()
    lhs = np.asarray(m @ qdd + h)
    rhs = np.concatenate([np.zeros(6), np.asarray(tau)])
    np.testing.assert_allclose(lhs, rhs, atol=2e-4)


def test_contact_jacobian_matches_finite_difference():
    rng = np.random.default_rng(5)
    q = _q(rng)
    jac = np.asarray(jax.jit(MODEL.contact_jacobians)(q))
    # joint part: finite difference of foot positions wrt q
    fd = np.asarray(
        jax.jit(jax.jacobian(lambda qq: MODEL.foot_positions_base(qq)))(q)
    )  # (4,3,12)
    np.testing.assert_allclose(jac[:, :, 6:18], fd, atol=1e-4)
    # base linear part is identity; angular part is -[p]x
    feet = np.asarray(jax.jit(MODEL.foot_positions_base)(q))
    for leg in range(4):
        np.testing.assert_allclose(jac[leg, :, 3:6], np.eye(3), atol=1e-6)
        p = feet[leg]
        px = np.array([[0, -p[2], p[1]], [p[2], 0, -p[0]], [-p[1], p[0], 0]])
        np.testing.assert_allclose(jac[leg, :, 0:3], -px, atol=1e-5)


def test_leg_jacobian_consistency():
    """The joint block of the contact Jacobian must equal the analytic leg
    Jacobian (LegController.cpp:203-244) for each leg."""
    rng = np.random.default_rng(6)
    q = _q(rng)
    jac = np.asarray(jax.jit(MODEL.contact_jacobians)(q))
    jl = np.asarray(lk.leg_jacobian(ROBOT, q.reshape(4, 3)))
    for leg in range(4):
        block = jac[leg, :, 6 + 3 * leg : 9 + 3 * leg]
        np.testing.assert_allclose(block, jl[leg], atol=1e-5)


def test_actuator_model_saturation():
    from quadruped_ctrl_tpu.models import actuator

    qd = jnp.zeros(12)
    # small torques pass through (minus negligible static friction at qd=0)
    tau = np.asarray(actuator.achievable_torque(ROBOT, jnp.full(12, 5.0), qd))
    np.testing.assert_allclose(tau, 5.0, atol=0.05)
    # huge commands saturate at gear * motor_tau_max
    tau = np.asarray(actuator.achievable_torque(ROBOT, jnp.full(12, 500.0), qd))
    g = np.array([6.0, 6.0, 9.33] * 4)
    np.testing.assert_allclose(tau, g * 3.0, rtol=1e-5)
    # high speed reduces available torque (back-EMF voltage limit binds)
    fast = jnp.full(12, 35.0)
    tau_fast = np.asarray(actuator.achievable_torque(ROBOT, jnp.full(12, 500.0), fast))
    assert (tau_fast < tau - 1.0).all()
