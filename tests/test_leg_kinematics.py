import numpy as np
import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import RobotConfig
from quadruped_ctrl_tpu.models import leg_kinematics as lk

ROBOT = RobotConfig()
fk = jax.jit(lambda q: lk.leg_fk(ROBOT, q))
jac_fn = jax.jit(lambda q: lk.leg_jacobian(ROBOT, q))
ik = jax.jit(lambda p: lk.leg_ik(ROBOT, p))
ik_ref_branch = jax.jit(lambda p: lk.leg_ik(ROBOT, p, knee_sign=-1.0))
fulljac = jax.jit(jax.jacobian(lambda q: lk.leg_fk(ROBOT, q)))


def test_fk_zero_pose():
    p = np.asarray(fk(jnp.zeros((4, 3))))
    l1, l2, l3, l4 = 0.062, 0.209, 0.195, 0.004
    for leg in range(4):
        side = ROBOT.side_signs[leg]
        np.testing.assert_allclose(
            p[leg], [0.0, (l1 + l4) * side, -(l2 + l3)], atol=1e-6
        )


def test_fk_crouch_pose_reasonable():
    # the reference spawns at q = (0, -0.8, 1.6) (walking_simulation.py:35)
    q = jnp.tile(jnp.array([0.0, -0.8, 1.6]), (4, 1))
    p = np.asarray(fk(q))
    assert (p[:, 2] < -0.15).all() and (p[:, 2] > -0.35).all()


def test_jacobian_matches_autodiff():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-0.8, 0.8, size=(4, 3)), jnp.float32)
    jac = np.asarray(jac_fn(q))
    full = np.asarray(fulljac(q))  # (4,3,4,3)
    jac_auto = np.stack([full[leg, :, leg, :] for leg in range(4)])
    np.testing.assert_allclose(jac, jac_auto, atol=1e-4)


def test_ik_fk_round_trip_knee_forward():
    rng = np.random.default_rng(4)
    for _ in range(5):
        q = np.zeros((4, 3), dtype=np.float32)
        q[:, 0] = rng.uniform(-0.4, 0.4, 4)
        q[:, 1] = rng.uniform(-1.0, -0.3, 4)
        q[:, 2] = rng.uniform(0.8, 2.0, 4)
        p = fk(jnp.asarray(q))
        q_ik = np.asarray(ik(p))
        np.testing.assert_allclose(q_ik, q, atol=2e-4)


def test_ik_fk_round_trip_reference_branch():
    rng = np.random.default_rng(14)
    for _ in range(5):
        q = np.zeros((4, 3), dtype=np.float32)
        q[:, 0] = rng.uniform(-0.4, 0.4, 4)
        q[:, 1] = rng.uniform(0.3, 1.0, 4)
        q[:, 2] = rng.uniform(-2.0, -0.8, 4)
        p = fk(jnp.asarray(q))
        q_ik = np.asarray(ik_ref_branch(p))
        np.testing.assert_allclose(q_ik, q, atol=2e-4)


def test_foot_velocity():
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 3)), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, (4, 3)), jnp.float32)
    jac = jac_fn(q)
    v = np.asarray(jax.jit(lk.foot_velocity)(jac, qd))
    want = np.einsum("fij,fj->fi", np.asarray(jac), np.asarray(qd))
    np.testing.assert_allclose(v, want, atol=1e-6)
