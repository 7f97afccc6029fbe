import numpy as np
import jax.numpy as jnp

from quadruped_ctrl_tpu.core import rotations as rot
from tests import oracle


def random_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def test_quat_to_rpy_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(50):
        q = random_quat(rng)
        got = np.asarray(rot.quat_to_rpy(jnp.asarray(q, jnp.float32)))
        want = oracle.quat_to_rpy(q)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_rpy_quat_round_trip():
    rng = np.random.default_rng(1)
    for _ in range(50):
        rpy = rng.uniform([-3, -1.4, -3], [3, 1.4, 3])
        q = rot.rpy_to_quat(jnp.asarray(rpy, jnp.float32))
        back = np.asarray(rot.quat_to_rpy(q))
        np.testing.assert_allclose(back, rpy, atol=1e-5)


def test_rbody_is_world_to_body():
    # rotate +90deg about z: world x-axis becomes body -y... check numerically:
    # a body yawed +90deg sees the world +x direction along its -y axis.
    yaw = np.pi / 2
    q = rot.rpy_to_quat(jnp.array([0.0, 0.0, yaw], jnp.float32))
    r_body = np.asarray(rot.quat_to_rbody(q))
    v_world = np.array([1.0, 0.0, 0.0])
    v_body = r_body @ v_world
    np.testing.assert_allclose(v_body, [0.0, -1.0, 0.0], atol=1e-6)


def test_rot_z_vs_coordinate_rotation():
    theta = 0.37
    rz = np.asarray(rot.rot_z(jnp.asarray(theta)))
    cz = np.asarray(rot.coordinate_rotation_z(jnp.asarray(theta)))
    np.testing.assert_allclose(cz, rz.T, atol=1e-6)
    c, s = np.cos(theta), np.sin(theta)
    np.testing.assert_allclose(cz, [[c, s, 0], [-s, c, 0], [0, 0, 1]], atol=1e-6)


def test_quat_product_matches_rotation_composition():
    rng = np.random.default_rng(2)
    for _ in range(20):
        q1, q2 = random_quat(rng), random_quat(rng)
        q12 = rot.quat_product(jnp.asarray(q1, jnp.float32), jnp.asarray(q2, jnp.float32))
        r12 = np.asarray(rot.quat_to_rot(q12))
        want = np.asarray(rot.quat_to_rot(jnp.asarray(q1, jnp.float32))) @ np.asarray(
            rot.quat_to_rot(jnp.asarray(q2, jnp.float32))
        )
        np.testing.assert_allclose(r12, want, atol=1e-5)


def test_quat_integrate_pure_z():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    omega = jnp.array([0.0, 0.0, 1.0])
    qn = q
    for _ in range(100):
        qn = rot.quat_integrate(qn, omega, 0.01)
    rpy = np.asarray(rot.quat_to_rpy(qn))
    np.testing.assert_allclose(rpy[2], 1.0, atol=1e-4)
