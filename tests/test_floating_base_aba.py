"""FloatingBaseModel tail APIs (reference FloatingBaseModel.cpp:879-1106,
360-376): ABA forward dynamics, test-force / inverse contact inertia, and
body-box contact points — differential-tested against the CRBA/RNEA path."""

import numpy as np
import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.models.floating_base import MiniCheetahModel, N_DOF

MODEL = MiniCheetahModel()
RNG = np.random.default_rng(7)


def _rand_state():
    q = jnp.asarray(
        np.tile([0.0, -0.8, 1.6], 4) + RNG.uniform(-0.3, 0.3, 12), jnp.float32
    )
    qd = jnp.asarray(RNG.uniform(-2.0, 2.0, 12), jnp.float32)
    base_vel = jnp.asarray(RNG.uniform(-1.0, 1.0, 6), jnp.float32)
    tau = jnp.asarray(RNG.uniform(-5.0, 5.0, 12), jnp.float32)
    return q, qd, base_vel, tau


def test_aba_matches_crba_rnea_solve():
    for _ in range(4):
        q, qd, bv, tau = _rand_state()
        ref = np.asarray(MODEL.forward_dynamics(q, qd, bv, tau))
        got = np.asarray(MODEL.aba(q, qd, bv, tau))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)


def test_aba_matches_with_orientation_and_foot_forces():
    q, qd, bv, tau = _rand_state()
    # a tilted base and external stance forces
    ang = 0.3
    r_body = jnp.asarray(
        [[np.cos(ang), 0, -np.sin(ang)], [0, 1, 0],
         [np.sin(ang), 0, np.cos(ang)]], jnp.float32
    )
    f_feet = jnp.asarray(RNG.uniform(-30.0, 30.0, (4, 3)), jnp.float32)
    ref = np.asarray(
        MODEL.forward_dynamics(q, qd, bv, tau, r_body=r_body,
                               f_ext_feet=f_feet)
    )
    got = np.asarray(
        MODEL.aba(q, qd, bv, tau, r_body=r_body, f_ext_feet=f_feet)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)


def test_aba_jittable():
    q, qd, bv, tau = _rand_state()
    f = jax.jit(lambda *a: MODEL.aba(*a))
    out = np.asarray(f(q, qd, bv, tau))
    assert out.shape == (N_DOF,) and np.isfinite(out).all()


def test_inv_contact_inertia_spd_and_consistent():
    q, _, _, _ = _rand_state()
    lam_inv = np.asarray(MODEL.inv_contact_inertia(q))
    assert lam_inv.shape == (12, 12)
    np.testing.assert_allclose(lam_inv, lam_inv.T, atol=1e-4)
    ev = np.linalg.eigvalsh(0.5 * (lam_inv + lam_inv.T))
    assert ev.min() > 0.0
    # diagonal block == J_leg M^-1 J_leg^T from apply_test_force columns
    for axis in range(3):
        e = jnp.zeros(3, jnp.float32).at[axis].set(1.0)
        dv, dqd = MODEL.apply_test_force(q, 1, e)
        np.testing.assert_allclose(
            np.asarray(dv), lam_inv[3:6, 3 + axis], rtol=1e-4, atol=1e-5
        )


def test_apply_test_force_response_direction():
    q, _, _, _ = _rand_state()
    # pushing a foot up must accelerate that foot up (Lambda^-1 SPD)
    dv, dqd = MODEL.apply_test_force(q, 0, jnp.asarray([0.0, 0.0, 1.0]))
    assert float(dv[2]) > 0.0
    assert dqd.shape == (N_DOF,)


def test_box_contact_points():
    pts = np.asarray(MODEL.box_contact_points())
    assert pts.shape == (8, 3)
    r = MODEL.robot
    np.testing.assert_allclose(
        np.abs(pts),
        np.tile([[r.body_length / 2, r.body_width / 2, r.body_height / 2]],
                (8, 1)),
    )
    assert len({tuple(p) for p in pts.tolist()}) == 8

    jac = np.asarray(MODEL.box_point_jacobians())
    assert jac.shape == (8, 3, 18)
    # pure base translation moves every corner identically
    v = jac @ np.concatenate([np.zeros(3), [0.0, 0.0, 1.0], np.zeros(12)])
    np.testing.assert_allclose(v, np.tile([[0.0, 0.0, 1.0]], (8, 1)).reshape(8, 3))
    # base rotation: v = omega x p
    omega = np.array([0.0, 0.0, 2.0])
    v = jac @ np.concatenate([omega, np.zeros(15)])
    pts_v = np.cross(np.tile(omega, (8, 1)), pts)
    np.testing.assert_allclose(v, pts_v, atol=1e-6)

    w = MODEL.box_point_positions_world(
        jnp.asarray([1.0, 2.0, 0.3]), jnp.eye(3, dtype=jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(w), pts + np.array([1.0, 2.0, 0.3]))
