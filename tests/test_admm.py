import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quadruped_ctrl_tpu.config import MPCConfig, SolverConfig
from quadruped_ctrl_tpu.mpc import formation
from quadruped_ctrl_tpu.solver import admm
from tests import oracle

MPC = MPCConfig()
SOL = SolverConfig()


def _mpc_qp(rng, h=6, n_swing_steps=2):
    """Build a realistic trot-like MPC QP via the oracle."""
    r_feet = rng.uniform(-0.25, 0.25, (4, 3))
    r_feet[:, 2] = -0.28
    yaw = float(rng.uniform(-0.5, 0.5))
    a_ct, b_ct = oracle.ct_ss_mats(np.array(MPC.inertia), MPC.mass, r_feet, yaw, 0.0)
    _, _, a_qp, b_qp = oracle.c2qp(a_ct, b_ct, 0.026, h)
    x0 = np.concatenate(
        [rng.uniform(-0.05, 0.05, 3), [0, 0, 0.28], rng.uniform(-0.2, 0.2, 3),
         rng.uniform(-0.4, 0.4, 3), [-9.8]]
    )
    traj = np.tile(
        np.array([0, 0, yaw, 0, 0, 0.25, 0, 0, 0, 0.4, 0, 0.0]), (h, 1)
    )
    hess, grad = oracle.qp_cost(a_qp, b_qp, np.array(MPC.weights), MPC.alpha, x0, traj, h)
    # trot-like gait table: alternate diagonal pairs
    gait = np.zeros((h, 4))
    for i in range(h):
        if (i // (h // 2)) % 2 == 0:
            gait[i, [0, 3]] = 1
        else:
            gait[i, [1, 2]] = 1
    fmat = oracle.pyramid_matrix(MPC.mu, h)
    l, u = oracle.pyramid_bounds(gait, MPC.f_max, MPC.big_number, h)
    return hess, grad, fmat, l, u, gait


_solve_mpc = jax.jit(
    lambda hh, gg, gt: admm.admm_mpc(SOL, MPC, hh, gg, gt)
)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_admm_mpc_matches_exact_oracle(seed):
    """First-step GRFs within 0.5 N of a KKT-certified float64 IPM solve."""
    rng = np.random.default_rng(seed)
    h = 4
    hess, grad, fmat, l, u, gait = _mpc_qp(rng, h)
    x_true = oracle.solve_mpc_qp_exact(hess, grad, gait, MPC.mu, MPC.f_max)
    x = np.asarray(
        _solve_mpc(
            jnp.asarray(hess, jnp.float32),
            jnp.asarray(grad, jnp.float32),
            jnp.asarray(gait, jnp.float32),
        ),
        np.float64,
    )
    np.testing.assert_allclose(x[:12], x_true[:12], atol=0.5)
    # primal feasibility in Newtons
    ax = fmat @ x
    assert max(0.0, (ax - u).max(), (l - ax).max()) < 0.1


def test_admm_dense_well_scaled_qp():
    """Generic dense solver on an O(1) random strictly-convex box-constrained QP."""
    rng = np.random.default_rng(10)
    n, m = 24, 30
    mroot = rng.normal(size=(n, n))
    hess = mroot @ mroot.T / n + 0.5 * np.eye(n)
    grad = rng.normal(size=n)
    a_mat = rng.normal(size=(m, n)) / np.sqrt(n)
    l = -rng.uniform(0.5, 1.5, m)
    u = rng.uniform(0.5, 1.5, m)
    x_true = oracle.solve_qp_exact(hess, grad, a_mat, l, u)
    x, z, y = jax.jit(
        lambda: admm.admm_dense(
            SOL,
            jnp.asarray(hess, jnp.float32),
            jnp.asarray(grad, jnp.float32),
            jnp.asarray(a_mat, jnp.float32),
            jnp.asarray(l, jnp.float32),
            jnp.asarray(u, jnp.float32),
            iterations=200,
            polish_rounds=4,
        )
    )()
    np.testing.assert_allclose(np.asarray(x), x_true, atol=3e-3)


def test_swing_feet_forces_are_zero():
    rng = np.random.default_rng(3)
    h = 6
    hess, grad, fmat, l, u, gait = _mpc_qp(rng, h)
    x = _solve_mpc(
        jnp.asarray(hess, jnp.float32),
        jnp.asarray(grad, jnp.float32),
        jnp.asarray(gait, jnp.float32),
    )
    forces = np.asarray(x).reshape(h, 4, 3)
    swing_mask = gait == 0
    assert np.abs(forces[swing_mask]).max() < 0.05
    # stance feet should carry meaningful vertical load (the exact optimum for
    # this synthetic descending-reference QP is ~11 N mean; just require that
    # the solver doesn't collapse to zero)
    stance_fz = forces[~swing_mask][:, 2]
    assert stance_fz.mean() > 5.0


def test_stance_forces_respect_friction_cone_and_fmax():
    rng = np.random.default_rng(4)
    h = 6
    hess, grad, fmat, l, u, gait = _mpc_qp(rng, h)
    x = _solve_mpc(
        jnp.asarray(hess, jnp.float32),
        jnp.asarray(grad, jnp.float32),
        jnp.asarray(gait, jnp.float32),
    )
    f = np.asarray(x).reshape(h, 4, 3)
    tol = 0.05
    assert f[..., 2].max() <= MPC.f_max + tol
    assert f[..., 2].min() >= -tol
    assert (np.abs(f[..., 0]) <= MPC.mu * f[..., 2] + tol).all()
    assert (np.abs(f[..., 1]) <= MPC.mu * f[..., 2] + tol).all()


def test_vmapped_batch_solve():
    h = 6
    problems = [_mpc_qp(np.random.default_rng(s), h) for s in range(4)]
    hs = jnp.stack([jnp.asarray(p[0], jnp.float32) for p in problems])
    gs = jnp.stack([jnp.asarray(p[1], jnp.float32) for p in problems])
    gaits = jnp.stack([jnp.asarray(p[5], jnp.float32) for p in problems])
    batch = jax.jit(jax.vmap(lambda hh, gg, gt: admm.admm_mpc(SOL, MPC, hh, gg, gt)))
    xb = batch(hs, gs, gaits)
    for i in range(4):
        xi = _solve_mpc(hs[i], gs[i], gaits[i])
        # vmapped and single-instance HLO round differently; the polish's
        # boolean active-set decisions can flip on knife-edge rows, so only
        # near-agreement (well inside control tolerance) is guaranteed
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(xi), atol=0.1)


def test_binding_friction_cone_converges():
    """One-sided rows (l=0, u=BIG) must get the regular rho, not rho_infty.

    Regression: classifying rows as 'infinite' when EITHER side exceeds
    infty gave every friction-pyramid row (u=5e10) a 1e-6 penalty; with a
    binding cone the dual built up at 1e-6/iter and ADMM stalled ~500 N
    infeasible (JCQP treats only rows unbounded on BOTH sides as loose,
    QpProblem.cpp:276-291). A demanded lateral push far outside the cone
    forces the cone rows active."""
    rng = np.random.default_rng(7)
    h = 4
    hess, grad, fmat, l, u, gait = _mpc_qp(rng, h)
    # crank the velocity-tracking gradient sideways: optimum slides to the
    # friction-cone boundary
    grad = grad + np.tile([60.0, 60.0, 0.0] * 4, h)
    x_true = oracle.solve_mpc_qp_exact(hess, grad, gait, MPC.mu, MPC.f_max)
    x = np.asarray(
        _solve_mpc(
            jnp.asarray(hess, jnp.float32),
            jnp.asarray(grad, jnp.float32),
            jnp.asarray(gait, jnp.float32),
        ),
        np.float64,
    )
    ax = fmat @ x
    assert max(0.0, (ax - u).max(), (l - ax).max()) < 0.1
    np.testing.assert_allclose(x[:12], x_true[:12], atol=0.8)
    # the cone must actually bind for this to be a regression test
    cone_rows = np.abs(ax[np.isclose(l, 0.0) & (u > 1e9)])
    assert cone_rows.min() < 1e-3


@pytest.mark.parametrize("gait_kind", [0, 1, 2])
def test_hard_battery_cone_pushes(gait_kind):
    """Aggressive-push battery: random lateral gradient pushes force large
    chunks of the friction pyramid active across trot/stand/bound tables.
    With rho=1 this left ~2/3 of cases >2 N from the oracle (worst 1968 N);
    the production defaults (rho=30, 250 iterations, 4 polish rounds) must
    keep every case within control tolerance."""
    h = 10
    fmat = oracle.pyramid_matrix(MPC.mu, h)
    for seed in range(2):
        for push in (0.0, 40.0, 80.0):
            rng = np.random.default_rng(seed)
            r_feet = rng.uniform(-0.25, 0.25, (4, 3))
            r_feet[:, 2] = -0.28
            yaw = float(rng.uniform(-0.5, 0.5))
            a_ct, b_ct = oracle.ct_ss_mats(
                np.array(MPC.inertia), MPC.mass, r_feet, yaw, 0.0
            )
            _, _, a_qp, b_qp = oracle.c2qp(a_ct, b_ct, 0.026, h)
            x0 = np.concatenate(
                [rng.uniform(-0.05, 0.05, 3), [0, 0, 0.28],
                 rng.uniform(-0.2, 0.2, 3), rng.uniform(-0.4, 0.4, 3), [-9.8]]
            )
            traj = np.tile(
                np.array([0, 0, yaw, 0, 0, 0.25, 0, 0, 0, 0.4, 0, 0.0]), (h, 1)
            )
            hess, grad = oracle.qp_cost(
                a_qp, b_qp, np.array(MPC.weights), MPC.alpha, x0, traj, h
            )
            th = rng.uniform(0, 2 * np.pi)
            grad = grad + np.tile(
                [push * np.cos(th), push * np.sin(th), 0.0] * 4, h
            )
            gait = np.zeros((h, 4))
            pairs = {0: ([0, 3], [1, 2]), 2: ([0, 1], [2, 3])}
            if gait_kind == 1:
                gait[:] = 1
            else:
                a_pair, b_pair = pairs[gait_kind]
                for i in range(h):
                    gait[i, a_pair if (i // (h // 2)) % 2 == 0 else b_pair] = 1
            x_true = oracle.solve_mpc_qp_exact(hess, grad, gait, MPC.mu, MPC.f_max)
            x = np.asarray(
                _solve_mpc(
                    jnp.asarray(hess, jnp.float32),
                    jnp.asarray(grad, jnp.float32),
                    jnp.asarray(gait, jnp.float32),
                ),
                np.float64,
            )
            l, u = oracle.pyramid_bounds(gait, MPC.f_max, MPC.big_number, h)
            ax = fmat @ x
            assert max(0.0, (ax - u).max(), (l - ax).max()) < 0.1, (seed, push)
            np.testing.assert_allclose(x, x_true, atol=2.0)


def test_polish_woodbury_path_runs_and_is_guarded():
    """The Woodbury+warm-NS polish variant (config.polish_woodbury, OFF by
    default — see the negative-result note there) must still compile, stay
    finite, and track the cold-round path on typical scenarios; where its
    f32 limitation bites, the best-iterate guard must cap the damage (the
    result can degrade toward round-0 quality but never diverge)."""
    import dataclasses
    import jax
    from quadruped_ctrl_tpu.config import default_config
    from quadruped_ctrl_tpu.mpc import pipeline

    cfg = default_config()
    wb = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, polish_woodbury=True))
    inputs = pipeline.random_inputs(jax.random.PRNGKey(2), 8, 10)
    f_cold = np.asarray(pipeline.solve_packed_batch(cfg, inputs))
    f_wb = np.asarray(pipeline.solve_packed_batch(wb, inputs))
    assert np.isfinite(f_wb).all()
    per_scn = np.abs(f_wb - f_cold).reshape(8, -1).max(axis=1)
    # typical scenarios match closely; the guarded worst case stays bounded
    assert np.median(per_scn) < 1.0, per_scn
    assert per_scn.max() < 40.0, per_scn
