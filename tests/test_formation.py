import numpy as np
import scipy.linalg
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import MPCConfig
from quadruped_ctrl_tpu.mpc import formation
from tests import oracle

CFG = MPCConfig()


def _random_problem(rng, h=10):
    r_feet = rng.uniform(-0.3, 0.3, (4, 3)).astype(np.float32)
    r_feet[:, 2] = rng.uniform(-0.3, -0.2, 4)
    yaw = float(rng.uniform(-np.pi, np.pi))
    x0 = np.concatenate(
        [
            rng.uniform(-0.1, 0.1, 3),     # rpy
            [0.0, 0.0, 0.28],              # p
            rng.uniform(-0.3, 0.3, 3),     # omega
            rng.uniform(-0.5, 0.5, 3),     # v
            [-9.8],
        ]
    ).astype(np.float32)
    traj = np.tile(
        np.array([0, 0, yaw, 0, 0, 0.25, 0, 0, 0, 0.5, 0, 0], dtype=np.float32),
        (h, 1),
    )
    return r_feet, yaw, x0, traj


def test_expm_fixed_matches_scipy():
    rng = np.random.default_rng(7)
    for _ in range(5):
        m = rng.uniform(-0.1, 0.1, (25, 25)).astype(np.float32)
        got = np.asarray(formation.expm_fixed(jnp.asarray(m)))
        want = scipy.linalg.expm(m.astype(np.float64))
        np.testing.assert_allclose(got, want, atol=5e-6)


def test_ct_dynamics_matches_oracle():
    rng = np.random.default_rng(8)
    r_feet, yaw, _, _ = _random_problem(rng)
    a, b = formation.srb_ct_dynamics(
        CFG, jnp.asarray(r_feet), jnp.asarray(yaw), jnp.asarray(0.5)
    )
    a_o, b_o = oracle.ct_ss_mats(np.array(CFG.inertia), CFG.mass, r_feet, yaw, 0.5)
    np.testing.assert_allclose(np.asarray(a), a_o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), b_o, atol=1e-4)


def test_condense_matches_oracle():
    rng = np.random.default_rng(9)
    h = 10
    r_feet, yaw, _, _ = _random_problem(rng, h)
    a_ct, b_ct = oracle.ct_ss_mats(np.array(CFG.inertia), CFG.mass, r_feet, yaw, 0.0)
    dt = 0.026
    adt_o, bdt_o, a_qp_o, b_qp_o = oracle.c2qp(a_ct, b_ct, dt, h)

    adt, bdt = formation.discretize(
        jnp.asarray(a_ct, jnp.float32), jnp.asarray(b_ct, jnp.float32), dt
    )
    np.testing.assert_allclose(np.asarray(adt), adt_o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bdt), bdt_o, atol=1e-5)

    a_qp, b_qp = formation.condense(adt, bdt, h)
    a_qp_flat = np.asarray(a_qp).reshape(h * 13, 13)
    b_qp_flat = np.asarray(b_qp.transpose(0, 2, 1, 3).reshape(h * 13, h * 12))
    np.testing.assert_allclose(a_qp_flat, a_qp_o, atol=1e-4)
    np.testing.assert_allclose(b_qp_flat, b_qp_o, atol=1e-4)


def test_qp_cost_matches_oracle():
    rng = np.random.default_rng(10)
    h = 10
    r_feet, yaw, x0, traj = _random_problem(rng, h)
    a_ct, b_ct = oracle.ct_ss_mats(np.array(CFG.inertia), CFG.mass, r_feet, yaw, 0.0)
    dt = 0.026
    _, _, a_qp_o, b_qp_o = oracle.c2qp(a_ct, b_ct, dt, h)
    hess_o, grad_o = oracle.qp_cost(
        a_qp_o, b_qp_o, np.array(CFG.weights), CFG.alpha, x0, traj, h
    )

    adt, bdt = formation.discretize(
        jnp.asarray(a_ct, jnp.float32), jnp.asarray(b_ct, jnp.float32), dt
    )
    a_qp, b_qp = formation.condense(adt, bdt, h)
    x_d = jnp.concatenate(
        [jnp.asarray(traj), jnp.zeros((h, 1), jnp.float32)], axis=1
    )
    hess, grad = formation.qp_cost(
        CFG, a_qp, b_qp, jnp.asarray(x0), x_d, jnp.ones(h, jnp.float32)
    )
    scale = max(1.0, np.abs(hess_o).max())
    np.testing.assert_allclose(np.asarray(hess), hess_o, atol=2e-4 * scale)
    gscale = max(1.0, np.abs(grad_o).max())
    np.testing.assert_allclose(np.asarray(grad), grad_o, atol=5e-4 * gscale)


def test_padded_steps_are_decoupled():
    """Padding to h_max with masked weights must reproduce the h-step cost."""
    rng = np.random.default_rng(11)
    h, h_max = 10, 16
    r_feet, yaw, x0, traj = _random_problem(rng, h)
    a_ct, b_ct = oracle.ct_ss_mats(np.array(CFG.inertia), CFG.mass, r_feet, yaw, 0.0)
    adt, bdt = formation.discretize(
        jnp.asarray(a_ct, jnp.float32), jnp.asarray(b_ct, jnp.float32), 0.026
    )
    a_qp, b_qp = formation.condense(adt, bdt, h_max)
    traj_pad = np.zeros((h_max, 13), dtype=np.float32)
    traj_pad[:h, :12] = traj
    mask = jnp.asarray((np.arange(h_max) < h).astype(np.float32))
    hess, grad = formation.qp_cost(
        CFG, a_qp, b_qp, jnp.asarray(x0), jnp.asarray(traj_pad), mask
    )
    # the first 12h block must equal the unpadded problem
    a_qp_s, b_qp_s = formation.condense(adt, bdt, h)
    x_d = jnp.concatenate([jnp.asarray(traj), jnp.zeros((h, 1), jnp.float32)], axis=1)
    hess_s, grad_s = formation.qp_cost(
        CFG, a_qp_s, b_qp_s, jnp.asarray(x0), x_d, jnp.ones(h, jnp.float32)
    )
    n = 12 * h
    np.testing.assert_allclose(np.asarray(hess)[:n, :n], np.asarray(hess_s), atol=1e-3)
    np.testing.assert_allclose(np.asarray(grad)[:n], np.asarray(grad_s), atol=1e-3)
    # cross terms between active and padded steps must vanish
    np.testing.assert_allclose(np.asarray(hess)[:n, n:], 0.0, atol=1e-4)


def test_pyramid_structural_ops_match_dense():
    rng = np.random.default_rng(12)
    h = 6
    fmat = oracle.pyramid_matrix(CFG.mu, h)
    x = rng.normal(size=12 * h).astype(np.float32)
    y = rng.normal(size=20 * h).astype(np.float32)
    ax = formation.pyramid_apply(CFG, jnp.asarray(x).reshape(h, 4, 3)).reshape(-1)
    np.testing.assert_allclose(np.asarray(ax), fmat @ x, atol=1e-4)
    aty = formation.pyramid_apply_t(CFG, jnp.asarray(y).reshape(h, 4, 5)).reshape(-1)
    np.testing.assert_allclose(np.asarray(aty), fmat.T @ y, atol=1e-4)

    rho = rng.uniform(0.5, 2.0, size=(h, 4, 5)).astype(np.float32)
    gram = np.asarray(formation.pyramid_gram(CFG, jnp.asarray(rho)))
    dense_gram = fmat.T @ np.diag(rho.reshape(-1)) @ fmat
    for i in range(h * 4):
        blk = dense_gram[i * 3 : i * 3 + 3, i * 3 : i * 3 + 3]
        np.testing.assert_allclose(gram.reshape(h * 4, 3, 3)[i], blk, atol=1e-4)


def test_qp_cost_nil_matches_qp_cost():
    """Closed-form nilpotent condensation == scan-based condense + qp_cost,
    full and stance-compressed, including masked (sticky-horizon) steps."""
    rng = np.random.default_rng(21)
    h = 12
    for trial in range(4):
        r_feet, yaw, x0, traj = _random_problem(rng, h)
        a_ct, b_ct = formation.srb_ct_dynamics(
            CFG, jnp.asarray(r_feet), jnp.asarray(yaw), jnp.asarray(0.7)
        )
        adt, bdt = formation.discretize(a_ct, b_ct, 0.026)
        a_qp, b_qp = formation.condense(adt, bdt, h)
        x_d = jnp.concatenate(
            [jnp.asarray(traj), jnp.zeros((h, 1), jnp.float32)], axis=1
        )
        x0j = jnp.asarray(x0)
        mask = (jnp.arange(h) < (10 if trial % 2 else h)).astype(jnp.float32)

        h_old, g_old = formation.qp_cost(CFG, a_qp, b_qp, x0j, x_d, mask)
        h_new, g_new = formation.qp_cost_nil(CFG, adt, bdt, x0j, x_d, mask)
        scale = float(np.abs(np.asarray(h_old)).max())
        np.testing.assert_allclose(
            np.asarray(h_new), np.asarray(h_old), atol=1e-6 * max(scale, 1.0)
        )
        np.testing.assert_allclose(
            np.asarray(g_new), np.asarray(g_old), atol=1e-5
        )

        tbl = (rng.uniform(size=(h, 4)) > 0.5).astype(np.float32)
        tbl[:, 0] = 1.0                       # ensure >=1 stance foot
        fi, _ = formation.compress_stance(jnp.asarray(tbl), 2)
        hc_old, gc_old = formation.qp_cost_compressed(
            CFG, a_qp, b_qp, x0j, x_d, mask, fi
        )
        hc_new, gc_new = formation.qp_cost_compressed_nil(
            CFG, adt, bdt, x0j, x_d, mask, fi
        )
        np.testing.assert_allclose(
            np.asarray(hc_new), np.asarray(hc_old), atol=1e-6 * max(scale, 1.0)
        )
        np.testing.assert_allclose(
            np.asarray(gc_new), np.asarray(gc_old), atol=1e-5
        )


def test_batched_formation_matches_per_scenario():
    """The batch-explicit fast path (closed-form sparse dynamics, sortless
    stance selectors, sqrt-S-folded cost) is numerically the vmapped
    per-scenario path."""
    import jax

    rng = np.random.default_rng(7)
    B, h = 12, 10
    r_feet = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 4, 3)), jnp.float32)
    yaw = jnp.asarray(rng.uniform(-1.5, 1.5, (B,)), jnp.float32)
    x_drag = jnp.asarray(rng.uniform(0.0, 3.0, (B,)), jnp.float32)
    dt = 0.026

    def old_dyn(rf, yw, xd):
        a_ct, b_ct = formation.srb_ct_dynamics(CFG, rf, yw, xd)
        return formation.discretize(a_ct, b_ct, dt)

    adt_o, bdt_o = jax.vmap(old_dyn)(r_feet, yaw, x_drag)
    adt_n, bdt_n = formation.srb_discrete(CFG, r_feet, yaw, x_drag, dt)
    np.testing.assert_allclose(np.asarray(adt_n), np.asarray(adt_o),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(bdt_n), np.asarray(bdt_o),
                               atol=1e-6)
    # unbatched call works too (the single-robot controller path)
    adt_1, bdt_1 = formation.srb_discrete(
        CFG, r_feet[0], yaw[0], x_drag[0], dt)
    np.testing.assert_allclose(np.asarray(adt_1), np.asarray(adt_n[0]),
                               atol=0.0)

    tbl = (rng.uniform(size=(B, h, 4)) > 0.45).astype(np.float32)
    tbl[:, :, 0] = 1.0
    tbl[:3] = 1.0                               # some all-stance scenarios
    tbl = jnp.asarray(tbl)
    fi_o, gr_o = jax.vmap(lambda t: formation.compress_stance(t, 2))(tbl)
    fi_n, gr_n, sel = formation.stance_selectors(tbl, 2)
    np.testing.assert_array_equal(np.asarray(fi_n), np.asarray(fi_o))
    np.testing.assert_array_equal(np.asarray(gr_n), np.asarray(gr_o))

    x0 = jnp.asarray(rng.standard_normal((B, 13)), jnp.float32)
    x_d = jnp.asarray(rng.standard_normal((B, h, 13)) * 0.3, jnp.float32)
    mask = jnp.ones((B, h), jnp.float32).at[4, 7:].set(0.0)
    h_o, g_o = jax.vmap(
        lambda a, b, x, t, s, fi: formation.qp_cost_compressed_nil(
            CFG, a, b, x, t, s, fi)
    )(adt_n, bdt_n, x0, x_d, mask, fi_n)
    h_n, g_n = formation.qp_cost_compressed_nil_sel(
        CFG, adt_n, bdt_n, x0, x_d, mask, sel)
    scale = float(jnp.max(jnp.abs(h_o)))
    np.testing.assert_allclose(np.asarray(h_n), np.asarray(h_o),
                               atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(g_n), np.asarray(g_o),
                               atol=2e-5 * max(float(jnp.max(jnp.abs(g_o))), 1.0))

    # identity selection IS the uncompressed 12h-variable cost
    sel4 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32)[None, None],
                            (B, h, 4, 4))
    h_u, g_u = jax.vmap(
        lambda a, b, x, t, s: formation.qp_cost_nil(CFG, a, b, x, t, s)
    )(adt_n, bdt_n, x0, x_d, mask)
    h_i, g_i = formation.qp_cost_compressed_nil_sel(
        CFG, adt_n, bdt_n, x0, x_d, mask, sel4)
    np.testing.assert_allclose(np.asarray(h_i), np.asarray(h_u),
                               atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(g_i), np.asarray(g_u),
                               atol=2e-5 * max(float(jnp.max(jnp.abs(g_u))), 1.0))
