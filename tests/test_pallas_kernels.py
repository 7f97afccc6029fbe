"""Pallas kernel coverage on every lane.

CPU lane (default): the kernels run under pallas interpret mode, so their
logic (NS recurrences, mu schedules, mixed-precision splits, tile padding)
is exercised by the default suite — a kernel regression can no longer ship
silently behind the TPU-only skip.

TPU lane (QCT_PLATFORM=tpu): the same cases compile and run the real
Mosaic kernels on-device and are checked against the XLA reference path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_ctrl_tpu.ops import ns_inverse as NI

ON_TPU = jax.default_backend() != "cpu"
INTERPRET = not ON_TPU


def _spd_batch(seed, b, n, npad, cond=1e3):
    """Jacobi-prescaled random SPD matrices embedded in the kernel tile
    (host-side NumPy: no device QR compiles through the TPU tunnel)."""
    rng = np.random.default_rng(seed)
    ks = []
    for _ in range(b):
        q, _ = np.linalg.qr(rng.standard_normal((n, n)).astype(np.float64))
        ev = np.logspace(0.0, -np.log10(cond), n)
        k = (q * ev[None, :]) @ q.T
        d = 1.0 / np.sqrt(np.diagonal(k))
        ks.append((k * d[:, None] * d[None, :]).astype(np.float32))
    return NI.pad_to(jnp.asarray(np.stack(ks)), n, npad)


@pytest.mark.parametrize("n,npad", [(96, 128), (192, 256)])
def test_blocked_kernel_inverts(n, npad):
    ks = _spd_batch(0, NI.G, n, npad)
    inv = np.asarray(NI.ns_inverse_pallas_blocked(ks, iters=25,
                                                  interpret=INTERPRET))
    eye = np.eye(npad, dtype=np.float32)
    resid = np.abs(np.asarray(ks) @ inv - eye).max()
    assert resid < 5e-4, resid


@pytest.mark.parametrize("n,npad", [(120, 128), (192, 256)])
def test_scaled_kernel_matches_plain(n, npad):
    ks = _spd_batch(1, NI.G, n, npad)
    inv = np.asarray(NI.ns_inverse_pallas_scaled(ks, interpret=INTERPRET))
    eye = np.eye(npad, dtype=np.float32)
    resid = np.abs(np.asarray(ks) @ inv - eye).max()
    # the bf16x3 phases floor at ~1e-4; the HIGHEST tail squares toward f32
    assert resid < 5e-3, resid


def test_single_instance_kernel():
    ks = _spd_batch(2, 1, 100, 128)[0]
    inv = np.asarray(NI.ns_inverse_pallas(ks, iters=25, interpret=INTERPRET))
    resid = np.abs(np.asarray(ks) @ inv - np.eye(128, dtype=np.float32)).max()
    assert resid < 5e-4, resid


def test_pad_to_identity_padding():
    k = jnp.eye(10, dtype=jnp.float32) * 2.0
    p = NI.pad_to(k, 10)
    assert p.shape == (128, 128)
    np.testing.assert_array_equal(np.asarray(p[10:, 10:]),
                                  np.eye(118, dtype=np.float32))
    assert NI.pad_sizes(128) == 128 and NI.pad_sizes(129) == 256


def test_fused_admm_kernel_interpret():
    """The fused single-kernel solver's in-kernel ADMM logic vs the XLA
    batched path, on a tiny h=4 problem (interpret mode is slow)."""
    from quadruped_ctrl_tpu.config import default_config
    from quadruped_ctrl_tpu.mpc import pipeline
    from quadruped_ctrl_tpu.ops import fused_admm as FA
    from quadruped_ctrl_tpu.solver import admm

    import dataclasses

    cfg = default_config()
    # the fused kernel runs a fixed-rho schedule; disable the XLA path's
    # adaptive-rho events so both solve the identical iteration
    scfg = dataclasses.replace(cfg.solver, rho_adapt=0)
    h, b = 4, FA.G
    inputs = pipeline.random_inputs(jax.random.PRNGKey(3), b, h)

    from quadruped_ctrl_tpu.mpc import formation

    def form(inp):
        a_ct, b_ct = formation.srb_ct_dynamics(
            cfg.mpc, inp.r_feet, inp.rpy[2], inp.x_drag
        )
        adt, bdt = formation.discretize(a_ct, b_ct, cfg.dt_mpc)
        x0 = formation.build_x0(
            inp.rpy, inp.position, inp.omega_world, inp.v_world,
            cfg.mpc.gravity,
        )
        sm = jnp.ones((h,), jnp.float32)
        return formation.qp_cost_nil(cfg.mpc, adt, bdt, x0, inp.traj, sm)

    hess, grad = jax.vmap(form)(inputs)
    gait = inputs.gait_table

    x_xla = np.asarray(
        admm.admm_mpc_batched(scfg, cfg.mpc, hess, grad, gait,
                              iterations=100, polish_rounds=4,
                              use_pallas=False)
    )

    # build the fused kernel's padded inputs exactly as admm_mpc_fused does
    n, m = 3 * 4 * h, 5 * 4 * h
    f_scale = cfg.mpc.f_max
    hp = jnp.zeros((b, FA.N, FA.N), jnp.float32)
    hp = hp.at[:, :n, :n].set(hess * f_scale * f_scale)
    idx = jnp.arange(n, FA.N)
    hp = hp.at[:, idx, idx].set(1.0)
    gp = jnp.zeros((b, FA.N), jnp.float32).at[:, :n].set(grad * f_scale)
    big = jnp.asarray(cfg.mpc.big_number, jnp.float32)
    u3 = jnp.broadcast_to(big, (b, h, 4, 5)).copy()
    u3 = u3.at[..., 4].set(gait * (cfg.mpc.f_max / f_scale))
    l = jnp.zeros((b, m), jnp.float32)
    u = u3.reshape(b, -1)
    rho = admm.constraint_rho(scfg, l, u)
    lp = jnp.zeros((b, FA.M), jnp.float32).at[:, :m].set(l)
    up = jnp.zeros((b, FA.M), jnp.float32).at[:, :m].set(u)
    rp = jnp.ones((b, FA.M), jnp.float32).at[:, :m].set(rho)
    a_pad = jnp.zeros((FA.M, FA.N), jnp.float32)
    a_pad = a_pad.at[:m, :n].set(
        jnp.asarray(admm._pyramid_dense(cfg.mpc.mu, h, 4))
    )

    x_k = FA.fused_admm_solve(
        a_pad, hp, gp, lp, up, rp, n_iter=100, polish_rounds=4,
        interpret=INTERPRET,
    )
    x_k = np.asarray(x_k)[:, :n] * f_scale
    assert np.isfinite(x_k).all()
    np.testing.assert_allclose(x_k, x_xla, atol=0.5)


def test_full_schedule_at_polish_cond():
    """The full (polish-grade) schedule at the polish-round conditioning:
    w_act=1e4 active-set penalties push the Jacobi-scaled polish K to
    cond ~1e5 (config.py ns_admm notes). Measured on-device: resid 7e-4 at
    cond 1e4, 1.7e-2 at 1e5 — the downstream polish solves carry 2 rounds
    of iterative refinement (error ~r^3), so 1e5 stays well inside the
    solver's accuracy budget."""
    from quadruped_ctrl_tpu.config import default_config

    cfg = default_config().solver
    eye = np.eye(128, dtype=np.float32)
    for cond, gate in ((1e4, 5e-3), (1e5, 5e-2)):
        ks = _spd_batch(7, NI.G, 120, 128, cond=cond)
        inv = np.asarray(NI.ns_inverse_pallas_scaled(
            ks, cfg.ns_a0, cfg.ns_scaled_iters, cfg.ns_quad_iters,
            cfg.ns_hi_iters, interpret=INTERPRET,
        ))
        resid = np.abs(
            np.asarray(ks) @ inv - eye).sum(axis=-1).max()
        assert resid < gate, (cond, resid)


def test_warm_kernel_quality_and_guard():
    """ns_inverse_pallas_warm: a nearby inverse seeds the short quadratic
    schedule to cold-grade residuals; a garbage seed trips the in-kernel
    divergence guard and still returns a cold-grade factorization."""
    from quadruped_ctrl_tpu.config import default_config

    cfg = default_config().solver
    sched = (cfg.ns_a0, cfg.ns_scaled_iters, cfg.ns_quad_iters,
             cfg.ns_hi_iters)
    warm_kw = dict(n_wquad=cfg.ns_warm_quad, n_whi=cfg.ns_warm_hi,
                   guard=cfg.ns_warm_guard, interpret=INTERPRET)
    ks = _spd_batch(8, NI.G, 120, 128, cond=1e4)
    cold = NI.ns_inverse_pallas_scaled(ks, *sched, interpret=INTERPRET)
    # perturb a few diagonal entries (a polish-round active-set delta)
    rng = np.random.default_rng(9)
    bump = (rng.uniform(0, 0.3, (NI.G, 128))
            * (rng.uniform(0, 1, (NI.G, 128)) < 0.05)
            * (np.arange(128) < 120)).astype(np.float32)
    ks2 = ks + jax.vmap(jnp.diag)(jnp.asarray(bump))
    eye = np.eye(128, dtype=np.float32)

    warm = np.asarray(NI.ns_inverse_pallas_warm(ks2, cold, *sched, **warm_kw))
    r_warm = np.abs(np.asarray(ks2) @ warm - eye).sum(axis=-1).max()
    assert r_warm < 5e-3, r_warm

    garbage = jnp.zeros_like(cold) + 17.0
    guarded = np.asarray(
        NI.ns_inverse_pallas_warm(ks2, garbage, *sched, **warm_kw))
    r_guard = np.abs(np.asarray(ks2) @ guarded - eye).sum(axis=-1).max()
    assert r_guard < 5e-3, r_guard


def test_short_admm_schedule_at_design_cond():
    """The ADMM-phase factorizations run a shortened NS schedule
    (cfg.solver.ns_admm_*, see config.py): it must reach the refinement
    floor at 10x the measured worst iterate-phase condition number (213 at
    the adaptive-rho clip floor)."""
    from quadruped_ctrl_tpu.config import default_config

    cfg = default_config().solver
    ks = _spd_batch(3, NI.G, 120, 128, cond=2.1e3)
    inv = np.asarray(
        NI.ns_inverse_pallas_scaled(
            ks, cfg.ns_admm_a0, cfg.ns_admm_scaled_iters,
            cfg.ns_quad_iters, cfg.ns_hi_iters, interpret=INTERPRET,
        )
    )
    eye = np.eye(128, dtype=np.float32)
    resid = np.abs(np.asarray(ks) @ inv - eye).max()
    # ADMM tolerates an inexact KKT solve (fixed-point iteration); 1e-2
    # keeps an order of magnitude under the splitting's own contraction
    assert resid < 1e-2, resid


def test_refine_kernel_from_warm_init():
    """ns_inverse_pallas_refine: an init whose NS residual r0 = ||I - K X0||
    is genuinely inside the convergence region (here r0 ~ 0.05, the measured
    quality of the Woodbury add-only correction is ~0.2) reaches near the
    cold schedule's floor in quad+hi = 2 iterations (each squares r).

    NOTE the contract (see the kernel docstring): what must be small is the
    NS residual ||I - K X0||, NOT the elementwise-relative error of X0. An
    elementwise 1e-2-relative perturbation at cond 1e4 has NS residual
    ~1e-2 * cond >> 1 and rightly diverges — the guard-free kernel is only
    for inits with a structured (residual-bounded) error."""
    n, npad = 96, 128
    ks = _spd_batch(7, NI.G, n, npad, cond=1e4)
    ks_np = np.asarray(ks, np.float64)
    exact = np.linalg.inv(ks_np)
    rng = np.random.default_rng(1)
    # right-multiply by (I + E) with ||E||_2 = 0.05: the NS residual of the
    # init is then ||I - K X0|| = ||K exact E|| ~ 0.05 by construction
    e = rng.standard_normal((NI.G, npad, npad))
    e *= 0.05 / np.linalg.norm(e, ord=2, axis=(-2, -1), keepdims=True)
    init_np = exact @ (np.eye(npad) + e)
    init = jnp.asarray(init_np.astype(np.float32))
    r0 = np.abs(ks_np @ init_np - np.eye(npad)).sum(axis=-1).max()
    assert 0.01 < r0 < 0.5, r0          # premise: genuinely warm, not exact
    out = np.asarray(NI.ns_inverse_pallas_refine(ks, init, n_quad=1, n_hi=1,
                                                 interpret=INTERPRET))
    eye = np.eye(npad, dtype=np.float32)
    resid = np.abs(ks_np @ out - eye).sum(axis=-1).max()
    # two squarings: r0~5e-2 -> ~2.5e-3 -> ~6e-6, floored by the bf16x3
    # quad step's precision (~1e-4 * cond-driven amplification); interpret
    # mode emulates the bf16 splits at true bf16 arithmetic, so gate at the
    # same 5e-3 the other interpret-mode cond-1e4 lanes use
    assert resid < 5e-3, resid
    # and the refinement genuinely improved on the init (>= 10x)
    assert resid < 0.1 * r0, (resid, r0)


@pytest.mark.parametrize("h,b", [
    (4, 6),     # 128 tile, bsz % G != 0 -> exercises the batch-pad branches
    (11, 4),    # n=132: ADMM phase takes the Schur split (128<n<=192);
                # polish rounds still hit the no-ks 256 kernel + K-matvec
    (12, 4),    # n=144: the h=16 ms=3 midband tile through the same glue
])
def test_fused_build_solver_path_interpret(monkeypatch, h, b):
    """Integration coverage for the use_pallas=True fused-build glue
    (hp_g tile/G padding, pad_bf batch-pad branch, g9 layout, and at the
    256 tile the emit_ks=False K-matvec reconstruction): the pallas NS
    entry points are routed through interpret mode so the whole
    admm_mpc_batched(use_pallas=True) path runs on the CPU lane, and its
    forces must match the XLA reference path."""
    import functools

    from quadruped_ctrl_tpu.config import default_config
    from quadruped_ctrl_tpu.mpc import formation, pipeline
    from quadruped_ctrl_tpu.solver import admm

    for name in ("ns_inverse_pallas_scaled", "ns_inverse_pallas_scaled_build",
                 "ns_inverse_pallas_refine", "ns_inverse_pallas_warm"):
        monkeypatch.setattr(
            NI, name, functools.partial(getattr(NI, name), interpret=True))

    cfg = default_config()
    inputs = pipeline.random_inputs(jax.random.PRNGKey(17 + h), b, h)

    def form(inp):
        a_ct, b_ct = formation.srb_ct_dynamics(
            cfg.mpc, inp.r_feet, inp.rpy[2], inp.x_drag)
        adt, bdt = formation.discretize(a_ct, b_ct, cfg.dt_mpc)
        x0 = formation.build_x0(inp.rpy, inp.position, inp.omega_world,
                                inp.v_world, cfg.mpc.gravity)
        sm = jnp.ones((h,), jnp.float32)
        return formation.qp_cost_nil(cfg.mpc, adt, bdt, x0, inp.traj, sm)

    hess, grad = jax.vmap(form)(inputs)
    gait = inputs.gait_table
    # production budgets: at reduced iteration counts the padded-iterate
    # pallas branch and the XLA branch can resolve a knife-edge active set
    # differently (measured 21.8 N at iterations=40 on this seed, 0.16 N at
    # the production 120/3)
    x_ref = np.asarray(admm.admm_mpc_batched(
        cfg.solver, cfg.mpc, hess, grad, gait, use_pallas=False))
    x_pal = np.asarray(admm.admm_mpc_batched(
        cfg.solver, cfg.mpc, hess, grad, gait, use_pallas=True))
    assert np.isfinite(x_pal).all()
    np.testing.assert_allclose(x_pal, x_ref, atol=0.5)
    # the fused build must agree with the two-step (assemble-then-factorize)
    # pallas path it replaces — same iterate phase, same schedules; the
    # in-kernel assembly itself is EXACTLY the XLA assembly
    # (test_fused_kbuild_matches_xla_assembly), so remaining differences are
    # the independently-rounded NS inverses propagated through polish
    # knife-edges (measured 0.11 N max on 1.9% of elements)
    monkeypatch.setattr(admm, "_FUSED_BUILD", False)
    x_two = np.asarray(admm.admm_mpc_batched(
        cfg.solver, cfg.mpc, hess, grad, gait, use_pallas=True))
    np.testing.assert_allclose(x_pal, x_two, atol=0.25)


# ---------------------------------------------------------------------------
# Fused packed formation kernel (ops/formation_pack.py)


@pytest.mark.parametrize("h,ms,pack,b", [
    (10, 2, 2, 32),     # the flagship bench shape (120-var pairs, 128 tile)
    (16, 2, 2, 16),     # h=16 fast-trot band (192-var pairs, 256 tile)
    (16, 3, 1, 8),      # h=16 aio walking band (144-var, 256 tile)
    (16, 4, 1, 8),      # h=16 uncompressed (192-var, 256 tile)
    (10, 2, 2, 6),      # system count not divisible by the kernel group
])
def test_formation_pack_kernel_matches_xla(h, ms, pack, b):
    """form_packed_pallas vs qp_cost_compressed_nil_sel + block-diagonal
    embedding, including a non-trivial step mask. The kernel's Gram runs
    bf16x3 (3 MXU passes): ~1e-6 relative on device; interpret mode
    emulates the bf16 splits at bf16 arithmetic precision, so the CPU lane
    gate is ~bf16 epsilon (the NS kernels' interpret lanes do the same)."""
    from quadruped_ctrl_tpu.config import default_config
    from quadruped_ctrl_tpu.mpc import formation, pipeline

    cfg = default_config()
    inputs = pipeline.random_inputs(jax.random.PRNGKey(h * ms + pack), b, h)
    if ms >= 3:
        rng = np.random.default_rng(0)
        tbl = (rng.uniform(size=(h, 4)) < 0.75).astype(np.float32)
        tbl[:, 0] = 1.0                      # at least one stance foot
        for x in range(h):                   # clamp each step to ms stance
            on = np.flatnonzero(tbl[x])
            tbl[x, on[ms:]] = 0.0
        inputs = inputs.replace(
            gait_table=jnp.broadcast_to(jnp.asarray(tbl), (b, h, 4)))
    adt, bdt = formation.srb_discrete(
        cfg.mpc, inputs.r_feet, inputs.rpy[:, 2], inputs.x_drag, cfg.dt_mpc)
    x0 = formation.build_x0(inputs.rpy, inputs.position, inputs.omega_world,
                            inputs.v_world, cfg.mpc.gravity)
    _, _, sel = formation.stance_selectors(inputs.gait_table, ms)
    mask = np.ones((b, h), np.float32)
    mask[:, -2:] = 0.0                       # exercise the step mask rows
    mask = jnp.asarray(mask)
    h_ref, g_ref = formation.qp_cost_packed(
        cfg.mpc, adt, bdt, x0, inputs.traj, mask, sel, pack,
        use_pallas=False)
    h_k, g_k = formation.qp_cost_packed(
        cfg.mpc, adt, bdt, x0, inputs.traj, mask, sel, pack,
        use_pallas=ON_TPU, interpret=INTERPRET)
    # on-device: bf16x3 Gram worst-case cancellation measured 1.0e-5
    # relative across the lane shapes (v5e, round-5 recalibration) — a
    # 1e-5-relative Hessian perturbation is orders below the solver's
    # refinement/oracle gates. Interpret mode emulates the splits at true
    # bf16 arithmetic, hence the looser CPU gate.
    tol_h = 5e-5 if ON_TPU else 2e-2
    rel_h = float(jnp.max(jnp.abs(h_k - h_ref)) / jnp.max(jnp.abs(h_ref)))
    rel_g = float(jnp.max(jnp.abs(g_k - g_ref)) / jnp.max(jnp.abs(g_ref)))
    assert rel_h < tol_h, rel_h
    assert rel_g < 1e-5, rel_g
    n_pair = pack * 3 * ms * h
    assert h_k.shape == (b // pack, n_pair, n_pair)
    assert g_k.shape == (b // pack, n_pair)
    # symmetry of the packed Hessian (Gram + diagonal regularizer)
    sym = float(jnp.max(jnp.abs(h_k - jnp.swapaxes(h_k, -1, -2))))
    assert sym < 1e-3 * float(jnp.max(jnp.abs(h_k)))


# ---------------------------------------------------------------------------
# Fused K-build + scaled NS factorization (ns_inverse_pallas_scaled_build)


@pytest.mark.parametrize("hv,nf,npad", [(20, 2, 128), (32, 2, 256)])
def test_fused_kbuild_matches_xla_assembly(hv, nf, npad):
    """The fused kernel's in-kernel K assembly (iota-mask gram expansion +
    Jacobi prescale) must match the XLA assembly EXACTLY (it is the same
    arithmetic), and its NS result must match the plain scaled kernel run
    on the XLA-assembled ks (shared schedule code). The NS *convergence*
    itself is the existing scaled-kernel tests' job — under interpret mode
    the bf16x3 emulation can diverge on hard data for BOTH kernels
    identically, so this test checks assembly exactness and kernel-vs-
    kernel agreement, not the residual."""
    from jax import lax

    from quadruped_ctrl_tpu.config import default_config
    from quadruped_ctrl_tpu.mpc import formation

    cfg = default_config()
    cs = cfg.solver
    n = 3 * nf * hv
    b = NI.G
    m0 = jax.random.uniform(jax.random.PRNGKey(0), (b, n, n), jnp.float32,
                            -1, 1)
    hess_n = jnp.einsum("bij,bkj->bik", m0, m0) * 0.05 + 3.0 * jnp.eye(n)[None]
    w = jnp.abs(jax.random.normal(jax.random.PRNGKey(1),
                                  (b, hv * nf * 5))) * 30.0
    eye = jnp.eye(n, dtype=jnp.float32)

    gram = formation.pyramid_gram(cfg.mpc, w.reshape(b, hv, nf, 5))
    g4 = gram.reshape(b, hv * nf, 3, 3)
    sel = jnp.eye(hv * nf, dtype=jnp.float32)
    delta = (g4[:, :, :, None, :] * sel[None, :, None, :, None]
             ).reshape(b, n, n)
    k = hess_n + cs.sigma * eye[None] + delta
    d_ref = lax.rsqrt(jnp.maximum(
        jnp.diagonal(k, axis1=-2, axis2=-1), 1e-30))
    ks_ref = k * d_ref[:, :, None] * d_ref[:, None, :]
    ksp = NI.pad_to(ks_ref, n, npad)
    inv_ref = NI.ns_inverse_pallas_scaled(
        ksp, cs.ns_a0, cs.ns_scaled_iters, cs.ns_quad_iters, cs.ns_hi_iters,
        interpret=INTERPRET)

    hp = NI.pad_to(hess_n + cs.sigma * eye[None], n, npad)
    g9 = gram.reshape(b, hv * nf, 9).transpose(0, 2, 1)
    inv_f, ks_f, d_f = NI.ns_inverse_pallas_scaled_build(
        hp, g9, cs.ns_a0, cs.ns_scaled_iters, cs.ns_quad_iters,
        cs.ns_hi_iters, emit_ks=True, interpret=INTERPRET)

    # the production default skips the ks output at the 256 tile (scoped
    # VMEM); its inv/d must be identical to the emit_ks variant's
    inv_d, ks_d, d_d = NI.ns_inverse_pallas_scaled_build(
        hp, g9, cs.ns_a0, cs.ns_scaled_iters, cs.ns_quad_iters,
        cs.ns_hi_iters, interpret=INTERPRET)
    assert (ks_d is None) == (npad > 128)
    both_d = jnp.isfinite(inv_d) & jnp.isfinite(inv_f)
    assert float(jnp.max(jnp.abs(
        jnp.where(both_d, inv_d - inv_f, 0.0)))) == 0.0
    assert float(jnp.max(jnp.abs(d_d - d_f))) == 0.0

    assert float(jnp.max(jnp.abs(ks_f[:, :n, :n] - ks_ref))) == 0.0
    assert float(jnp.max(jnp.abs(d_f[:, 0, :n] - d_ref))) == 0.0
    # pad region: identity diagonal, zero coupling
    if npad > n:
        assert float(jnp.max(jnp.abs(
            ks_f[:, n:, :n]))) == 0.0
        pd = jnp.diagonal(ks_f[:, n:, n:], axis1=-2, axis2=-1)
        assert float(jnp.max(jnp.abs(pd - 1.0))) == 0.0
    both = jnp.isfinite(inv_f) & jnp.isfinite(inv_ref)
    assert float(jnp.max(jnp.abs(jnp.where(both, inv_f - inv_ref, 0.0)))) \
        < 1e-6
    assert bool(jnp.all(jnp.isfinite(inv_f) == jnp.isfinite(inv_ref)))


# ---------------------------------------------------------------------------
# Schur-split inverse (ADMM-grade 128 < n <= 192 systems)


@pytest.mark.parametrize("n,cond", [
    (144, 213.0),    # h=16 ms=3 midband size, measured worst ADMM cond
    (144, 1e3),      # ~5x margin over the measured worst case
    (192, 213.0),    # h=16 ms=4 full size
    (192, 1e3),
])
def test_schur_split_inverse(n, cond):
    """ns_inverse_schur_scaled: block factorization at the 128 boundary +
    one NS scrub must land at the 256-tile kernel's residual level for
    ADMM-grade conditioning (cond <= 213 measured, config.py:160-167; the
    1e3 rows are the safety margin). See ops/ns_inverse.py Schur block
    comment for the measured v5e timings this path buys."""
    b = 2 * NI.G + 3          # non-multiple of G: exercises the A-block pad
    ks = _spd_batch(11, b, n, n, cond=cond)
    x = np.asarray(NI.ns_inverse_schur_scaled(
        ks, 5e-4, 6, 2, 1, interpret=INTERPRET), np.float64)
    ks64 = np.asarray(ks, np.float64)
    resid = np.abs(np.eye(n) - ks64 @ x).sum(-1).max()
    # interpret mode emulates bf16 splits at true bf16; same 5e-3 gate as
    # the other interpret-mode lanes (measured 2.4e-5..3.5e-4 on-device)
    assert resid < 5e-3, resid
    # blockwise identity: the assembled inverse must actually invert, not
    # just have a small scrubbed residual on the test spectrum
    err = np.abs(x - np.linalg.inv(ks64)).max() / np.abs(x).max()
    assert err < 1e-2, err
