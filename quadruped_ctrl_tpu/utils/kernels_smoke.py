"""On-device smoke for EVERY production Pallas kernel at production shapes.

Round-4 post-mortem (VERDICT r04): three new/changed kernels shipped with
zero on-device execution evidence and one could not even compile at the
256 tile at production batch, erasing the round's bench record. This lane
is the gate that prevents that: it compiles and RUNS each kernel at the
exact (batch, tile) shapes the bench/closed-loop paths use — both the 128
and 256 tiles, multi-step grids included (scoped-VMEM pressure only shows
up with grid double-buffering) — checks finiteness plus an NS residual
where meaningful, and reports one line per case.

Run via `python -m quadruped_ctrl_tpu.cli kernels-smoke [--out FILE]`
(artifact: TPU_LANE_r05.txt). Exit code is non-zero if any case fails.
On CPU the kernels run in interpret mode at reduced batch so the lane is
still exercised by the default suite.
"""

from __future__ import annotations

import time

import numpy as np


def _spd_batch(seed: int, b: int, n: int, npad: int, cond: float = 1e3):
    """Jacobi-prescaled SPD batch embedded in the kernel tile (identical
    construction to tests/test_pallas_kernels.py, but tiled from G distinct
    systems for speed at production batch)."""
    import jax.numpy as jnp

    from quadruped_ctrl_tpu.ops import ns_inverse as NI

    rng = np.random.default_rng(seed)
    ks = []
    for _ in range(NI.G):
        q, _ = np.linalg.qr(rng.standard_normal((n, n)).astype(np.float64))
        ev = np.logspace(0.0, -np.log10(cond), n)
        k = (q * ev[None, :]) @ q.T
        d = 1.0 / np.sqrt(np.diagonal(k))
        ks.append((k * d[:, None] * d[None, :]).astype(np.float32))
    base = NI.pad_to(jnp.asarray(np.stack(ks)), n, npad)
    reps = -(-b // NI.G)
    return jnp.tile(base, (reps, 1, 1))[:b]


def _timed(fn, *args):
    """Compile + run + fetch; returns (result, best-of-2 ms).

    `args` MUST carry every large array (they become jit parameters) — a
    closure-captured batch would be baked into the program as a constant:
    a couple hundred MB of HLO through the remote-compile tunnel (HTTP 413)
    and constant-folding hazards."""
    import jax

    jf = jax.jit(fn)
    out = jax.block_until_ready(jf(*args))
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = jax.block_until_ready(jf(*args))
        times.append(time.perf_counter() - t0)
    return out, min(times) * 1e3


def run_smoke(full: bool | None = None):
    """Returns (lines, n_failed). `full=None` auto-selects: production
    batches on an accelerator, tiny interpret-mode batches on CPU."""
    import jax
    import jax.numpy as jnp

    from quadruped_ctrl_tpu.config import default_config
    from quadruped_ctrl_tpu.mpc import formation, pipeline
    from quadruped_ctrl_tpu.ops import ns_inverse as NI

    on_tpu = jax.default_backend() == "tpu"
    if full is None:
        full = on_tpu
    interpret = not on_tpu
    cfg = default_config()
    cs = cfg.solver
    sched = (cs.ns_a0, cs.ns_scaled_iters, cs.ns_quad_iters, cs.ns_hi_iters)
    asched = (cs.ns_admm_a0, cs.ns_admm_scaled_iters, cs.ns_quad_iters,
              cs.ns_hi_iters)
    B = 2048 if full else NI.G
    lines = []
    failed = 0

    def case(name, fn, *args, check=None):
        nonlocal failed
        try:
            out, ms = _timed(fn, *args)
            arrs = jax.tree_util.tree_leaves(out)
            ok = all(bool(jnp.all(jnp.isfinite(a))) for a in arrs)
            extra = ""
            if ok and check is not None:
                ok, extra = check(out)
            status = "ok" if ok else "BAD-VALUES"
            if not ok:
                failed += 1
            lines.append(f"{name:<58} {status:>10}  {ms:9.2f} ms{extra}")
        except Exception as e:  # noqa: BLE001 — the whole point is recording
            failed += 1
            lines.append(
                f"{name:<58} {'FAIL':>10}  {type(e).__name__}: "
                f"{str(e)[:200]}")
        print(lines[-1], flush=True)

    def ns_resid_check(ks):
        # host f64 check on the first group: a device-side einsum would run
        # at DEFAULT (bf16) matmul precision and its own ~sqrt(n)*eps_bf16
        # ~ 0.09 error would swamp the kernel's actual ~1e-5 residual
        ks8 = np.asarray(ks[:NI.G], np.float64)

        def chk(inv):
            if isinstance(inv, tuple):
                inv = inv[0]
            eye = np.eye(ks8.shape[-1])
            r = float(np.abs(ks8 @ np.asarray(inv[:NI.G], np.float64)
                             - eye).max())
            return r < 0.05, f"  resid={r:.2e}"
        return chk

    # ---- NS inversion kernels, both tiles, production batch ----
    for n, npad in ((120, 128), (192, 256)):
        ks = _spd_batch(0, B, n, npad)
        case(f"ns_inverse_pallas_scaled        B={B} tile={npad}",
             lambda ks: NI.ns_inverse_pallas_scaled(
                 ks, *sched, interpret=interpret),
             ks, check=ns_resid_check(ks))
        case(f"ns_inverse_pallas_scaled[admm]  B={B} tile={npad}",
             lambda ks: NI.ns_inverse_pallas_scaled(
                 ks, *asched, interpret=interpret),
             ks, check=ns_resid_check(ks))

    # ---- fused K-build + NS, production (n, nblk) per tile ----
    # 128: the h=10 pair-packed bench shape (n=120, nblk=40);
    # 256: h=16 uncompressed (n=192, nblk=64) and the ms=3 walking band
    # (n=144, nblk=48) — the shapes whose compile failure sank round 4
    for n, npad in ((120, 128), (144, 256), (192, 256)):
        nblk = n // 3
        rng = np.random.default_rng(n)
        m0 = rng.standard_normal((NI.G, n, n)).astype(np.float32)
        h8 = np.einsum("bij,bkj->bik", m0, m0) * 0.02 \
            + 3.0 * np.eye(n, dtype=np.float32)
        hp8 = NI.pad_to(jnp.asarray(h8), n, npad)
        reps = -(-B // NI.G)
        hp = jnp.tile(hp8, (reps, 1, 1))[:B]
        g9 = jnp.asarray(
            np.abs(rng.standard_normal((B, 9, nblk))).astype(np.float32)
            * 0.05)
        case(f"ns_inverse_pallas_scaled_build  B={B} tile={npad} n={n}",
             lambda hp, g9: NI.ns_inverse_pallas_scaled_build(
                 hp, g9, *sched, interpret=interpret)[0],
             hp, g9)

    # ---- Schur-split inverse, both production 128<n<=192 sizes ----
    for n in (144, 192):
        ks8 = _spd_batch(5, NI.G, n, n, cond=213.0)
        ks = jnp.tile(ks8, (-(-B // NI.G), 1, 1))[:B]
        case(f"ns_inverse_schur_scaled         B={B} n={n}",
             lambda ks: NI.ns_inverse_schur_scaled(
                 ks, cs.ns_admm_a0, cs.ns_admm_scaled_iters,
                 cs.ns_quad_iters, cs.ns_hi_iters, interpret=interpret),
             ks, check=ns_resid_check(ks))

    # ---- warm refine kernel, both tiles ----
    for n, npad in ((120, 128), (192, 256)):
        ks = _spd_batch(1, B, n, npad)
        exact8 = np.linalg.inv(np.asarray(ks[:NI.G], np.float64))
        e = np.random.default_rng(2).standard_normal(exact8.shape)
        e *= 0.05 / np.linalg.norm(e, ord=2, axis=(-2, -1), keepdims=True)
        init8 = jnp.asarray(
            (exact8 @ (np.eye(npad) + e)).astype(np.float32))
        init = jnp.tile(init8, (-(-B // NI.G), 1, 1))[:B]
        case(f"ns_inverse_pallas_refine        B={B} tile={npad}",
             lambda ks, init: NI.ns_inverse_pallas_refine(
                 ks, init, cs.ns_wb_quad, cs.ns_wb_hi, interpret=interpret),
             ks, init, check=ns_resid_check(ks))

    # ---- fused packed formation kernel, every bench lane shape ----
    bform = (4096 if full else 4, 2048 if full else 4)
    for h, ms, pack, b in ((10, 2, 2, bform[0]), (16, 2, 2, bform[1]),
                           (16, 3, 1, bform[1]), (16, 4, 1, bform[1])):
        inputs = pipeline.random_inputs(jax.random.PRNGKey(h + ms), b, h)
        if ms < 4:
            # build an exactly-ms-stance gait table so the compression and
            # the kernel's selector contraction run their production shape
            offs = np.arange(4) * (h // 4)
            steps = np.arange(h)[:, None]
            dur = max(int(h * ms / 4), 1)
            tbl = (((steps - offs[None, :]) % h) < dur).astype(np.float32)
            tbl[tbl.sum(1) < 1, 0] = 1.0
            for x in range(h):
                on = np.flatnonzero(tbl[x])
                tbl[x, on[ms:]] = 0.0
            inputs = inputs.replace(
                gait_table=jnp.broadcast_to(jnp.asarray(tbl), (b, h, 4)))

        def run_form(inputs, ms=ms, pack=pack):
            adt, bdt = formation.srb_discrete(
                cfg.mpc, inputs.r_feet, inputs.rpy[:, 2], inputs.x_drag,
                cfg.dt_mpc)
            x0 = formation.build_x0(inputs.rpy, inputs.position,
                                    inputs.omega_world, inputs.v_world,
                                    cfg.mpc.gravity)
            _, _, sel = formation.stance_selectors(inputs.gait_table, ms)
            smask = jnp.ones(inputs.traj.shape[:2], jnp.float32)
            return formation.qp_cost_packed(
                cfg.mpc, adt, bdt, x0, inputs.traj, smask, sel, pack,
                use_pallas=not interpret, interpret=interpret)

        case(f"formation_pack.form_packed      B={b} h={h} ms={ms} "
             f"pack={pack}", run_form, inputs)

    # ---- fused single-kernel ADMM solver (the opt-in use_fused path) ----
    if full:
        bfa = 2048
        inputs_fa = pipeline.random_inputs(jax.random.PRNGKey(9), bfa, 10)
        case(f"fused_admm (solve_packed use_fused) B={bfa} h=10",
             lambda i: pipeline.solve_packed_batch(cfg, i, use_fused=True),
             inputs_fa)
    else:
        lines.append(
            "fused_admm.admm_mpc_fused       (skipped on CPU: covered by "
            "test_pallas_kernels.test_fused_admm_kernel_interpret)")

    # ---- the production pipeline entries the bench lanes call ----
    if full:
        inp10 = pipeline.random_inputs(jax.random.PRNGKey(0), 4096, 10)
        case("pipeline.solve_packed_batch     B=4096 h=10 (flagship)",
             lambda i: pipeline.solve_packed_batch(cfg, i), inp10)
        inp16 = pipeline.random_inputs(jax.random.PRNGKey(1), 2048, 16)
        case("pipeline.solve_packed_batch     B=2048 h=16 ms=4 (256 tile)",
             lambda i: pipeline.solve_packed_batch(cfg, i, max_stance=4,
                                                   pack=1), inp16)
        case("pipeline.solve_packed_batch     B=2048 h=16 ms=2 pack=2",
             lambda i: pipeline.solve_packed_batch(cfg, i, max_stance=2,
                                                   pack=2), inp16)
        case("pipeline.solve_packed_batch     B=2048 h=16 ms=3 (midband)",
             lambda i: pipeline.solve_packed_batch(cfg, i, max_stance=3,
                                                   pack=1), inp16)
    return lines, failed
