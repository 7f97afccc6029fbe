"""Differential tests against the UNMODIFIED reference C++ stack.

The reference controller (/root/reference) is compiled as-is into a golden
shared library (tests/build_reference.sh) and driven through its own
extern "C" FFI (GaitCtrller.h:63-99) exactly the way walking_simulation.py
drives it. Three layers of parity:

1. QP level: the reference's dense condensed MPC (setup_problem ->
   update_problem_data_floats -> get_solution, i.e. its formation + qpOASES
   active-set solve) vs our formation + batched ADMM on IDENTICAL inputs —
   deterministic, tight (GRF agreement to a few 0.1 N out of 120 N).
2. Closed loop: the reference controller drives OUR articulated 18-DoF
   plant (sim/articulated.py) through joint torques; it must stand and trot
   stably — validating the plant against the controller it was derived from.
3. Trace level: along that reference-driven trajectory, our controller
   shadows the same sensor stream and must produce closely matching torques.
   (Closed-loop trace comparison is chaos-limited: 1-ulp noise in XLA CPU
   threaded reductions grows along the rollout, so thresholds here are
   robust-aggregate, not bitwise. The bitwise-grade claim is layer 1.)
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from quadruped_ctrl_tpu.config import FrameworkConfig  # noqa: E402
from quadruped_ctrl_tpu.control import controller as ctrl  # noqa: E402
from quadruped_ctrl_tpu.core import rotations as rot  # noqa: E402
from quadruped_ctrl_tpu.core.types import Command  # noqa: E402
from quadruped_ctrl_tpu.mpc import pipeline  # noqa: E402
from quadruped_ctrl_tpu.models.floating_base import MiniCheetahModel  # noqa: E402
from quadruped_ctrl_tpu.sim import articulated as art  # noqa: E402
from quadruped_ctrl_tpu.sim.terrain import Terrain  # noqa: E402

from tests import ref_bridge  # noqa: E402


@pytest.fixture(scope="module")
def ref_lib():
    lib = ref_bridge.ensure_built()
    if lib is None:
        pytest.skip("reference golden library could not be built")
    return lib


def test_mpc_grf_parity_vs_reference_solver(ref_lib):
    """Our formation+ADMM vs the reference's formation+qpOASES on identical
    random trot instances (BASELINE 'bit-comparable GRF', 10-step horizon)."""
    cfg = FrameworkConfig()
    h, b = 10, 16
    inputs = pipeline.random_inputs(jax.random.PRNGKey(0), b, h, trot=True)
    ours = np.asarray(pipeline.solve_batch(cfg, inputs, h=h))

    rmpc = ref_bridge.ReferenceMPC()
    weights = np.asarray(cfg.mpc.weights, np.float32)
    for i in range(b):
        quat = np.asarray(rot.rpy_to_quat(inputs.rpy[i]))
        ref = rmpc.solve(
            dt_mpc=cfg.dt_mpc, h=h, mu=cfg.mpc.mu, f_max=cfg.mpc.f_max,
            p=np.asarray(inputs.position[i]), v=np.asarray(inputs.v_world[i]),
            quat_wxyz=quat, omega=np.asarray(inputs.omega_world[i]),
            r_feet=np.asarray(inputs.r_feet[i]).T,  # axis-major (RobotState.cpp:25-27)
            yaw=float(inputs.rpy[i, 2]), weights=weights,
            traj=np.asarray(inputs.traj[i]), alpha=cfg.mpc.alpha,
            gait_table=np.asarray(inputs.gait_table[i]),
            x_drag=float(inputs.x_drag[i]),
        )
        d0 = np.abs(ours[i, 0] - ref[0]).max()
        dall = np.abs(ours[i] - ref).max()
        assert d0 < 0.5, f"scenario {i}: first-step GRF diff {d0:.3f} N"
        assert dall < 1.0, f"scenario {i}: horizon GRF diff {dall:.3f} N"


def test_mpc_grf_parity_other_gaits(ref_lib):
    """GRF parity beyond the trot table: all-stance (standing, gait 4) and a
    bounding-style front/back pair table (gait 1).

    On the full 120-var all-stance problem (no swing-variable elimination to
    shrink it) the reference's qpOASES sometimes exhausts its nWSR=100
    budget (SolverMPC.cpp:435) and returns an INFEASIBLE iterate (measured
    up to 22 N friction-pyramid violation on these instances). Parity is
    therefore judged per scenario: where the reference's answer is feasible
    we must match it; where its budget fails, we must match the float64
    active-set oracle instead (our solver has no such failure mode — fixed
    iterations + polish always return a feasible iterate)."""
    import oracle

    cfg = FrameworkConfig()
    h, b = 10, 8
    inputs = pipeline.random_inputs(jax.random.PRNGKey(5), b, h, trot=False)
    tbl_bound = np.zeros((h, 4), np.float32)
    for i in range(h):
        tbl_bound[i, [0, 1] if (i // (h // 2)) % 2 == 0 else [2, 3]] = 1.0
    gait = np.asarray(inputs.gait_table).copy()
    gait[b // 2:] = tbl_bound                      # half stand, half bound
    inputs = inputs.replace(gait_table=jnp.asarray(gait))
    ours = np.asarray(pipeline.solve_batch(cfg, inputs, h=h))

    fmat = oracle.pyramid_matrix(cfg.mpc.mu, h)
    rmpc = ref_bridge.ReferenceMPC()
    weights = np.asarray(cfg.mpc.weights, np.float32)
    for i in range(b):
        quat = np.asarray(rot.rpy_to_quat(inputs.rpy[i]))
        gait_i = np.asarray(inputs.gait_table[i])
        ref = rmpc.solve(
            dt_mpc=cfg.dt_mpc, h=h, mu=cfg.mpc.mu, f_max=cfg.mpc.f_max,
            p=np.asarray(inputs.position[i]), v=np.asarray(inputs.v_world[i]),
            quat_wxyz=quat, omega=np.asarray(inputs.omega_world[i]),
            r_feet=np.asarray(inputs.r_feet[i]).T,
            yaw=float(inputs.rpy[i, 2]), weights=weights,
            traj=np.asarray(inputs.traj[i]), alpha=cfg.mpc.alpha,
            gait_table=gait_i,
            x_drag=float(inputs.x_drag[i]),
        )
        l, u = oracle.pyramid_bounds(gait_i, cfg.mpc.f_max,
                                     cfg.mpc.big_number, h)
        ax = fmat @ np.asarray(ref).reshape(-1)
        ref_viol = max(0.0, (ax - u).max(), (l - ax).max())
        if ref_viol < 1e-6:
            d0 = np.abs(ours[i, 0] - ref[0]).max()
            assert d0 < 0.5, f"scenario {i}: first-step GRF diff {d0:.3f} N"
        else:
            inp = jax.tree.map(lambda x: np.asarray(x[i]), inputs)
            from quadruped_ctrl_tpu.mpc import formation as F
            a_ct, b_ct = oracle.ct_ss_mats(
                np.array(cfg.mpc.inertia), cfg.mpc.mass, inp.r_feet,
                inp.rpy[2], float(inp.x_drag))
            _, _, a_qp, b_qp = oracle.c2qp(a_ct, b_ct, cfg.dt_mpc, h)
            x0 = np.asarray(F.build_x0(
                jnp.asarray(inp.rpy), jnp.asarray(inp.position),
                jnp.asarray(inp.omega_world), jnp.asarray(inp.v_world),
                cfg.mpc.gravity))
            hess, grad = oracle.qp_cost(
                a_qp, b_qp, np.array(cfg.mpc.weights), cfg.mpc.alpha, x0,
                inp.traj[:, :12], h)
            want = oracle.solve_mpc_qp_exact(
                hess, grad, gait_i, cfg.mpc.mu, cfg.mpc.f_max
            ).reshape(h, 4, 3)
            d0 = np.abs(ours[i, 0] - want[0]).max()
            assert d0 < 0.5, (
                f"scenario {i}: reference infeasible ({ref_viol:.1f} N) and "
                f"ours off oracle by {d0:.3f} N")


def _run_reference_trace(terrain, gait: int, vx: float, n: int, stand: int):
    """Run the reference controller closed-loop on our articulated plant,
    with our controller shadowing the identical sensor stream."""
    cfg = FrameworkConfig()
    model = MiniCheetahModel()

    sens_fn = jax.jit(lambda s: art.sensors_from_articulated(cfg, s))
    step_fn = jax.jit(lambda st, sens, cmd: ctrl.controller_step(cfg, st, sens, cmd))
    plant_fn = jax.jit(lambda s, tau: art.articulated_step(cfg, model, s, tau, terrain))
    pre_fn = jax.jit(lambda st, sens: ctrl.pre_work(cfg, st, sens))

    sim = art.articulated_init(cfg, model, terrain)
    state = ctrl.init_state(cfg)
    rc = ref_bridge.ReferenceController(freq=cfg.sim.freq)
    s0 = sens_fn(sim)
    imu0, leg0 = ref_bridge.sensors_to_arrays(jax.tree.map(np.asarray, s0))
    for _ in range(10):                      # walking_simulation.py:185-189
        rc.pre_work(imu0, leg0)
        state = pre_fn(state, s0)

    rc.set_robot_mode(1)
    rc.set_gait_type(9)
    rc.set_robot_vel([0.0, 0.0, 0.0])
    cmd_stand = Command.create(0.0, 0.0, 0.0, gait_type=9, robot_mode=1)
    cmd_go = Command.create(vx, 0.0, 0.0, gait_type=gait, robot_mode=0)

    tau_ref = np.zeros((n, 12))
    tau_ours = np.zeros((n, 12))
    ps = np.zeros((n, 3))
    rpys = np.zeros((n, 3))
    rpy_fn = jax.jit(rot.quat_to_rpy)
    for t in range(n):
        if t == stand:
            rc.set_robot_mode(0)
            rc.set_gait_type(gait)
            rc.set_robot_vel([vx, 0.0, 0.0])
        sens = sens_fn(sim)
        imu, leg = ref_bridge.sensors_to_arrays(jax.tree.map(np.asarray, sens))
        tau_ref[t] = rc.torques(imu, leg)
        state, out = step_fn(state, sens, cmd_stand if t < stand else cmd_go)
        tau_ours[t] = np.asarray(out.tau).ravel()
        ps[t] = np.asarray(sim.p)
        rpys[t] = np.asarray(rpy_fn(sim.quat))
        sim = plant_fn(sim, jnp.asarray(tau_ref[t], jnp.float32))

    return dict(tau_ref=tau_ref, tau_ours=tau_ours, ps=ps, rpys=rpys,
                stand=stand, n=n)


def _trace_subprocess(spec: dict, timeout: float = 2400.0) -> dict:
    """Run a trace lane in a FRESH subprocess (tests/golden_trace_runner.py).

    The reference C++ is deterministic only on a cold heap (it reads memory
    it never wrote somewhere downstream of init_controller — see the runner
    docstring for the measurement); in-process re-runs inherit dirty heap
    pages and drift by up to ~0.25 N*m in the window medians depending on
    which fixtures ran before. A fresh process (kernel-zeroed pages) is the
    state the reference's own launcher runs it in and makes every lane
    order-independent."""
    import json
    import os
    import subprocess
    import sys
    import tempfile

    fd, out = tempfile.mkstemp(suffix=".npz", prefix="golden_trace_")
    os.close(fd)
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "tests.golden_trace_runner", out,
             json.dumps(spec)],
            cwd=str(__import__("pathlib").Path(__file__).parent.parent),
            env=os.environ.copy(),
            capture_output=True,
            timeout=timeout,
        )
        if proc.returncode != 0:
            pytest.fail(
                "golden trace subprocess failed:\n"
                + proc.stderr.decode(errors="replace")[-2000:]
            )
        with np.load(out) as z:
            return {k: (z[k].item() if z[k].ndim == 0 else z[k]) for k in z}
    finally:
        try:
            os.unlink(out)
        except OSError:
            pass


@pytest.fixture(scope="module")
def reference_driven_trace(ref_lib):
    return _trace_subprocess(dict(kind="simple", terrain="plane", gait=9,
                                  vx=0.4, n=780, stand=390))


@pytest.fixture(scope="module")
def reference_trace_walking_rough(ref_lib):
    """Second trace-parity lane (VERDICT r2 next #6): walking gait (10) on
    procedural rough terrain — a 3-stance gait pattern and terrain-excited
    contact timing, neither exercised by the trot@plane trace."""
    return _trace_subprocess(dict(kind="simple", terrain="random",
                                  terrain_key=2, amplitude=0.03, gait=10,
                                  vx=0.3, n=780, stand=390))


def test_reference_controller_stabilizes_our_plant(reference_driven_trace):
    """The unmodified C++ stack must stand and trot on our articulated
    dynamics — cross-validating plant and controller models."""
    tr = reference_driven_trace
    ps, rpys, stand = tr["ps"], tr["rpys"], tr["stand"]
    settle = 100
    assert ps[settle:, 2].min() > 0.22, "body height collapsed"
    assert ps[settle:, 2].max() < 0.33, "body height blew up"
    assert np.abs(rpys[settle:, :2]).max() < 0.15, "roll/pitch diverged"
    assert ps[-1, 0] > 0.15, "no forward progress while trotting"


def test_torque_trace_parity(reference_driven_trace):
    """Our torques along the reference-driven trajectory (robust aggregate
    thresholds; see module docstring for why not bitwise)."""
    tr = reference_driven_trace
    d = tr["tau_ours"] - tr["tau_ref"]
    stand, n = tr["stand"], tr["n"]

    def rel_rms(sl):
        return float(
            np.sqrt((d[sl] ** 2).mean())
            / np.sqrt((tr["tau_ref"][sl] ** 2).mean())
        )

    # score a bounded window: closed-loop chaos (XLA CPU reduction
    # nondeterminism amplified through the rollout) grows with trace length
    # and can misalign a late swing transition by a tick, so the far tail is
    # stability-tested (test above) but not torque-scored.
    trot_end = min(stand + 250, n)
    r_stand = rel_rms(slice(50, stand))
    r_trot = rel_rms(slice(stand, trot_end))
    tick_max = np.abs(d).max(axis=1)
    med = float(np.median(tick_max[50:trot_end]))
    spike_frac = float((tick_max[50:trot_end] > 2.0).mean())
    # measured on aligned runs: stand 0.07, trot 0.02, median 0.1, spikes 0.
    # The robust discriminator for a real regression is the spike fraction:
    # an MPC-cadence off-by-one spikes every 13th tick (~7.7%) above 2 N*m.
    assert r_stand < 0.30, f"stand-phase torque rel RMS {r_stand:.3f}"
    assert r_trot < 0.35, f"trot-phase torque rel RMS {r_trot:.3f}"
    assert med < 0.5, f"median per-tick torque deviation {med:.3f} N*m"
    assert spike_frac < 0.05, f"{spike_frac:.1%} of ticks deviate >2 N*m"


def test_reference_controller_walks_rough_terrain(reference_trace_walking_rough):
    """The unmodified C++ stack must stand and WALK (gait 10) over the
    rough heightfield on our articulated dynamics."""
    tr = reference_trace_walking_rough
    ps, rpys = tr["ps"], tr["rpys"]
    settle = 100
    # terrain cells are 0..0.03 m; height bounds widen accordingly
    assert ps[settle:, 2].min() > 0.20, "body height collapsed"
    assert ps[settle:, 2].max() < 0.36, "body height blew up"
    assert np.abs(rpys[settle:, :2]).max() < 0.25, "roll/pitch diverged"
    assert ps[-1, 0] > 0.08, "no forward progress while walking"


def test_torque_trace_parity_walking_rough(reference_trace_walking_rough):
    """Torque-shadowing parity on the walking@rough trace, same robust
    aggregates as the trot lane (thresholds widened ~1.3x: rough-terrain
    contact transitions amplify closed-loop chaos; the off-by-one-cadence
    spike discriminator stays)."""
    tr = reference_trace_walking_rough
    d = tr["tau_ours"] - tr["tau_ref"]
    stand, n = tr["stand"], tr["n"]

    def rel_rms(sl):
        return float(
            np.sqrt((d[sl] ** 2).mean())
            / np.sqrt((tr["tau_ref"][sl] ** 2).mean())
        )

    walk_end = min(stand + 250, n)
    r_stand = rel_rms(slice(50, stand))
    r_walk = rel_rms(slice(stand, walk_end))
    tick_max = np.abs(d).max(axis=1)
    med = float(np.median(tick_max[50:walk_end]))
    spike_frac = float((tick_max[50:walk_end] > 2.0).mean())
    assert r_stand < 0.40, f"stand-phase torque rel RMS {r_stand:.3f}"
    assert r_walk < 0.45, f"walk-phase torque rel RMS {r_walk:.3f}"
    assert med < 0.6, f"median per-tick torque deviation {med:.3f} N*m"
    assert spike_frac < 0.07, f"{spike_frac:.1%} of ticks deviate >2 N*m"


def _run_reference_trace_profile(terrain, profile, n: int):
    """Like _run_reference_trace, but driven by a command PROFILE
    [(t_start, mode, gait, vx), ...] — the mode-1 (aio) lane, where the
    controller rebands gait shape and horizon from the filtered speed
    (ConvexMPCLocomotion.cpp:173-236). Also records our controller's
    sticky solved horizon (loco.mpc_h) per tick so the test can assert the
    bands actually crossed."""
    cfg = FrameworkConfig()
    model = MiniCheetahModel()

    sens_fn = jax.jit(lambda s: art.sensors_from_articulated(cfg, s))
    step_fn = jax.jit(lambda st, sens, cmd: ctrl.controller_step(cfg, st, sens, cmd))
    plant_fn = jax.jit(lambda s, tau: art.articulated_step(cfg, model, s, tau, terrain))
    pre_fn = jax.jit(lambda st, sens: ctrl.pre_work(cfg, st, sens))

    sim = art.articulated_init(cfg, model, terrain)
    state = ctrl.init_state(cfg)
    rc = ref_bridge.ReferenceController(freq=cfg.sim.freq)
    s0 = sens_fn(sim)
    imu0, leg0 = ref_bridge.sensors_to_arrays(jax.tree.map(np.asarray, s0))
    for _ in range(10):
        rc.pre_work(imu0, leg0)
        state = pre_fn(state, s0)

    cmd = None
    tau_ref = np.zeros((n, 12))
    tau_ours = np.zeros((n, 12))
    ps = np.zeros((n, 3))
    rpys = np.zeros((n, 3))
    mpc_hs = np.zeros(n, np.int32)
    rpy_fn = jax.jit(rot.quat_to_rpy)
    for t in range(n):
        for (t0, mode, gait, vx) in profile:
            if t == t0:
                rc.set_robot_mode(mode)
                rc.set_gait_type(gait)
                rc.set_robot_vel([vx, 0.0, 0.0])
                cmd = Command.create(vx, 0.0, 0.0, gait_type=gait,
                                     robot_mode=mode)
        sens = sens_fn(sim)
        imu, leg = ref_bridge.sensors_to_arrays(jax.tree.map(np.asarray, sens))
        tau_ref[t] = rc.torques(imu, leg)
        state, out = step_fn(state, sens, cmd)
        tau_ours[t] = np.asarray(out.tau).ravel()
        ps[t] = np.asarray(sim.p)
        rpys[t] = np.asarray(rpy_fn(sim.quat))
        mpc_hs[t] = int(state.core.locomotion.mpc_h)
        sim = plant_fn(sim, jnp.asarray(tau_ref[t], jnp.float32))

    return dict(tau_ref=tau_ref, tau_ours=tau_ours, ps=ps, rpys=rpys,
                mpc_hs=mpc_hs, n=n)


MODE1_SEGMENTS = [(0, 1, 9, 0.0), (260, 1, 9, 0.3), (520, 1, 9, 0.9),
                  (780, 1, 9, 1.6)]


@pytest.fixture(scope="module")
def reference_trace_mode1(ref_lib):
    """Third trace-parity lane (VERDICT r3 next #5): mode 1 (aio) with a
    velocity profile crossing the 0.2/0.4 and 1.4 m/s reshaping thresholds —
    the phase-lagged boundary checks, band reshaping, and sticky-horizon
    semantics (controller._select_gait) against the reference's own mode-1
    behavior."""
    return _trace_subprocess(dict(kind="profile", terrain="plane",
                                  profile=MODE1_SEGMENTS, n=1040))


def test_reference_mode1_stabilizes_our_plant(reference_trace_mode1):
    tr = reference_trace_mode1
    ps, rpys = tr["ps"], tr["rpys"]
    settle = 100
    assert ps[settle:, 2].min() > 0.20, "body height collapsed"
    assert ps[settle:, 2].max() < 0.36, "body height blew up"
    assert np.abs(rpys[settle:, :2]).max() < 0.30, "roll/pitch diverged"
    assert ps[-1, 0] > 0.5, "no forward progress across the speed profile"


def test_mode1_bands_crossed(reference_trace_mode1):
    """Our aio re-derivation must actually traverse the reshaping bands:
    sticky horizon 16 (walking/morph band), 14 (mid trot), 10 (fast
    reshaped trot)."""
    hs = set(reference_trace_mode1["mpc_hs"].tolist())
    assert 16 in hs, f"walking-band horizon never engaged: {sorted(hs)}"
    assert 14 in hs, f"mid-trot horizon never engaged: {sorted(hs)}"
    assert 10 in hs, f"fast-band horizon never engaged: {sorted(hs)}"


def test_torque_trace_parity_mode1(reference_trace_mode1):
    """Torque-shadowing parity along the mode-1 profile. Windows start 50
    ticks after each segment's command step (the filtered-velocity band
    crossings and gait-cycle-boundary reshapes land in between; both stacks
    compute the same f32 filter so the reshape ticks align — that alignment
    IS what the spike discriminator validates)."""
    tr = reference_trace_mode1
    d = tr["tau_ours"] - tr["tau_ref"]

    def rel_rms(sl):
        return float(np.sqrt((d[sl] ** 2).mean())
                     / np.sqrt((tr["tau_ref"][sl] ** 2).mean()))

    windows = [(50, 260), (310, 520), (570, 780), (830, 1040)]
    for i, (a, b) in enumerate(windows):
        r = rel_rms(slice(a, b))
        assert r < 0.45, f"window {i} ({a}:{b}): torque rel RMS {r:.3f}"
        tick_max = np.abs(d[a:b]).max(axis=1)
        med = float(np.median(tick_max))
        spike = float((tick_max > 2.0).mean())
        assert med < 0.6, f"window {i}: median deviation {med:.3f} N*m"
        assert spike < 0.08, f"window {i}: {spike:.1%} ticks deviate >2 N*m"
