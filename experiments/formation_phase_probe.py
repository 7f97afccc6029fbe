"""Where do the formation phase's 5.5 ms go? (BENCH_r05_builder.json:
formation 5.52 ms at B=4096/h=10, 2.1% of the MXU bound.)

Times each formation sub-stage in isolation with the bench's chained-reps
methodology (serial dependency through the inputs, final scalar fetched).

CAVEAT (the finding this probe produced): at n_reps=8 every per-rep figure
includes ~23/8 ~= 2.9 ms of the axon tunnel's FIXED per-call transport
(verified: a trivial body costs 23.4 ms at n_reps=1, 0.37 ms/rep at 64 —
see s0_split_probe.py). Absolute stage times are only meaningful after
subtracting it; stage DELTAS cancel it. The bench's rep counts were raised
so its lanes amortize this to <2% (bench.py methodology note).

Stages:

  s0  srb_discrete + build_x0 + stance_selectors  (per-scenario small ops)
  s1  + packed_qp_operands                        (condense to operand form)
  s2  + form_packed_pallas                        (the fused K/grad kernel)

Usage: python experiments/formation_phase_probe.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.mpc import formation, pipeline


def timed(fn, inputs, n_reps=8):
    def body(inp, _):
        probe = fn(inp)
        inp = inp.replace(v_world=inp.v_world + 1e-12 * jnp.mean(probe))
        return inp, None

    def chained(inp):
        inp, _ = lax.scan(body, inp, None, length=n_reps)
        return jnp.sum(inp.v_world)

    jf = jax.jit(chained)
    np.asarray(jf(inputs))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jf(inputs))
        times.append(time.perf_counter() - t0)
    return min(times) / n_reps


def main():
    cfg = default_config()
    batch, h, ms, pack = 4096, 10, 2, 2
    inputs = pipeline.random_inputs(jax.random.PRNGKey(0), batch, h)

    def stage0(inp):
        adt, bdt = formation.srb_discrete(
            cfg.mpc, inp.r_feet, inp.rpy[:, 2], inp.x_drag, cfg.dt_mpc)
        x0 = formation.build_x0(
            inp.rpy, inp.position, inp.omega_world, inp.v_world,
            cfg.mpc.gravity)
        foot_idx, gait_red, sel = formation.stance_selectors(
            inp.gait_table, ms)
        def s(x):
            return jnp.sum(x, tuple(range(1, x.ndim)))
        return (s(adt) + s(bdt) + s(x0) + s(sel)
                + s(gait_red.astype(jnp.float32)))

    def stage1(inp):
        adt, bdt = formation.srb_discrete(
            cfg.mpc, inp.r_feet, inp.rpy[:, 2], inp.x_drag, cfg.dt_mpc)
        x0 = formation.build_x0(
            inp.rpy, inp.position, inp.omega_world, inp.v_world,
            cfg.mpc.gravity)
        foot_idx, gait_red, sel = formation.stance_selectors(
            inp.gait_table, ms)
        step_mask = jnp.ones((batch, h), jnp.float32)
        bfam_s, smat, r, smask = formation.packed_qp_operands(
            cfg.mpc, adt, bdt, x0, inp.traj, step_mask, sel)
        return (jnp.sum(bfam_s, tuple(range(1, bfam_s.ndim)))
                + jnp.sum(smat, tuple(range(1, smat.ndim)))
                + jnp.sum(r, tuple(range(1, r.ndim)))
                + jnp.sum(smask, tuple(range(1, smask.ndim))))

    def stage2(inp):
        adt, bdt = formation.srb_discrete(
            cfg.mpc, inp.r_feet, inp.rpy[:, 2], inp.x_drag, cfg.dt_mpc)
        x0 = formation.build_x0(
            inp.rpy, inp.position, inp.omega_world, inp.v_world,
            cfg.mpc.gravity)
        foot_idx, gait_red, sel = formation.stance_selectors(
            inp.gait_table, ms)
        step_mask = jnp.ones((batch, h), jnp.float32)
        kp, gp = formation.qp_cost_packed(
            cfg.mpc, adt, bdt, x0, inp.traj, step_mask, sel, pack)
        return jnp.sum(kp, (1, 2)) + jnp.sum(gp, 1)

    out = {}
    acc = 0.0
    for name, fn in (("s0_discretize+selectors", stage0),
                     ("s1_+packed_operands", stage1),
                     ("s2_+pack_kernel(full formation)", stage2)):
        t = timed(fn, inputs) * 1e3
        out[name] = {"ms": round(t, 3), "delta_ms": round(t - acc, 3)}
        acc = t
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"backend": jax.default_backend(),
                      "batch": batch, "h": h, "stages": out}))


if __name__ == "__main__":
    main()
