#!/usr/bin/env python
"""Single-robot control-cycle latency benchmark (BASELINE.md row 2: p99
within the ~30 ms MPC / 2 ms tick budget).

Measures, with ONE compiled program (no long-scan compile — the round-1
version spent ~5 min compiling a 1300-tick scan):

* host round-trip latency per tick (dispatch + compute + fetch) — under
  this container's remote-tunnel transport this includes ~5-10 ms of tunnel
  RTT that does not exist on locally-attached hardware;
* device-side per-tick rate, from a pipeline of 130 asynchronously
  dispatched ticks (10 full MPC macro-cycles) with a single final fetch —
  the dispatch queue keeps the device busy, so wall/ticks ~= device time.

The closed-loop MPC solves use the temporally warm-started budget
(cfg.solver.warm_iterations), as in deployment. Writes LATENCY.json at the
repo root and prints the same JSON line.
"""

import json
import os
import time

import jax

# persistent XLA compilation cache: the single-robot step is one large
# program (~3 min cold compile through the remote tunnel); cached reruns
# skip straight to measurement
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.control import controller as ctrl
from quadruped_ctrl_tpu.core.types import Command
from quadruped_ctrl_tpu.sim import engine
from quadruped_ctrl_tpu.sim.terrain import Terrain
from quadruped_ctrl_tpu.utils.timer import LatencyRecorder


def main():
    cfg = default_config(**{"mpc.h_max": 10})
    terrain = Terrain.plane()
    sim = engine.sim_init(cfg, terrain)
    state = ctrl.init_state(cfg)
    cmd = Command.create(0.5, 0.0, 0.0, gait_type=9, robot_mode=0)

    @jax.jit
    def step(state, sim):
        sensors = engine.sensors_from_sim(cfg, sim)
        # mpc_iterations=None -> runtime warm/cold budget selection
        # (controller.mpc_update): steady-state ticks run the reduced
        # warm_iterations, exactly as in deployment
        state, out = ctrl.controller_step(cfg, state, sensors, cmd)
        sim = engine.sim_step(cfg, sim, out, terrain)
        return state, sim, out.tau

    t0 = time.perf_counter()
    state, sim, tau = step(state, sim)   # compile + warm up
    np.asarray(tau)
    compile_s = time.perf_counter() - t0

    rec = LatencyRecorder()
    for _ in range(200):
        t0 = time.perf_counter()
        state, sim, tau = step(state, sim)
        np.asarray(tau)              # force completion (host round trip)
        rec.record((time.perf_counter() - t0) * 1e3)
    host = rec.summary()

    # --- tunnel-RTT decomposition -------------------------------------
    # Each measured tick is exactly TWO transport round trips (one execute
    # dispatch + one device->host transfer for the fetch) plus device
    # compute. A trivial one-op program measures the pure transport cost of
    # the same two round trips, so the locally-attached projection is
    # arithmetic: p99_local ~= p99_here - rtt_pair_p50 + eps_local, with
    # eps_local ~0.1 ms for a PCIe-attached dispatch+fetch pair.
    import jax.numpy as jnp

    @jax.jit
    def noop(x):
        return x + 1.0

    xs = jnp.zeros(())
    np.asarray(noop(xs))             # compile
    rec_rtt = LatencyRecorder()
    for _ in range(200):
        t0 = time.perf_counter()
        np.asarray(noop(xs))
        rec_rtt.record((time.perf_counter() - t0) * 1e3)
    rtt = rec_rtt.summary()

    # device-side rate: ONE jitted 13-tick MPC macro-cycle (scan), queued
    # 40 deep with a single scalar fetch. Per-call dispatch through the
    # remote tunnel costs ~1 ms and dominates any per-tick measurement
    # made with one execute per tick (measured: a PLAIN tick "takes" more
    # than a full step that way); the scanned macro amortizes dispatch so
    # wall/ticks is genuine device compute.
    from jax import lax

    @jax.jit
    def macro13(state, sim):
        def tick(carry, _):
            st, sm = carry
            sensors = engine.sensors_from_sim(cfg, sm)
            st, out = ctrl.controller_step(cfg, st, sensors, cmd)
            sm = engine.sim_step(cfg, sm, out, terrain)
            return (st, sm), jnp.sum(out.tau)
        (st, sm), taus = lax.scan(tick, (state, sim), None, length=13)
        return st, sm, jnp.sum(taus)

    n_macros = 40
    state, sim, acc = macro13(state, sim)
    np.asarray(acc)                  # compile + drain
    t0 = time.perf_counter()
    for _ in range(n_macros):
        state, sim, acc = macro13(state, sim)
    np.asarray(acc)
    per_tick_ms = (time.perf_counter() - t0) / (n_macros * 13) * 1e3

    report = {
        "metric": "control_cycle_latency",
        "host_roundtrip_p50_ms": round(host["p50_ms"], 3),
        "host_roundtrip_p99_ms": round(host["p99_ms"], 3),
        "host_roundtrip_note": "per-call dispatch through the axon tunnel "
                               "(~1 ms RTT absent on locally-attached TPUs)",
        "device_per_tick_ms": round(per_tick_ms, 4),
        "device_method": "13-tick scanned MPC macro-cycle x40, single fetch",
        "dispatches_per_tick": 2,
        "dispatch_note": "one execute RPC + one device->host fetch RPC",
        "tunnel_rtt_pair_p50_ms": round(rtt["p50_ms"], 3),
        "tunnel_rtt_pair_p99_ms": round(rtt["p99_ms"], 3),
        "host_p99_decomposition_ms": {
            "transport_2rpc_p50": round(rtt["p50_ms"], 3),
            "device_and_jitter": round(host["p99_ms"] - rtt["p50_ms"], 3),
        },
        "projected_local_p99_ms": round(
            max(host["p99_ms"] - rtt["p50_ms"], 0.0) + 0.1, 3),
        "projected_local_note": "p99 - tunnel transport pair + ~0.1 ms "
                                "PCIe dispatch/fetch pair",
        "tick_budget_ms": 2.0,
        "mpc_budget_ms": 26.0,
        "device_within_budget": bool(per_tick_ms < 2.0),
        "projected_local_within_mpc_budget": bool(
            max(host["p99_ms"] - rtt["p50_ms"], 0.0) + 0.1 < 26.0),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "LATENCY.json")
    with open(out_path, "w") as f:
        json.dump(report, f)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
