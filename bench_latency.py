#!/usr/bin/env python
"""Single-robot control-cycle latency benchmark (BASELINE.md row 2: p99
within the ~30 ms MPC / 2 ms tick budget).

Measures (a) the full controller step on MPC ticks and plain ticks as
host-observed round trips, and (b) the device-only step rate from a chained
in-jit scan (the deployment number for a locally-attached TPU: under this
container's remote-tunnel transport, host round trips include ~5-10 ms of
tunnel RTT that does not exist on real hardware).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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
        state, out = ctrl.controller_step(cfg, state, sensors, cmd)
        sim = engine.sim_step(cfg, sim, out, terrain)
        return state, sim, out.tau

    # warm up / compile
    state, sim, tau = step(state, sim)
    np.asarray(tau)

    rec = LatencyRecorder()
    for _ in range(260):
        t0 = time.perf_counter()
        state, sim, tau = step(state, sim)
        np.asarray(tau)              # force completion (host round trip)
        rec.record((time.perf_counter() - t0) * 1e3)
    host = rec.summary()

    # device-only rate: 1300 chained ticks (100 MPC solves) inside one jit
    @jax.jit
    def run_n(state, sim):
        def body(carry, _):
            state, sim = carry
            sensors = engine.sensors_from_sim(cfg, sim)
            state, out = ctrl.controller_step(cfg, state, sensors, cmd)
            sim = engine.sim_step(cfg, sim, out, terrain)
            return (state, sim), None

        (state, sim), _ = lax.scan(body, (state, sim), None, length=1300)
        return sim.p

    np.asarray(run_n(state, sim))
    t0 = time.perf_counter()
    np.asarray(run_n(state, sim))
    per_tick_ms = (time.perf_counter() - t0) / 1300 * 1e3

    print(
        json.dumps(
            {
                "metric": "control_cycle_latency",
                "host_roundtrip_p50_ms": round(host["p50_ms"], 3),
                "host_roundtrip_p99_ms": round(host["p99_ms"], 3),
                "device_per_tick_ms": round(per_tick_ms, 4),
                "tick_budget_ms": 2.0,
                "mpc_budget_ms": 26.0,
                "device_within_budget": bool(per_tick_ms < 2.0),
            }
        )
    )


if __name__ == "__main__":
    main()
