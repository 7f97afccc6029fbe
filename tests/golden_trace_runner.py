"""Run ONE golden reference trace in a fresh process and save it as .npz.

Why a subprocess (test_golden_reference._trace_subprocess): the compiled
reference is only deterministic on a COLD heap. Somewhere downstream of
init_controller its C++ reads memory it never wrote (observed, not assumed:
two identical mode-1 traces in one process diverge at tick 2 by ~9e-6 N*m
in the REFERENCE's own torque stream — before our shadow controller
deviates at all — growing chaotically to ~40 N*m; fresh per-instance dlopen
copies and fresh controller state do not remove it, so the residue is heap
reuse, not library statics). A fresh process starts from kernel-zeroed
pages, which restores the cold behavior walking_simulation.py launches the
controller in — the state the golden thresholds were calibrated against.

Usage: python -m tests.golden_trace_runner <out.npz> '<spec json>'
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main() -> None:
    out, spec = sys.argv[1], json.loads(sys.argv[2])

    import jax
    from quadruped_ctrl_tpu.sim.terrain import Terrain
    from tests import test_golden_reference as tg

    if spec["terrain"] == "plane":
        terrain = Terrain.plane()
    else:
        terrain = Terrain.random(
            jax.random.PRNGKey(spec["terrain_key"]),
            amplitude=spec["amplitude"],
        )
    if spec["kind"] == "simple":
        tr = tg._run_reference_trace(
            terrain, gait=spec["gait"], vx=spec["vx"], n=spec["n"],
            stand=spec["stand"],
        )
    else:
        tr = tg._run_reference_trace_profile(
            terrain, [tuple(s) for s in spec["profile"]], n=spec["n"],
        )
    np.savez(out, **tr)


if __name__ == "__main__":
    main()
