"""Multi-host runtime + scaling-efficiency reporting.

The reference has no distributed execution at all (SURVEY.md §2.8); these
are the pod-scale components: `jax.distributed` bring-up for same-program
SPMD across hosts, and a scaling report measuring batched-MPC throughput at
increasing device counts (the ">=85% efficiency at 2 hosts" BASELINE.md
metric). Collectives ride XLA (psum over ICI within a slice, DCN across
hosts) — the TPU-native replacement for NCCL/MPI.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_ctrl_tpu.config import FrameworkConfig
from quadruped_ctrl_tpu.mpc import pipeline
from quadruped_ctrl_tpu.parallel import mesh as mesh_mod


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Bring up multi-host JAX (no-op for single-process runs).

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters.
    """
    if num_processes is None and coordinator_address is None:
        return False  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _throughput(cfg: FrameworkConfig, n_devices: int, per_device_batch: int,
                h: int, reps: int) -> float:
    """Solves/s for a batch sharded over the first n_devices."""
    m = mesh_mod.make_mesh(n_devices)
    batch = n_devices * per_device_batch
    inputs = pipeline.random_inputs(jax.random.PRNGKey(0), batch, h)
    inputs = mesh_mod.shard_batch(inputs, m)
    fn = mesh_mod.sharded_mpc_solve(cfg, m, h)
    out = fn(inputs)
    np.asarray(out[1])                      # force completion (host fetch)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(inputs)
    np.asarray(out[1])
    dt = time.perf_counter() - t0
    return batch * reps / dt


def scaling_report(cfg: FrameworkConfig, device_counts=None,
                   per_device_batch: int = 256, h: int = 10,
                   reps: int = 3) -> dict:
    """Weak-scaling efficiency across device counts.

    Efficiency(n) = throughput(n) / (n * throughput(1)). On this machine the
    axes available are whatever jax.devices() exposes (virtual CPU devices in
    tests, one real chip under the tunnel, a pod slice in production).
    """
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    base = None
    rows = []
    for n in device_counts:
        tput = _throughput(cfg, n, per_device_batch, h, reps)
        if base is None:
            base = tput
        rows.append(
            {
                "devices": n,
                "solves_per_s": round(tput, 1),
                "efficiency": round(tput / (base * n), 4),
            }
        )
    return {
        "metric": "mpc_scaling",
        "per_device_batch": per_device_batch,
        "horizon": h,
        "rows": rows,
    }
