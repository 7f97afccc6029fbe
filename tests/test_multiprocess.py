"""Multi-process distributed smoke test (SURVEY.md §4 item 5).

Launches two real `jax.distributed` CPU processes (2 virtual devices each)
forming one 4-device global mesh, and asserts (a) each process's shard of
the sharded fast-path MPC solve equals a single-process solve of the same
lanes, and (b) the psum'd cross-process statistic equals the global value.
The reference has no distributed analogue; this is the mandated multi-host
runtime evidence (BASELINE.md row 3's harness)."""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_solve(tmp_path):
    port = _free_port()
    nproc, devs = 2, 2
    procs, outs = [], []
    for pid in range(nproc):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)          # the worker sets its own
        env.pop("JAX_PLATFORMS", None)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), str(nproc), str(port),
                 str(devs), str(out)],
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        o, _ = p.communicate(timeout=540)
        logs.append(o.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    for out in outs:
        rep = json.loads(out.read_text())
        assert rep["global_devices"] == nproc * devs
        # sharded solve == local solve of the same lanes; different batch
        # shapes compile to different XLA fusions, so knife-edge active-set
        # rows may differ at the ~0.1 N polish precision
        assert rep["max_err"] < 0.25, rep
        assert rep["psum_rel_err"] < 1e-4, rep
