"""Structured metrics & jsonl logging.

Replaces the reference's observability surface (six ROS topics +
printf/rospy.loginfo scattered through the C++ — SURVEY.md §5) with
structured records: solves/s, per-stage times, cycle-latency percentiles,
tracking errors, safety flags — appended as one JSON object per line.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricsLogger:
    def __init__(self, path: str | None = None, echo: bool = False):
        self.path = Path(path) if path else None
        self.echo = echo
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, record: dict):
        record = {"t": time.time(), **record}
        line = json.dumps(record, default=float)
        if self.path:
            with self.path.open("a") as f:
                f.write(line + "\n")
        if self.echo:
            print(line)
        return record


def tracking_metrics(traj, v_cmd, body_height: float) -> dict:
    """Summarize a rollout trajectory dict (from sim.rollout)."""
    import numpy as np

    v = np.asarray(traj["v"])
    p = np.asarray(traj["p"])
    rpy = np.asarray(traj["rpy"])
    tail = slice(len(v) // 2, None)
    return {
        "vx_mean": float(v[tail, 0].mean()),
        "vx_err": float(abs(v[tail, 0].mean() - v_cmd[0])),
        "vy_err": float(abs(v[tail, 1].mean() - v_cmd[1])),
        "height_mean": float(p[tail, 2].mean()),
        "height_err": float(abs(p[tail, 2].mean() - body_height)),
        "rpy_max": float(np.abs(rpy[tail]).max()),
        "safety_ok": bool(np.asarray(traj["safety"])[-1]),
        "fell": bool(p[:, 2].min() < 0.1),
    }
