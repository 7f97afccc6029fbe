"""Utility tests: checkpoint round trip, metrics, timers, YAML config, CLI."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.control import controller as ctrl
from quadruped_ctrl_tpu.sim import engine
from quadruped_ctrl_tpu.sim.terrain import Terrain
from quadruped_ctrl_tpu.utils import checkpoint
from quadruped_ctrl_tpu.utils.timer import LatencyRecorder, Timer

CFG = default_config()


def test_checkpoint_round_trip(tmp_path):
    state = ctrl.init_state(CFG)
    sim = engine.sim_init(CFG, Terrain.plane())
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, (state, sim))
    state2, sim2 = checkpoint.load(path, (state, sim))
    for a, b in zip(jax.tree.leaves((state, sim)), jax.tree.leaves((state2, sim2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_continues_identically(tmp_path):
    """A rollout resumed from a checkpoint must match the uninterrupted one."""
    from quadruped_ctrl_tpu.core.types import Command
    from quadruped_ctrl_tpu.sim import rollout as R

    terrain = Terrain.plane()
    cmd = Command.create(0.3, 0.0, 0.0, gait_type=9, robot_mode=0)
    cmds = R.make_command_sequence(CFG, 400, cmd)
    state, sim, _ = R.rollout(CFG, terrain, cmds)

    path = str(tmp_path / "mid.npz")
    checkpoint.save(path, (state, sim))
    state_r, sim_r = checkpoint.load(path, (state, sim))

    # continue both for 1 tick through the controller and compare
    sens = engine.sensors_from_sim(CFG, sim)
    s1, o1 = ctrl.controller_step(CFG, state, sens, Command.create(0.3, 0, 0))
    s2, o2 = ctrl.controller_step(CFG, state_r, sens, Command.create(0.3, 0, 0))
    np.testing.assert_allclose(np.asarray(o1.tau), np.asarray(o2.tau), atol=1e-6)


def test_latency_recorder():
    rec = LatencyRecorder()
    for v in [1.0, 2.0, 3.0, 10.0]:
        rec.record(v)
    s = rec.summary()
    assert s["count"] == 4
    assert s["p50_ms"] in (2.0, 3.0)
    assert s["max_ms"] == 10.0
    t = Timer()
    assert t.get_ns() >= 0


def test_yaml_config_overrides(tmp_path):
    from quadruped_ctrl_tpu.cli import load_config

    p = tmp_path / "cfg.yaml"
    p.write_text("mpc:\n  horizon: 10\n  h_max: 10\ncontrol:\n  body_height: 0.27\n")
    cfg = load_config(str(p))
    assert cfg.mpc.horizon == 10 and cfg.mpc.h_max == 10
    assert cfg.control.body_height == 0.27


def test_metrics_logger(tmp_path):
    from quadruped_ctrl_tpu.utils.metrics import MetricsLogger

    path = tmp_path / "m.jsonl"
    MetricsLogger(str(path)).log({"a": 1.5})
    rec = json.loads(path.read_text().strip())
    assert rec["a"] == 1.5 and "t" in rec


def test_cli_sim_profile_trace(tmp_path):
    """`cli sim --profile DIR` captures a jax.profiler trace (SURVEY.md §5
    tracing — the replacement for the reference's Timer.h instrumentation)."""
    from quadruped_ctrl_tpu import cli

    prof = tmp_path / "trace"
    rc = cli.main([
        "sim", "--gait", "trot", "--terrain", "plane", "--vx", "0.3",
        "--ticks", "40", "--profile", str(prof),
    ])
    assert rc == 0
    files = list(prof.rglob("*.xplane.pb"))
    assert files, "no profiler trace written"
