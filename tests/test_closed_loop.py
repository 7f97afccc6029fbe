"""Closed-loop behavior tests — the replacement for the reference's
"launch it and watch rviz" validation (SURVEY.md §4 item 4): standing must
hold height, trot must track velocity, turning must turn."""

import numpy as np
import jax
import pytest

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.core.types import Command
from quadruped_ctrl_tpu.sim import rollout as R
from quadruped_ctrl_tpu.sim.terrain import Terrain

CFG = default_config()
PLANE = Terrain.plane()


def test_standing_holds_height():
    cmd = Command.create(0.0, 0.0, 0.0, gait_type=4, robot_mode=0)
    _, sim, traj = R.run_session(CFG, PLANE, cmd, n_ticks=600)
    p = np.asarray(traj["p"])
    assert 0.24 < p[-1, 2] < 0.29
    # settled: last 200 ticks height variation < 1 cm
    assert np.ptp(p[-200:, 2]) < 0.01
    rpy = np.asarray(traj["rpy"])
    assert np.abs(rpy[-200:]).max() < 0.05
    assert bool(np.asarray(traj["safety"])[-1])


def test_trot_tracks_forward_velocity():
    cmd = Command.create(0.5, 0.0, 0.0, gait_type=9, robot_mode=0)
    _, sim, traj = R.run_session(CFG, PLANE, cmd, n_ticks=2500)
    v = np.asarray(traj["v"])
    p = np.asarray(traj["p"])
    assert abs(v[-1000:, 0].mean() - 0.5) < 0.1
    assert 0.22 < p[-1000:, 2].min() and p[-1000:, 2].max() < 0.30
    assert bool(np.asarray(traj["safety"])[-1])


def test_trot_turns_with_yaw_command():
    cmd = Command.create(0.3, 0.0, 0.5, gait_type=9, robot_mode=0)
    _, sim, traj = R.run_session(CFG, PLANE, cmd, n_ticks=2500)
    rpy = np.asarray(traj["rpy"])
    # yaw should have advanced in the commanded direction
    assert rpy[-1, 2] > 0.5
    assert bool(np.asarray(traj["safety"])[-1])


def test_lateral_velocity_tracking():
    cmd = Command.create(0.0, 0.3, 0.0, gait_type=9, robot_mode=0)
    _, sim, traj = R.run_session(CFG, PLANE, cmd, n_ticks=2500)
    v = np.asarray(traj["v"])
    assert abs(v[-1000:, 1].mean() - 0.3) < 0.1
    assert bool(np.asarray(traj["safety"])[-1])


def test_adaptive_aio_mode_stand_and_walk():
    # mode 1 picks gait/horizon from commanded speed (aio)
    cmd = Command.create(0.0, 0.0, 0.0, gait_type=9, robot_mode=1)
    _, sim, traj = R.run_session(CFG, PLANE, cmd, n_ticks=800)
    p = np.asarray(traj["p"])
    assert 0.21 < p[-100:, 2].mean() < 0.30
    cmd = Command.create(0.8, 0.0, 0.0, gait_type=9, robot_mode=1)
    _, sim, traj = R.run_session(CFG, PLANE, cmd, n_ticks=2500)
    v = np.asarray(traj["v"])
    assert abs(v[-800:, 0].mean() - 0.8) < 0.2
    assert bool(np.asarray(traj["safety"])[-1])


@pytest.mark.parametrize("gait_type", [8, 10])  # pacing, walking
def test_other_gaits_stay_upright(gait_type):
    cmd = Command.create(0.3, 0.0, 0.0, gait_type=gait_type, robot_mode=0)
    _, sim, traj = R.run_session(CFG, PLANE, cmd, n_ticks=2000)
    p = np.asarray(traj["p"])
    assert p[-500:, 2].min() > 0.15
    rpy = np.asarray(traj["rpy"])
    assert np.abs(rpy[-500:, :2]).max() < 0.4


def test_rough_terrain_trot():
    terrain = Terrain.random(jax.random.PRNGKey(0), amplitude=0.02)
    cmd = Command.create(0.4, 0.0, 0.0, gait_type=9, robot_mode=0)
    _, sim, traj = R.run_session(CFG, terrain, cmd, n_ticks=2500)
    v = np.asarray(traj["v"])
    assert v[-1000:, 0].mean() > 0.2
    p = np.asarray(traj["p"])
    assert p[-1, 2] > 0.15
