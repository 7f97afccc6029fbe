"""Sharding / scaling tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.mpc import pipeline
from quadruped_ctrl_tpu.parallel import mesh as mesh_mod
from quadruped_ctrl_tpu.parallel import multihost

CFG = default_config()
H = 6


def test_sharded_solve_matches_single_device():
    m = mesh_mod.make_mesh(8)
    batch = 16
    inputs = pipeline.random_inputs(jax.random.PRNGKey(1), batch, H)
    fn = mesh_mod.sharded_mpc_solve(CFG, m, H)
    sharded_inputs = mesh_mod.shard_batch(inputs, m)
    forces_sh, mean_abs = fn(sharded_inputs)
    forces_1 = jax.jit(lambda i: pipeline.solve_batch(CFG, i))(inputs)
    # packed fast path vs per-scenario reference: same minimizer, slightly
    # different iterate schedules -> knife-edge rows may differ by ~0.1 N
    np.testing.assert_allclose(
        np.asarray(forces_sh), np.asarray(forces_1), atol=0.25
    )
    # the psum'd statistic matches the global mean
    np.testing.assert_allclose(
        float(mean_abs), float(jnp.mean(jnp.abs(forces_1))), rtol=1e-3
    )


def test_mp_axis_mesh():
    m = mesh_mod.make_mesh(8, mp=2)
    assert m.shape["dp"] == 4 and m.shape["mp"] == 2
    fn = mesh_mod.sharded_mpc_solve(CFG, m, H)
    inputs = pipeline.random_inputs(jax.random.PRNGKey(2), 8, H)
    forces, mean_abs = fn(mesh_mod.shard_batch(inputs, m))
    assert np.isfinite(np.asarray(forces)).all()


def test_scaling_report_runs():
    rep = multihost.scaling_report(
        CFG, device_counts=[1, 2], per_device_batch=4, h=H, reps=1
    )
    assert len(rep["rows"]) == 2
    assert rep["rows"][0]["weak_efficiency"] == 1.0
    assert rep["rows"][0]["sharding_efficiency"] == 1.0
    assert rep["rows"][1]["solves_per_s"] > 0
    assert rep["rows"][1]["sharding_efficiency"] > 0
