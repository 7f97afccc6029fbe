"""Heightmap-file terrain (the reference "random2",
walking_simulation.py:120-130): arbitrary-resolution heightmap arrays/files,
static-grid resampling, and a rough-terrain closed-loop run on a loaded map."""

import numpy as np
import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.core.types import Command
from quadruped_ctrl_tpu.sim import batch_rollout as br
from quadruped_ctrl_tpu.sim import rollout as R
from quadruped_ctrl_tpu.sim.terrain import Terrain, height_at

CFG = default_config()


def _bumpy(n=256, amp=0.04):
    x = np.linspace(0, 6 * np.pi, n)
    hf = amp * (np.sin(x)[:, None] * np.cos(x)[None, :] + 1.0) / 2.0
    return hf.astype(np.float32)


def test_from_array_native_256_grid_under_jit():
    hf = _bumpy(256)
    t = Terrain.from_array(hf, cell_size=0.5, z_scale=1.0)
    assert t.heightfield.shape == (256, 256)
    # center cell is the z=0 datum
    h0 = jax.jit(lambda t: height_at(t, jnp.asarray(0.0), jnp.asarray(0.0)))(t)
    assert abs(float(h0)) < 1e-6
    # an off-center sample matches the (shifted) source array
    x = 3 * 0.5  # 3 cells in +x
    h = float(height_at(t, jnp.asarray(x), jnp.asarray(0.0)))
    expect = hf[131, 128] - hf[128, 128]
    np.testing.assert_allclose(h, expect, atol=1e-6)


def test_resample_preserves_world_extent():
    hf = _bumpy(256)
    t = Terrain.from_array(hf, cell_size=0.5, z_scale=1.0, grid=(64, 64))
    assert t.heightfield.shape == (64, 64)
    # 256 cells at 0.5 m = 128 m extent -> 64 cells at 2.0 m
    np.testing.assert_allclose(float(t.cell_size), 2.0)


def test_from_file_txt_and_npy(tmp_path):
    hf = _bumpy(64)
    txt = tmp_path / "ground.txt"
    np.savetxt(txt, hf)
    npy = tmp_path / "ground.npy"
    np.save(npy, hf)
    t1 = Terrain.from_file(str(txt), cell_size=0.5, z_scale=0.5)
    t2 = Terrain.from_file(str(npy), cell_size=0.5, z_scale=0.5)
    np.testing.assert_allclose(
        np.asarray(t1.heightfield), np.asarray(t2.heightfield), atol=1e-6
    )
    # reference meshScale [.5,.5,.5]: z is scaled by 0.5
    span = np.asarray(t1.heightfield).max() - np.asarray(t1.heightfield).min()
    np.testing.assert_allclose(span, 0.5 * (hf.max() - hf.min()), atol=1e-6)


def test_batch_terrains_with_file_kind(tmp_path):
    path = tmp_path / "map.npy"
    np.save(path, _bumpy(128))
    terr = br.batch_terrains(
        4, jax.random.PRNGKey(0), kinds=("plane", f"file:{path}"),
        grid=(64, 64),
    )
    assert terr.heightfield.shape == (4, 64, 64)
    kinds = np.asarray(terr.kind)
    assert set(kinds.tolist()) == {0, 4}


def test_closed_loop_trot_on_loaded_heightmap():
    # gentle rough ground loaded from an array, native 128x128 grid
    t = Terrain.from_array(_bumpy(128, amp=0.02), cell_size=0.25)
    cmd = Command.create(0.3, 0.0, 0.0, gait_type=9, robot_mode=0)
    _, sim, traj = R.run_session(CFG, t, cmd, n_ticks=900)
    p = np.asarray(traj["p"])
    assert bool(np.asarray(traj["safety"])[-1])
    assert p[-1, 2] > 0.15          # upright on the terrain
    assert np.isfinite(p).all()
    # it actually walked forward
    assert p[-1, 0] > 0.15
