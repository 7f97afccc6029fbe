"""Static box-prop obstacles (the reference racetrack's collision models,
worlds/racetrack_day.world:32-45 + model.sdf <collision> elements, loaded
into PyBullet at walking_simulation.py:153-156): geometry unit tests plus a
closed-loop trot that steps over a low prop and walks past a tall one."""

import numpy as np
import jax.numpy as jnp

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.core.types import Command
from quadruped_ctrl_tpu.sim import rollout as R
from quadruped_ctrl_tpu.sim.terrain import Terrain, box_support, height_at

CFG = default_config()


def test_box_support_geometry():
    t = Terrain.plane().with_boxes(
        centers=[[1.0, 0.0, 0.1], [3.0, 0.0, 0.5]],
        halves=[[0.5, 0.5, 0.1], [0.2, 0.2, 0.5]],
        yaws=[0.0, np.pi / 4],
    )
    # inside the first box footprint: top at 0.2 (f32 arithmetic)
    assert np.isclose(float(height_at(t, 1.0, 0.0)), 0.2)
    assert np.isclose(float(height_at(t, 1.4, 0.4)), 0.2)
    # outside: base plane
    assert float(height_at(t, 1.6, 0.0)) == 0.0
    assert float(height_at(t, 1.0, 0.6)) == 0.0
    # the yawed box: at 45 degrees the corner reach extends to
    # sqrt(2)*0.2 along x — a point at x=3.26 is inside the rotated
    # footprint but would be outside an axis-aligned one
    assert np.isclose(float(height_at(t, 3.26, 0.0)), 1.0)
    # (3.0, 0.35): local coords (0.247, 0.247) exceed the 0.2 half-extent
    assert float(height_at(t, 3.0, 0.35)) == 0.0
    # box_support alone is -inf off every prop
    assert np.isneginf(float(box_support(t, 10.0, 10.0)))


def test_boxes_stack_on_base_terrain():
    # a prop shorter than the local stairs step must not lower the support
    t = Terrain.stairs(height=0.05).with_boxes(
        centers=[[1.5, 0.0, 0.01]], halves=[[0.2, 0.2, 0.01]])
    h_stairs = float(height_at(Terrain.stairs(height=0.05), 1.5, 0.0))
    assert float(height_at(t, 1.5, 0.0)) == h_stairs
    # and a taller prop wins
    t2 = Terrain.stairs(height=0.05).with_boxes(
        centers=[[1.5, 0.0, 0.1]], halves=[[0.2, 0.2, 0.1]])
    assert np.isclose(float(height_at(t2, 1.5, 0.0)), 0.2)


def test_batched_terrains_include_boxes():
    import jax

    from quadruped_ctrl_tpu.sim import batch_rollout as br

    terr = br.batch_terrains(4, jax.random.PRNGKey(0),
                             kinds=("plane", "boxes"))
    # height_at is per-scenario (the engine vmaps it); vmap over the batch
    h_on_prop = np.asarray(jax.vmap(height_at)(
        terr, jnp.full((4,), 0.9), jnp.zeros((4,))))
    assert h_on_prop[1] > 0.0 and h_on_prop[3] > 0.0
    assert h_on_prop[0] == 0.0 and h_on_prop[2] == 0.0


def test_trot_over_and_past_boxes():
    """Closed loop: a 2 cm platform straddles the path (the robot steps
    onto and over it) and a 50 cm crate sits beside the path (walked past).
    The robot must stay safe and keep tracking velocity."""
    terrain = Terrain.plane().with_boxes(
        centers=[[0.9, 0.0, 0.01], [1.0, 0.6, 0.25]],
        halves=[[0.35, 0.6, 0.01], [0.2, 0.2, 0.25]],
    )
    cmd = Command.create(0.5, 0.0, 0.0, gait_type=9, robot_mode=0)
    _, sim, traj = R.run_session(CFG, terrain, cmd, n_ticks=2500)
    p = np.asarray(traj["p"])
    v = np.asarray(traj["v"])
    assert bool(np.asarray(traj["safety"])[-1])
    # made it past the prop zone (x > 1.25 end of platform)
    assert p[-1, 0] > 1.3, p[-1]
    # body height stayed nominal relative to the support surface
    assert p[-500:, 2].min() > 0.15
    assert abs(v[-1000:, 0].mean() - 0.5) < 0.12
    # while over the platform the feet rode its top: body z tracks ~2 cm up
    over = (p[:, 0] > 0.7) & (p[:, 0] < 1.1)
    if over.sum() > 50:
        assert p[over, 2].mean() > p[:200, 2].mean() - 0.02


def test_camera_renders_box_props():
    """Props image as TRUE 3D volumes (the PyBullet camera sees the actual
    collision box): a grounded crate ahead of the camera produces nearer
    prop pixels, while a FLOATING box above every ray leaves the depth
    image identical to the bare plane — under a support-height column
    model its footprint would wall off the ground behind it."""
    import jax
    import jax.numpy as jnp

    from quadruped_ctrl_tpu.sim import camera

    p = jnp.array([0.0, 0.0, 0.3], jnp.float32)
    quat = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    plane = Terrain.plane()
    d0 = np.asarray(jax.jit(
        lambda: camera.render_depth(plane, p, quat)[0])())

    crate = plane.with_boxes(centers=[[0.8, 0.0, 0.15]],
                             halves=[[0.1, 0.3, 0.15]])
    depth_c, _, _, _, is_prop = jax.jit(
        lambda: camera.render_depth(crate, p, quat))()
    is_prop = np.asarray(is_prop)
    depth_c = np.asarray(depth_c)
    assert is_prop.sum() > 10                      # the crate is in-frame
    assert (depth_c[is_prop] <= d0[is_prop] + 1e-6).all()
    assert depth_c[is_prop].mean() < d0[is_prop].mean() - 0.05
    # and the point cloud / rgb paths accept props
    pts, valid = jax.jit(lambda: camera.point_cloud(crate, p, quat))()
    assert bool(valid.any())
    rgb = np.asarray(jax.jit(lambda: camera.render_rgb(crate, p, quat))())
    assert rgb.shape == (camera.HEIGHT, camera.WIDTH, 3)

    # floating box wholly above the down-looking frustum: invisible, and
    # crucially it does NOT occlude the ground under/behind it
    lintel = plane.with_boxes(centers=[[0.8, 0.0, 0.5]],
                              halves=[[0.15, 0.4, 0.05]])
    depth_l, _, _, _, is_prop_l = jax.jit(
        lambda: camera.render_depth(lintel, p, quat))()
    assert not np.asarray(is_prop_l).any()
    np.testing.assert_array_equal(np.asarray(depth_l), d0)
    # while the CONTACT query still reports its support height (documented
    # archway limitation: a foot under the lintel sees the lintel top)
    assert np.isclose(float(height_at(lintel, 0.8, 0.0)), 0.55)
