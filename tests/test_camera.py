import numpy as np
import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.sim import camera
from quadruped_ctrl_tpu.sim.terrain import Terrain


def test_depth_render_flat_ground():
    terrain = Terrain.plane()
    p = jnp.array([0.0, 0.0, 0.3], jnp.float32)
    quat = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    depth, dirs, eye, is_robot, is_prop = jax.jit(
        lambda: camera.render_depth(terrain, p, quat)
    )()
    assert not np.asarray(is_prop).any()    # no box props on this plane
    assert not np.asarray(is_robot).any()   # no robot geometry passed
    depth = np.asarray(depth)
    assert depth.shape == (camera.HEIGHT, camera.WIDTH)
    # looking 30 deg below the horizon from 0.3 m: depth ~ 0.3/0.5 = 0.6
    center = depth[camera.HEIGHT // 2, camera.WIDTH // 2]
    assert 0.4 < center < 0.9
    # rays toward the horizon (top rows) travel farther than center
    assert depth[0].mean() > depth[camera.HEIGHT // 2].mean()


def test_point_cloud_on_ground():
    terrain = Terrain.plane()
    p = jnp.array([0.0, 0.0, 0.3], jnp.float32)
    quat = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    pts, valid = jax.jit(lambda: camera.point_cloud(terrain, p, quat))()
    pts = np.asarray(pts)[np.asarray(valid)]
    assert len(pts) > 100
    # points lie on the ground plane (within marching resolution)
    assert np.abs(pts[:, 2]).max() < 0.12
    # and in front of the robot
    assert pts[:, 0].min() > 0.0


def test_point_cloud_sees_stairs():
    terrain = Terrain.stairs(depth=0.2, height=0.05, x0=0.4)
    p = jnp.array([0.0, 0.0, 0.35], jnp.float32)
    quat = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    pts, valid = jax.jit(lambda: camera.point_cloud(terrain, p, quat))()
    pts = np.asarray(pts)[np.asarray(valid)]
    ahead = pts[pts[:, 0] > 0.45]
    assert len(ahead) > 10
    assert ahead[:, 2].max() > 0.03  # the step is visible


def test_render_rgb_and_mono8():
    from quadruped_ctrl_tpu.sim import camera as cam

    t = Terrain.slope(0.2)
    p = jnp.array([0.0, 0.0, 0.3], jnp.float32)
    q = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    rgb = np.asarray(cam.render_rgb(t, p, q))
    assert rgb.shape == (cam.HEIGHT, cam.WIDTH, 3) and rgb.dtype == np.uint8
    # earth-toned ground: red/green dominate blue on hit pixels
    assert (rgb[..., 0].astype(int) - rgb[..., 2].astype(int)).mean() > 10

    img = np.asarray(cam.render_image(t, p, q))
    assert img.shape == (cam.HEIGHT, cam.WIDTH) and img.dtype == np.uint8
    # shading varies across the frame (near-bright, far-attenuated)
    assert int(img.max()) - int(img.min()) > 20
    # mono8 IS the ITU-R 601 luma of the RGB render (the reference's
    # RGB -> PIL 'L' conversion, walking_simulation.py:330-347)
    luma = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
    np.testing.assert_allclose(img.astype(float), luma, atol=1.0)
    # a frame with sky: camera on a downslope looking past the horizon
    img_sky = np.asarray(cam.render_image(Terrain.slope(-0.6), p, q))
    assert img_sky.max() > 190
    # jit-compatible
    jimg = jax.jit(lambda t, p, q: cam.render_image(t, p, q))(t, p, q)
    np.testing.assert_array_equal(np.asarray(jimg), img)


def test_robot_self_occlusion():
    """The camera sees the robot's own body/legs, as PyBullet's world render
    does (reference walking_simulation.py:287-299): at a pose with the legs
    reaching forward below the head, robot-occluded pixels appear in-frame,
    nearer than the terrain they mask, and enter the point cloud."""
    from quadruped_ctrl_tpu.config import default_config

    cfg = default_config()
    terrain = Terrain.plane()
    p = jnp.array([0.0, 0.0, 0.3], jnp.float32)
    quat = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    # front legs stretched far forward: feet land in the down-forward frustum
    q = jnp.array(
        [[0.0, 1.2, -0.4], [0.0, 1.2, -0.4],
         [0.0, -0.8, 1.6], [0.0, -0.8, 1.6]], jnp.float32
    )
    robot = (cfg.robot, q)
    depth_r, _, eye, is_robot, _ = jax.jit(
        lambda: camera.render_depth(terrain, p, quat, robot=robot)
    )()
    depth_t, _, _, _, _ = jax.jit(
        lambda: camera.render_depth(terrain, p, quat)
    )()
    is_robot = np.asarray(is_robot)
    assert is_robot.sum() > 5                    # legs are in-frame
    # robot pixels are strictly nearer than the terrain behind them
    dr, dt = np.asarray(depth_r), np.asarray(depth_t)
    assert (dr[is_robot] <= dt[is_robot] + 1e-6).all()
    assert dr[is_robot].mean() < dt[is_robot].mean() - 0.05
    # self-points enter the published point cloud above the ground plane
    pts, valid = jax.jit(
        lambda: camera.point_cloud(terrain, p, quat, robot=robot)
    )()
    pts = np.asarray(pts)[np.asarray(valid)]
    assert (pts[:, 2] > 0.05).sum() > 5
    # and the RGB render shades those pixels as the (gray) robot, not ground
    rgb = np.asarray(camera.render_rgb(terrain, p, quat, robot=robot))
    rpix = rgb[is_robot].astype(int)
    assert (rpix[:, 2] >= rpix[:, 0]).mean() > 0.9   # gray-blue, not earth
