"""Head-mounted depth camera + point-cloud synthesis.

The reference runs a 20 Hz thread rendering 80x60 RGB-D from PyBullet and
back-projecting depth to a world point cloud with a Python double loop
(walking_simulation.py:246-356, the loop at :311-328). TPU-native
re-design: a vectorized sphere-traced depth render of the terrain height
function — no loops, batched over pixels (and scenarios under vmap) — with
the same camera geometry: eye on the head, pitched 60 degrees down-forward
(the reference's T1 matrix, walking_simulation.py:263-264), 60-degree FOV.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from quadruped_ctrl_tpu.core import rotations as rot
from quadruped_ctrl_tpu.sim.terrain import Terrain, height_at

WIDTH, HEIGHT = 80, 60
FOV_DEG = 60.0
NEAR, FAR = 0.1, 4.0          # the reference discards Z>4 (line 316)


def camera_pose(base_p, base_quat):
    """(eye, forward, right, down) of the head camera in world frame.

    Mount: 0.25 m forward of the base origin, looking 60 degrees below the
    horizon (the reference's T1: cos30 forward, -sin30... composed with the
    body pose T2; walking_simulation.py:263-271).
    """
    r = rot.quat_to_rot(base_quat)            # body->world
    eye = base_p + r @ jnp.array([0.25, 0.0, 0.0], jnp.float32)
    fwd_body = jnp.array([jnp.sqrt(3.0) / 2.0, 0.0, -0.5], jnp.float32)
    forward = r @ fwd_body
    right = r @ jnp.array([0.0, -1.0, 0.0], jnp.float32)
    down = jnp.cross(forward, right)      # image +v points below the horizon
    return eye, forward, right, down


def render_depth(terrain: Terrain, base_p, base_quat, n_steps: int = 48):
    """(HEIGHT, WIDTH) depth image by sphere-tracing the terrain.

    Each ray marches a fixed number of steps (static shapes); depth is the
    first crossing of the terrain height function, FAR if none.
    """
    eye, forward, right, down = camera_pose(base_p, base_quat)
    aspect = WIDTH / HEIGHT
    tan_half = jnp.tan(jnp.deg2rad(FOV_DEG / 2.0))

    u = (jnp.arange(WIDTH, dtype=jnp.float32) + 0.5) / WIDTH * 2.0 - 1.0
    v = (jnp.arange(HEIGHT, dtype=jnp.float32) + 0.5) / HEIGHT * 2.0 - 1.0
    uu, vv = jnp.meshgrid(u, v)                               # (H,W)
    dirs = (
        forward[None, None, :]
        + uu[..., None] * tan_half * aspect * right[None, None, :]
        + vv[..., None] * tan_half * down[None, None, :]
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    ts = jnp.linspace(NEAR, FAR, n_steps, dtype=jnp.float32)  # (S,)
    pts = eye[None, None, None, :] + ts[:, None, None, None] * dirs[None]  # (S,H,W,3)
    ground = height_at(terrain, pts[..., 0], pts[..., 1])
    below = pts[..., 2] <= ground
    # first step index below ground (S axis), FAR if never
    first = jnp.argmax(below, axis=0)                          # (H,W)
    any_hit = jnp.any(below, axis=0)
    depth = jnp.where(any_hit, ts[first], FAR)
    return depth, dirs, eye


def point_cloud(terrain: Terrain, base_p, base_quat, n_steps: int = 48):
    """(H*W, 3) world-frame point cloud + validity mask (the reference's
    back-projection loop, vectorized)."""
    depth, dirs, eye = render_depth(terrain, base_p, base_quat, n_steps)
    pts = eye[None, None, :] + depth[..., None] * dirs
    valid = (depth > NEAR) & (depth < FAR - 1e-3)
    return pts.reshape(-1, 3), valid.reshape(-1)


def render_rgb(terrain: Terrain, base_p, base_quat, n_steps: int = 48,
               light=(0.3, 0.2, 0.9)):
    """(HEIGHT, WIDTH, 3) uint8 RGB image — the reference renders RGB via
    PyBullet getCameraImage (walking_simulation.py:287-299) and publishes
    mono8 converted from it. TPU-native shading of the sphere-traced hit
    points: height-tinted terrain albedo, Lambertian terrain normal
    (finite-difference of the height function) with inverse-distance
    attenuation; sky (no hit) renders light blue."""
    depth, dirs, eye = render_depth(terrain, base_p, base_quat, n_steps)
    pts = eye[None, None, :] + depth[..., None] * dirs        # (H,W,3)
    eps = 0.05
    hx1 = height_at(terrain, pts[..., 0] + eps, pts[..., 1])
    hx0 = height_at(terrain, pts[..., 0] - eps, pts[..., 1])
    hy1 = height_at(terrain, pts[..., 0], pts[..., 1] + eps)
    hy0 = height_at(terrain, pts[..., 0], pts[..., 1] - eps)
    n = jnp.stack(
        [-(hx1 - hx0) / (2 * eps), -(hy1 - hy0) / (2 * eps),
         jnp.ones_like(hx1)], axis=-1,
    )
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    l = jnp.asarray(light, jnp.float32)
    l = l / jnp.linalg.norm(l)
    lambert = jnp.clip(jnp.einsum("hwi,i->hw", n, l), 0.0, 1.0)
    atten = 1.0 / (1.0 + 0.15 * depth * depth)
    hit = depth < FAR - 1e-3
    shade = 0.15 + 0.85 * lambert * atten                     # (H,W)
    # terrain albedo: height-tinted earth tones (greener when higher)
    ground = height_at(terrain, pts[..., 0], pts[..., 1])
    tint = jnp.clip(ground * 4.0 + 0.5, 0.0, 1.0)
    albedo = jnp.stack(
        [0.55 + 0.1 * tint, 0.45 + 0.35 * tint, 0.30 + 0.05 * tint], axis=-1
    )
    sky = jnp.asarray([0.70, 0.82, 0.95], jnp.float32)
    rgb = jnp.where(hit[..., None], shade[..., None] * albedo,
                    sky[None, None, :])
    return (jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def render_image(terrain: Terrain, base_p, base_quat, n_steps: int = 48,
                 light=(0.3, 0.2, 0.9)):
    """(HEIGHT, WIDTH) uint8 mono8 image, converted from the RGB render with
    ITU-R 601 luma weights — the same RGB->'L' conversion PIL applies in the
    reference's /cam0/image_raw path (walking_simulation.py:330-347)."""
    rgb = render_rgb(terrain, base_p, base_quat, n_steps, light).astype(
        jnp.float32
    )
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    return jnp.clip(luma, 0.0, 255.0).astype(jnp.uint8)
