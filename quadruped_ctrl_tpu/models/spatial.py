"""6D spatial algebra (Featherstone conventions).

Re-derivation of the reference's spatial substrate (src/Dynamics/spatial.h,
SpatialInertia.h): Plücker coordinate transforms, motion/force cross
products, and spatial inertia construction. Motion vectors are
[omega; v], force vectors [n; f]; transforms are 6x6 Plücker matrices
X = [[R, 0], [-R [p]x, R]] mapping motion vectors from frame A to B where R
rotates A into B and p locates B's origin in A.
All pure jnp, batched over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from quadruped_ctrl_tpu.core.rotations import cross_matrix


def xform(rot, p):
    """Plücker motion transform from (R, p). rot: (...,3,3), p: (...,3)."""
    z = jnp.zeros_like(rot)
    top = jnp.concatenate([rot, z], axis=-1)
    bot = jnp.concatenate([-rot @ cross_matrix(p), rot], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def xform_rot(x):
    return x[..., 0:3, 0:3]


def xform_force(x):
    """Force-vector version of a motion transform: X* = [[R, -R[p]x],[0, R]]."""
    r = x[..., 0:3, 0:3]
    skew = x[..., 3:6, 0:3]
    top = jnp.concatenate([r, skew], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(r), r], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inv_xform(x):
    """Inverse of a Plücker motion transform."""
    r = x[..., 0:3, 0:3]
    rt = jnp.swapaxes(r, -1, -2)
    skew = x[..., 3:6, 0:3]
    top = jnp.concatenate([rt, jnp.zeros_like(r)], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(skew, -1, -2), rt], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def motion_cross(v):
    """vx for motion vectors: [[wx, 0], [vx, wx]] (spatial.h motionCrossMatrix)."""
    w = cross_matrix(v[..., 0:3])
    vl = cross_matrix(v[..., 3:6])
    top = jnp.concatenate([w, jnp.zeros_like(w)], axis=-1)
    bot = jnp.concatenate([vl, w], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def force_cross(v):
    """vx* for force vectors: [[wx, vx], [0, wx]]."""
    w = cross_matrix(v[..., 0:3])
    vl = cross_matrix(v[..., 3:6])
    top = jnp.concatenate([w, vl], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(w), w], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spatial_inertia(mass, com, inertia_about_com):
    """6x6 spatial inertia from mass, CoM offset, rotational inertia about
    the CoM (SpatialInertia.h constructor)."""
    c = cross_matrix(com)
    eye = jnp.eye(3, dtype=c.dtype)
    i_bar = inertia_about_com + mass * (c @ c.T)
    top = jnp.concatenate([i_bar, mass * c], axis=-1)
    bot = jnp.concatenate([mass * c.T, mass * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def rot_axis(axis: int, theta):
    """Featherstone coordinate rotation about a coordinate axis
    (orientation_tools.h:59-76 conventions: transforms INTO the rotated frame)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    if axis == 0:
        rows = [one, zero, zero, zero, c, s, zero, -s, c]
    elif axis == 1:
        rows = [c, zero, -s, zero, one, zero, s, zero, c]
    else:
        rows = [c, s, zero, -s, c, zero, zero, zero, one]
    return jnp.stack(rows, axis=-1).reshape(theta.shape + (3, 3))


def joint_xform(axis: int, theta):
    """Revolute joint transform about a coordinate axis."""
    return xform(rot_axis(axis, theta), jnp.zeros(theta.shape + (3,), theta.dtype))


def joint_motion_subspace(axis: int, dtype=jnp.float32):
    """Motion subspace S for a revolute joint about a coordinate axis."""
    s = jnp.zeros((6,), dtype)
    return s.at[axis].set(1.0)
