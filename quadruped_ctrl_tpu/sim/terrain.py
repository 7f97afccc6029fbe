"""Terrain library for the batched scenario engine.

The reference builds five PyBullet terrains (plane, random1 procedural
heightfield, random2 heightmap file, stairs, racetrack —
scripts/walking_simulation.py:93-159). Here terrain is a pure height
function h(x, y) parameterized by a small pytree, so thousands of scenarios
with different terrains batch under vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

TERRAIN_PLANE = 0
TERRAIN_RANDOM = 1      # procedural heightfield (reference "random1")
TERRAIN_STAIRS = 2      # box steps (reference "stairs")
TERRAIN_SLOPE = 3


@struct.dataclass
class Terrain:
    """Batched terrain parameters; `kind` selects the height function."""

    kind: jnp.ndarray          # () int32
    # random heightfield: (H, W) grid, scale meters/cell, amplitude
    heightfield: jnp.ndarray   # (64, 64)
    cell_size: jnp.ndarray     # ()
    # stairs: step depth/height along +x from x0
    stair_depth: jnp.ndarray   # ()
    stair_height: jnp.ndarray  # ()
    stair_x0: jnp.ndarray      # ()
    # slope: grade in x
    slope: jnp.ndarray         # ()

    @staticmethod
    def plane():
        return Terrain(
            kind=jnp.asarray(TERRAIN_PLANE, jnp.int32),
            heightfield=jnp.zeros((64, 64), jnp.float32),
            cell_size=jnp.asarray(0.1, jnp.float32),
            stair_depth=jnp.asarray(0.2, jnp.float32),
            stair_height=jnp.asarray(0.02, jnp.float32),
            stair_x0=jnp.asarray(1.0, jnp.float32),
            slope=jnp.asarray(0.0, jnp.float32),
        )

    @staticmethod
    def random(key, amplitude=0.03, cell_size=0.1):
        """Procedural rough ground (reference random1: +-0.06 m cells,
        walking_simulation.py:101-119; amplitude is halved by default for the
        point-foot SRB model)."""
        hf = jax.random.uniform(key, (64, 64), jnp.float32, 0.0, amplitude)
        base = Terrain.plane()
        return base.replace(
            kind=jnp.asarray(TERRAIN_RANDOM, jnp.int32),
            heightfield=hf,
            cell_size=jnp.asarray(cell_size, jnp.float32),
        )

    @staticmethod
    def stairs(depth=0.2, height=0.02, x0=1.0):
        base = Terrain.plane()
        return base.replace(
            kind=jnp.asarray(TERRAIN_STAIRS, jnp.int32),
            stair_depth=jnp.asarray(depth, jnp.float32),
            stair_height=jnp.asarray(height, jnp.float32),
            stair_x0=jnp.asarray(x0, jnp.float32),
        )

    @staticmethod
    def slope(grade=0.1):
        base = Terrain.plane()
        return base.replace(
            kind=jnp.asarray(TERRAIN_SLOPE, jnp.int32),
            slope=jnp.asarray(grade, jnp.float32),
        )


def height_at(terrain: Terrain, x, y):
    """Terrain height at world (x, y); broadcasts over trailing dims."""
    hw = terrain.heightfield.shape
    gx = jnp.clip(x / terrain.cell_size + hw[0] / 2, 0, hw[0] - 1).astype(jnp.int32)
    gy = jnp.clip(y / terrain.cell_size + hw[1] / 2, 0, hw[1] - 1).astype(jnp.int32)
    h_random = terrain.heightfield[gx, gy]
    h_stairs = jnp.clip(
        jnp.floor((x - terrain.stair_x0) / terrain.stair_depth) + 1, 0, 4
    ) * terrain.stair_height
    h_slope = terrain.slope * x
    zero = jnp.zeros_like(jnp.asarray(x, jnp.float32))
    return jnp.select(
        [
            terrain.kind == TERRAIN_RANDOM,
            terrain.kind == TERRAIN_STAIRS,
            terrain.kind == TERRAIN_SLOPE,
        ],
        [h_random, h_stairs, h_slope],
        zero,
    )
