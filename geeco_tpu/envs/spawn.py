"""Spawn-grid sampling and sphere-volume sampling (JAX, rng-explicit).

Behavioral parity with the reference utilities (not translations):
  * compute_grid_v2 / sample_spawn_grid — reference:
    src/geeco_gym/utils/grids.py:23-46 (cell centers excluding borders,
    sampled without replacement)
  * sample_point_within_sphere — reference: src/geeco_gym/utils/volumes.py:5
    (direction ~ normal / |normal|, radius ~ cbrt(U(0, r)))
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_grid(minmax_x: Tuple[float, float], minmax_y: Tuple[float, float],
                 tiling_xy: Tuple[int, int]) -> np.ndarray:
  """Static cell-center grid [nx*ny, 2] (x-major, matching the reference)."""
  nx, ny = tiling_xy
  cx = np.linspace(minmax_x[0], minmax_x[1], nx * 2 + 1)[1::2]
  cy = np.linspace(minmax_y[0], minmax_y[1], ny * 2 + 1)[1::2]
  centers = [(x, y) for x in cx for y in cy]
  return np.asarray(centers, np.float32)


def sample_spawn_points(rng: jax.Array, grid: jnp.ndarray,
                        num_points: int) -> jax.Array:
  """Choose num_points distinct cell centers. grid: [ncells, 2]."""
  idx = jax.random.permutation(rng, grid.shape[0])[:num_points]
  return jnp.asarray(grid)[idx]


def sample_point_within_sphere(rng: jax.Array, radius: float = 1.0
                               ) -> jax.Array:
  ru, rn = jax.random.split(rng)
  # uniform in the ball: direction uniform on the sphere, radius ~ cbrt(U)
  # (reference: src/geeco_gym/utils/volumes.py:5-15)
  u = jax.random.uniform(ru, ())
  x = jax.random.normal(rn, (3,))
  x = x / jnp.maximum(jnp.linalg.norm(x), 1e-9)
  return x * radius * jnp.cbrt(u)
