"""Device-mesh helpers: batch-sharded simulation + data-parallel training.

The reference has no parallelism (single env, single GPU; SURVEY.md §2
parallelism table).  The TPU-native scaling recipe:
  * env batch: `vmap` the env step/render over a leading axis, shard that
    axis over a 1-d 'data' mesh — physics and rendering are embarrassingly
    parallel per env, so no cross-chip traffic inside the sim step.
  * training: params replicated, batch sharded on 'data'; XLA inserts the
    gradient all-reduce over ICI (no hand-written collectives needed).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = 'data') -> Mesh:
  devs = jax.devices()
  n = n_devices or len(devs)
  return Mesh(np.asarray(devs[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
  return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_env_batch(batched_pytree, mesh: Mesh, axis: str = 'data'):
  """Place a [B, ...] pytree with B sharded across the mesh."""
  sh = batch_sharding(mesh, axis)
  return jax.tree.map(lambda x: jax.device_put(x, sh), batched_pytree)


def batched_env_step(env, mesh: Optional[Mesh] = None):
  """jit(vmap(env.step)) with optional batch sharding constraint."""
  step = jax.vmap(env.step)
  if mesh is None:
    return jax.jit(step)
  sh = batch_sharding(mesh)

  def sharded(es, action):
    es = jax.lax.with_sharding_constraint(es, sh)
    action = jax.lax.with_sharding_constraint(action, sh)
    return step(es, action)

  return jax.jit(sharded)
