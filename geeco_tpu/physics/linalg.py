"""While-loop-free small-matrix inverses for the physics hot path.

XLA lowers ``jax.scipy.linalg.cho_factor``/``cho_solve`` and
``jnp.linalg.inv`` to While loops (column sweeps with dynamic slicing).
Inside the 20-substep scan each While iteration is an unfusable dispatch,
so the factorization of the ~40-dof mass matrix costs hundreds of tiny
sequential ops per control step — pure latency on TPU, where the whole
substep is dispatch-bound rather than FLOP-bound (cf. the FK note in
physics/kinematics.py).

This module replaces them with *unrolled* Gauss-Jordan elimination over a
static size: every step is a full-width elementwise/broadcast op XLA can
fuse, and the joint-space mass matrix's exact block-diagonal structure
(one block per kinematic tree: the actuated chain, plus one 6x6 block per
free body — cross terms are structurally zero because no body depends on
dofs from two different trees) cuts the sequential depth from nv to the
largest block size.

No pivoting: all inputs here are SPD (mass matrix with implicit-damping
diagonal, weld Schur complement A_EE = J M^-1 J^T + R), where diagonal
pivots are safe — the same assumption Cholesky makes.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def dof_blocks(anc_mask: np.ndarray) -> List[np.ndarray]:
  """Partition dofs into mass-matrix diagonal blocks.

  ``anc_mask`` [nbody, nv] marks which dofs move each body.  Two dofs can
  couple in M iff some body depends on both (M = sum_b J_b^T I_b J_b),
  so the blocks are the connected components of the share-a-body relation.
  Returns a list of sorted dof-index arrays covering 0..nv-1.
  """
  nv = anc_mask.shape[1]
  parent = np.arange(nv)

  def find(i):
    while parent[i] != i:
      parent[i] = parent[parent[i]]
      i = parent[i]
    return i

  for row in np.asarray(anc_mask) != 0:
    idx = np.nonzero(row)[0]
    if len(idx) > 1:
      r = find(idx[0])
      for j in idx[1:]:
        parent[find(j)] = r
  comps: dict = {}
  for i in range(nv):
    comps.setdefault(find(i), []).append(i)
  return [np.asarray(sorted(v), np.int32) for v in
          sorted(comps.values(), key=lambda v: v[0])]


def gj_inverse(A: jax.Array) -> jax.Array:
  """Unrolled Gauss-Jordan inverse of SPD ``A`` [..., n, n] (n static).

  n sequential steps, each a fused full-width FMA over [..., n, 2n] — no
  While loop, no dynamic slicing, vmaps/batches cleanly.
  """
  n = A.shape[-1]
  eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
  M = jnp.concatenate([A, eye], axis=-1)            # [..., n, 2n]
  for j in range(n):
    piv = M[..., j:j + 1, :] / M[..., j:j + 1, j:j + 1]   # [..., 1, 2n]
    col = M[..., :, j:j + 1]                               # [..., n, 1]
    # one fused select+FMA per step: eliminate every row, then put the
    # scaled pivot row back in place of its (self-eliminated) zero row
    is_j = (jnp.arange(n) == j)[:, None]
    M = jnp.where(is_j, piv, M - col * piv)
  return M[..., :, n:]


def spd_block_inverse(A: jax.Array, blocks: List[np.ndarray]) -> jax.Array:
  """Inverse of block-diagonal SPD ``A`` [..., nv, nv].

  ``blocks`` (from :func:`dof_blocks`) lists the static dof-index sets of
  the diagonal blocks; off-block entries of A are assumed (structurally)
  zero and the result is assembled block-diagonally.  Equal-size blocks
  are stacked and inverted in one vectorized GJ pass.
  """
  nv = A.shape[-1]
  batch = A.shape[:-2]
  out = jnp.zeros_like(A)
  by_size: dict = {}
  for idx in blocks:
    by_size.setdefault(len(idx), []).append(idx)
  for n, group in sorted(by_size.items()):
    k = len(group)
    gi = np.stack(group)                             # [k, n]
    rows = gi[:, :, None]                            # [k, n, 1]
    cols = gi[:, None, :]                            # [k, 1, n]
    sub = A[..., rows, cols]                         # [..., k, n, n]
    inv = gj_inverse(sub)
    out = out.at[..., rows, cols].set(inv)
  return out
