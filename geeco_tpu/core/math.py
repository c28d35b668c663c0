"""Quaternion / SO(3) / SE(3) math primitives.

All functions are pure jax.numpy, shaped for batching via ``jax.vmap`` and safe
under ``jit``.  Quaternion convention follows MuJoCo: ``[w, x, y, z]`` scalar
first, unit norm, representing rotation of a vector from the local frame into
the parent/world frame.

Reference semantics mirrored here (for parity checking, not copied):
  * gym rotations.euler2quat  (reference: src/geeco_gym/pickplace.py:503)
  * MuJoCo quaternion integration (mju_quatIntegrate)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------------------
# quaternions
# ----------------------------------------------------------------------------


def quat_identity() -> jax.Array:
  return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
  return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
  """Hamilton product a ⊗ b (both wxyz)."""
  aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
  bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
  return jnp.stack(
      [
          aw * bw - ax * bx - ay * by - az * bz,
          aw * bx + ax * bw + ay * bz - az * by,
          aw * by - ax * bz + ay * bw + az * bx,
          aw * bz + ax * by - ay * bx + az * bw,
      ],
      axis=-1,
  )


def quat_conj(q: jax.Array) -> jax.Array:
  return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_inv(q: jax.Array) -> jax.Array:
  """Inverse of a unit quaternion (= conjugate)."""
  return quat_conj(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate vector v by quaternion q (local -> parent frame)."""
  # v' = v + 2*w*(u x v) + 2*(u x (u x v)),  u = q_xyz
  u = q[..., 1:]
  w = q[..., 0:1]
  uv = jnp.cross(u, v)
  return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
  return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
  """Quaternion -> 3x3 rotation matrix."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  r = jnp.stack(
      [
          1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
          2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
          2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
      ],
      axis=-1,
  )
  return r.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
  """3x3 rotation matrix -> quaternion (wxyz), branch-free (Shepperd)."""
  tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
  # four candidate constructions, pick numerically best
  qw = jnp.stack([
      1.0 + tr,
      m[..., 2, 1] - m[..., 1, 2],
      m[..., 0, 2] - m[..., 2, 0],
      m[..., 1, 0] - m[..., 0, 1],
  ], -1)
  qx = jnp.stack([
      m[..., 2, 1] - m[..., 1, 2],
      1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
      m[..., 0, 1] + m[..., 1, 0],
      m[..., 0, 2] + m[..., 2, 0],
  ], -1)
  qy = jnp.stack([
      m[..., 0, 2] - m[..., 2, 0],
      m[..., 0, 1] + m[..., 1, 0],
      1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
      m[..., 1, 2] + m[..., 2, 1],
  ], -1)
  qz = jnp.stack([
      m[..., 1, 0] - m[..., 0, 1],
      m[..., 0, 2] + m[..., 2, 0],
      m[..., 1, 2] + m[..., 2, 1],
      1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
  ], -1)
  cand = jnp.stack([qw, qx, qy, qz], -2)  # [..., 4(case), 4(quat)]
  case = jnp.argmax(jnp.stack([
      tr, m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]], -1), axis=-1)
  q = jnp.take_along_axis(cand, case[..., None, None].astype(jnp.int32),
                          axis=-2)[..., 0, :]
  return quat_normalize(q)


def euler_to_quat(euler: jax.Array) -> jax.Array:
  """Intrinsic x-y-z euler angles (MuJoCo compiler default) -> quaternion.

  Matches mujoco's eulerseq="xyz": q = qx ⊗ qy ⊗ qz applied right-to-left,
  and gym.envs.robotics.rotations.euler2quat for the z-rotation case used in
  reference reset randomization (pickplace.py:503).
  """
  ex, ey, ez = euler[..., 0] * 0.5, euler[..., 1] * 0.5, euler[..., 2] * 0.5
  zeros = jnp.zeros_like(ex)
  qx = jnp.stack([jnp.cos(ex), jnp.sin(ex), zeros, zeros], -1)
  qy = jnp.stack([jnp.cos(ey), zeros, jnp.sin(ey), zeros], -1)
  qz = jnp.stack([jnp.cos(ez), zeros, zeros, jnp.sin(ez)], -1)
  return quat_mul(quat_mul(qx, qy), qz)


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
  """Integrate unit quaternion by angular velocity (world frame) over dt.

  Uses the exponential map like MuJoCo's mju_quatIntegrate (local frame), but
  with omega expressed in the world frame: q' = exp(0.5*omega*dt) ⊗ q.
  """
  angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
  half = 0.5 * angle * dt
  # sinc-safe axis scaling
  k = jnp.where(angle > 1e-9, jnp.sin(half) / jnp.maximum(angle, 1e-9), 0.5 * dt)
  dq = jnp.concatenate([jnp.cos(half), omega * k], axis=-1)
  return quat_normalize(quat_mul(dq, q))


def quat_tangent(q: jax.Array, omega: jax.Array) -> jax.Array:
  """d(q)/dt given world-frame angular velocity: 0.5 * [0, omega] ⊗ q."""
  zero = jnp.zeros_like(omega[..., :1])
  ow = jnp.concatenate([zero, omega], axis=-1)
  return 0.5 * quat_mul(ow, q)


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """Rotation 'difference' qa ⊖ qb as a world-frame rotation vector.

  Returns the axis-angle vector v such that exp(v) ⊗ qb = qa.
  """
  dq = quat_mul(qa, quat_conj(qb))
  # ensure shortest path
  dq = jnp.where(dq[..., 0:1] < 0, -dq, dq)
  w = jnp.clip(dq[..., 0], -1.0, 1.0)
  angle = 2.0 * jnp.arccos(w)
  s = jnp.sqrt(jnp.maximum(1.0 - w * w, 1e-18))
  axis = dq[..., 1:] / s[..., None]
  return jnp.where(angle[..., None] > 1e-7, axis * angle[..., None],
                   2.0 * dq[..., 1:])


def mat_to_euler(m: jax.Array) -> jax.Array:
  """Rotation matrix -> intrinsic x-y-z euler (parity with gym rotations.mat2euler)."""
  cy = jnp.sqrt(m[..., 2, 2] * m[..., 2, 2] + m[..., 1, 2] * m[..., 1, 2])
  cond = cy > 1e-6
  ex = jnp.where(cond, jnp.arctan2(-m[..., 1, 2], m[..., 2, 2]),
                 jnp.arctan2(m[..., 2, 1], m[..., 1, 1]))
  ey = jnp.where(cond, jnp.arctan2(m[..., 0, 2], cy),
                 jnp.arctan2(m[..., 0, 2], cy))
  ez = jnp.where(cond, jnp.arctan2(-m[..., 0, 1], m[..., 0, 0]),
                 jnp.zeros_like(ex))
  return jnp.stack([ex, ey, ez], axis=-1)


# ----------------------------------------------------------------------------
# SE(3) transforms: (pos[3], quat[4]) pairs
# ----------------------------------------------------------------------------


def transform_point(pos: jax.Array, quat: jax.Array, p: jax.Array) -> jax.Array:
  """Apply transform (pos, quat) to local point p -> world point."""
  return pos + quat_rotate(quat, p)


def transform_inv_point(pos: jax.Array, quat: jax.Array, p: jax.Array) -> jax.Array:
  """World point p -> local frame of transform (pos, quat)."""
  return quat_rotate_inv(quat, p - pos)


def transform_compose(pos_a, quat_a, pos_b, quat_b):
  """Compose A*B (apply B first in A's frame): returns (pos, quat)."""
  return transform_point(pos_a, quat_a, pos_b), quat_normalize(
      quat_mul(quat_a, quat_b))


# ----------------------------------------------------------------------------
# misc
# ----------------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
  """Skew-symmetric cross-product matrix of v."""
  x, y, z = v[..., 0], v[..., 1], v[..., 2]
  zero = jnp.zeros_like(x)
  m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
  return m.reshape(v.shape[:-1] + (3, 3))


def norm_safe(v: jax.Array, axis=-1, eps: float = 1e-12):
  """(norm, unit_vector) with zero-safe normalization."""
  n = jnp.linalg.norm(v, axis=axis, keepdims=True)
  return n.squeeze(axis), v / jnp.maximum(n, eps)
