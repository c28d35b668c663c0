"""Forward kinematics, body Jacobians and qpos integration.

TPU-first formulation: the kinematic tree is unrolled at trace time (static
topology), everything downstream is batched linear algebra.  The mass matrix
and bias forces (physics/dynamics.py) are built from the body Jacobians via
einsums instead of recursive CRBA/RNEA — O(nbody·nv) tensor contractions map
cleanly onto the MXU and vmap over thousands of envs.

Conventions:
  * quaternions wxyz, world-frame angular velocity for free joints
    (qvel[3:6] of a free joint is world-frame omega; integration is
    left-multiplied exponential).  This differs from MuJoCo's local-frame
    convention internally but is behaviorally equivalent; recorded data
    (SURVEY.md §2.6 schema) only contains scalar joint velocities.
  * hinge/slide joint displacement is (qpos - jnt_ref), matching MuJoCo's
    reference-configuration semantics (e.g. head_tilt ref=0.06,
    reference: assets/gym/robots/fetch-gym.xml:24).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as gm
from ..core.model import (FREE, HINGE, JOINT_DOF_DIM, JOINT_QPOS_DIM, Kin,
                          Model, SLIDE, State)


# ---------------------------------------------------------------------------
# forward kinematics
# ---------------------------------------------------------------------------


def fk(model: Model, state: State) -> Kin:
  """World poses of all bodies, geoms and sites for one env."""
  qpos = state.qpos
  xpos = [jnp.zeros(3)]
  xquat = [jnp.array([1.0, 0.0, 0.0, 0.0])]

  for b in range(1, model.nbody):
    mid = model.body_mocapid[b]
    if mid >= 0:
      xpos.append(state.mocap_pos[mid])
      xquat.append(gm.quat_normalize(state.mocap_quat[mid]))
      continue
    parent = model.body_parentid[b]
    pos = xpos[parent] + gm.quat_rotate(xquat[parent], model.body_pos[b])
    quat = gm.quat_mul(xquat[parent], model.body_quat[b])
    for j in model.body_jntadr[b]:
      jtype = model.jnt_type[j]
      adr = model.jnt_qposadr[j]
      if jtype == FREE:
        pos = qpos[adr:adr + 3]
        quat = gm.quat_normalize(qpos[adr + 3:adr + 7])
      elif jtype == SLIDE:
        disp = qpos[adr] - model.jnt_ref[j]
        pos = pos + gm.quat_rotate(quat, model.jnt_axis[j]) * disp
      elif jtype == HINGE:
        angle = qpos[adr] - model.jnt_ref[j]
        axis = model.jnt_axis[j]
        half = 0.5 * angle
        qj = jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)])
        # rotate about anchor jnt_pos (in pre-joint body-local frame)
        anchor_w = pos + gm.quat_rotate(quat, model.jnt_pos[j])
        quat = gm.quat_mul(quat, qj)
        pos = anchor_w - gm.quat_rotate(quat, model.jnt_pos[j])
      else:
        raise NotImplementedError('ball joints not used by GEECO scenes')
    xpos.append(pos)
    xquat.append(quat)

  xpos = jnp.stack(xpos)
  xquat = jnp.stack(xquat)
  ximat = gm.quat_to_mat(xquat)
  xipos = xpos + jax.vmap(gm.quat_rotate)(xquat, model.body_ipos)

  gb = np.asarray(model.geom_bodyid, np.int32)
  geom_xpos = xpos[gb] + jax.vmap(gm.quat_rotate)(xquat[gb], model.geom_pos)
  geom_xquat = jax.vmap(gm.quat_mul)(xquat[gb], model.geom_quat)
  if model.nsite:
    sb = np.asarray(model.site_bodyid, np.int32)
    site_xpos = xpos[sb] + jax.vmap(gm.quat_rotate)(xquat[sb], model.site_pos)
    site_xmat = gm.quat_to_mat(jax.vmap(gm.quat_mul)(xquat[sb],
                                                     model.site_quat))
  else:
    site_xpos = jnp.zeros((0, 3))
    site_xmat = jnp.zeros((0, 3, 3))

  return Kin(xpos=xpos, xquat=xquat, ximat=ximat, xipos=xipos,
             geom_xpos=geom_xpos, geom_xquat=geom_xquat,
             site_xpos=site_xpos, site_xmat=site_xmat)


# ---------------------------------------------------------------------------
# dof geometry + ancestor masks (static structure, dynamic values)
# ---------------------------------------------------------------------------


class DofInfo(NamedTuple):
  axis: jax.Array      # [nv, 3] world axis of each dof
  anchor: jax.Array    # [nv, 3] world anchor point (rotational dofs)
  is_rot: jax.Array    # [nv] 1.0 where dof contributes angular velocity
  is_trans: jax.Array  # [nv] 1.0 where dof contributes linear velocity


_FREE_AXES = np.eye(3, dtype=np.float32)


def ancestor_mask(model: Model) -> np.ndarray:
  """Static [nbody, nv] mask: dof d moves body b."""
  mask = np.zeros((model.nbody, model.nv), np.float32)
  for b in range(1, model.nbody):
    chain = []
    cur = b
    while cur != 0:
      chain.append(cur)
      cur = model.body_parentid[cur]
    for cb in chain:
      for j in model.body_jntadr[cb]:
        adr = model.jnt_dofadr[j]
        for k in range(JOINT_DOF_DIM[model.jnt_type[j]]):
          mask[b, adr + k] = 1.0
  return mask


def dof_info(model: Model, kin: Kin) -> DofInfo:
  """World-frame axis/anchor per dof (per env)."""
  axes, anchors, is_rot, is_trans = [], [], [], []
  for j in range(model.njnt):
    jtype = model.jnt_type[j]
    b = model.jnt_bodyid[j]
    if jtype == FREE:
      origin = kin.xpos[b]
      for k in range(3):  # translations, world axes
        axes.append(jnp.asarray(_FREE_AXES[k]))
        anchors.append(origin)
        is_rot.append(0.0)
        is_trans.append(1.0)
      for k in range(3):  # rotations, world axes about body origin
        axes.append(jnp.asarray(_FREE_AXES[k]))
        anchors.append(origin)
        is_rot.append(1.0)
        is_trans.append(0.0)
    else:
      axis_w = gm.quat_rotate(kin.xquat[b], model.jnt_axis[j])
      anchor_w = kin.xpos[b] + gm.quat_rotate(kin.xquat[b], model.jnt_pos[j])
      axes.append(axis_w)
      anchors.append(anchor_w)
      is_rot.append(1.0 if jtype == HINGE else 0.0)
      is_trans.append(1.0 if jtype == SLIDE else 0.0)
  return DofInfo(
      axis=jnp.stack(axes),
      anchor=jnp.stack(anchors),
      is_rot=jnp.asarray(is_rot),
      is_trans=jnp.asarray(is_trans),
  )


def point_jacobian(model: Model, kin: Kin, info: DofInfo,
                   point: jax.Array, bodyid: int,
                   anc_mask: np.ndarray) -> Tuple[jax.Array, jax.Array]:
  """6-dof Jacobian of a world point attached to body `bodyid`.

  Returns (jacp [nv, 3], jacr [nv, 3]): linear / angular velocity of the
  point per unit dof velocity.
  """
  mask = anc_mask[bodyid][:, None]  # [nv, 1] static 0/1
  r = point[None, :] - info.anchor  # [nv, 3]
  jacp = mask * (info.is_trans[:, None] * info.axis +
                 info.is_rot[:, None] * jnp.cross(info.axis, r))
  jacr = mask * info.is_rot[:, None] * info.axis
  return jacp, jacr


def com_jacobians(model: Model, kin: Kin, info: DofInfo,
                  anc_mask: np.ndarray) -> Tuple[jax.Array, jax.Array]:
  """Stacked COM Jacobians: (jacp [nbody, nv, 3], jacr [nbody, nv, 3])."""
  mask = jnp.asarray(anc_mask)[:, :, None]           # [nbody, nv, 1]
  r = kin.xipos[:, None, :] - info.anchor[None, :, :]  # [nbody, nv, 3]
  jacp = mask * (info.is_trans[None, :, None] * info.axis[None] +
                 info.is_rot[None, :, None] * jnp.cross(
                     jnp.broadcast_to(info.axis[None], r.shape), r))
  jacr = mask * info.is_rot[None, :, None] * jnp.broadcast_to(
      info.axis[None], r.shape)
  return jacp, jacr


# ---------------------------------------------------------------------------
# qpos tangent / integration
# ---------------------------------------------------------------------------


def qpos_tangent(model: Model, qpos: jax.Array, qvel: jax.Array) -> jax.Array:
  """d(qpos)/dt as a tangent vector aligned with qpos layout."""
  parts = []
  for j in range(model.njnt):
    jtype = model.jnt_type[j]
    qadr, dadr = model.jnt_qposadr[j], model.jnt_dofadr[j]
    if jtype == FREE:
      v = qvel[dadr:dadr + 3]
      omega = qvel[dadr + 3:dadr + 6]
      quat = qpos[qadr + 3:qadr + 7]
      parts.append(v)
      parts.append(gm.quat_tangent(quat, omega))
    else:
      parts.append(qvel[dadr:dadr + 1])
  return jnp.concatenate(parts)


def integrate_qpos(model: Model, qpos: jax.Array, qvel: jax.Array,
                   dt) -> jax.Array:
  """Semi-implicit position update (quaternion-exact for free joints)."""
  parts = []
  for j in range(model.njnt):
    jtype = model.jnt_type[j]
    qadr, dadr = model.jnt_qposadr[j], model.jnt_dofadr[j]
    if jtype == FREE:
      pos = qpos[qadr:qadr + 3] + dt * qvel[dadr:dadr + 3]
      quat = gm.quat_integrate(qpos[qadr + 3:qadr + 7],
                               qvel[dadr + 3:dadr + 6], dt)
      parts.append(pos)
      parts.append(quat)
    else:
      parts.append(qpos[qadr:qadr + 1] + dt * qvel[dadr:dadr + 1])
  return jnp.concatenate(parts)
