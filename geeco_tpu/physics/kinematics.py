"""Forward kinematics, body Jacobians and qpos integration.

TPU-first formulation: the kinematic tree is fully VECTORIZED over joints
and bodies — per-joint local transforms in parallel, per-body composition
over (padded) joint slots, then a levelized sweep down the tree (one batched
gather/compose per depth level, ~13 for the Fetch scenes).  Everything
downstream is batched linear algebra: the mass matrix and bias forces
(physics/dynamics.py) are built from body Jacobians via einsums instead of
recursive CRBA/RNEA — O(nbody·nv) tensor contractions map cleanly onto the
MXU and vmap over thousands of envs.

This replaces a per-body Python unroll that traced to ~6.5k scalar
primitives per FK call (~27k per substep with the jvp bias pass): XLA
compile time was minutes per scene and the runtime was dispatch-latency
bound.  The vectorized form is ~20x fewer, wider ops.

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

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as gm
from ..core.model import (FREE, HINGE, JOINT_DOF_DIM, JOINT_QPOS_DIM, Kin,
                          Model, SLIDE, State)


# ---------------------------------------------------------------------------
# static kinematic structure (host-side, cached per scene topology)
# ---------------------------------------------------------------------------


class KinStatic(NamedTuple):
  """Precomputed index arrays for the vectorized sweeps (all numpy)."""
  # scalar (slide/hinge) joints
  sj: np.ndarray          # [ns] joint ids of scalar joints
  sj_qadr: np.ndarray     # [ns] qpos address
  sj_dadr: np.ndarray     # [ns] dof address
  sj_hinge: np.ndarray    # [ns] 1.0 where hinge (else slide)
  # free joints
  fj: np.ndarray          # [nf] joint ids
  fj_body: np.ndarray     # [nf] body ids
  fj_qadr: np.ndarray     # [nf]
  fj_dadr: np.ndarray     # [nf]
  # per-body composition
  body_jslot: np.ndarray  # [nbody, JMAX] joint id per slot, -1 = none
  body_free: np.ndarray   # [nbody] free joint id or -1
  body_mocap: np.ndarray  # [nbody] mocap id or -1
  parent: np.ndarray      # [nbody]
  levels: Tuple[np.ndarray, ...]  # body ids grouped by tree depth >= 2
  # ancestor chains for the one-shot pose composition: body ids root-first,
  # front-padded with 0 (world = identity transform) to a power-of-two
  # length so the compose is a fixed log2(D) binary tree
  anc: np.ndarray         # [nbody, Dp]
  # full-joint parallel transform helpers
  jnt_qadr: np.ndarray    # [njnt] qpos start address
  jnt_hinge: np.ndarray   # [njnt] 1.0 where hinge
  jnt_scalar: np.ndarray  # [njnt] 1.0 where slide/hinge
  body_free_inv: np.ndarray  # [nbody] index into fj (0 where none)
  # per-dof structure
  dof_body: np.ndarray    # [nv] body id owning each dof
  dof_jnt: np.ndarray     # [nv] joint id
  dof_free: np.ndarray    # [nv] 1.0 for free-joint dofs
  dof_free_axis: np.ndarray  # [nv, 3] world axis for free dofs (eye rows)
  is_rot: np.ndarray      # [nv]
  is_trans: np.ndarray    # [nv]


@functools.lru_cache(maxsize=32)
def _kin_static(parentid, mocapid, jntadr, jnt_type, jnt_qposadr,
                jnt_dofadr, jnt_bodyid) -> KinStatic:
  nbody = len(parentid)
  njnt = len(jnt_type)
  sj, fj = [], []
  for j in range(njnt):
    if jnt_type[j] == FREE:
      fj.append(j)
    elif jnt_type[j] in (SLIDE, HINGE):
      sj.append(j)
    else:
      raise NotImplementedError('ball joints not used by GEECO scenes')
  sj = np.asarray(sj, np.int32)
  fj = np.asarray(fj, np.int32)

  jmax = max((len(a) for a in jntadr), default=0)
  jmax = max(jmax, 1)
  body_jslot = np.full((nbody, jmax), -1, np.int32)
  body_free = np.full(nbody, -1, np.int32)
  for b in range(nbody):
    slots = [j for j in jntadr[b] if jnt_type[j] != FREE]
    body_jslot[b, :len(slots)] = slots
    for j in jntadr[b]:
      if jnt_type[j] == FREE:
        assert parentid[b] == 0, 'free bodies must be children of world'
        assert len(jntadr[b]) == 1, 'free joint must be the only joint'
        body_free[b] = j
  for b in range(nbody):
    if mocapid[b] >= 0:
      assert parentid[b] == 0, 'mocap bodies must be children of world'

  depth = np.zeros(nbody, np.int32)
  for b in range(1, nbody):
    depth[b] = depth[parentid[b]] + 1
  levels = tuple(
      np.asarray([b for b in range(1, nbody) if depth[b] == d], np.int32)
      for d in range(2, int(depth.max()) + 1) if (depth == d).any())

  nv = sum(JOINT_DOF_DIM[t] for t in jnt_type)
  dof_body = np.zeros(nv, np.int32)
  dof_jnt = np.zeros(nv, np.int32)
  dof_free = np.zeros(nv, np.float32)
  dof_free_axis = np.zeros((nv, 3), np.float32)
  is_rot = np.zeros(nv, np.float32)
  is_trans = np.zeros(nv, np.float32)
  for j in range(njnt):
    d0 = jnt_dofadr[j]
    b = jnt_bodyid[j]
    if jnt_type[j] == FREE:
      for k in range(3):
        dof_body[d0 + k] = b
        dof_jnt[d0 + k] = j
        dof_free[d0 + k] = 1.0
        dof_free_axis[d0 + k, k] = 1.0
        is_trans[d0 + k] = 1.0
      for k in range(3):
        dof_body[d0 + 3 + k] = b
        dof_jnt[d0 + 3 + k] = j
        dof_free[d0 + 3 + k] = 1.0
        dof_free_axis[d0 + 3 + k, k] = 1.0
        is_rot[d0 + 3 + k] = 1.0
    else:
      dof_body[d0] = b
      dof_jnt[d0] = j
      is_rot[d0] = 1.0 if jnt_type[j] == HINGE else 0.0
      is_trans[d0] = 1.0 if jnt_type[j] == SLIDE else 0.0

  dmax = max(1, int(depth.max()))
  dp = 1
  while dp < dmax:
    dp *= 2
  anc = np.zeros((nbody, dp), np.int32)
  for b in range(nbody):
    chain = []
    p = b
    while p:
      chain.append(p)
      p = parentid[p]
    chain.reverse()
    anc[b, dp - len(chain):] = chain

  body_free_inv = np.zeros(nbody, np.int32)
  for i, j in enumerate(fj):
    body_free_inv[jnt_bodyid[j]] = i

  return KinStatic(
      sj=sj,
      sj_qadr=np.asarray([jnt_qposadr[j] for j in sj], np.int32),
      sj_dadr=np.asarray([jnt_dofadr[j] for j in sj], np.int32),
      sj_hinge=np.asarray([1.0 if jnt_type[j] == HINGE else 0.0
                           for j in sj], np.float32),
      fj=fj,
      fj_body=np.asarray([jnt_bodyid[j] for j in fj], np.int32),
      fj_qadr=np.asarray([jnt_qposadr[j] for j in fj], np.int32),
      fj_dadr=np.asarray([jnt_dofadr[j] for j in fj], np.int32),
      body_jslot=body_jslot,
      body_free=body_free,
      body_mocap=np.asarray(mocapid, np.int32),
      anc=anc,
      jnt_qadr=np.asarray(jnt_qposadr, np.int32),
      jnt_hinge=np.asarray([1.0 if t == HINGE else 0.0 for t in jnt_type],
                           np.float32),
      jnt_scalar=np.asarray([1.0 if t in (SLIDE, HINGE) else 0.0
                             for t in jnt_type], np.float32),
      body_free_inv=body_free_inv,
      parent=np.asarray(parentid, np.int32),
      levels=levels,
      dof_body=dof_body,
      dof_jnt=dof_jnt,
      dof_free=dof_free,
      dof_free_axis=dof_free_axis,
      is_rot=is_rot,
      is_trans=is_trans,
  )


def kin_static(model: Model) -> KinStatic:
  return _kin_static(model.body_parentid, model.body_mocapid,
                     model.body_jntadr, model.jnt_type, model.jnt_qposadr,
                     model.jnt_dofadr, model.jnt_bodyid)


# the core quaternion helpers broadcast over leading axes natively
_vquat_mul = gm.quat_mul
_vquat_rot = gm.quat_rotate


# ---------------------------------------------------------------------------
# forward kinematics
# ---------------------------------------------------------------------------


def fk(model: Model, state: State) -> Kin:
  """World poses of all bodies, geoms and sites for one env (vectorized).

  Gather/scatter-free formulation: local transforms for ALL joints in one
  masked pass, free/mocap overrides as full-width selects, then every
  body's world pose composed along its (front-identity-padded) ancestor
  chain with a log2(D) pairwise transform reduce.  A substep is dispatch-
  latency bound on TPU, not flops — the O(nbody*D) redundant compose work
  is free, while the per-level gather/scatter sweep it replaces was ~60%
  of the substep's unfusable ops.
  """
  ks = kin_static(model)
  qpos = state.qpos
  nbody = model.nbody

  # --- per-joint local transforms, all joints in one masked pass --------
  # hinge: rotate by angle about jnt_axis anchored at jnt_pos
  #   T_j = (jnt_pos - R(q_j)·jnt_pos, q_j)
  # slide: T_j = (jnt_axis·disp, identity); free joints -> identity (their
  # world pose is read straight from qpos below)
  ident = jnp.array([1.0, 0, 0, 0])
  disp = (qpos[ks.jnt_qadr] - model.jnt_ref) * ks.jnt_scalar  # [njnt]
  axis = jnp.asarray(model.jnt_axis)                          # [njnt, 3]
  half = 0.5 * disp * ks.jnt_hinge
  qj = jnp.concatenate([jnp.cos(half)[:, None],
                        axis * jnp.sin(half)[:, None]], -1)
  anchor = jnp.asarray(model.jnt_pos)
  t_hinge = anchor - _vquat_rot(qj, anchor)
  t_slide = axis * disp[:, None]
  hinge = ks.jnt_hinge[:, None] > 0
  scal = ks.jnt_scalar[:, None] > 0
  jt = jnp.where(scal, jnp.where(hinge, t_hinge, t_slide), 0.0)
  jq = jnp.where(scal & hinge, qj, ident)

  # --- per-body local transform: (body_pos, body_quat) ∘ joint slots ----
  lp, lq = jnp.asarray(model.body_pos), jnp.asarray(model.body_quat)
  for s in range(ks.body_jslot.shape[1]):
    slot = ks.body_jslot[:, s]                               # [nbody]
    live = (slot >= 0)[:, None]
    idx = np.maximum(slot, 0)
    tq = jnp.where(live, jq[idx], ident)
    tt = jnp.where(live, jt[idx], 0.0)
    lp = lp + _vquat_rot(lq, tt)
    lq = _vquat_mul(lq, tq)

  # --- free bodies: world pose straight from qpos (parent is world) -----
  if len(ks.fj):
    fq = qpos[ks.fj_qadr[:, None] + np.arange(7)[None]]       # [nf, 7]
    fb = fq[ks.body_free_inv]                                 # [nbody, 7]
    free = (ks.body_free >= 0)[:, None]
    lp = jnp.where(free, fb[:, :3], lp)
    lq = jnp.where(free, gm.quat_normalize(fb[:, 3:7]), lq)

  # --- mocap bodies: pose from State (parent is world) ------------------
  if (ks.body_mocap >= 0).any():
    mids = np.maximum(ks.body_mocap, 0)
    moc = (ks.body_mocap >= 0)[:, None]
    lp = jnp.where(moc, state.mocap_pos[mids], lp)
    lq = jnp.where(moc, gm.quat_normalize(state.mocap_quat[mids]), lq)

  # --- world row = identity, then ancestor-chain composition ------------
  world = (np.arange(nbody) == 0)[:, None]
  lp = jnp.where(world, 0.0, lp)
  lq = jnp.where(world, ident, lq)
  cp = lp[ks.anc]                                            # [nbody, Dp, 3]
  cq = lq[ks.anc]                                            # [nbody, Dp, 4]
  while cp.shape[1] > 1:
    p1, q1 = cp[:, 0::2], cq[:, 0::2]                        # root side
    p2, q2 = cp[:, 1::2], cq[:, 1::2]
    cp = p1 + _vquat_rot(q1, p2)
    cq = _vquat_mul(q1, q2)
  xpos, xquat = cp[:, 0], cq[:, 0]

  ximat = gm.quat_to_mat(xquat)
  xipos = xpos + _vquat_rot(xquat, model.body_ipos)

  gb = np.asarray(model.geom_bodyid, np.int32)
  geom_xpos = xpos[gb] + _vquat_rot(xquat[gb], model.geom_pos)
  geom_xquat = _vquat_mul(xquat[gb], model.geom_quat)
  if model.nsite:
    sb = np.asarray(model.site_bodyid, np.int32)
    site_xpos = xpos[sb] + _vquat_rot(xquat[sb], model.site_pos)
    site_xmat = gm.quat_to_mat(_vquat_mul(xquat[sb], model.site_quat))
  else:
    site_xpos = jnp.zeros((0, 3))
    site_xmat = jnp.zeros((0, 3, 3))

  return Kin(xpos=xpos, xquat=xquat, ximat=ximat, xipos=xipos,
             geom_xpos=geom_xpos, geom_xquat=geom_xquat,
             site_xpos=site_xpos, site_xmat=site_xmat)


def fk_reference(model: Model, state: State) -> Kin:
  """Original per-body loop FK (kept as the test oracle for fk())."""
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
  """World-frame axis/anchor per dof (per env), vectorized over dofs.

  Scalar joints: axis = R(xquat[b])·jnt_axis, anchor = body origin +
  R(xquat[b])·jnt_pos.  Free joints: world axes (eye rows), anchor = body
  origin (jnt_pos treated as 0, matching the reference loop).
  """
  ks = kin_static(model)
  b = ks.dof_body
  q = kin.xquat[b]                                           # [nv, 4]
  local_axis = model.jnt_axis[ks.dof_jnt]                    # [nv, 3]
  local_anchor = jnp.where(ks.dof_free[:, None] > 0, 0.0,
                           model.jnt_pos[ks.dof_jnt])
  axis = jnp.where(ks.dof_free[:, None] > 0,
                   jnp.asarray(ks.dof_free_axis),
                   _vquat_rot(q, local_axis))
  anchor = kin.xpos[b] + _vquat_rot(q, local_anchor)
  return DofInfo(axis=axis, anchor=anchor,
                 is_rot=jnp.asarray(ks.is_rot),
                 is_trans=jnp.asarray(ks.is_trans))


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
# qpos tangent / integration (vectorized over joints)
# ---------------------------------------------------------------------------


def qpos_tangent(model: Model, qpos: jax.Array, qvel: jax.Array) -> jax.Array:
  """d(qpos)/dt as a tangent vector aligned with qpos layout."""
  ks = kin_static(model)
  tang = jnp.zeros(model.nq)
  if len(ks.sj):
    tang = tang.at[ks.sj_qadr].set(qvel[ks.sj_dadr])
  if len(ks.fj):
    pos_idx = ks.fj_qadr[:, None] + np.arange(3)[None]
    quat_idx = ks.fj_qadr[:, None] + np.arange(3, 7)[None]
    v = qvel[ks.fj_dadr[:, None] + np.arange(3)[None]]
    omega = qvel[ks.fj_dadr[:, None] + np.arange(3, 6)[None]]
    quat = qpos[quat_idx]
    tang = tang.at[pos_idx].set(v)
    tang = tang.at[quat_idx].set(jax.vmap(gm.quat_tangent)(quat, omega))
  return tang


def integrate_qpos(model: Model, qpos: jax.Array, qvel: jax.Array,
                   dt) -> jax.Array:
  """Semi-implicit position update (quaternion-exact for free joints)."""
  ks = kin_static(model)
  out = qpos
  if len(ks.sj):
    out = out.at[ks.sj_qadr].add(dt * qvel[ks.sj_dadr])
  if len(ks.fj):
    pos_idx = ks.fj_qadr[:, None] + np.arange(3)[None]
    quat_idx = ks.fj_qadr[:, None] + np.arange(3, 7)[None]
    v = qvel[ks.fj_dadr[:, None] + np.arange(3)[None]]
    omega = qvel[ks.fj_dadr[:, None] + np.arange(3, 6)[None]]
    quat = jax.vmap(gm.quat_integrate, in_axes=(0, 0, None))(
        qpos[quat_idx], omega, dt)
    out = out.at[pos_idx].add(dt * v)
    out = out.at[quat_idx].set(quat)
  return out
