"""Constraint assembly + projected-gradient contact solver.

MuJoCo-compatible soft-constraint model (solref/solimp impedance, reference
accelerations, R-regularization) solved in the dual (force) space with a
diagonally-preconditioned projected gradient method — fully parallel across
constraint rows, unlike sequential PGS, so it vmaps cleanly over thousands
of envs and maps to the VPU/MXU.  Friction cones are elliptic (the scenes
set cone="elliptic", reference: assets/gym/envs/geeco-pad2-cube2.xml:4):
projection clamps tangential force to the mu*fn disk.

Row layout (static per model):
  [ncon * 4]  contact rows: (normal, tangent1, tangent2, torsional)
  [nlim * 2]  joint-limit rows (lower, upper)
  [neq * 6]   weld rows (3 translation + 3 rotation)

condim semantics: condim 3 pairs mask the torsional row; condim >= 4 uses
friction[1] as torsional coefficient (gripper fingers are condim 4,
reference: assets/gym/robots/fetch-gym.xml:89).  Rolling rows (condim 6,
friction[2] coefficient) are supported and auto-gated: they are emitted
when any condim-6 pair has a rolling coefficient above 1e-3 (the GEECO
scenes keep MuJoCo's 1e-4 default, where the clamped rolling force is
dynamically negligible but would cost 50% more solver rows — skipping the
rows there is a measured-equivalence optimization, not a capability gap;
see tests/test_physics_contact.py::test_rolling_friction_stops_ball).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as gm
from ..core.model import FREE, Model, State
from . import collision as C
from . import dynamics as D
from . import kinematics as K


class ConstraintStatic(NamedTuple):
  """Static (trace-time) constraint layout for a model."""
  ncon: int
  nlim: int
  neq: int
  ne: int
  con_body1: np.ndarray     # [ncon]
  con_body2: np.ndarray     # [ncon]
  con_friction: np.ndarray  # [ncon, 3]
  con_solref: np.ndarray    # [ncon, 2]
  con_solimp: np.ndarray    # [ncon, 3]
  con_condim: np.ndarray    # [ncon]
  lim_dof: np.ndarray       # [nlim]
  lim_qadr: np.ndarray      # [nlim]
  lim_range: np.ndarray     # [nlim, 2]
  lim_solref: np.ndarray    # [nlim, 2]
  lim_solimp: np.ndarray    # [nlim, 3]
  invweight: np.ndarray     # [ne] reference-pose inverse weight per row
  ncon_sel: int             # active-set size (top-K contacts solved)
  ngrp: int                 # contact row groups: 4, or 6 with rolling rows
  # quota selection: static tuple of (candidate-index array, k) per group,
  # or None for plain global top-K.  Groups partition the candidate rows by
  # the free body they constrain (robot/static rows in their own group), so
  # active-set COMPOSITION for a resting body cannot be perturbed by
  # depth-rank churn on robot rows — the root cause of mesh-scene rest
  # creep (STATUS.md "hull rest creep").
  quota_sel: Optional[Tuple[Tuple[np.ndarray, int], ...]] = None


def _body_invweights(model: Model, anc_mask: np.ndarray) -> np.ndarray:
  """Reference-pose inverse weights [nbody, 2] (translation, rotation).

  Like MuJoCo's body_invweight0: mean diagonal of J M(q0)^-1 J^T at the COM,
  computed once at compile.  Used to regularize constraints independently of
  the instantaneous Jacobian — near kinematic singularities the true diagA
  collapses (e.g. EE x-motion of the fully-stretched Fetch arm goes only
  through the 1e11-damped world slides) and regularizing with it produces
  unbounded constraint forces.
  """
  from ..core.model import State, make_state
  state0 = make_state(model)
  kin = K.fk(model, state0)
  info = K.dof_info(model, kin)
  jacp, jacr = K.com_jacobians(model, kin, info, anc_mask)
  M = D.mass_matrix(model, kin, jacp, jacr)
  Minv = np.linalg.inv(np.asarray(M, np.float64))
  jp = np.asarray(jacp, np.float64)  # [nbody, nv, 3]
  jr = np.asarray(jacr, np.float64)
  A_t = np.einsum('bvi,vw,bwi->b', jp, Minv, jp) / 3.0
  A_r = np.einsum('bvi,vw,bwi->b', jr, Minv, jr) / 3.0
  out = np.stack([A_t, A_r], -1).astype(np.float32)
  return out


def _dof_invweights(model: Model, anc_mask: np.ndarray) -> np.ndarray:
  from ..core.model import make_state
  state0 = make_state(model)
  kin = K.fk(model, state0)
  info = K.dof_info(model, kin)
  jacp, jacr = K.com_jacobians(model, kin, info, anc_mask)
  M = D.mass_matrix(model, kin, jacp, jacr)
  Minv = np.linalg.inv(np.asarray(M, np.float64))
  return np.diag(Minv).astype(np.float32)


def _quota_groups(model: Model, b1: np.ndarray, b2: np.ndarray,
                  quota_obj: int, quota_mesh: int, quota_robot: int
                  ) -> Tuple[Tuple[np.ndarray, int], ...]:
  """Partition candidate contact rows into per-free-body quota groups.

  Row -> group: the free body it constrains (rows between two free bodies
  go to the lower body id); rows touching no free body (robot/table/walls)
  form the 'robot' group.  Bodies with mesh-hull geoms get the larger
  ``quota_mesh`` budget (hull face manifolds produce more simultaneous
  rows than a box's 4-point manifold).
  """
  from ..core.model import FREE, MESH
  free = {int(model.jnt_bodyid[j]) for j in range(model.njnt)
          if model.jnt_type[j] == FREE}
  g_body = np.asarray(model.geom_bodyid)
  g_type = np.asarray(model.geom_type)
  has_mesh = {b: bool(np.any((g_body == b) & (g_type == MESH)))
              for b in free}
  groups: dict = {b: [] for b in sorted(free)}
  groups['robot'] = []
  for i in range(len(b1)):
    f1 = int(b1[i]) in free
    f2 = int(b2[i]) in free
    if f1 and f2:
      groups[min(int(b1[i]), int(b2[i]))].append(i)
    elif f1:
      groups[int(b1[i])].append(i)
    elif f2:
      groups[int(b2[i])].append(i)
    else:
      groups['robot'].append(i)
  out = []
  for key, rows in groups.items():
    if not rows:
      continue
    if key == 'robot':
      k = min(len(rows), quota_robot)
    else:
      k = min(len(rows), quota_mesh if has_mesh[key] else quota_obj)
    out.append((np.asarray(rows, np.int32), k))
  return tuple(out)


def constraint_static(model: Model, anc_mask: np.ndarray,
                      select_k: int = 128,
                      rolling: str | bool = 'auto',
                      select_mode: str = 'topk',
                      quota_obj: int = 24, quota_mesh: int = 48,
                      quota_robot: int = 32) -> ConstraintStatic:
  b1, b2, fric, solref, solimp, condim = C.contact_params(model)
  ncon = len(b1)
  quota_sel = None
  if select_mode == 'quota' and ncon:
    quota_sel = _quota_groups(model, b1, b2, quota_obj, quota_mesh,
                              quota_robot)
    select_k = sum(k for _, k in quota_sel)
  elif select_mode not in ('topk', 'quota'):
    raise ValueError(f'unknown select_mode {select_mode!r}')
  ncon_sel = min(ncon, select_k) if select_k else ncon
  if rolling == 'auto':
    # emit rolling rows only where they are dynamically meaningful (see
    # module docstring); MuJoCo's default coefficient is 1e-4
    rolling = bool(ncon) and bool(
        np.any((condim >= 6) & (fric[:, 2] > 1e-3)))
  ngrp = 6 if rolling else 4
  lim_dof, lim_qadr, lim_range, lim_solref, lim_solimp = [], [], [], [], []
  for j in range(model.njnt):
    if model.jnt_limited[j]:
      lim_dof.append(model.jnt_dofadr[j])
      lim_qadr.append(model.jnt_qposadr[j])
      lim_range.append(np.asarray(model.jnt_range[j]))
      lim_solref.append(np.asarray(model.jnt_solref[j]))
      lim_solimp.append(np.asarray(model.jnt_solimp[j]))
  nlim = len(lim_dof)
  ne = ncon * ngrp + nlim * 2 + model.neq * 6

  binvw = _body_invweights(model, anc_mask)
  dinvw = _dof_invweights(model, anc_mask)
  con_w_t = binvw[b1, 0] + binvw[b2, 0] if ncon else np.zeros(0)
  con_w_r = binvw[b1, 1] + binvw[b2, 1] if ncon else np.zeros(0)
  lim_w = dinvw[np.asarray(lim_dof, np.int32)] if nlim else np.zeros(0)
  eq_w = []
  for e in range(model.neq):
    w1 = binvw[model.eq_body1[e]]
    w2 = binvw[model.eq_body2[e]]
    eq_w.extend([w1[0] + w2[0]] * 3)
    eq_w.extend([w1[1] + w2[1]] * 3)
  con_w = [con_w_t, con_w_t, con_w_t, con_w_r]  # n, t1, t2, torsion
  if ngrp == 6:
    con_w += [con_w_r, con_w_r]                 # roll1, roll2
  invweight = np.concatenate(con_w + [
      np.repeat(lim_w, 1), np.repeat(lim_w, 1),
      np.asarray(eq_w, np.float32),
  ]).astype(np.float32) if ne else np.zeros(0, np.float32)
  invweight = np.maximum(invweight, 1e-8)

  return ConstraintStatic(
      ncon=ncon, nlim=nlim, neq=model.neq, ne=ne,
      con_body1=b1, con_body2=b2, con_friction=fric, con_solref=solref,
      con_solimp=solimp, con_condim=condim,
      lim_dof=np.asarray(lim_dof, np.int32),
      lim_qadr=np.asarray(lim_qadr, np.int32),
      lim_range=np.asarray(lim_range, np.float32).reshape(nlim, 2),
      lim_solref=np.asarray(lim_solref, np.float32).reshape(nlim, 2),
      lim_solimp=np.asarray(lim_solimp, np.float32).reshape(nlim, 3),
      invweight=invweight,
      ncon_sel=ncon_sel,
      ngrp=ngrp,
      quota_sel=quota_sel,
  )


class Constraints(NamedTuple):
  J: jax.Array       # [ne_sel, nv]
  aref: jax.Array    # [ne_sel]
  d_imp: jax.Array   # [ne_sel] impedance in (0, 1)
  active: jax.Array  # [ne_sel] bool — clamped rows only meaningful if active
  invweight: jax.Array  # [ne_sel] reference-pose inverse weight per row
  mu_t: jax.Array    # [K] tangential friction per selected contact
  mu_tor: jax.Array  # [K] torsional friction per selected contact
  mu_roll: jax.Array  # [K] rolling friction (used when ngrp == 6)
  sel_idx: jax.Array  # [K] selected contact indices into the full set


def impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
  """MuJoCo impedance sigmoid d(|pos|) with power=2, midpoint=0.5."""
  dmin, dmax, width = solimp[..., 0], solimp[..., 1], solimp[..., 2]
  x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-9), 0.0, 1.0)
  y = jnp.where(x < 0.5, 2.0 * x * x, 1.0 - 2.0 * (1.0 - x) * (1.0 - x))
  return jnp.clip(dmin + y * (dmax - dmin), 1e-4, 1.0 - 1e-6)


def _kb(solref: jax.Array, d: jax.Array, dmax: jax.Array):
  tc, dr = jnp.maximum(solref[..., 0], 1e-6), jnp.maximum(
      solref[..., 1], 1e-6)
  b = 2.0 / (dmax * tc)
  k = d / (dmax * dmax * tc * tc * dr * dr)
  return k, b


def _tangent_frame(n: jax.Array) -> Tuple[jax.Array, jax.Array]:
  """Two unit tangents orthogonal to n (branch-free)."""
  ref = jnp.where(jnp.abs(n[..., 2:3]) < 0.9,
                  jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
                  jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape))
  t1 = jnp.cross(ref, n)
  t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
  t2 = jnp.cross(n, t1)
  return t1, t2


def make_constraints(model: Model, cs: ConstraintStatic, smooth: D.Smooth,
                     contacts: C.Contacts, state: State,
                     anc_mask: np.ndarray,
                     hysteresis: float = 0.0) -> Constraints:
  info = smooth.info
  nv = model.nv
  J_rows, aref_rows, d_rows, active_rows, invw_rows = [], [], [], [], []
  mu_t = jnp.zeros(0)
  mu_tor = jnp.zeros(0)
  mu_roll = jnp.zeros(0)
  sel_idx = jnp.zeros(0, jnp.int32)

  # ---------------- contacts (top-K active selection) ----------------
  # Most of the statically-enumerated candidate points are inactive at any
  # instant; the solver's memory traffic scales with rows, so we gather the
  # K deepest candidates and solve only those (TPU-native active set).
  if cs.ncon:
    K = cs.ncon_sel
    score = contacts.dist
    if hysteresis > 0.0 and state.efc_force is not None:
      # Set-membership hysteresis: contacts that carried normal force last
      # substep get a depth bonus so active-set COMPOSITION is sticky.  The
      # depth ranking alone lets robot-row depth churn evict/readmit rest
      # contacts every substep; with the solver's global line search this
      # couples into micro-impulses that make resting bodies creep (see
      # STATUS.md "hull rest creep").  Full-layout group 0 = normal rows.
      warm_n = jax.lax.stop_gradient(state.efc_force[:cs.ncon])
      score = score - hysteresis * (warm_n > 0.0).astype(score.dtype)
    if cs.quota_sel is not None:
      # per-free-body quota selection: top-k within each static group so
      # one body's active rows can't evict another's (see quota_sel doc)
      parts = []
      for idx, k in cs.quota_sel:
        _, top = jax.lax.top_k(-score[jnp.asarray(idx)], k)
        parts.append(jnp.asarray(idx)[top])
      sel_idx = jnp.concatenate(parts)
    else:
      _, sel_idx = jax.lax.top_k(-score, K)
    pts = contacts.pos[sel_idx]
    n = contacts.normal[sel_idx]
    dist = contacts.dist[sel_idx]
    body1 = jnp.asarray(cs.con_body1)[sel_idx]
    body2 = jnp.asarray(cs.con_body2)[sel_idx]
    friction = jnp.asarray(cs.con_friction)[sel_idx]
    solimp = jnp.asarray(cs.con_solimp)[sel_idx]
    solref = jnp.asarray(cs.con_solref)[sel_idx]
    tor_on = jnp.asarray((cs.con_condim >= 4).astype(np.float32))[sel_idx]
    roll_on = jnp.asarray((cs.con_condim >= 6).astype(np.float32))[sel_idx]
    inv_t = jnp.asarray(cs.invweight[:cs.ncon])[sel_idx]
    inv_r = jnp.asarray(cs.invweight[3 * cs.ncon:4 * cs.ncon])[sel_idx]
    mu_t = friction[:, 0]
    mu_tor = friction[:, 1]
    mu_roll = friction[:, 2]

    anc = jnp.asarray(anc_mask)
    mask1 = anc[body1]  # [K, nv]
    mask2 = anc[body2]
    r = pts[:, None, :] - info.anchor[None, :, :]  # [K, nv, 3]
    axis = jnp.broadcast_to(info.axis[None], r.shape)
    jp = (info.is_trans[None, :, None] * axis +
          info.is_rot[None, :, None] * jnp.cross(axis, r))
    Jp_rel = (mask2 - mask1)[:, :, None] * jp                # [K, nv, 3]
    Jr_rel = ((mask2 - mask1)[:, :, None] *
              info.is_rot[None, :, None] * axis)             # [K, nv, 3]

    t1, t2 = _tangent_frame(n)
    J_n = jnp.einsum('cvi,ci->cv', Jp_rel, n)
    J_t1 = jnp.einsum('cvi,ci->cv', Jp_rel, t1)
    J_t2 = jnp.einsum('cvi,ci->cv', Jp_rel, t2)
    J_tor = jnp.einsum('cvi,ci->cv', Jr_rel, n) * tor_on[:, None]

    d_con = impedance(solimp, dist)                           # [K]
    k, b = _kb(solref, d_con, solimp[:, 1])

    qvel = state.qvel
    aref_n = -b * (J_n @ qvel) - k * jnp.minimum(dist, 0.0)
    aref_t1 = -b * (J_t1 @ qvel)
    aref_t2 = -b * (J_t2 @ qvel)
    aref_tor = -b * (J_tor @ qvel)

    act = dist < 0.0
    groups = [(J_n, aref_n, inv_t), (J_t1, aref_t1, inv_t),
              (J_t2, aref_t2, inv_t), (J_tor, aref_tor, inv_r)]
    if cs.ngrp == 6:  # rolling rows around the two tangents (condim 6)
      J_r1 = jnp.einsum('cvi,ci->cv', Jr_rel, t1) * roll_on[:, None]
      J_r2 = jnp.einsum('cvi,ci->cv', Jr_rel, t2) * roll_on[:, None]
      groups += [(J_r1, -b * (J_r1 @ qvel), inv_r),
                 (J_r2, -b * (J_r2 @ qvel), inv_r)]
    for Jr, ar, iw in groups:
      J_rows.append(Jr)
      aref_rows.append(ar)
      d_rows.append(d_con)
      active_rows.append(act)
      invw_rows.append(iw)

  # ---------------- joint limits ----------------
  if cs.nlim:
    qp = state.qpos[jnp.asarray(cs.lim_qadr)]
    lo = jnp.asarray(cs.lim_range[:, 0])
    hi = jnp.asarray(cs.lim_range[:, 1])
    e = jnp.zeros((cs.nlim, nv))
    e = e.at[jnp.arange(cs.nlim), jnp.asarray(cs.lim_dof)].set(1.0)
    solimp = jnp.asarray(cs.lim_solimp)
    solref = jnp.asarray(cs.lim_solref)
    lim_invw = jnp.asarray(
        cs.invweight[cs.ngrp * cs.ncon:cs.ngrp * cs.ncon + cs.nlim])
    for pos, Jr in (((qp - lo), e), ((hi - qp), -e)):
      d_l = impedance(solimp, jnp.minimum(pos, 0.0))
      k, b = _kb(solref, d_l, solimp[:, 1])
      vel = Jr @ state.qvel
      aref = -b * vel - k * jnp.minimum(pos, 0.0)
      J_rows.append(Jr)
      aref_rows.append(aref)
      d_rows.append(d_l)
      active_rows.append(pos < 0.0)
      invw_rows.append(lim_invw)

  # ---------------- weld equalities ----------------
  for e_i in range(model.neq):
    b1 = model.eq_body1[e_i]
    b2 = model.eq_body2[e_i]
    kin = smooth.kin
    perr = kin.xpos[b2] - kin.xpos[b1]
    rerr = gm.quat_sub(kin.xquat[b2], kin.xquat[b1])
    pos6 = jnp.concatenate([perr, rerr])

    point = kin.xpos[b2]
    m1 = anc_mask[b1]
    m2 = anc_mask[b2]
    rr = point[None, :] - info.anchor
    jp = (info.is_trans[:, None] * info.axis +
          info.is_rot[:, None] * jnp.cross(info.axis, rr))
    Jp_rel = (jnp.asarray(m2 - m1))[:, None] * jp      # [nv, 3]
    Jr_rel = (jnp.asarray(m2 - m1))[:, None] * \
        info.is_rot[:, None] * info.axis
    J6 = jnp.concatenate([Jp_rel.T, Jr_rel.T])          # [6, nv]

    solimp = model.eq_solimp[e_i]
    solref = model.eq_solref[e_i]
    d_e = impedance(solimp[None, :], jnp.linalg.norm(pos6))
    d_e6 = jnp.broadcast_to(d_e, (6,))
    k, b = _kb(solref[None, :], d_e6, solimp[1])
    vel = J6 @ state.qvel
    aref = -b * vel - k * pos6
    J_rows.append(J6)
    aref_rows.append(aref)
    d_rows.append(d_e6)
    active_rows.append(jnp.ones(6, bool))
    invw_rows.append(jnp.asarray(
        cs.invweight[cs.ngrp * cs.ncon + 2 * cs.nlim + 6 * e_i:
                     cs.ngrp * cs.ncon + 2 * cs.nlim + 6 * (e_i + 1)]))

  if not J_rows:
    z = jnp.zeros(0)
    return Constraints(J=jnp.zeros((0, nv)), aref=z, d_imp=z,
                       active=jnp.zeros(0, bool), invweight=z, mu_t=z,
                       mu_tor=z, mu_roll=z, sel_idx=jnp.zeros(0, jnp.int32))

  return Constraints(
      J=jnp.concatenate([j.reshape(-1, nv) for j in J_rows]),
      aref=jnp.concatenate([a.reshape(-1) for a in aref_rows]),
      d_imp=jnp.concatenate([d.reshape(-1) for d in d_rows]),
      active=jnp.concatenate([a.reshape(-1) for a in active_rows]),
      invweight=jnp.concatenate([w.reshape(-1) for w in invw_rows]),
      mu_t=mu_t, mu_tor=mu_tor, mu_roll=mu_roll, sel_idx=sel_idx,
  )


def block_ids(cs: ConstraintStatic) -> Optional[np.ndarray]:
  """Static row -> island-block id over the selected inequality rows.

  Blocks follow the quota partition (one per free body + one for
  robot/static rows, see _quota_groups); joint-limit rows get their own
  extra block.  Only meaningful under quota selection, where slot j of
  sel_idx statically belongs to quota group q(j); with global top-K the
  slot composition is dynamic and no static blocking exists.
  Layout matches _row_order: [ngrp x K contact rows, 2 x nlim limit rows].
  """
  if cs.quota_sel is None:
    return None
  slot_block = np.concatenate(
      [np.full(k, gi, np.int32) for gi, (_, k) in enumerate(cs.quota_sel)]
  ) if cs.quota_sel else np.zeros(0, np.int32)
  nb = len(cs.quota_sel)
  return np.concatenate(
      [np.tile(slot_block, cs.ngrp), np.full(2 * cs.nlim, nb, np.int32)])


def _row_order(ncon: int, nlim: int, neq: int, ngrp: int = 4) -> dict:
  """Index ranges of each row family in a concatenated layout."""
  off = 0
  out = {}
  out['con_n'] = (off, off + ncon); off += ncon
  out['con_t1'] = (off, off + ncon); off += ncon
  out['con_t2'] = (off, off + ncon); off += ncon
  out['con_tor'] = (off, off + ncon); off += ncon
  if ngrp == 6:
    out['con_roll'] = (off, off + 2 * ncon); off += 2 * ncon
  out['lim'] = (off, off + 2 * nlim); off += 2 * nlim
  out['eq'] = (off, off + 6 * neq); off += 6 * neq
  return out


def gather_warmstart(cs: ConstraintStatic, con: Constraints,
                     warm_full: jax.Array) -> jax.Array:
  """Map a full-layout warmstart vector onto the selected-row layout."""
  warm2 = warm_full[:cs.ngrp * cs.ncon].reshape(cs.ngrp, cs.ncon)
  sel = warm2[:, con.sel_idx]                  # one gather for all groups
  return jnp.concatenate([sel.reshape(-1),
                          warm_full[cs.ngrp * cs.ncon:]])  # limits + welds


def scatter_forces(cs: ConstraintStatic, con: Constraints,
                   f_sel: jax.Array) -> jax.Array:
  """Selected-row forces -> full-layout vector (for warmstart carry)."""
  K = cs.ncon_sel
  f2 = f_sel[:cs.ngrp * K].reshape(cs.ngrp, K)
  full2 = jnp.zeros((cs.ngrp, cs.ncon)).at[:, con.sel_idx].set(f2)
  return jnp.concatenate([full2.reshape(-1), f_sel[cs.ngrp * K:]])


def _iterate(Aop, project, f0: jax.Array, b: jax.Array, precond: jax.Array,
             iterations: int, method: str, unroll: int = 1,
             bid: Optional[jax.Array] = None, nblocks: int = 0) -> jax.Array:
  """Run the projected iteration on min 1/2 f^T A f + b^T f s.t. cone.

  Methods (all touch only cone/limit rows through ``project``):
    psd  preconditioned steepest descent with exact quadratic step — two
         operator applications per iteration, monotone, the round-1 default.
    cg   preconditioned conjugate gradient (Fletcher-Reeves) with projection;
         conjugacy is only approximate once the projection clamps rows, but
         the momentum still cuts the iteration count on the ill-conditioned
         graspy states (measured in scripts_dev/solver_convergence.py).
    bb   projected Barzilai-Borwein: the step size comes from the previous
         (s, y) pair, so each iteration needs only ONE operator application —
         half the op chain of psd/cg on TPU — at the cost of non-monotone
         convergence (safeguarded by falling back to the preconditioned
         gradient step when curvature information is unusable).

  Block variants (``psd_block``/``bb_block``, require ``bid``/``nblocks``):
  per-ISLAND step sizes over the static quota-group row blocks (each free
  body's rows, robot rows, limit rows — see ConstraintStatic.quota_sel).
  A single global step size couples otherwise-independent islands: a rank
  change on a robot row changes alpha for everyone, perturbing the forces
  of a body at rest every substep — the root cause of mesh-scene rest
  creep (STATUS.md "hull rest creep").  With per-block alphas, islands
  whose rows never share dofs take their EXACT independent steps (for
  decoupled blocks the safeguarded composite step reduces to alpha == 1
  per block); coupled blocks (a grasped object + the gripper) degrade
  gracefully:
    psd_block  per-block exact steps composed into one direction, then a
               global exact line search along it — monotone like psd, one
               extra operator application (3/iter).
    bb_block   per-block Barzilai-Borwein step sizes from per-block (s, y)
               — still ONE operator application per iteration.
  """
  if method in ('psd_block', 'bb_block'):
    assert bid is not None and nblocks > 0, (
        f'{method} requires quota contact selection (contact_select='
        f"'quota') so row blocks are static")
    seg = lambda x: jax.ops.segment_sum(x, bid, num_segments=nblocks)

  if method == 'psd_block':
    def body(f, _):
      g = Aop(f) + b
      d = precond * g
      Ad = Aop(d)
      num_b = seg(g * d)
      den_b = seg(d * Ad)
      alpha_b = jnp.where(den_b > 1e-12, num_b / jnp.maximum(den_b, 1e-12),
                          0.0)
      dp = alpha_b[bid] * d
      Adp = Aop(dp)  # A(D d) != D (A d): the composite needs its own Aop
      den = jnp.dot(dp, Adp)
      alpha = jnp.where(den > 1e-12, jnp.dot(g, dp) / jnp.maximum(
          den, 1e-12), 0.0)
      return project(f - alpha * dp), None
    f, _ = jax.lax.scan(body, f0, None, length=iterations, unroll=unroll)
    return f

  if method == 'bb_block':
    # seed the (s, y) history with one exact global psd step
    g0 = Aop(f0) + b
    d0 = precond * g0
    Ad0 = Aop(d0)
    den0 = jnp.dot(d0, Ad0)
    alpha0 = jnp.where(den0 > 1e-12, jnp.dot(g0, d0) / jnp.maximum(
        den0, 1e-12), 0.0)
    f1 = project(f0 - alpha0 * d0)

    def body(carry, _):
      f, f_prev, g_prev, alpha_prev_b = carry
      g = Aop(f) + b                      # the ONLY operator application
      s = f - f_prev
      y = g - g_prev
      sy_b = seg(s * y)
      ss_b = seg(s * s / precond)         # s^T P^-1 s per block (BB1)
      alpha_b = jnp.where(sy_b > 1e-14, ss_b / jnp.maximum(sy_b, 1e-14),
                          alpha_prev_b)
      f_new = project(f - alpha_b[bid] * precond * g)
      return (f_new, f, g, alpha_b), None
    init = (f1, f0, g0,
            jnp.full((nblocks,), jnp.maximum(alpha0, 1e-8), f0.dtype))
    (f, _, _, _), _ = jax.lax.scan(body, init, None, length=iterations,
                                   unroll=unroll)
    return f
  if method == 'psd':
    def body(f, _):
      g = Aop(f) + b
      d = precond * g
      Ad = Aop(d)
      denom = jnp.dot(d, Ad)
      alpha = jnp.where(denom > 1e-12, jnp.dot(g, d) / jnp.maximum(
          denom, 1e-12), 0.0)
      return project(f - alpha * d), None
    f, _ = jax.lax.scan(body, f0, None, length=iterations,
                        unroll=unroll)
    return f

  if method == 'cg':
    def body(carry, _):
      f, d_prev, gz_prev = carry
      g = Aop(f) + b
      z = precond * g
      gz = jnp.dot(g, z)
      beta = jnp.where(gz_prev > 1e-12, gz / jnp.maximum(gz_prev, 1e-12),
                       0.0)
      d = z + beta * d_prev
      Ad = Aop(d)
      denom = jnp.dot(d, Ad)
      # non-positive curvature along d: fall back to the plain gradient step
      d = jnp.where(denom > 1e-12, d, z)
      Ad2 = jnp.where(denom > 1e-12, jnp.dot(d, Ad), jnp.dot(z, Aop(z)))
      alpha = jnp.where(Ad2 > 1e-12, jnp.dot(g, d) / jnp.maximum(
          Ad2, 1e-12), 0.0)
      return (project(f - alpha * d), d, gz), None
    init = (f0, jnp.zeros_like(f0), jnp.asarray(0.0, f0.dtype))
    (f, _, _), _ = jax.lax.scan(body, init, None, length=iterations,
                                unroll=unroll)
    return f

  if method == 'apgd':
    # Nesterov-accelerated projected gradient with adaptive restart
    # (the standard contact-QP accelerator, cf. Chrono's APGD): a psd step
    # taken at the extrapolated point y, momentum reset whenever the
    # objective direction test g . (f_new - f) > 0 fails.
    def body(carry, _):
      f, y, t = carry
      g = Aop(y) + b
      d = precond * g
      Ad = Aop(d)
      denom = jnp.dot(d, Ad)
      alpha = jnp.where(denom > 1e-12, jnp.dot(g, d) / jnp.maximum(
          denom, 1e-12), 0.0)
      f_new = project(y - alpha * d)
      restart = jnp.dot(g, f_new - f) > 0.0
      t_new = jnp.where(restart, 1.0, 0.5 * (1.0 + jnp.sqrt(1.0 + 4 * t * t)))
      beta = jnp.where(restart, 0.0, (t - 1.0) / t_new)
      y_new = f_new + beta * (f_new - f)
      return (f_new, y_new, t_new), None
    init = (f0, f0, jnp.asarray(1.0, f0.dtype))
    (f, _, _), _ = jax.lax.scan(body, init, None, length=iterations,
                                unroll=unroll)
    return f

  if method == 'bb':
    # one exact preconditioned-gradient step to seed the (s, y) history
    g0 = Aop(f0) + b
    d0 = precond * g0
    Ad0 = Aop(d0)
    den0 = jnp.dot(d0, Ad0)
    alpha0 = jnp.where(den0 > 1e-12, jnp.dot(g0, d0) / jnp.maximum(
        den0, 1e-12), 0.0)
    f1 = project(f0 - alpha0 * d0)

    def body(carry, _):
      f, f_prev, g_prev, alpha_prev = carry
      g = Aop(f) + b                      # the ONLY operator application
      s = f - f_prev
      y = g - g_prev
      sy = jnp.dot(s, y)
      ss = jnp.dot(s, s / precond)        # s^T P^-1 s: BB1 in the P metric
      # when the curvature pair is unusable (projection killed the step, or
      # non-convex direction) reuse the previous step size instead of
      # spending a second Aop on an exact line search
      alpha = jnp.where(sy > 1e-14, ss / jnp.maximum(sy, 1e-14), alpha_prev)
      f_new = project(f - alpha * precond * g)
      return (f_new, f, g, alpha), None
    init = (f1, f0, g0, jnp.maximum(alpha0, 1e-8))
    (f, _, _, _), _ = jax.lax.scan(body, init, None, length=iterations,
                                   unroll=unroll)
    return f

  raise ValueError(f'unknown solver method {method!r}')


def solve(model: Model, cs: ConstraintStatic, smooth: D.Smooth,
          con: Constraints, warmstart: jax.Array | None,
          iterations: int = 60, method: str = 'psd',
          unroll: int = 1) -> Tuple[jax.Array, jax.Array]:
  """Projected-gradient solve with weld-equality elimination.

  The weld equality rows couple to the 1e11-damped world slides
  (fetch-gym.xml:9-11) and dominate the dual conditioning; solving them
  exactly by Schur complement (they need no cone projection) and
  iterating only the inequality rows reaches the same qacc error in
  about half the iterations of the plain projected-gradient sweep.
  Returns (f_full [ne], qacc [nv]).
  """
  ne_sel = con.J.shape[0]
  if ne_sel == 0:
    return jnp.zeros(cs.ne), smooth.qacc_smooth

  bid = None
  nblocks = 0
  if method in ('psd_block', 'bb_block'):
    bid_np = block_ids(cs)
    if bid_np is None:
      raise ValueError(
          f"{method!r} requires quota contact selection "
          "(constraint_static(select_mode='quota'))")
    bid = jnp.asarray(bid_np)
    nblocks = int(bid_np.max()) + 1 if bid_np.size else 1

  if smooth.minv is not None:     # explicit-inverse path: one fused matmul
    X = smooth.minv @ con.J.T                     # [nv, ne_sel] = Minv J^T
  else:
    X = jax.scipy.linalg.cho_solve((smooth.chol, False), con.J.T)
  diagA = jnp.einsum('ev,ve->e', con.J, X)
  # regularization from reference-pose invweights (see _body_invweights)
  R = (1.0 - con.d_imp) / con.d_imp * con.invweight
  b = con.J @ smooth.qacc_smooth - con.aref

  K = cs.ncon_sel
  order = _row_order(K, cs.nlim, cs.neq, cs.ngrp)
  lo_lim, hi_lim = order['lim']
  eq_lo, eq_hi = order['eq']
  nI = eq_lo                                       # inequality row count
  nE = eq_hi - eq_lo
  con_active = con.active[0:K] if K else jnp.zeros(0, bool)
  lim_active = con.active[lo_lim:hi_lim]

  def project(f):
    if K:
      fn = jnp.maximum(f[0:K], 0.0) * con_active
      ft1 = f[K:2 * K]
      ft2 = f[2 * K:3 * K]
      ftor = f[3 * K:4 * K]
      t_norm = jnp.sqrt(ft1 * ft1 + ft2 * ft2 + 1e-18)
      scale = jnp.minimum(1.0, con.mu_t * fn / t_norm)
      ft1 = ft1 * scale * con_active
      ft2 = ft2 * scale * con_active
      ftor = jnp.clip(ftor, -con.mu_tor * fn, con.mu_tor * fn) * con_active
      cols = [fn, ft1, ft2, ftor]
      if cs.ngrp == 6:
        lim_r = con.mu_roll * fn
        for g in (4, 5):
          fr = jnp.clip(f[g * K:(g + 1) * K], -lim_r, lim_r) * con_active
          cols.append(fr)
      f = f.at[0:cs.ngrp * K].set(jnp.concatenate(cols))
    if hi_lim > lo_lim:
      f = f.at[lo_lim:hi_lim].set(
          jnp.maximum(f[lo_lim:hi_lim], 0.0) * lim_active)
    return f

  if warmstart is None:
    f0 = jnp.zeros(ne_sel)
  else:
    f0 = gather_warmstart(cs, con, warmstart)
  f0 = project(f0)

  if nE:
    J_I, J_E = con.J[:nI], con.J[eq_lo:eq_hi]
    X_I, X_E = X[:, :nI], X[:, eq_lo:eq_hi]
    R_I, R_E = R[:nI], R[eq_lo:eq_hi]
    b_I, b_E = b[:nI], b[eq_lo:eq_hi]
    A_EE = J_E @ X_E + jnp.diag(R_E)               # [nE, nE]
    # SPD Schur block: unrolled GJ instead of jnp.linalg.inv's While-loop
    # LU — removes ~nE sequential dispatches per substep
    from .linalg import gj_inverse
    A_EE_inv = gj_inverse(A_EE)
    A_IE = J_I @ X_E                               # [nI, nE]
    Z = A_EE_inv @ A_IE.T                          # [nE, nI]
    diag_red = diagA[:nI] + R_I - jnp.einsum('ie,ei->i', A_IE, Z)
    b_red = b_I - A_IE @ (A_EE_inv @ b_E)
    precond = 1.0 / jnp.maximum(diag_red, 1e-12)

    def A_red(f):
      u = X_I @ f
      return J_I @ u + R_I * f - A_IE @ (A_EE_inv @ (J_E @ u))

    # project touches only contact/limit rows, all of which are < nI
    if method == 'pallas' and cs.ngrp == 4:
      from .solver_pallas import make_iterator
      it = make_iterator(K, cs.nlim, nE, iterations)
      fI = it(J_I, X_I, A_IE, A_EE_inv, R_I, b_red, precond, f0[:nI],
              con.mu_t, con.mu_tor, con_active, lim_active)
    else:
      fI = _iterate(A_red, project, f0[:nI], b_red, precond, iterations,
                    'psd' if method == 'pallas' else method, unroll,
                    bid=bid, nblocks=nblocks)
    fE = -A_EE_inv @ (b_E + A_IE.T @ fI)
    f = jnp.concatenate([fI, fE])
  else:
    precond = 1.0 / (diagA + R + 1e-12)

    if method == 'pallas' and cs.ngrp == 4:
      from .solver_pallas import make_iterator
      it = make_iterator(K, cs.nlim, 0, iterations)
      f = it(con.J, X, jnp.zeros((ne_sel, 0)), jnp.zeros((0, 0)), R, b,
             precond, f0, con.mu_t, con.mu_tor, con_active, lim_active)
    else:

      def A_full(f):
        return con.J @ (X @ f) + R * f

      f = _iterate(A_full, project, f0, b, precond, iterations,
                   'psd' if method == 'pallas' else method, unroll,
                   bid=bid, nblocks=nblocks)

  qacc = smooth.qacc_smooth + X @ f
  return scatter_forces(cs, con, f), qacc
