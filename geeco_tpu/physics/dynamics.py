"""Smooth (unconstrained) dynamics: mass matrix, bias, passive, actuation.

Formulation (TPU-first, see physics/kinematics.py):
  M(q)      = Σ_b m_b Jp_bᵀ Jp_b + Jr_bᵀ I_b^w Jr_b   (einsum over bodies)
  bias(q,v) = Σ_b Jp_bᵀ m_b (a_b − g) + Jr_bᵀ (I_b^w α_b + ω_b × I_b^w ω_b)
where (a_b, α_b) = d/dt (J_b v) at constant v, obtained with one jax.jvp
through forward kinematics — replacing the recursive Newton-Euler pass of a
CPU engine with a dual-number sweep XLA fuses into the FK computation.

Joint damping is handled implicitly in the integrator: the velocity update
solves (M + h·diag(damping)) — required for stability with the reference's
1e11 world-slide damping (assets/gym/robots/fetch-gym.xml:9-11) at h=0.002.

Actuators are MuJoCo position servos: force = kp·(ctrl − qpos_joint)
(gain kp, affine bias −kp·qpos; reference: geeco-pad2-cube2.xml:68-71).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as gm
from ..core.model import FREE, Kin, Model, State
from . import kinematics as K


class Smooth(NamedTuple):
  kin: Kin
  info: K.DofInfo
  M: jax.Array            # [nv, nv] mass matrix (incl. armature)
  M_impl: jax.Array       # [nv, nv] M + h*diag(damping)  (implicit damping)
  chol: jax.Array | None  # cholesky factor of M_impl ('chol' path)
  qfrc_smooth: jax.Array  # [nv] applied + bias-compensated force
  qacc_smooth: jax.Array  # [nv] unconstrained acceleration
  minv: jax.Array | None = None  # explicit M_impl^-1 ('blockgj' path)


def inertia_world(model: Model, kin: Kin) -> jax.Array:
  """Rotational inertia of each body in world frame [nbody, 3, 3]."""
  iquat_mat = gm.quat_to_mat(model.body_iquat)     # [nbody, 3, 3]
  R = jnp.einsum('bij,bjk->bik', kin.ximat, iquat_mat)
  return jnp.einsum('bij,bj,bkj->bik', R, model.body_inertia, R)


def mass_matrix(model: Model, kin: Kin, jacp: jax.Array, jacr: jax.Array
                ) -> jax.Array:
  Iw = inertia_world(model, kin)
  M = jnp.einsum('bdi,b,bei->de', jacp, model.body_mass, jacp)
  M = M + jnp.einsum('bdi,bij,bej->de', jacr, Iw, jacr)
  return M + jnp.diag(model.dof_armature)


def kin_and_bias(model: Model, state: State, anc_mask: np.ndarray):
  """One jvp sweep through FK yields the kinematics, Jacobians AND the
  bias-force ingredients (body accelerations at constant qvel).

  Returns (kin, info, jacp, jacr, qfrc_bias).  The primal pass of the jvp
  IS the forward kinematics — computing kin separately would trace and run
  FK twice per substep.
  """
  qvel = state.qvel

  def body_twists(qpos):
    st = state.replace(qpos=qpos)
    kin_q = K.fk(model, st)
    info_q = K.dof_info(model, kin_q)
    jp, jr = K.com_jacobians(model, kin_q, info_q, anc_mask)
    v = jnp.einsum('bdi,d->bi', jp, qvel)
    w = jnp.einsum('bdi,d->bi', jr, qvel)
    return v, w, (kin_q, info_q, jp, jr)

  tangent = K.qpos_tangent(model, state.qpos, qvel)
  (v, w, aux), (a, alpha, _) = jax.jvp(
      body_twists, (state.qpos,), (tangent,))
  kin, info, jacp, jacr = aux

  Iw = inertia_world(model, kin)
  g = model.opt.gravity
  f_lin = model.body_mass[:, None] * (a - g[None, :])         # [nbody, 3]
  Iww = jnp.einsum('bij,bj->bi', Iw, w)
  f_ang = jnp.einsum('bij,bj->bi', Iw, alpha) + jnp.cross(w, Iww)
  qfrc_bias = (jnp.einsum('bdi,bi->d', jacp, f_lin) +
               jnp.einsum('bdi,bi->d', jacr, f_ang))
  return kin, info, jacp, jacr, qfrc_bias


def passive_force(model: Model, state: State) -> jax.Array:
  """Joint spring forces (damping is implicit in the integrator)."""
  ks = K.kin_static(model)
  qfrc = jnp.zeros(model.nv)
  if len(ks.sj):
    stiff = model.jnt_stiffness[ks.sj]
    springref = model.jnt_springref[ks.sj]
    qfrc = qfrc.at[ks.sj_dadr].add(
        -stiff * (state.qpos[ks.sj_qadr] - springref))
  return qfrc


def actuator_force(model: Model, state: State) -> jax.Array:
  """Position-servo torques mapped into dof space (vectorized)."""
  qfrc = jnp.zeros(model.nv)
  if model.nu == 0:
    return qfrc
  jid = np.asarray(model.actuator_jntid, np.int32)
  qadr = np.asarray([model.jnt_qposadr[j] for j in jid], np.int32)
  dadr = np.asarray([model.jnt_dofadr[j] for j in jid], np.int32)
  ctrl = jnp.clip(state.ctrl, model.actuator_ctrlrange[:, 0],
                  model.actuator_ctrlrange[:, 1])
  force = model.actuator_kp * (ctrl - state.qpos[qadr])
  return qfrc.at[dadr].add(force)


def fluid_force(model: Model, state: State, kin: Kin, jacp: jax.Array,
                jacr: jax.Array) -> jax.Array:
  """Quadratic drag from ambient fluid density (simplified inertia-box model).

  The reference scenes set density=1.2 (air); at manipulation speeds this is
  a small damping term.  We apply MuJoCo-style quadratic drag on body COM
  linear velocity using the equivalent inertia-box cross sections.
  """
  density = model.opt.density
  v = jnp.einsum('bdi,d->bi', jacp, state.qvel)  # COM linear velocities
  # equivalent box half-sizes from diagonal inertia
  m = jnp.maximum(model.body_mass, 1e-9)
  I = model.body_inertia
  box2 = jnp.stack([
      (I[:, 1] + I[:, 2] - I[:, 0]),
      (I[:, 0] + I[:, 2] - I[:, 1]),
      (I[:, 0] + I[:, 1] - I[:, 2]),
  ], -1) * (3.0 / (2.0 * m[:, None]))
  half = jnp.sqrt(jnp.maximum(box2, 1e-12))
  area = 4.0 * jnp.stack([half[:, 1] * half[:, 2], half[:, 0] * half[:, 2],
                          half[:, 0] * half[:, 1]], -1)
  # world-frame drag uses body-frame areas rotated; approximate with mean area
  mean_area = area.mean(axis=-1, keepdims=True)
  drag = -0.5 * density * mean_area * jnp.linalg.norm(
      v, axis=-1, keepdims=True) * v
  drag = jnp.where(model.body_mass[:, None] > 0, drag, 0.0)
  return jnp.einsum('bdi,bi->d', jacp, drag)


def smooth_dynamics(model: Model, state: State, anc_mask: np.ndarray,
                    dt, mass_inverse: str = 'chol') -> Smooth:
  """``mass_inverse``: 'chol' factorizes M_impl with XLA's (While-loop)
  Cholesky and solves lazily; 'blockgj' forms the explicit inverse with
  an unrolled block-diagonal Gauss-Jordan (physics/linalg.py) so every
  downstream solve is a single fused matmul — same math, no While loops
  in the substep (dispatch-latency lever on TPU)."""
  kin, info, jacp, jacr, qfrc_bias = kin_and_bias(model, state, anc_mask)
  M = mass_matrix(model, kin, jacp, jacr)
  qfrc = (actuator_force(model, state) + passive_force(model, state) +
          fluid_force(model, state, kin, jacp, jacr) - qfrc_bias)
  M_impl = M + dt * jnp.diag(model.dof_damping)
  # implicit damping consumes existing momentum too:
  #   (M + h D) v' = M v + h (qfrc - D·0)  =>  acc = Minv_impl (qfrc - D v)
  qfrc_total = qfrc - model.dof_damping * state.qvel
  if mass_inverse == 'blockgj':
    from . import linalg as L
    blocks = L.dof_blocks(np.asarray(anc_mask))
    minv = L.spd_block_inverse(M_impl, blocks)
    qacc = minv @ qfrc_total
    return Smooth(kin=kin, info=info, M=M, M_impl=M_impl, chol=None,
                  qfrc_smooth=qfrc_total, qacc_smooth=qacc, minv=minv)
  if mass_inverse != 'chol':
    raise ValueError(f'unknown mass_inverse {mass_inverse!r}')
  chol = jax.scipy.linalg.cho_factor(M_impl)[0]
  qacc = jax.scipy.linalg.cho_solve((chol, False), qfrc_total)
  return Smooth(kin=kin, info=info, M=M, M_impl=M_impl, chol=chol,
                qfrc_smooth=qfrc_total, qacc_smooth=qacc)
