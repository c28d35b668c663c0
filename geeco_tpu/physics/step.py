"""Full physics step: smooth dynamics -> collide -> solve -> integrate.

``build_stepper(model)`` precomputes all static structure and returns pure
functions suitable for jit/vmap/scan:

  substep(state)            one physics substep (h = model timestep)
  step(state, n_substeps)   the env-facing step (reference uses 20 substeps
                            per control step: src/geeco_gym/pickplace.py:95)

TPU-batched usage: ``jax.vmap(stepper.substep)`` over a leading env axis,
wrapped in ``jax.lax.scan`` over substeps, all inside one jit — no host
round-trips inside the control loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.model import Kin, Model, State
from . import collision as C
from . import dynamics as D
from . import kinematics as K
from . import solver as S


class Stepper(NamedTuple):
  model: Model
  anc_mask: np.ndarray
  cs: S.ConstraintStatic
  ne: int

  def fk(self, state: State) -> Kin:
    return K.fk(self.model, state)

  def _substep_c(self, state: State, solver_iterations: int,
                 solver_method: str, solver_unroll: int, hysteresis: float,
                 contacts: C.Contacts | None, mass_inverse: str = 'chol'
                 ) -> tuple[State, C.Contacts]:
    model = self.model
    dt = model.opt.timestep
    smooth = D.smooth_dynamics(model, state, self.anc_mask, dt,
                               mass_inverse=mass_inverse)
    if contacts is None:
      contacts = C.collide(model, smooth.kin)
    con = S.make_constraints(model, self.cs, smooth, contacts, state,
                             self.anc_mask, hysteresis=hysteresis)
    f, qacc = S.solve(model, self.cs, smooth, con, state.efc_force,
                      iterations=solver_iterations, method=solver_method,
                      unroll=solver_unroll)
    qvel = state.qvel + dt * qacc
    qpos = K.integrate_qpos(model, state.qpos, qvel, dt)
    return state.replace(qpos=qpos, qvel=qvel, time=state.time + dt,
                         efc_force=f), contacts

  def substep(self, state: State, solver_iterations: int = 60,
              solver_method: str = 'psd', solver_unroll: int = 1,
              hysteresis: float = 0.0,
              mass_inverse: str = 'chol') -> State:
    return self._substep_c(state, solver_iterations, solver_method,
                           solver_unroll, hysteresis, None,
                           mass_inverse=mass_inverse)[0]

  def step(self, state: State, n_substeps: int = 20,
           solver_iterations: int = 60, unroll: int = 1,
           solver_method: str = 'psd', solver_unroll: int = 1,
           hysteresis: float = 0.0, collide_every: int = 1,
           mass_inverse: str = 'chol') -> State:
    """n_substeps of physics.

    ``collide_every=k`` runs narrowphase collision once per k substeps and
    reuses the contact set (points/normals/depths) for the k-1 following
    substeps; Jacobians, reference accelerations, and the solve still use
    each substep's own kinematics/velocities.  At the 2 ms timestep the
    contact geometry moves O(v * 2 ms) ~ 0.1 mm between substeps, so k=2
    is a fidelity-gated throughput lever (validate with
    scripts_dev/replay_fidelity_sweep.py), k=1 (default) is exact
    MuJoCo-rate collision (mj_step collides every substep).
    """
    if collide_every <= 1:
      def body(s, _):
        return self.substep(s, solver_iterations, solver_method,
                            solver_unroll, hysteresis,
                            mass_inverse=mass_inverse), None
      state, _ = jax.lax.scan(body, state, None, length=n_substeps,
                              unroll=unroll)
      return state

    assert n_substeps % collide_every == 0, (n_substeps, collide_every)

    def outer(s, _):
      contacts = None
      for _i in range(collide_every):
        s, contacts = self._substep_c(s, solver_iterations, solver_method,
                                      solver_unroll, hysteresis, contacts,
                                      mass_inverse=mass_inverse)
      return s, None
    state, _ = jax.lax.scan(outer, state, None,
                            length=n_substeps // collide_every,
                            unroll=unroll)
    return state

  def init_state(self, state: State) -> State:
    """Attach a zero warmstart vector of the right static size."""
    return state.replace(efc_force=jnp.zeros((self.ne,), jnp.float32))


def build_stepper(model: Model, contact_select_k: int = 128,
                  rolling: str | bool = 'auto',
                  select_mode: str = 'topk', quota_obj: int = 24,
                  quota_mesh: int = 48, quota_robot: int = 32) -> Stepper:
  anc_mask = K.ancestor_mask(model)
  cs = S.constraint_static(model, anc_mask, select_k=contact_select_k,
                           rolling=rolling, select_mode=select_mode,
                           quota_obj=quota_obj, quota_mesh=quota_mesh,
                           quota_robot=quota_robot)
  return Stepper(model=model, anc_mask=anc_mask, cs=cs, ne=cs.ne)
