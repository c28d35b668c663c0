"""Dev profiler: per-component physics timings at batch B on the real chip.

Unlike profile_components.py this follows the axon measurement rules:
forced host readbacks end every timed region, and inputs are perturbed per
iteration so dispatches cannot be cache-served.

Env overrides: B (batch, default 256), N (iters, default 10),
SCENE (default pad2-cube2).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from geeco_tpu.envs.base import GeecoEnv
from geeco_tpu.physics import collision as C
from geeco_tpu.physics import dynamics as D
from geeco_tpu.physics import kinematics as K
from geeco_tpu.physics import solver as S

B = int(os.environ.get('B', '256'))
N = int(os.environ.get('N', '10'))
SCENE = os.environ.get('SCENE', 'pad2-cube2')

env = GeecoEnv(shapes=SCENE, settle_steps=2)
env.setup()
stp = env.stepper
model = stp.model

rngs = jax.random.split(jax.random.PRNGKey(0), B)
es = jax.jit(jax.vmap(env.reset_random))(rngs)
state = es.phys
actions = jnp.tile(jnp.asarray([0.1, 0.0, 0.2, 1.0]), (B, 1))


def readback(out):
  leaves = jax.tree.leaves(out)
  tot = sum(jnp.sum(l.reshape(-1)[-1].astype(jnp.float32)) for l in leaves)
  return float(jax.device_get(tot))


def timed(name, fn, state_arg, *args):
  fn = jax.jit(fn)
  out = fn(state_arg, *args)
  readback(out)
  # per-iter perturbed copies staged on device ahead of the loop
  perturbed = [
      jax.device_put(state_arg.replace(
          qvel=state_arg.qvel + 1e-6 * (i + 1)))
      for i in range(N)
  ]
  t0 = time.perf_counter()
  for i in range(N):
    out = fn(perturbed[i], *args)
  readback(out)
  dt = (time.perf_counter() - t0) / N
  print(f'{name:28s} {dt*1e3:9.2f} ms/call  {B/dt:12.1f} env-steps/s',
        flush=True)
  return out


vm = jax.vmap

# component chain (each includes its prerequisites' compute)
timed('fk', vm(lambda s: K.fk(model, s)), state)
timed('smooth_dynamics',
      vm(lambda s: D.smooth_dynamics(model, s, stp.anc_mask,
                                     model.opt.timestep)), state)
timed('smooth+collide',
      vm(lambda s: C.collide(
          model, D.smooth_dynamics(model, s, stp.anc_mask,
                                   model.opt.timestep).kin)), state)


def through_solve(iters):
  def f(s):
    smooth = D.smooth_dynamics(model, s, stp.anc_mask, model.opt.timestep)
    contacts = C.collide(model, smooth.kin)
    con = S.make_constraints(model, stp.cs, smooth, contacts, s,
                             stp.anc_mask)
    ff, qacc = S.solve(model, stp.cs, smooth, con, s.efc_force,
                       iterations=iters)
    return ff, qacc
  return f


for iters in (30, 60, 120):
  timed(f'..+constraints+solve({iters})', vm(through_solve(iters)), state)

timed('substep', vm(stp.substep), state)
for unroll in (1, 2, 4):
  timed(f'step 20sub unroll={unroll}',
        vm(lambda s, u=unroll: stp.step(s, unroll=u)), state)

timed('env.step (full)', vm(env.step), es, actions)

# ---- solver method x iteration sweep (see scripts_dev/solver_convergence
# for the accuracy side of this tradeoff) --------------------------------
for method in ('psd', 'cg', 'bb'):
  for iters in (15, 30, 60):
    timed(f'step20 {method}@{iters}',
          vm(lambda s, m=method, k=iters: stp.step(
              s, solver_iterations=k, solver_method=m)), state)

# ---- solver-iteration unroll (can XLA keep J/X VMEM-resident across
# unrolled iterations? each non-unrolled iteration re-streams ~126 KB/env
# of J+X from HBM: 2 Aop x 60 iters x 20 substeps x B — the suspected
# physics bandwidth floor) -------------------------------------------------
for su in (4, 8, 16):
  timed(f'step20 psd@60 solver_unroll={su}',
        vm(lambda s, u=su: stp.step(s, solver_unroll=u)), state)

# ---- contact active-set size sweep (smaller K shrinks every constraint
# row dimension: assembly einsums + solver matvecs) -----------------------
from geeco_tpu.physics.step import build_stepper
for sel_k in (32, 48, 64):
  stp_k = build_stepper(model, contact_select_k=sel_k)
  # re-init warmstart at the right static width for this stepper
  st_k = state.replace(
      efc_force=jnp.zeros((B, stp_k.cs.ne), jnp.float32))
  timed(f'step20 K={sel_k} psd@60',
        vm(lambda s, sk=stp_k: sk.step(s)), st_k)
  timed(f'step20 K={sel_k} bb@30',
        vm(lambda s, sk=stp_k: sk.step(
            s, solver_iterations=30, solver_method='bb')), st_k)

# ---- microbench: how does XLA lower the batched GEMV at the heart of the
# solver? einsum (dot_general -> MXU, N=1 pads 128x) vs explicit mul+sum
# (VPU elementwise + reduce). Decides the Aop formulation on TPU. ---------
nI, nv = 4 * stp.cs.ncon_sel + 2 * stp.cs.nlim, model.nv
key = jax.random.PRNGKey(1)
Jb = jax.random.normal(key, (B, nI, nv), jnp.float32)
xb = jax.random.normal(key, (B, nv), jnp.float32)
fb = jax.random.normal(key, (B, nI), jnp.float32)


def _ein_chain(x, Jb=Jb, fb=fb):
  u = jnp.einsum('eiv,ei->ev', Jb, fb + x.sum() * 1e-9)   # J^T f
  return jnp.einsum('eiv,ev->ei', Jb, u)                  # J u


def _mulsum_chain(x, Jb=Jb, fb=fb):
  f = fb + x.sum() * 1e-9
  u = (Jb * f[:, :, None]).sum(1)
  return (Jb * u[:, None, :]).sum(2)


timed('gemv einsum  JtJ f', lambda s: _ein_chain(s.qvel), state)
timed('gemv mul+sum JtJ f', lambda s: _mulsum_chain(s.qvel), state)
