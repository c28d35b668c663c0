"""Solver iteration study on real replay states (CPU, no TPU needed).

How many contact-solver iterations does pad2-cube2 actually need, and do the
cheaper iteration methods (cg momentum / one-Aop-per-iter bb) reach the same
accuracy sooner?  The per-substep solve is the deepest op chain in the
physics step, so iterations x ops-per-iteration is the single biggest lever
on env-steps/s (VERDICT.md round-1 ask #3).

Protocol: replay the committed MuJoCo expert fixture
(tests/fixtures/mujoco_pickplace_pad2cube2.npz) through the engine with the
known-good psd@60 configuration, capture the physics state at every control
step (warmstart efc_force included), then at a stride of states compare
qacc(method, k) against a 1000-iteration psd reference.

Run:  JAX_PLATFORMS=cpu python scripts_dev/solver_convergence.py
"""

import os
import sys
import time

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

from geeco_tpu.envs.base import ResetSpec, make_env
from geeco_tpu.physics import collision as C
from geeco_tpu.physics import dynamics as D
from geeco_tpu.physics import solver as S

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                       'tests', 'fixtures', 'mujoco_pickplace_pad2cube2.npz')

METHODS = tuple(os.environ.get('METHODS', 'psd,cg,bb').split(','))
ITERS = tuple(int(k) for k in os.environ.get(
    'ITERS', '10,15,20,30,40,60,90,120').split(','))
REF_ITERS = 1000
STATE_STRIDE = 4


def main():
  fx = np.load(FIXTURE)
  env = make_env('pad2-cube2', frame_res=(64, 64))
  env.setup()
  obj_qpos = fx['init_obj_qpos'].copy()
  obj_qpos[:, 2] -= 0.025
  spec = ResetSpec(obj_qpos=jnp.asarray(obj_qpos),
                   mocap_qpos=jnp.asarray(fx['init_mocap_qpos']),
                   task_goal=jnp.asarray(0, jnp.int32),
                   task_object=jnp.asarray(0, jnp.int32))
  es = env.reset_to(spec, jax.random.PRNGKey(0))

  @jax.jit
  def replay_capture(es, cmds):
    def body(es, cmd):
      es2 = env.step(es, cmd)
      return es2, es2.phys
    return jax.lax.scan(body, es, cmds)

  t0 = time.time()
  _, traj = replay_capture(es, jnp.asarray(fx['cmds']))
  traj = jax.tree.map(lambda x: np.asarray(x), traj)
  print(f'replay captured {traj.qpos.shape[0]} states '
        f'in {time.time() - t0:.1f}s', flush=True)

  stepper = env.stepper
  model, cs, anc = stepper.model, stepper.cs, stepper.anc_mask
  dt = model.opt.timestep

  def qacc_at(state, iterations, method):
    smooth = D.smooth_dynamics(model, state, anc, dt)
    contacts = C.collide(model, smooth.kin)
    con = S.make_constraints(model, cs, smooth, contacts, state, anc)
    _, qacc = S.solve(model, cs, smooth, con, state.efc_force,
                      iterations=iterations, method=method)
    return qacc

  sub = jax.tree.map(lambda x: jnp.asarray(x[::STATE_STRIDE]), traj)
  n_states = int(sub.qpos.shape[0])

  t0 = time.time()
  ref_fn = jax.jit(jax.vmap(lambda s: qacc_at(s, REF_ITERS, 'psd')))
  qacc_ref = np.asarray(ref_fn(sub))
  ref_norm = np.linalg.norm(qacc_ref, axis=-1)
  print(f'reference psd@{REF_ITERS} on {n_states} states '
        f'in {time.time() - t0:.1f}s  (|qacc| median '
        f'{np.median(ref_norm):.3f}, max {ref_norm.max():.3f})', flush=True)

  print(f"\n{'method':>6} {'iters':>5} {'rel_l2_med':>11} {'rel_l2_p95':>11} "
        f"{'rel_l2_max':>11} {'dvel_max':>10} {'sec':>6}")
  results = {}
  for method in METHODS:
    for k in ITERS:
      fn = jax.jit(jax.vmap(lambda s, k=k, m=method: qacc_at(s, k, m)))
      t0 = time.time()
      qa = np.asarray(fn(sub))
      sec = time.time() - t0
      err = np.linalg.norm(qa - qacc_ref, axis=-1)
      rel = err / np.maximum(ref_norm, 1.0)
      dvel = np.abs(qa - qacc_ref).max() * dt  # worst per-substep vel error
      results[(method, k)] = (np.median(rel), np.percentile(rel, 95),
                              rel.max(), dvel)
      print(f'{method:>6} {k:>5} {np.median(rel):>11.2e} '
            f'{np.percentile(rel, 95):>11.2e} {rel.max():>11.2e} '
            f'{dvel:>10.2e} {sec:>6.1f}', flush=True)

  # headline: what does each method need to match the known-good psd@60?
  if ('psd', 60) not in results:
    return
  base = results[('psd', 60)][1]
  print(f'\npsd@60 (round-1 default) rel_l2_p95 = {base:.2e}')
  for method in METHODS:
    ks = [k for k in ITERS if results[(method, k)][1] <= base * 1.05]
    print(f'  {method}: smallest k matching psd@60 accuracy: '
          f'{min(ks) if ks else ">120"}')


if __name__ == '__main__':
  main()
