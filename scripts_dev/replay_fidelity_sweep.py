"""End-to-end fidelity sweep over solver configs (CPU, no TPU needed).

The real acceptance bar for any solver-cost reduction is the MuJoCo
replay-parity gate (tests/test_replay_parity.py) plus bounded trajectory
drift — not per-state qacc error.  This replays the committed MuJoCo expert
fixture through the full env at each (method, iterations, contact_select_k)
config and reports task success / final goal distance / drift vs the
known-good psd@60 K=128 trajectory.

Run:  JAX_PLATFORMS=cpu python scripts_dev/replay_fidelity_sweep.py
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

# FIXTURE=mujoco_pickplace_nutcone.npz (etc.) selects another committed
# fixture; the scene name is read from the fixture itself.
FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                       'tests', 'fixtures',
                       os.environ.get('FIXTURE',
                                      'mujoco_pickplace_pad2cube2.npz'))

# (method, iterations, select_k) — baseline first (drift reference).
# cg/bb were measured unstable under projection (solver_convergence.py run
# of 2026-08-17): cg p95 rel err 13-25x at any k, bb non-monotone blowups.
CONFIGS = [
    ('psd', 60, 128),
    ('psd', 40, 128),
    ('psd', 30, 128),
    ('apgd', 30, 128),
    ('apgd', 20, 128),
    ('psd', 60, 48),
    ('psd', 40, 48),
    ('apgd', 30, 48),
    ('psd', 40, 32),
    ('apgd', 30, 32),
]
if os.environ.get('CONFIGS'):
  # e.g. CONFIGS="psd:60:96,psd:60:128:2" — method:iters:select_k[:ce]
  # (baseline psd:60:128 ce=1 auto-prepended); ce = collide_every
  CONFIGS = [('psd', 60, 128, 1)] + [
      (p[0], int(p[1]), int(p[2]), int(p[3]) if len(p) > 3 else 1)
      for p in (c.split(':') for c in os.environ['CONFIGS'].split(','))]
CONFIGS = [c if len(c) == 4 else c + (1,) for c in CONFIGS]


def run_config(fx, method, iters, sel_k, ce=1):
  env = make_env(str(fx['shapes']), frame_res=(64, 64), solver_method=method,
                 solver_iterations=iters, contact_select_k=sel_k,
                 collide_every=ce)
  env.setup()
  obj_qpos = fx['init_obj_qpos'].copy()
  obj_qpos[:, 2] -= 0.025
  spec = ResetSpec(obj_qpos=jnp.asarray(obj_qpos),
                   mocap_qpos=jnp.asarray(fx['init_mocap_qpos']),
                   task_goal=jnp.asarray(0, jnp.int32),
                   task_object=jnp.asarray(0, jnp.int32))
  es = env.reset_to(spec, jax.random.PRNGKey(0))

  @jax.jit
  def replay_all(es, cmds):
    def body(es, cmd):
      es2 = env.step(es, cmd)
      return es2, es2.phys.qpos
    return jax.lax.scan(body, es, cmds)

  es_f, qpos_traj = replay_all(es, jnp.asarray(fx['cmds']))
  m = env.eval_metrics(es_f)
  return (np.asarray(qpos_traj), float(m['task_success']),
          float(m['goal_dist']),
          bool(np.isfinite(np.asarray(es_f.phys.qpos)).all()))


def main():
  fx = np.load(FIXTURE)
  ref_traj = None
  print(f"{'method':>6} {'iters':>5} {'K':>4} {'ce':>3} {'success':>7} "
        f"{'goal_dist':>9} {'qpos_drift':>10} {'finite':>6} {'sec':>6}")
  for method, iters, sel_k, ce in CONFIGS:
    t0 = time.time()
    traj, succ, gd, finite = run_config(fx, method, iters, sel_k, ce)
    if ref_traj is None:
      ref_traj = traj
    drift = float(np.abs(traj - ref_traj).max())
    print(f'{method:>6} {iters:>5} {sel_k:>4} {ce:>3} {succ:>7.0f} '
          f'{gd:>9.4f} {drift:>10.4f} {str(finite):>6} '
          f'{time.time() - t0:>6.1f}', flush=True)


if __name__ == '__main__':
  main()
