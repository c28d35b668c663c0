"""Dev: run the FULL 5-fixture MuJoCo replay-parity gate at a given solver
config (CPU).  This is the acceptance screen for solver-cost reductions:
a config only graduates to the bench/env defaults if every fixture passes
the same criteria as tests/test_replay_parity.py.

Env overrides:
  CONFIGS      comma list of method:iters[:select_k[:collide_every]]
               (default "psd:60,psd:30,apgd:20,psd:60:0:2,apgd:30:0:2";
               select_k 0 = env auto)
  SELECT_MODE  'topk' (default) or 'quota' — contact active-set selection
               for every config in this run
"""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp

from geeco_tpu.envs.base import ResetSpec, make_env

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                           'tests', 'fixtures')
FIXTURES = ('mujoco_pickplace_pad2cube2.npz',
            'mujoco_pushing_pushpad2cube2.npz',
            'mujoco_pickplace_pad2cube2clutter4.npz',
            'mujoco_pickplace_nutcone.npz',
            'mujoco_pickplace_ballcup.npz')

CONFIGS = os.environ.get(
    'CONFIGS', 'psd:60,psd:30,apgd:20,psd:60:0:2,apgd:30:0:2')
SELECT_MODE = os.environ.get('SELECT_MODE', 'topk')
if os.environ.get('FIXTURES'):   # substring filter, e.g. FIXTURES=nutcone
  FIXTURES = tuple(f for f in FIXTURES
                   if any(s in f for s in os.environ['FIXTURES'].split(',')))


def run_fixture(fname, method, iters, sel_k, ce, roll='auto'):
  fx = np.load(os.path.join(FIXTURE_DIR, fname))
  env = make_env(str(fx['shapes']), frame_res=(64, 64),
                 solver_method=method, solver_iterations=iters,
                 contact_select_k=sel_k or None, collide_every=ce,
                 contact_select=SELECT_MODE, rolling=roll)
  env.setup()
  obj_qpos = fx['init_obj_qpos'].copy()
  obj_qpos[:, 2] -= 0.025
  spec = ResetSpec(obj_qpos=jnp.asarray(obj_qpos),
                   mocap_qpos=jnp.asarray(fx['init_mocap_qpos']),
                   task_goal=jnp.asarray(0, jnp.int32),
                   task_object=jnp.asarray(0, jnp.int32))
  es = env.reset_to(spec, jax.random.PRNGKey(0))
  adrs = [env.model.jnt_qposadr[env.model.jnt_name.index(str(j))]
          for j in fx['obj_joint_names']]

  @jax.jit
  def replay_all(es, cmds):
    def body(es, cmd):
      es2 = env.step(es, cmd)
      pos = jnp.stack([jax.lax.dynamic_slice(es2.phys.qpos, (a,), (3,))
                       for a in adrs])
      return es2, pos
    return jax.lax.scan(body, es, cmds)

  es_f, obj_trace = replay_all(es, jnp.asarray(fx['cmds']))
  m = env.eval_metrics(es_f)
  obj_trace = np.asarray(obj_trace)
  mj = fx['obj_pos_trace']
  drift = np.linalg.norm(obj_trace - mj, axis=-1)
  per_obj = drift.max(axis=0)
  moved = np.linalg.norm(mj - mj[:1], axis=-1).max(axis=0) > 0.005
  static = per_obj[~moved]
  static_bound = 0.02 if env.shapes in ('nut-cone', 'ball-cup') else 0.005
  ok = (np.isfinite(np.asarray(es_f.phys.qpos)).all()
        and float(m['task_success']) == 1.0
        and abs(float(m['goal_dist']) - float(fx['final_goal_dist'])) < 0.03
        and per_obj[0] < 0.03
        and (not moved.any() or per_obj[moved].max() < 0.03)
        and (not static.size or static.max() < static_bound))
  return (bool(ok), float(m['task_success']), float(m['goal_dist']),
          float(per_obj[0]), float(static.max()) if static.size else 0.0)


def main():
  for cfg in CONFIGS.split(','):
    p = cfg.split(':')
    method, iters = p[0], int(p[1])
    sel_k = int(p[2]) if len(p) > 2 else 0
    ce = int(p[3]) if len(p) > 3 else 1
    roll_tok = p[4] if len(p) > 4 and p[4] else 'auto'
    roll = {'auto': 'auto', 'on': True, 'off': False}.get(roll_tok)
    if roll is None:
      raise SystemExit(f'bad roll token {roll_tok!r} in {cfg!r}: '
                       f'valid tokens are auto/on/off')
    tag = (f'{method}@{iters}' + (f' K={sel_k}' if sel_k else '') +
           (f' ce={ce}' if ce > 1 else '') +
           (f' roll={roll}' if roll != 'auto' else '') +
           (' quota' if SELECT_MODE == 'quota' else ''))
    all_ok = True
    for fname in FIXTURES:
      t0 = time.time()
      try:
        ok, succ, gd, task_drift, static_drift = run_fixture(
            fname, method, iters, sel_k, ce, roll)
      except Exception as e:
        print(f'{tag:24s} {fname:42s} ERROR {type(e).__name__}: {e}',
              flush=True)
        all_ok = False
        continue
      all_ok &= ok
      print(f'{tag:24s} {fname:42s} {"PASS" if ok else "FAIL"} '
            f'succ={succ:.0f} gd={gd:.4f} task_drift={task_drift:.4f} '
            f'static_drift={static_drift:.4f} ({time.time() - t0:.0f}s)',
            flush=True)
    print(f'== {tag}: {"GATE PASS" if all_ok else "GATE FAIL"}', flush=True)


if __name__ == '__main__':
  main()
