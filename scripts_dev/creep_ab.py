"""A/B the solver config on the golden MuJoCo replay fixtures.

Measures per-fixture drift vs the recorded MuJoCo trajectory (same
mechanics as tests/test_replay_parity.py) for a list of solver configs,
to decide whether quota selection + per-island block line search
(bb_block/psd_block) should replace the psd+topk default: the block
solvers exist to kill the rest-creep path (STATUS.md "hull rest creep").

CPU-friendly:
  env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts_dev/creep_ab.py \
      [--configs psd:topk bb_block:quota] [--fixtures nutcone ballcup ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           '..', 'tests', 'fixtures')
ALL_FIXTURES = {
    'pick': 'mujoco_pickplace_pad2cube2.npz',
    'push': 'mujoco_pushing_pushpad2cube2.npz',
    'clutter4': 'mujoco_pickplace_pad2cube2clutter4.npz',
    'nutcone': 'mujoco_pickplace_nutcone.npz',
    'ballcup': 'mujoco_pickplace_ballcup.npz',
}


def run_one(fx_path, method, select, iterations):
  import jax
  import jax.numpy as jnp
  import numpy as np
  from geeco_tpu.envs.base import ResetSpec, make_env

  fx = np.load(fx_path)
  env = make_env(str(fx['shapes']), frame_res=(64, 64),
                 solver_method=method, contact_select=select,
                 solver_iterations=iterations)
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

  es_f, trace = replay_all(es, jnp.asarray(fx['cmds']))
  m = env.eval_metrics(es_f)
  mj = fx['obj_pos_trace']
  drift = np.linalg.norm(np.asarray(trace) - mj, axis=-1)
  per_obj = drift.max(axis=0)
  moved = np.linalg.norm(mj - mj[:1], axis=-1).max(axis=0) > 0.005
  static = per_obj[~moved]
  return {
      'task_success': float(m['task_success']),
      'goal_dist_delta': abs(float(m['goal_dist']) -
                             float(fx['final_goal_dist'])),
      'task_obj_drift': float(per_obj[0]),
      'moved_drift': float(per_obj[moved].max()) if moved.any() else 0.0,
      'static_drift': float(static.max()) if static.size else 0.0,
  }


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--configs', nargs='+',
                  default=['psd:topk:60', 'bb_block:quota:60',
                           'psd_block:quota:60'])
  ap.add_argument('--fixtures', nargs='+', default=list(ALL_FIXTURES))
  args = ap.parse_args()
  for name in args.fixtures:
    fx_path = os.path.join(FIXTURE_DIR, ALL_FIXTURES[name])
    for cfg in args.configs:
      parts = cfg.split(':')
      method, select = parts[0], parts[1]
      iters = int(parts[2]) if len(parts) > 2 else 60
      r = run_one(fx_path, method, select, iters)
      print(json.dumps({'fixture': name, 'config': cfg, **r}), flush=True)


if __name__ == '__main__':
  main()
