"""Dev: A/B the active-set membership hysteresis against the rest-creep.

Replays the MuJoCo golden fixtures (nut-cone = worst hull rest creep,
clutter4 = bystander boxes, pad2-cube2 = grasp-sensitivity control) with
hysteresis in {0, 1, 2} mm and reports per-object drift vs the recorded
MuJoCo trace plus task success.  CPU job (JAX_PLATFORMS=cpu); see
STATUS.md "hull rest creep" for the mechanism this targets.

Run:  env -u PYTHONPATH JAX_PLATFORMS=cpu nice -n 19 \
        python scripts_dev/hysteresis_ab.py
"""

import os
import sys
import time

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp
import numpy as np

from geeco_tpu.envs.base import ResetSpec, make_env

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                           'tests', 'fixtures')
FIXTURES = [f for f in os.environ.get(
    'FIXTURES',
    'mujoco_pickplace_nutcone.npz,mujoco_pickplace_pad2cube2clutter4.npz,'
    'mujoco_pickplace_pad2cube2.npz').split(',') if f]
HYST = [float(h) for h in os.environ.get('HYST', '0,0.001,0.002').split(',')]


def run(fixture, hyst):
  fx = np.load(os.path.join(FIXTURE_DIR, fixture))
  env = make_env(str(fx['shapes']), frame_res=(64, 64), hysteresis=hyst)
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

  t0 = time.time()
  es_f, obj_trace = replay_all(es, jnp.asarray(fx['cmds']))
  obj_trace = np.asarray(obj_trace)
  mj = np.asarray(fx['obj_pos_trace'])
  drift = np.linalg.norm(obj_trace - mj, axis=-1).max(axis=0)
  moved = (np.linalg.norm(mj[-1] - mj[0], axis=-1) > 0.01)
  met = env.eval_metrics(es_f)
  succ = float(np.asarray(met['task_success']))
  static = drift[~moved]
  print(f'{fixture:44s} hyst={hyst * 1e3:3.0f}mm  success={succ:.0f}  '
        f'task={drift[0] * 1e3:6.1f}mm  '
        f'moved_max={drift[moved].max() * 1e3:6.1f}mm  '
        f'static_max={(static.max() * 1e3 if static.size else 0):6.1f}mm  '
        f'({time.time() - t0:.0f}s)', flush=True)


if __name__ == '__main__':
  for fixture in FIXTURES:
    for h in HYST:
      run(fixture, h)
