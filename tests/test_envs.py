"""GeecoEnv functional API tests (reduced settle for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.envs.base import GeecoEnv, ResetSpec


@pytest.fixture(scope='module')
def env():
  # CI-sized config: reduced settle/solver iterations + 128px frames; the
  # substep count stays at the reference 20 (it is a lax.scan — free at
  # compile time — and the EE weld needs the full 40 ms to track).
  return GeecoEnv(shapes='pad2-cube2', settle_steps=1,
                  solver_iterations=24, frame_res=(128, 128))


@pytest.fixture(scope='module')
def es0(env):
  return env.jit('reset_random')(jax.random.PRNGKey(0))


@pytest.mark.slow
def test_reset_random(env, es0):
  es = es0
  assert int(es.ts) == 0
  assert np.isfinite(np.asarray(es.phys.qpos)).all()
  # objects placed inside the spawn workspace
  kin = env.kin(es)
  for sid in env.obj_site_ids:
    p = np.asarray(kin.site_xpos[sid])
    assert 1.0 < p[0] < 1.6 and 0.3 < p[1] < 1.2, p
    assert 0.25 < p[2] < 0.45, p
  # task indices valid
  assert 0 <= int(es.task_goal) < len(env.goal_sites)
  assert 0 <= int(es.task_object) < len(env.cube_sites)
  # recolor applied: object0 geom is red
  g = env.model.geom('object0')
  np.testing.assert_allclose(np.asarray(es.rgba[g]), [1, 0, 0, 1])
  # crosshair hidden
  cg = env.model.geom('robot0:ee_crosshair_c')
  assert float(es.rgba[cg, 3]) == 0.0


@pytest.mark.slow
def test_step_moves_ee(env, es0):
  es = es0
  kin = env.kin(es)
  z0 = float(env.grip_pos(kin)[2])
  step = env.jit('step')
  for _ in range(5):
    es = step(es, jnp.array([0.0, 0.0, 1.0, 1.0]))
  kin = env.kin(es)
  z1 = float(env.grip_pos(kin)[2])
  assert z1 > z0 + 0.05, f'EE did not move up: {z0} -> {z1}'
  assert int(es.ts) == 5
  # gripper opens under cmd_grp=+1
  qadr = env.model.jnt_qposadr[env.model.joint(
      'robot0:r_gripper_finger_joint')]
  assert float(es.phys.qpos[qadr]) > 0.025


@pytest.mark.slow
def test_observe_and_eval(env, es0):
  obs = env.jit('observe')(es0)
  assert obs['observation'].shape == (25 + len(env.monitored_joints) * 0,)
  metrics = env.jit('eval_metrics')(es0)
  for k in ('obj_vicinity', 'grasp_success', 'task_success', 'goal_dist'):
    assert np.isfinite(float(metrics[k]))
  assert float(metrics['task_success']) in (0.0, 1.0)


@pytest.mark.slow
def test_reset_to_spec(env):
  n = len(env.obj_joint_names)
  obj_qpos = np.zeros((n, 7), np.float32)
  obj_qpos[:, 3] = 1.0
  xy = [(1.2, 0.5), (1.2, 1.0), (1.45, 0.55), (1.45, 0.95)]
  for i in range(n):
    obj_qpos[i, :2] = xy[i % len(xy)]
    obj_qpos[i, 2] = 0.28
  mocap = np.array([1.34, 0.75, 0.55, 1, 0, 1, 0], np.float32)
  spec = ResetSpec(obj_qpos=jnp.asarray(obj_qpos),
                   mocap_qpos=jnp.asarray(mocap),
                   task_goal=jnp.asarray(1, jnp.int32),
                   task_object=jnp.asarray(0, jnp.int32))
  es = env.jit('reset_to')(spec, jax.random.PRNGKey(1))
  assert int(es.task_goal) == 1
  kin = env.kin(es)
  p = np.asarray(env.task_object_pos(es, kin))
  np.testing.assert_allclose(p[:2], [1.2, 0.5], atol=0.05)


@pytest.mark.slow
def test_render_env(env, es0):
  rgb, depth = env.jit('render')(es0)
  assert rgb.shape == (128, 128, 3)
  rgb = np.asarray(rgb)
  # red object0 visible after recolor
  red = (rgb[:, :, 0] > 150) & (rgb[:, :, 1] < 90) & (rgb[:, :, 2] < 90)
  assert red.sum() > 3


def test_sphere_sample_within_radius():
  """EE start perturbation stays in the reference 0.03-radius ball
  (pickplace.py:521; utils/volumes.py)."""
  import jax
  import numpy as np
  from geeco_tpu.envs import spawn
  rngs = jax.random.split(jax.random.PRNGKey(0), 256)
  pts = jax.vmap(lambda r: spawn.sample_point_within_sphere(r, 0.03))(rngs)
  norms = np.linalg.norm(np.asarray(pts), axis=1)
  assert norms.max() <= 0.03 + 1e-6
  assert norms.mean() > 0.01  # not collapsed to the center


def test_adaptive_contact_select_k(monkeypatch):
  """Clutter scenes widen the top-K contact active set: at K=128 the
  resting clutter manifolds evict the ~0-depth finger-cube grasp rows
  mid-transport (expert success 0% -> 100% on clutter4 at K>=192)."""
  import geeco_tpu.envs.base as B
  seen = {}
  orig = B.build_stepper

  def spy(model, contact_select_k=128, **kw):
    seen['k'] = contact_select_k
    return orig(model, contact_select_k=contact_select_k, **kw)

  monkeypatch.setattr(B, 'build_stepper', spy)
  B.GeecoEnv(shapes='pad2-cube2', frame_res=(64, 64))
  assert seen['k'] == 128          # baseline scenes keep the round-1 K
  B.GeecoEnv(shapes='pad2-cube2-clutter4', frame_res=(64, 64))
  assert seen['k'] >= 192          # the measured clutter4 threshold
  k4 = seen['k']
  B.GeecoEnv(shapes='pad2-cube2-clutter12', frame_res=(64, 64))
  assert seen['k'] > k4            # grows with free-body count
  # explicit override still wins
  B.GeecoEnv(shapes='pad2-cube2-clutter4', frame_res=(64, 64),
             contact_select_k=96)
  assert seen['k'] == 96
