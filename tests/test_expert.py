"""Expert FSM unit tests against a scripted fake env (no physics).

The policies only consume env.kin / grip_pos / task_object_pos /
task_goal_pos, so transitions and actions are verified exactly against the
reference constants (scripts/gym_pickplace.py:140-151, gym_pushing.py:
127-133).
"""

import jax.numpy as jnp
import numpy as np

from geeco_tpu.expert import policies as P


class FakeEnv:
  task = 'pickplace'

  def __init__(self, grip, obj, pad):
    self.grip = jnp.asarray(grip, jnp.float32)
    self.obj = jnp.asarray(obj, jnp.float32)
    self.pad = jnp.asarray(pad, jnp.float32)

  def kin(self, es):
    return None

  def grip_pos(self, kin):
    return self.grip

  def task_object_pos(self, es, kin):
    return self.obj

  def task_goal_pos(self, es, kin):
    return self.pad


def _step(env, xs):
  fn = (P.pushing_expert(env) if env.task == 'pushing'
        else P.pickplace_expert(env))
  return fn(None, xs)


def test_pickplace_pre_grasp_action():
  env = FakeEnv(grip=[1.0, 0.5, 0.9], obj=[1.2, 0.7, 0.3], pad=[1.4, 0.9, 0.3])
  action, xs = _step(env, P.init_expert_state())
  # action = (obj - grip + [0,0,0.05]) * 6, gripper OPEN
  expect = (np.array([0.2, 0.2, -0.6]) + [0, 0, 0.05]) * 6.0
  np.testing.assert_allclose(np.asarray(action[:3]), expect, atol=1e-5)
  assert float(action[3]) == 1.0
  assert int(xs.phase) == 0


def test_pickplace_full_phase_progression():
  obj = np.array([1.2, 0.7, 0.3])
  pad = np.array([1.4, 0.9, 0.3])
  xs = P.init_expert_state()
  # 1) gripper reaches pre-grasp pose -> GRASP
  env = FakeEnv(grip=obj + [0, 0, 0.0501], obj=obj, pad=pad)
  action, xs = _step(env, xs)
  assert int(xs.phase) == 1
  assert float(action[3]) == -1.0  # CLOSE
  # 2) gripper reaches object -> POST_GRASP, captures grip+0.05 target
  env = FakeEnv(grip=obj + [0, 0, 0.001], obj=obj, pad=pad)
  action, xs = _step(env, xs)
  assert int(xs.phase) == 2
  np.testing.assert_allclose(np.asarray(xs.aux),
                             obj + [0, 0, 0.001 + 0.05], atol=1e-6)
  # 3) lifted to post-grasp pose -> MOVE, captures pad + 0.175
  env = FakeEnv(grip=np.asarray(xs.aux), obj=obj + [0, 0, 0.05], pad=pad)
  action, xs = _step(env, xs)
  assert int(xs.phase) == 3
  np.testing.assert_allclose(np.asarray(xs.target), pad + [0, 0, 0.175],
                             atol=1e-6)
  # MOVE action = (target - obj) * 6, CLOSE
  env = FakeEnv(grip=np.asarray(xs.aux), obj=obj + [0, 0, 0.05], pad=pad)
  action, xs2 = _step(env, xs)
  expect = (np.asarray(xs.target) - (obj + [0, 0, 0.05])) * 6.0
  np.testing.assert_allclose(np.asarray(action[:3]), expect, atol=1e-4)
  # 4) object reaches goal -> DROP; DROP holds [0,0,0.025,OPEN] forever
  env = FakeEnv(grip=np.asarray(xs.target), obj=np.asarray(xs.target),
                pad=pad)
  action, xs = _step(env, xs)
  assert int(xs.phase) == 4
  np.testing.assert_allclose(np.asarray(action), [0, 0, 0.025, 1.0],
                             atol=1e-6)
  # stays in DROP
  action, xs = _step(env, xs)
  assert int(xs.phase) == 4


def test_pushing_phase_progression():
  obj = np.array([1.25, 0.7, 0.3])
  pad = np.array([1.4, 0.9, 0.3])

  class PushEnv(FakeEnv):
    task = 'pushing'

  xs = P.init_expert_state()
  # PRE_PUSH_X: move behind object in -x
  env = PushEnv(grip=[1.0, 0.7, 0.3], obj=obj, pad=pad)
  action, xs = _step(env, xs)
  assert int(xs.phase) == 0
  expect = (obj - np.array([1.0, 0.7, 0.3]) - [0.1, 0, 0]) * 6.0
  np.testing.assert_allclose(np.asarray(action[:3]), expect, atol=1e-5)
  assert float(action[3]) == -1.0  # pushing keeps gripper CLOSED
  # reach pre-push pose -> PUSH_X with target [pad.x, obj.y, obj.z]
  env = PushEnv(grip=obj - [0.1, 0, 0], obj=obj, pad=pad)
  action, xs = _step(env, xs)
  assert int(xs.phase) == 1
  np.testing.assert_allclose(np.asarray(xs.target), [pad[0], obj[1], obj[2]],
                             atol=1e-6)
  # object reaches x-target but y misaligned -> BACKOFF with sign
  obj2 = np.array([pad[0], obj[1], obj[2]])
  env = PushEnv(grip=obj2 - [0.05, 0, 0], obj=obj2, pad=pad)
  action, xs = _step(env, xs)
  assert int(xs.phase) == 2
  assert float(xs.aux[0]) == -1.0  # goal.y > obj.y -> approach from -y side
  # 3 backoff steps with action [-0.6, 0, 0, CLOSE]
  np.testing.assert_allclose(np.asarray(action), [-0.6, 0, 0, -1.0],
                             atol=1e-6)
  for _ in range(2):
    action, xs = _step(env, xs)
  assert int(xs.phase) == 3
  # PRE_PUSH_Y reached -> PUSH_Y with target [obj.x, pad.y, obj.z]
  env = PushEnv(grip=obj2 + [0, -0.1, 0], obj=obj2, pad=pad)
  action, xs = _step(env, xs)
  assert int(xs.phase) == 4
  np.testing.assert_allclose(np.asarray(xs.target),
                             [obj2[0], pad[1], obj2[2]], atol=1e-6)
  # object aligned in y -> IDLE with no-op
  obj3 = np.array([pad[0], pad[1], obj[2]])
  env = PushEnv(grip=obj3 - [0, 0.1, 0], obj=obj3, pad=pad)
  action, xs = _step(env, xs)
  assert int(xs.phase) == 5
  np.testing.assert_allclose(np.asarray(action), [0, 0, 0, 0], atol=1e-6)


def test_pushing_skips_y_phase_when_aligned():
  class PushEnv(FakeEnv):
    task = 'pushing'
  obj = np.array([1.25, 0.9, 0.3])
  pad = np.array([1.4, 0.9005, 0.3])  # already aligned in y
  xs = P.init_expert_state()
  env = PushEnv(grip=obj - [0.1, 0, 0], obj=obj, pad=pad)
  action, xs = _step(env, xs)  # -> PUSH_X
  assert int(xs.phase) == 1
  obj2 = np.array([pad[0], obj[1], obj[2]])
  env = PushEnv(grip=obj2 - [0.05, 0, 0], obj=obj2, pad=pad)
  action, xs = _step(env, xs)
  assert int(xs.phase) == 5  # straight to IDLE
