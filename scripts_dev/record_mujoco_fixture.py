"""Record golden expert trajectories with REAL MuJoCo for the replay gate.

BASELINE.md's fidelity gate: "recorded MuJoCo expert trajectories must
replay to task success" in the new engine (reference replay mechanism:
scripts/gym_pickplace.py:765-794).  This script drives the vendored
scenes with the `mujoco` package (3.x) using the same env-step semantics
the reference gym envs use (ctrl_set_action + mocap_set_action +
20 substeps; src/geeco_gym/pickplace.py:342-376, pushing.py:327-361) and
the same scripted expert FSMs (pick: gym_pickplace.py:369-563; push:
gym_pushing.py:250-443 constants), then saves the per-step command buffer
+ initial state as a committed test fixture.

Run:  python scripts_dev/record_mujoco_fixture.py [out.npz] [shapes]
      (shapes: pad2-cube2 | push-pad2-cube2 | pad2-cube2-clutter4)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mujoco  # noqa: E402

from geeco_tpu.envs.base import (ASSET_ROOT, EE_QUAT, GRIPPER_CTRL,  # noqa: E402
                                 GOAL_VICINITY, MODEL_XML)

# expert constants (gym_pickplace.py:140-151)
OFFSET_HEIGHT_PRE_GRASP = 0.05
DIST_PRE_GRASP = 0.005
DIST_GRASP = 0.002
DIST_ON_TOP = 0.175
DIST_GOAL = 0.01
MULT = 6.0
OPEN, CLOSE = 1.0, -1.0

N_SUBSTEPS = 20
EPISODE_STEPS = 100

PICK_JOINTS = ('object0:joint', 'object1:joint', 'goal0:joint',
               'goal1:joint')
# free-joint order must match GeecoEnv.obj_joint_names (envs/base.py)
OBJ_JOINTS_BY_SHAPES = {
    'pad2-cube2': PICK_JOINTS,
    'push-pad2-cube2': PICK_JOINTS,
    'pad2-cube2-clutter4': PICK_JOINTS + tuple(
        f'clutter{i}:joint' for i in range(4)),
    'nut-cone': PICK_JOINTS,
    'ball-cup': PICK_JOINTS,
}


class MjEnv:
  """Minimal mujoco driver reproducing the reference env-step contract."""

  def __init__(self, shapes='pad2-cube2'):
    xml = os.path.join(ASSET_ROOT, 'envs', MODEL_XML[shapes])
    self.m = mujoco.MjModel.from_xml_path(xml)
    self.d = mujoco.MjData(self.m)
    self.grip_site = self.m.site('robot0:grip').id
    self.gripper_body = self.m.body('robot0:gripper_link').id
    self.actuator_jnt = [self.m.actuator(i).trnid[0]
                         for i in range(self.m.nu)]

  def jnt_qpos_idx(self, name):
    return self.m.joint(name).qposadr[0]

  def set_joint_qpos(self, name, val):
    adr = self.m.joint(name).qposadr[0]
    n = np.size(val)
    self.d.qpos[adr:adr + n] = val

  def get_joint_qpos(self, name):
    j = self.m.joint(name)
    n = 7 if j.type[0] == mujoco.mjtJoint.mjJNT_FREE else 1
    return self.d.qpos[j.qposadr[0]:j.qposadr[0] + n].copy()

  def forward(self):
    mujoco.mj_forward(self.m, self.d)

  def substeps(self):
    for _ in range(N_SUBSTEPS):
      mujoco.mj_step(self.m, self.d)

  def setup(self):
    """Reference _env_setup (pickplace.py:532-583)."""
    for name, val in (('robot0:slide0', 0.405), ('robot0:slide1', 0.48),
                      ('robot0:slide2', 0.0)):
      self.set_joint_qpos(name, val)
    # reset_mocap_welds (gym robotics utils): identity relpose so the weld
    # pins the gripper exactly to the mocap pose.  mujoco 3 weld eq_data
    # layout: anchor[0:3], relpose pos[3:6] quat[6:10], torquescale[10].
    for i in range(self.m.neq):
      if self.m.eq_type[i] == mujoco.mjtEq.mjEQ_WELD:
        self.m.eq_data[i, :10] = np.array([0, 0, 0, 0, 0, 0, 1, 0, 0, 0],
                                          np.float64)
    self.forward()
    grip0 = self.d.site_xpos[self.grip_site].copy()
    target = grip0 + np.array([-0.498, 0.005, -0.431 + 0.2])
    self.d.mocap_pos[0] = target
    self.d.mocap_quat[0] = EE_QUAT
    for _ in range(10):
      self.substeps()
    self.forward()

  def step(self, action):
    """Reference _set_action + n_substeps (pickplace.py:326-376).

    Clip at execution: gym 0.18 robotics RobotEnv.step clips the action
    to [-1, 1] before _set_action; recorded cmds stay raw (the caller
    appends the unclipped action to cmds first)."""
    action = np.clip(np.asarray(action, np.float64), -1.0, 1.0)
    pos_ctrl = action[:3] * 0.05
    cmd_grp = int(np.rint(action[3]))
    g = GRIPPER_CTRL[-1 if cmd_grp < 0 else (1 if cmd_grp > 0 else 0)]
    # ctrl_set_action: position servos target current qpos + delta
    for i, j in enumerate(self.actuator_jnt):
      adr = self.m.jnt_qposadr[j]
      self.d.ctrl[i] = self.d.qpos[adr] + g
    # mocap_set_action: snap to welded body pose, then displace
    self.d.mocap_pos[0] = self.d.xpos[self.gripper_body] + pos_ctrl
    q = self.d.xquat[self.gripper_body] + np.array([1.0, 0, 1.0, 0])
    self.d.mocap_quat[0] = q / np.linalg.norm(q)
    self.substeps()
    self.forward()

  def site_pos(self, name):
    return self.d.site_xpos[self.m.site(name).id].copy()


def run_expert(env, task_object='object0', task_goal='goal0'):
  """Sequential pick&place FSM (gym_pickplace.py:369-563)."""
  cmds, qpos_trace = [], []
  phase, target, aux = 0, None, None
  for _ in range(EPISODE_STEPS):
    grip = env.site_pos('robot0:grip')
    obj = env.site_pos(task_object)
    pad = env.site_pos(task_goal)
    pre_grasp_vec = obj - grip + np.array([0, 0, OFFSET_HEIGHT_PRE_GRASP])
    grasp_vec = obj - grip
    if phase == 0 and np.linalg.norm(pre_grasp_vec) < DIST_PRE_GRASP:
      phase = 1
    if phase == 1 and np.linalg.norm(grasp_vec) < DIST_GRASP:
      aux = grip + np.array([0, 0, OFFSET_HEIGHT_PRE_GRASP])
      phase = 2
    if phase == 2 and np.linalg.norm(aux - grip) < DIST_PRE_GRASP:
      target = pad + np.array([0, 0, DIST_ON_TOP])
      phase = 3
    if phase == 3 and np.linalg.norm(target - obj) < DIST_GOAL:
      phase = 4
    if phase == 0:
      action = np.concatenate([pre_grasp_vec * MULT, [OPEN]])
    elif phase == 1:
      action = np.concatenate([grasp_vec * MULT, [CLOSE]])
    elif phase == 2:
      action = np.concatenate([(aux - grip) * MULT, [CLOSE]])
    elif phase == 3:
      action = np.concatenate([(target - obj) * MULT, [CLOSE]])
    else:
      action = np.array([0.0, 0.0, OFFSET_HEIGHT_PRE_GRASP / 2, OPEN])
    cmds.append(action.astype(np.float32))
    env.step(action)
    qpos_trace.append(env.d.qpos.copy().astype(np.float32))
  return np.stack(cmds), np.stack(qpos_trace)


# pushing constants (gym_pushing.py:127-133)
OFFSET_PRE_PUSH = 0.1
DIST_PRE_PUSH = 0.015
NOOP = 0.0


def run_push_expert(env, task_object='object0', task_goal='goal0'):
  """Sequential pushing FSM (gym_pushing.py:250-443): push the object
  along x onto the pad column, back off, then push along y."""
  cmds, qpos_trace = [], []
  phase, target, sign, goal_y, count = 0, None, 1.0, 0.0, 0
  for _ in range(EPISODE_STEPS):
    grip = env.site_pos('robot0:grip')
    obj = env.site_pos(task_object)
    pad = env.site_pos(task_goal)
    pre_x_vec = obj - grip - np.array([OFFSET_PRE_PUSH, 0.0, 0.0])
    if phase == 0 and np.linalg.norm(pre_x_vec) < DIST_PRE_PUSH:
      target = np.array([pad[0], obj[1], obj[2]])   # gym_pushing.py:286-288
      phase = 1
    if phase == 1 and np.linalg.norm(target - obj) < DIST_GOAL:
      if abs(pad[1] - obj[1]) < DIST_GOAL:          # gym_pushing.py:421
        phase = 5
      else:
        sign = -1.0 if pad[1] - obj[1] > 0 else 1.0  # gym_pushing.py:316-319
        goal_y, count, phase = pad[1], 0, 2
    if phase == 2:
      count += 1
      if count >= 3:
        phase = 3
    pre_y_vec = obj - grip + np.array([0.0, sign * OFFSET_PRE_PUSH, 0.0])
    if phase == 3 and np.linalg.norm(pre_y_vec) < DIST_PRE_PUSH:
      target = np.array([obj[0], goal_y, obj[2]])   # gym_pushing.py:361-363
      phase = 4
    if phase == 4 and np.linalg.norm(target - obj) < DIST_GOAL:
      phase = 5
    if phase == 0:
      action = np.concatenate([pre_x_vec * MULT, [CLOSE]])
    elif phase in (1, 4):
      action = np.concatenate([(target - obj) * MULT, [CLOSE]])
    elif phase == 2:
      action = np.array([-OFFSET_PRE_PUSH * MULT, 0.0, 0.0, CLOSE])
    elif phase == 3:
      action = np.concatenate([pre_y_vec * MULT, [CLOSE]])
    else:
      action = np.array([0.0, 0.0, 0.0, NOOP])
    cmds.append(action.astype(np.float32))
    env.step(action)
    qpos_trace.append(env.d.qpos.copy().astype(np.float32))
  return np.stack(cmds), np.stack(qpos_trace)


# robot reset anchor (pickplace.py:57, pushing.py:450)
ROBOT_XPOS0 = {'pad2-cube2': None,           # setup() already parks there
               'pad2-cube2-clutter4': None,
               'nut-cone': None,
               'ball-cup': None,
               'push-pad2-cube2': np.array([1.3419, 0.7491, 0.8])}

# fixed in-grid spawn positions per scene (envs/base.py SPAWN_DIMS cells;
# push goal pads get the +0.125 x offset, pushing.py:434-436)
SPAWN_XY = {
    'pad2-cube2': {
        'object0:joint': (1.30, 0.62), 'object1:joint': (1.22, 0.92),
        'goal0:joint': (1.42, 0.72), 'goal1:joint': (1.34, 0.95),
    },
    'push-pad2-cube2': {
        'object0:joint': (1.23125, 0.75), 'object1:joint': (1.34375, 0.5833),
        'goal0:joint': (1.35625, 0.9167), 'goal1:joint': (1.46875, 0.75),
    },
    # nut-cone: 3x6 grid cells; nuts = object0/1, cones = goal0/1
    'nut-cone': {
        'object0:joint': (1.25, 0.55), 'object1:joint': (1.1333, 0.8167),
        'goal0:joint': (1.3667, 0.6833), 'goal1:joint': (1.25, 0.95),
    },
    # ball-cup: same 3x6 grid as nut-cone; balls = object0/1, cups = goal0/1
    'ball-cup': {
        'object0:joint': (1.25, 0.55), 'object1:joint': (1.1333, 0.8167),
        'goal0:joint': (1.3667, 0.6833), 'goal1:joint': (1.25, 0.95),
    },
    # clutter4: 4x7 grid cells (envs/base.py SPAWN_DIMS), distinct cells
    'pad2-cube2-clutter4': {
        'object0:joint': (1.20625, 0.5214), 'object1:joint': (1.11875, 0.8643),
        'goal0:joint': (1.38125, 0.75), 'goal1:joint': (1.29375, 1.0929),
        'clutter0:joint': (1.11875, 0.4071), 'clutter1:joint': (1.29375, 0.6357),
        'clutter2:joint': (1.38125, 0.9786), 'clutter3:joint': (1.20625, 0.8643),
    },
}


def main(out_path, shapes='pad2-cube2', seed=0):
  rng = np.random.RandomState(seed)
  pushing = shapes.startswith('push')
  env = MjEnv(shapes)
  env.setup()
  if ROBOT_XPOS0[shapes] is not None:
    # reset parks the mocap at the task's EE anchor (pushing.py:450)
    env.d.mocap_pos[0] = ROBOT_XPOS0[shapes]
    env.d.mocap_quat[0] = EE_QUAT
    env.d.qvel[:] = 0
    for _ in range(10):
      env.substeps()
    env.forward()

  # spawn: fixed in-grid positions (workspace grids, envs/spawn.py)
  spawn_z = 0.27 + (0.025 if pushing else 0.037)
  spawn_xy = SPAWN_XY[shapes]
  for name, (x, y) in spawn_xy.items():
    x += rng.uniform(-0.01, 0.01)
    y += rng.uniform(-0.01, 0.01)
    env.set_joint_qpos(name, [x, y, spawn_z, 1, 0, 0, 0])
  env.d.qvel[:] = 0
  # EE start: exact initial gripper position (sphere radius 0 for
  # fixture determinism; reference samples r=0.03 around it)
  env.forward()
  for _ in range(10):
    env.substeps()
  env.forward()

  # frame-0 state AFTER settle (what the reference replay buffer stores)
  obj_joints = OBJ_JOINTS_BY_SHAPES[shapes]
  init_obj_qpos = np.stack([env.get_joint_qpos(j) for j in obj_joints])
  init_mocap = np.concatenate([env.d.mocap_pos[0], env.d.mocap_quat[0]])
  init_qpos = env.d.qpos.copy()

  cmds, qpos_trace = (run_push_expert(env) if pushing else run_expert(env))
  # per-joint object position trace (engine-agnostic drift metric: qpos
  # layouts match only joint-by-joint)
  obj_pos_trace = np.stack(
      [[q[env.jnt_qpos_idx(j):env.jnt_qpos_idx(j) + 3] for j in obj_joints]
       for q in qpos_trace])  # [T, n_obj, 3]

  obj = env.site_pos('object0')
  goal = env.site_pos('goal0')
  dist = float(np.linalg.norm(obj - goal))
  success = dist <= GOAL_VICINITY
  print(f'mujoco {mujoco.__version__} {shapes} expert episode: final '
        f'obj-goal dist {dist:.4f} success={success}')
  if not success:
    print('WARNING: mujoco episode did not succeed; fixture not saved')
    return 1

  np.savez_compressed(
      out_path,
      mujoco_version=np.str_(mujoco.__version__),
      shapes=np.str_(shapes),
      task_object=np.str_('object0'),
      task_goal=np.str_('goal0'),
      obj_joint_names=np.asarray(obj_joints),
      init_obj_qpos=init_obj_qpos.astype(np.float32),
      init_mocap_qpos=init_mocap.astype(np.float32),
      init_qpos=init_qpos.astype(np.float32),
      cmds=cmds,
      qpos_trace=qpos_trace,
      obj_pos_trace=obj_pos_trace.astype(np.float32),
      final_goal_dist=np.float32(dist),
  )
  print('saved', out_path)
  return 0


if __name__ == '__main__':
  shapes = sys.argv[2] if len(sys.argv) > 2 else 'pad2-cube2'
  default_name = ('mujoco_pushing_pushpad2cube2.npz'
                  if shapes.startswith('push')
                  else 'mujoco_pickplace_pad2cube2.npz')
  out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
      os.path.dirname(os.path.abspath(__file__)), '..', 'tests', 'fixtures',
      default_name)
  os.makedirs(os.path.dirname(out), exist_ok=True)
  raise SystemExit(main(out, shapes))
