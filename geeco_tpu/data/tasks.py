"""Task-initialization CSV generation and loading.

Library port of the reference notebook ``dataset-create_tasks.ipynb``
(SURVEY.md §2.18): sample non-colliding object spawn tuples on the
workspace grid, cross with goal x object task permutations, randomize the
gripper start within a small sphere, and export ``init-<scenario>.csv``.

CSV format parity (consumed by _load_reset_queue_v2,
scripts/gym_pickplace.py:185-218):
  header: '<jnt>::px;<jnt>::py;...;<jnt>::qz' x joints ';task::goal;task::object'
  joint order: object joints first, robot mocap LAST (the loader treats the
  last joint group as the robot).
"""

from __future__ import annotations

import csv
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..envs import base as envbase
from ..envs.spawn import compute_grid

_QPOS_FIELDS = ('px', 'py', 'pz', 'qw', 'qx', 'qy', 'qz')


def generate_tasks(shapes: str, num_tasks: int, seed: int = 0,
                   goal_names: Optional[Sequence[str]] = None,
                   object_names: Optional[Sequence[str]] = None
                   ) -> Tuple[List[str], List[List]]:
  """Sample task init rows. Returns (header, rows)."""
  rng = np.random.RandomState(seed)
  mmx, mmy, tiling, goal_off = envbase.SPAWN_DIMS[shapes]
  grid = compute_grid(mmx, mmy, tiling)
  task = 'pushing' if shapes.startswith('push') else 'pickplace'
  z = 0.27 + (0.025 if task == 'pushing' else 0.037)
  robot0 = (envbase.ROBOT_XPOS0_PUSH if task == 'pushing'
            else envbase.ROBOT_XPOS0_PICK)

  env = envbase.GeecoEnv(shapes=shapes, settle_steps=0)
  obj_sites = env.obj_sites
  goal_names = list(goal_names or env.goal_sites)
  object_names = list(object_names or env.cube_sites)

  joint_names = [f'{n}:joint' for n in obj_sites] + ['robot0:mocap']
  header = []
  for jn in joint_names:
    header += [f'{jn}::{f}' for f in _QPOS_FIELDS]
  header += ['task::goal', 'task::object']

  rows = []
  combos = [(g, o) for g in goal_names for o in object_names]
  for i in range(num_tasks):
    idx = rng.choice(len(grid), len(obj_sites), replace=False)
    row = []
    for k, name in enumerate(obj_sites):
      x, y = grid[idx[k]]
      if goal_off and name.startswith('goal'):
        x += goal_off
      row += [x, y, z, 1.0, 0.0, 0.0, 0.0]
    # gripper start: ROBOT_XPOS0 + point within sphere r=0.03
    u = rng.uniform(0, 0.03)
    d = rng.normal(size=3)
    d /= max(np.linalg.norm(d), 1e-9)
    gp = robot0 + d * np.cbrt(u) * np.cbrt(0.03) ** 0  # radius-scaled dir
    gp = robot0 + d * np.cbrt(u)
    row += [gp[0], gp[1], gp[2], 1.0, 0.0, 1.0, 0.0]
    g, o = combos[i % len(combos)]
    row += [g, o]
    rows.append(row)
  return header, rows


def write_task_csv(path: str, header: List[str], rows: List[List]):
  os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
  with open(path, 'w', newline='') as fp:
    w = csv.writer(fp, delimiter=';')
    w.writerow(header)
    for r in rows:
      w.writerow(r)


def load_reset_specs(env, csv_path: str, start_idx: int = 0,
                     end_idx: int = 10 ** 9):
  """Parse an init CSV into a stacked batch of ResetSpec arrays.

  Functional equivalent of _load_reset_queue_v2
  (scripts/gym_pickplace.py:185-218).
  """
  import jax.numpy as jnp
  from ..envs.base import ResetSpec
  with open(csv_path) as fp:
    reader = csv.reader(fp, delimiter=';')
    rows = list(reader)
  header, rows = rows[0], rows[1:end_idx + 1 if end_idx < 10 ** 9 else None]
  state_header = header[:-2]
  num_joints = len(state_header) // 7
  joint_names = [state_header[i * 7].split('::')[0]
                 for i in range(num_joints)]
  obj_joint_names = joint_names[:-1]

  specs = []
  for i, row in enumerate(rows):
    if i < start_idx or i >= end_idx:
      continue
    vals = np.asarray([float(e) for e in row[:-2]], np.float32)
    qpos_list = vals.reshape(num_joints, 7)
    by_name = dict(zip(joint_names, qpos_list))
    obj_qpos = np.stack([by_name[jn] for jn in env.obj_joint_names])
    mocap = qpos_list[-1]
    goals = row[-2].split(',')
    objects = row[-1].split(',')
    specs.append(ResetSpec(
        obj_qpos=obj_qpos,
        mocap_qpos=mocap,
        task_goal=np.int32(env.goal_sites.index(goals[0])),
        task_object=np.int32(env.cube_sites.index(objects[0])),
    ))
  import jax
  return jax.tree.map(lambda *xs: jnp.stack(xs), *specs)
