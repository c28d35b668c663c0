"""Task CSV generation + reset-spec loading round trip."""

import numpy as np
import pytest

from geeco_tpu.data import tasks as T


class EnvStub:
  obj_joint_names = ('object0:joint', 'object1:joint', 'goal0:joint',
                     'goal1:joint')
  goal_sites = ('goal0', 'goal1')
  cube_sites = ('object0', 'object1')
  obj_sites = ('object0', 'object1', 'goal0', 'goal1')


def test_csv_roundtrip(tmp_path):
  # hand-write a CSV in the reference format (gym_pickplace.py:185-218)
  path = str(tmp_path / 'init.csv')
  joints = list(EnvStub.obj_joint_names) + ['robot0:mocap']
  header = []
  for jn in joints:
    header += [f'{jn}::{f}' for f in
               ('px', 'py', 'pz', 'qw', 'qx', 'qy', 'qz')]
  header += ['task::goal', 'task::object']
  rows = []
  rng = np.random.RandomState(0)
  for i in range(3):
    row = []
    for _ in joints:
      row += list(rng.rand(3)) + [1.0, 0.0, 0.0, 0.0]
    row += ['goal1', 'object0']
    rows.append(row)
  import csv
  with open(path, 'w', newline='') as fp:
    w = csv.writer(fp, delimiter=';')
    w.writerow(header)
    for r in rows:
      w.writerow(r)

  specs = T.load_reset_specs(EnvStub(), path)
  assert specs.obj_qpos.shape == (3, 4, 7)
  assert specs.mocap_qpos.shape == (3, 7)
  assert int(specs.task_goal[0]) == 1
  assert int(specs.task_object[0]) == 0
  # joint alignment: first row object0 px
  np.testing.assert_allclose(float(specs.obj_qpos[0, 0, 0]),
                             rows[0][0], rtol=1e-6)


def test_generated_csv_loads(tmp_path):
  header, rows = T.generate_tasks('pad2-cube2', 5, seed=1)
  path = str(tmp_path / 'gen.csv')
  T.write_task_csv(path, header, rows)
  # generated CSV must parse back through the loader with the real env's
  # joint naming (stub matches pad2-cube2 structure)
  specs = T.load_reset_specs(EnvStub(), path)
  assert specs.obj_qpos.shape[0] == 5
  # spawn positions inside the pad2-cube2 workspace
  xy = np.asarray(specs.obj_qpos[:, :, :2]).reshape(-1, 2)
  assert (xy[:, 0] > 1.0).all() and (xy[:, 0] < 1.6).all()
  assert (xy[:, 1] > 0.3).all() and (xy[:, 1] < 1.2).all()
  # distinct spawn cells per row
  first = np.asarray(specs.obj_qpos[0, :, :2])
  assert len({tuple(p) for p in first.round(4).tolist()}) == 4
