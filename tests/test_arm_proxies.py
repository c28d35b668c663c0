"""Arm-link collision capsule proxies (core/mjcf.py arm_proxies).

The reference collides the Fetch arm meshes directly (MuJoCo default
contype/conaffinity=1 on fetch-gym.xml link geoms); the TPU model replaces
that with an auto-fitted bounding capsule per distal link, invisible to the
renderer and restricted to robot-vs-world pairs.
"""

import numpy as np
import pytest

from geeco_tpu.core import mjcf
from geeco_tpu.core.mjcf import _fit_capsule_np
from geeco_tpu.core.model import CAPSULE, make_state
from geeco_tpu.physics import collision
from geeco_tpu.physics import kinematics as K
from tests.conftest import reference_xml


def _dist_to_segment(p, a, b):
  ab = b - a
  t = np.clip((p - a) @ ab / max(float(ab @ ab), 1e-12), 0.0, 1.0)
  return np.linalg.norm(p - (a + t * ab))


def test_fit_capsule_bounds_vertices():
  rng = np.random.default_rng(0)
  for _ in range(10):
    # anisotropic cloud with a random principal direction
    scale = rng.uniform(0.02, 0.5, size=3)
    rot = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    verts = rng.normal(size=(40, 3)) * scale @ rot.T + rng.normal(size=3)
    pos, quat, r, hl = _fit_capsule_np(verts)
    axis = mjcf._quat_to_mat_np(quat)[:, 2]
    a, b = pos - hl * axis, pos + hl * axis
    for v in verts:
      assert _dist_to_segment(v, a, b) <= r + 1e-9


@pytest.fixture(scope='module')
def with_proxies():
  return mjcf.load_model(reference_xml('geeco-pad2-cube2.xml'))


@pytest.fixture(scope='module')
def without_proxies():
  return mjcf.load_model(reference_xml('geeco-pad2-cube2.xml'),
                         arm_proxies=False)


def test_proxies_exist_and_are_invisible(with_proxies):
  model, _ = with_proxies
  caps = [g for g, n in enumerate(model.geom_name)
          if n.endswith('__colcap')]
  # distal chain: shoulder_lift .. wrist_roll (6 links; gripper_link is
  # deliberately proxy-free — see core/mjcf.py _ARM_PROXY_LINKS)
  assert len(caps) == 6
  for g in caps:
    assert model.geom_type[g] == CAPSULE
    assert float(model.geom_rgba[g][3]) == 0.0  # renderer skips alpha=0
    assert float(model.geom_size[g][0]) > 0.0


def test_proxy_pairs_robot_vs_world_only(with_proxies):
  model, _ = with_proxies
  prox = {g for g, n in enumerate(model.geom_name)
          if n.endswith('__colcap')}
  robot = {g for g, n in enumerate(model.geom_name) if 'robot0' in n}
  n_proxy_pairs = 0
  for _, pairs in model.col_pairs:
    for g1, g2 in pairs:
      if g1 in prox:
        assert g2 not in robot, (model.geom_name[g1], model.geom_name[g2])
        n_proxy_pairs += 1
      elif g2 in prox:
        assert g1 not in robot, (model.geom_name[g1], model.geom_name[g2])
        n_proxy_pairs += 1
  # every proxy collides at least with the floor plane and the table
  assert n_proxy_pairs >= 2 * len(prox)


def test_proxies_do_not_change_mass(with_proxies, without_proxies):
  m1, _ = with_proxies
  m0, _ = without_proxies
  np.testing.assert_allclose(np.asarray(m1.body_mass),
                             np.asarray(m0.body_mass))
  np.testing.assert_allclose(np.asarray(m1.body_inertia),
                             np.asarray(m0.body_inertia))


def test_no_proxy_contact_at_rest(with_proxies):
  """At qpos0 the arm hangs clear of the table: no proxy row is active."""
  model, _ = with_proxies
  state = make_state(model)
  con = collision.collide(model, K.fk(model, state))
  d = np.asarray(con.dist)
  prox = np.array([n.endswith('__colcap') for n in model.geom_name])
  rows = prox[con.geom1] | prox[con.geom2]
  assert not np.any((d < 0.0) & rows)
