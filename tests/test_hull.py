"""Convex-hull narrowphase tests (mesh collision kernels).

Reference behaviors covered: mesh task objects (nut/ball/bridge/diamond)
must collide with the plane/table, boxes (gripper fingers, pads) and each
other (SURVEY.md §2.22: geeco-nut-cone.xml multi-convex bodies).
"""

from tests.conftest import reference_xml
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.core import mjcf
from geeco_tpu.physics import collision as C

IDQ = jnp.array([1.0, 0.0, 0.0, 0.0])


def cube_cloud(half=0.1, n=200, seed=0):
  """Point cloud filling a cube (hull must recover the 8 corners)."""
  rng = np.random.RandomState(seed)
  pts = rng.uniform(-half, half, (n, 3))
  corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                      for sz in (-1, 1)]) * half
  return np.concatenate([pts, corners]).astype(np.float32)


@pytest.fixture(scope='module')
def cube_hull():
  return mjcf.build_hull(cube_cloud())


def test_build_hull_cube(cube_hull):
  hv, hvm, hf, hfm = cube_hull
  assert int(hvm.sum()) == 8
  assert int(hfm.sum()) == 6
  # face offsets are the half size
  offs = hf[hfm > 0.5, 3]
  np.testing.assert_allclose(offs, 0.1, atol=1e-5)


def test_plane_hull_depth(cube_hull):
  hv, hvm, hf, hfm = cube_hull
  # hull center 0.05 above plane -> bottom corners 0.05 below it
  pos, n, d = C.plane_hull(jnp.zeros(3), IDQ, jnp.zeros(3),
                           jnp.array([0.0, 0.0, 0.05]), IDQ,
                           jnp.asarray(hv), jnp.asarray(hvm))
  d = np.asarray(d)
  assert d.shape == (4,)
  np.testing.assert_allclose(d, -0.05, atol=1e-5)
  np.testing.assert_allclose(np.asarray(n), [[0, 0, 1]] * 4, atol=1e-6)


def test_sphere_hull_outside_inside(cube_hull):
  _, _, hf, hfm = cube_hull
  hf, hfm = jnp.asarray(hf), jnp.asarray(hfm)
  # sphere r=0.05 centered 0.3 above the hull -> separated by 0.15
  pos, n, d = C.sphere_hull(jnp.array([0.0, 0.0, 0.3]), IDQ,
                            jnp.array([0.05, 0, 0]),
                            jnp.zeros(3), IDQ, hf, hfm)
  assert abs(float(d[0]) - 0.15) < 1e-5
  # normal points sphere -> hull (downward)
  assert float(n[0, 2]) < -0.9
  # overlapping: center at z=0.12 -> phi=0.02, d = 0.02 - 0.05 = -0.03
  _, _, d2 = C.sphere_hull(jnp.array([0.0, 0.0, 0.12]), IDQ,
                           jnp.array([0.05, 0, 0]),
                           jnp.zeros(3), IDQ, hf, hfm)
  assert abs(float(d2[0]) + 0.03) < 1e-5


def test_hull_hull_stacked_cubes(cube_hull):
  hv, hvm, hf, hfm = [jnp.asarray(x) for x in cube_hull]
  # second cube on top, overlapping by 0.04
  pos, n, d = C.hull_hull(jnp.zeros(3), IDQ, hv, hvm, hf, hfm,
                          jnp.array([0.0, 0.0, 0.16]), IDQ,
                          hv, hvm, hf, hfm)
  d = np.asarray(d)
  assert (d[:4] < 0).all() and abs(d.min() + 0.04) < 1e-5
  # normal geom1 -> geom2 = +z for the deepest points
  nz = np.asarray(n)[:4, 2]
  assert (nz > 0.9).all()
  # separated case
  _, _, d_sep = C.hull_hull(jnp.zeros(3), IDQ, hv, hvm, hf, hfm,
                            jnp.array([0.0, 0.0, 0.5]), IDQ,
                            hv, hvm, hf, hfm)
  assert (np.asarray(d_sep) > 0).all()


def test_box_hull_matches_box_box(cube_hull):
  hv, hvm, hf, hfm = [jnp.asarray(x) for x in cube_hull]
  s = jnp.array([0.1, 0.1, 0.1])
  p2 = jnp.array([0.0, 0.0, 0.17])
  pos_h, n_h, d_h = C.box_hull(jnp.zeros(3), IDQ, s, p2, IDQ,
                               hv, hvm, hf, hfm)
  pos_b, n_b, d_b = C.box_box(jnp.zeros(3), IDQ, s, p2, IDQ, s)
  assert abs(float(jnp.min(d_h)) - float(jnp.min(d_b))) < 1e-4


def test_mesh_scene_pairs_and_contacts():
  m, a = mjcf.load_model(
      reference_xml('geeco-nut-cone.xml'))
  keys = [k for k, _ in m.col_pairs]
  from geeco_tpu.core.model import MESH, PLANE
  assert (PLANE, MESH) in keys and (MESH, MESH) in keys
  assert m.hull_vert.shape[0] > 0
  # contacts evaluate finite on the reference pose
  from geeco_tpu.core.model import make_state
  from geeco_tpu.physics import kinematics as K
  state = make_state(m)
  kin = K.fk(m, state)
  con = C.collide(m, kin)
  assert np.isfinite(np.asarray(con.dist)).all()
  assert np.isfinite(np.asarray(con.pos)).all()
