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


@pytest.fixture(scope='module')
def cube_edges(cube_hull):
  hv, hvm, _, _ = cube_hull
  return mjcf.hull_edge_dirs(hv, hvm)


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


def test_cube_edge_dirs(cube_edges):
  he, hem = cube_edges
  # a cube (even with coplanar-facet triangulation diagonals) must keep
  # the three axis directions among its unique edges
  dirs = he[hem > 0.5]
  for axis in np.eye(3):
    assert (np.abs(dirs @ axis) > 0.999).any()


def test_hull_hull_stacked_cubes(cube_hull, cube_edges):
  hv, hvm, hf, hfm = [jnp.asarray(x) for x in cube_hull]
  he, hem = [jnp.asarray(x) for x in cube_edges]
  # second cube on top, overlapping by 0.04
  pos, n, d = C.hull_hull(jnp.zeros(3), IDQ, hv, hvm, hf, hfm, he, hem,
                          jnp.array([0.0, 0.0, 0.16]), IDQ,
                          hv, hvm, hf, hfm, he, hem)
  d = np.asarray(d)
  assert (d[:4] < 0).all() and abs(d.min() + 0.04) < 1e-5
  # normal geom1 -> geom2 = +z for the deepest points
  nz = np.asarray(n)[:4, 2]
  assert (nz > 0.9).all()
  # separated case
  _, _, d_sep = C.hull_hull(jnp.zeros(3), IDQ, hv, hvm, hf, hfm, he, hem,
                            jnp.array([0.0, 0.0, 0.5]), IDQ,
                            hv, hvm, hf, hfm, he, hem)
  assert (np.asarray(d_sep) > 0).all()


def test_box_hull_matches_box_box(cube_hull, cube_edges):
  hv, hvm, hf, hfm = [jnp.asarray(x) for x in cube_hull]
  he, hem = [jnp.asarray(x) for x in cube_edges]
  s = jnp.array([0.1, 0.1, 0.1])
  p2 = jnp.array([0.0, 0.0, 0.17])
  pos_h, n_h, d_h = C.box_hull(jnp.zeros(3), IDQ, s, p2, IDQ,
                               hv, hvm, hf, hfm, he, hem)
  pos_b, n_b, d_b = C.box_box(jnp.zeros(3), IDQ, s, p2, IDQ, s)
  assert abs(float(jnp.min(d_h)) - float(jnp.min(d_b))) < 1e-4


def _axis_quat(deg, axis):
  a = np.radians(deg) / 2
  q = np.zeros(4)
  q[0] = np.cos(a)
  q[1 + axis] = np.sin(a)
  return jnp.asarray(q)


def _beam_hull(half):
  verts = np.array([[sx * half[0], sy * half[1], sz * half[2]]
                    for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                   np.float32)
  hv, hvm, hf, hfm = mjcf.build_hull(verts)
  he, hem = mjcf.hull_edge_dirs(hv, hvm)
  return map(jnp.asarray, (hv, hvm, hf, hfm, he, hem))


def test_hull_hull_edge_edge_cross():
  """Two square beams, each rolled 45 deg about its long axis, crossing
  ridge-over-ridge: the true contact axis +/-z is the cross product of the
  two long-edge directions and is NOT a face normal of either hull, so
  face-only SAT reports a wrong (deeper, tilted) contact.  box_box's
  15-axis SAT is the ground truth."""
  s1 = np.array([0.5, 0.05, 0.05])   # long in x, rolled about x
  s2 = np.array([0.05, 0.5, 0.05])   # long in y, rolled about y
  hv1, hvm1, hf1, hfm1, he1, hem1 = _beam_hull(s1)
  hv2, hvm2, hf2, hfm2, he2, hem2 = _beam_hull(s2)
  q1 = _axis_quat(45.0, 0)
  q2 = _axis_quat(45.0, 1)
  ridge = 0.05 * np.sqrt(2.0)        # ridge height of a rolled beam
  overlap = 0.02
  p2 = jnp.array([0.0, 0.0, 2 * ridge - overlap])
  pos, n, d = C.hull_hull(jnp.zeros(3), q1, hv1, hvm1, hf1, hfm1, he1, hem1,
                          p2, q2, hv2, hvm2, hf2, hfm2, he2, hem2)
  d = np.asarray(d)
  # box_box reference answer for the same configuration
  _, n_b, d_b = C.box_box(jnp.zeros(3), q1, jnp.asarray(s1),
                          p2, q2, jnp.asarray(s2))
  assert float(d.min()) < 0                      # truly penetrating
  assert abs(float(d.min()) + overlap) < 1e-4    # by exactly the overlap
  assert abs(float(d.min()) - float(np.asarray(d_b).min())) < 1e-4
  i = int(np.argmin(d))
  assert abs(float(np.asarray(n)[i, 2])) > 0.99  # +/-z contact normal
  # contact point sits at the ridge crossing (near the origin in x, y)
  assert np.linalg.norm(np.asarray(pos)[i, :2]) < 0.01


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
