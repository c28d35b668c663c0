"""Narrowphase kernel unit tests against analytic configurations."""

import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.physics import collision as C

I4 = jnp.array([1.0, 0.0, 0.0, 0.0])


def _q(axis, angle):
  axis = np.asarray(axis, np.float64)
  axis = axis / np.linalg.norm(axis)
  return jnp.asarray(np.concatenate([[np.cos(angle / 2)],
                                     np.sin(angle / 2) * axis]), jnp.float32)


def test_plane_sphere():
  pos, n, d = C.plane_sphere(jnp.zeros(3), I4, jnp.zeros(3),
                             jnp.array([0.0, 0, 0.5]),
                             I4, jnp.array([0.2, 0, 0]), C.SPHERE)
  assert float(d[0]) == pytest.approx(0.3, abs=1e-6)
  np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-6)
  # penetrating
  _, _, d2 = C.plane_sphere(jnp.zeros(3), I4, jnp.zeros(3),
                            jnp.array([0.0, 0, 0.1]),
                            I4, jnp.array([0.2, 0, 0]), C.SPHERE)
  assert float(d2[0]) == pytest.approx(-0.1, abs=1e-6)


def test_plane_box_corners():
  pos, n, d = C.plane_box(jnp.zeros(3), I4, jnp.zeros(3),
                          jnp.array([0.0, 0, 0.05]), I4,
                          jnp.array([0.1, 0.1, 0.1]))
  d = np.sort(np.asarray(d))
  # four bottom corners at -0.05, four top at +0.15
  np.testing.assert_allclose(d[:4], -0.05, atol=1e-6)
  np.testing.assert_allclose(d[4:], 0.15, atol=1e-6)


def test_sphere_sphere():
  pos, n, d = C.sphere_sphere(jnp.zeros(3), I4, jnp.array([0.1, 0, 0]),
                              jnp.array([0.25, 0, 0.0]), I4,
                              jnp.array([0.1, 0, 0]))
  assert float(d[0]) == pytest.approx(0.05, abs=1e-6)
  np.testing.assert_allclose(np.asarray(n[0]), [1, 0, 0], atol=1e-6)
  # contact point midway in the gap
  np.testing.assert_allclose(np.asarray(pos[0]), [0.125, 0, 0], atol=1e-5)


def test_sphere_box_outside_and_inside():
  # sphere left of the box face
  pos, n, d = C.sphere_box(jnp.array([-0.3, 0, 0.0]), I4,
                           jnp.array([0.1, 0, 0]),
                           jnp.zeros(3), I4, jnp.array([0.1, 0.1, 0.1]))
  assert float(d[0]) == pytest.approx(0.1, abs=1e-5)
  # normal points sphere -> box (+x)
  np.testing.assert_allclose(np.asarray(n[0]), [1, 0, 0], atol=1e-5)
  # overlapping
  _, _, d2 = C.sphere_box(jnp.array([-0.15, 0, 0.0]), I4,
                          jnp.array([0.1, 0, 0]),
                          jnp.zeros(3), I4, jnp.array([0.1, 0.1, 0.1]))
  assert float(d2[0]) == pytest.approx(-0.05, abs=1e-5)


def test_capsule_capsule_crossed():
  # capsule along z (segment to z=0.3); capsule along x at z=0.45:
  # segment distance 0.15, radii 0.1 each -> overlap d = -0.05
  qx = _q([0, 1, 0], np.pi / 2)  # rotate z-axis to x-axis
  pos, n, d = C.capsule_capsule(
      jnp.zeros(3), I4, jnp.array([0.1, 0.3, 0]),
      jnp.array([0.0, 0, 0.45]), qx, jnp.array([0.1, 0.3, 0]))
  assert float(d[0]) == pytest.approx(-0.05, abs=1e-5)
  np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-4)


def test_box_box_face_contact():
  # upper box resting 1mm into the lower
  pos, n, d = C.box_box(
      jnp.zeros(3), I4, jnp.array([0.1, 0.1, 0.1]),
      jnp.array([0.0, 0, 0.199]), I4, jnp.array([0.1, 0.1, 0.1]))
  d = np.asarray(d)
  n = np.asarray(n)
  active = d < 0
  assert active.sum() >= 4, d
  np.testing.assert_allclose(d[active], -0.001, atol=1e-4)
  np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-5)


def test_box_box_separated():
  _, _, d = C.box_box(
      jnp.zeros(3), I4, jnp.array([0.1, 0.1, 0.1]),
      jnp.array([0.0, 0, 0.5]), I4, jnp.array([0.1, 0.1, 0.1]))
  assert (np.asarray(d) > 0).all()


def test_box_box_rotated_45():
  # 45-degree rotated box resting on flat box: edge contact, normal +z
  q45 = _q([0, 0, 1], np.pi / 4)
  pos, n, d = C.box_box(
      jnp.zeros(3), I4, jnp.array([0.2, 0.2, 0.1]),
      jnp.array([0.0, 0, 0.198]), q45, jnp.array([0.1, 0.1, 0.1]))
  d = np.asarray(d)
  assert (d < 0).sum() >= 1
  np.testing.assert_allclose(np.abs(np.asarray(n[0])), [0, 0, 1], atol=1e-4)


def test_plane_ellipsoid():
  # ellipsoid with semi-axes (0.1, 0.2, 0.3) centered at z=0.25: support
  # along -z reaches 0.25 - 0.3 = -0.05
  pos, n, d = C.plane_ellipsoid(
      jnp.zeros(3), I4, jnp.zeros(3),
      jnp.array([0.0, 0, 0.25]), I4, jnp.array([0.1, 0.2, 0.3]))
  assert float(d[0]) == pytest.approx(-0.05, abs=1e-5)


def test_plane_cylinder_standing_and_lying():
  s = jnp.array([0.1, 0.3, 0.0])  # r=0.1, half-len=0.3
  # standing upright, base at z=0.05: flat end rests 0.05 above the plane
  pos, n, d = C.plane_cylinder(jnp.zeros(3), I4, jnp.zeros(3),
                               jnp.array([0.0, 0.0, 0.35]), I4, s)
  d = np.asarray(d)
  # tripod on the bottom rim all at the same height (a capsule
  # approximation would report 0.35 - 0.3 - 0.1 = -0.05 instead)
  assert sorted(d)[:3] == pytest.approx([0.05] * 3, abs=1e-6)
  # lying on its side, center at z=0.08: penetrates by 0.02
  q = _q([1, 0, 0], np.pi / 2)
  _, _, d2 = C.plane_cylinder(jnp.zeros(3), I4, jnp.zeros(3),
                              jnp.array([0.0, 0.0, 0.08]), q, s)
  d2 = np.asarray(d2)
  # both end rim points touch the plane at the same depth (line contact)
  assert sorted(d2)[:2] == pytest.approx([-0.02, -0.02], abs=1e-6)


def test_box_box_edge_edge_cross():
  """Ridge-over-ridge crossing: the contact axis is a cross product of
  edge directions, and no corner lies near the contact."""
  s = jnp.array([0.5, 0.05, 0.05])
  s2 = jnp.array([0.05, 0.5, 0.05])
  q1 = _q([1, 0, 0], np.pi / 4)
  q2 = _q([0, 1, 0], np.pi / 4)
  ridge = 0.05 * np.sqrt(2.0)
  p2 = jnp.array([0.0, 0.0, 2 * ridge - 0.02])
  pos, n, d = C.box_box(jnp.zeros(3), q1, s, p2, q2, s2)
  d = np.asarray(d)
  assert float(d.min()) == pytest.approx(-0.02, abs=1e-4)
  i = int(np.argmin(d))
  assert abs(float(np.asarray(n)[i, 2])) > 0.99
  assert np.linalg.norm(np.asarray(pos)[i, :2]) < 0.01


def test_ellipsoid_box_support_correction():
  """A flat ellipsoid resting on a box face must rest at its support
  radius along the face normal, not at its min semi-axis."""
  from geeco_tpu.core import mjcf as M
  from geeco_tpu.core.model import make_state
  from geeco_tpu.physics import kinematics as K
  import textwrap, tempfile, os
  xml = textwrap.dedent("""
    <mujoco>
      <worldbody>
        <body name="table"><geom type="box" size="1 1 0.1" pos="0 0 0"/></body>
        <body name="e" pos="0 0 0.35">
          <joint type="free"/>
          <geom type="ellipsoid" size="0.05 0.08 0.3"/>
        </body>
      </worldbody>
    </mujoco>""")
  with tempfile.TemporaryDirectory() as td:
    fp = os.path.join(td, 's.xml')
    open(fp, 'w').write(xml)
    m, _ = M.load_model(fp)
  state = make_state(m)
  con = C.collide(m, K.fk(m, state))
  d = np.asarray(con.dist)
  # box top z=0.1, ellipsoid bottom z=0.35-0.3=0.05: penetrating by 0.05.
  # The min-radius bounding sphere (r=0.05) would report a +0.20 gap.
  assert float(d.min()) == pytest.approx(-0.05, abs=1e-3)
