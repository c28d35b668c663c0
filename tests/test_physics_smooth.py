"""Smooth-dynamics unit tests against analytic cases."""

from tests.conftest import reference_xml
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.core import mjcf
from geeco_tpu.core.model import make_state
from geeco_tpu.physics import dynamics as D
from geeco_tpu.physics import kinematics as K


def _load(tmp_path, xml: str):
  p = tmp_path / 'scene.xml'
  p.write_text(xml)
  return mjcf.load_model(str(p))


PENDULUM = """
<mujoco>
  <option timestep="0.001" density="0"/>
  <worldbody>
    <body name="pole" pos="0 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0" pos="0 0 0"/>
      <geom type="sphere" size="0.05" pos="0 0 -0.5" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""

FREE_BOX = """
<mujoco>
  <option timestep="0.002" density="0"/>
  <worldbody>
    <body name="box" pos="0.1 0.2 1.0">
      <joint name="box:joint" type="free"/>
      <geom type="box" size="0.05 0.05 0.05" mass="2"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_fk_pendulum(tmp_path):
  model, _ = _load(tmp_path, PENDULUM)
  state = make_state(model)
  # at qpos=0 the sphere sits at (0, 0, 0.5) world
  kin = K.fk(model, state)
  b = model.body('pole')
  np.testing.assert_allclose(np.asarray(kin.xpos[b]), [0, 0, 1], atol=1e-6)
  g = model.geom_name.index('geom0')
  np.testing.assert_allclose(np.asarray(kin.geom_xpos[g]), [0, 0, 0.5],
                             atol=1e-6)
  # rotate by pi/2 about +y: R_y(pi/2) (0,0,-0.5) = (-0.5, 0, 0)
  state = state.replace(qpos=jnp.array([np.pi / 2]))
  kin = K.fk(model, state)
  np.testing.assert_allclose(np.asarray(kin.geom_xpos[g]), [-0.5, 0, 1.0],
                             atol=1e-5)


def test_mass_matrix_pendulum(tmp_path):
  model, _ = _load(tmp_path, PENDULUM)
  state = make_state(model)
  anc = K.ancestor_mask(model)
  kin = K.fk(model, state)
  info = K.dof_info(model, kin)
  jacp, jacr = K.com_jacobians(model, kin, info, anc)
  M = D.mass_matrix(model, kin, jacp, jacr)
  # point mass at distance 0.5: I = m l^2 = 0.25, plus sphere inertia
  sphere_I = 0.4 * 1.0 * 0.05 ** 2
  np.testing.assert_allclose(float(M[0, 0]), 0.25 + sphere_I, rtol=1e-5)


def test_pendulum_gravity_acc(tmp_path):
  model, _ = _load(tmp_path, PENDULUM)
  anc = K.ancestor_mask(model)
  # at 90 degrees the gravitational torque is -m g l
  state = make_state(model).replace(qpos=jnp.array([np.pi / 2]))
  sm = D.smooth_dynamics(model, state, anc, model.opt.timestep)
  l, m, g = 0.5, 1.0, 9.81
  I = m * l * l + 0.4 * m * 0.05 ** 2
  np.testing.assert_allclose(float(sm.qacc_smooth[0]), -m * g * l / I,
                             rtol=1e-4)


def test_pendulum_energy_conservation(tmp_path):
  model, _ = _load(tmp_path, PENDULUM)
  anc = K.ancestor_mask(model)
  dt = model.opt.timestep
  state = make_state(model).replace(qpos=jnp.array([np.pi / 2]))

  def substep(state, _):
    sm = D.smooth_dynamics(model, state, anc, dt)
    qvel = state.qvel + dt * sm.qacc_smooth
    qpos = K.integrate_qpos(model, state.qpos, qvel, dt)
    return state.replace(qpos=qpos, qvel=qvel), state.qpos[0]

  state2, traj = jax.lax.scan(substep, state, None, length=2000)

  def energy(q, qd):
    l, m, g = 0.5, 1.0, 9.81
    I = m * l * l + 0.4 * m * 0.05 ** 2
    h = -l * np.cos(q)
    return 0.5 * I * qd ** 2 + m * g * h

  e0 = energy(np.pi / 2, 0.0)
  e1 = energy(float(state2.qpos[0]), float(state2.qvel[0]))
  # semi-implicit Euler: energy drift small over 2s
  assert abs(e1 - e0) < 0.05 * abs(e0) + 0.05
  # it actually swung
  assert np.asarray(traj).min() < -1.0


def test_free_body_falls(tmp_path):
  model, _ = _load(tmp_path, FREE_BOX)
  anc = K.ancestor_mask(model)
  dt = model.opt.timestep
  state = make_state(model)

  def substep(state, _):
    sm = D.smooth_dynamics(model, state, anc, dt)
    qvel = state.qvel + dt * sm.qacc_smooth
    qpos = K.integrate_qpos(model, state.qpos, qvel, dt)
    return state.replace(qpos=qpos, qvel=qvel), None

  n = 250  # 0.5 s
  state2, _ = jax.lax.scan(substep, state, None, length=n)
  t = n * float(dt)
  # z = z0 - 1/2 g t^2 (semi-implicit: slight offset ok)
  expect_z = 1.0 - 0.5 * 9.81 * t ** 2
  assert abs(float(state2.qpos[2]) - expect_z) < 5e-3
  # x, y unchanged; no rotation picked up
  np.testing.assert_allclose(np.asarray(state2.qpos[:2]), [0.1, 0.2],
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(state2.qpos[3:7]), [1, 0, 0, 0],
                             atol=1e-6)


def test_free_body_spin_conserves_momentum(tmp_path):
  model, _ = _load(tmp_path, FREE_BOX)
  anc = K.ancestor_mask(model)
  dt = model.opt.timestep
  state = make_state(model)
  w0 = jnp.array([0.0, 0.0, 3.0])
  state = state.replace(qvel=state.qvel.at[3:6].set(w0))

  def substep(state, _):
    sm = D.smooth_dynamics(model, state, anc, dt)
    qvel = state.qvel + dt * sm.qacc_smooth
    qpos = K.integrate_qpos(model, state.qpos, qvel, dt)
    return state.replace(qpos=qpos, qvel=qvel), None

  state2, _ = jax.lax.scan(substep, state, None, length=100)
  # cube: isotropic inertia -> omega constant
  np.testing.assert_allclose(np.asarray(state2.qvel[3:6]), np.asarray(w0),
                             atol=1e-4)


def test_implicit_damping_freezes_stiff_slide(tmp_path):
  xml = """
  <mujoco>
    <option timestep="0.002" density="0"/>
    <worldbody>
      <body name="b" pos="0 0 1">
        <joint name="s" type="slide" axis="0 0 1" damping="1e11"/>
        <geom type="sphere" size="0.1" mass="5"/>
      </body>
    </worldbody>
  </mujoco>
  """
  model, _ = _load(tmp_path, xml)
  anc = K.ancestor_mask(model)
  dt = model.opt.timestep
  state = make_state(model)
  for _ in range(5):
    sm = D.smooth_dynamics(model, state, anc, dt)
    qvel = state.qvel + dt * sm.qacc_smooth
    qpos = K.integrate_qpos(model, state.qpos, qvel, dt)
    state = state.replace(qpos=qpos, qvel=qvel)
  # with damping 1e11 the slide must not move measurably under gravity
  assert abs(float(state.qpos[0])) < 1e-8
  assert not np.isnan(np.asarray(state.qpos)).any()


def test_fetch_scene_smooth_step_finite():
  model, _ = mjcf.load_model(
      reference_xml('geeco-pad2-cube2.xml'))
  anc = K.ancestor_mask(model)
  dt = model.opt.timestep
  state = make_state(model)
  sm = D.smooth_dynamics(model, state, anc, dt)
  assert np.isfinite(np.asarray(sm.qacc_smooth)).all()
  # eigenvalues of implicit mass matrix strictly positive
  w = np.linalg.eigvalsh(np.asarray(sm.M_impl))
  assert w.min() > 0


# ---------------------------------------------------------------- linalg


def test_gj_inverse_matches_numpy():
  from geeco_tpu.physics import linalg as L
  rng = np.random.RandomState(0)
  for n in (3, 6, 15):
    B = rng.randn(4, n, n).astype(np.float32)
    A = np.einsum('bij,bkj->bik', B, B) + 3.0 * np.eye(n, dtype=np.float32)
    inv = np.asarray(L.gj_inverse(jnp.asarray(A)))
    np.testing.assert_allclose(inv, np.linalg.inv(A), rtol=2e-3, atol=2e-4)


def test_dof_blocks_cover_fetch_scene_and_match_M_structure():
  from geeco_tpu.physics import linalg as L
  model, _ = mjcf.load_model(reference_xml('geeco-pad2-cube2.xml'))
  anc = K.ancestor_mask(model)
  blocks = L.dof_blocks(np.asarray(anc))
  got = np.sort(np.concatenate(blocks))
  np.testing.assert_array_equal(got, np.arange(model.nv))
  assert len(blocks) > 1  # robot chain + free bodies
  # off-block entries of the mass matrix are structurally zero
  state = make_state(model)
  smooth = D.smooth_dynamics(model, state, np.asarray(anc),
                             model.opt.timestep)
  M = np.asarray(smooth.M_impl)
  mask = np.zeros_like(M, dtype=bool)
  for idx in blocks:
    mask[np.ix_(idx, idx)] = True
  assert np.abs(M[~mask]).max() < 1e-6 * max(1.0, np.abs(M).max())


def test_blockgj_substep_matches_chol():
  from geeco_tpu.envs.base import GeecoEnv
  from geeco_tpu.core.model import make_state
  model, _ = mjcf.load_model(reference_xml('geeco-pad2-cube2.xml'))
  from geeco_tpu.physics.step import build_stepper
  st = build_stepper(model)
  state = st.init_state(make_state(model))
  run = lambda mi: jax.jit(lambda s: st.step(
      s, 5, 20, mass_inverse=mi))(state)
  a = run('chol')
  b = run('blockgj')
  np.testing.assert_allclose(np.asarray(a.qpos), np.asarray(b.qpos),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(a.qvel), np.asarray(b.qvel),
                             rtol=1e-3, atol=1e-3)
