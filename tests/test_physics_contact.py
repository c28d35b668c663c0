"""Contact, limit and weld constraint tests on minimal scenes."""

from tests.conftest import reference_xml
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.core import mjcf
from geeco_tpu.core.model import make_state
from geeco_tpu.physics.step import build_stepper


def _load(tmp_path, xml: str):
  p = tmp_path / 'scene.xml'
  p.write_text(xml)
  return mjcf.load_model(str(p))


BOX_ON_PLANE = """
<mujoco>
  <option timestep="0.002" density="0"/>
  <worldbody>
    <geom name="floor" type="plane" pos="0 0 0" size="5 5 1" condim="6"
          friction="{mu} 0.005 0.0001"/>
    <body name="box" pos="0 0 {z0}">
      <joint name="box:joint" type="free"/>
      <geom type="box" size="0.025 0.025 0.025" condim="6" mass="2"
            friction="{mu} 0.005 0.0001"/>
    </body>
  </worldbody>
</mujoco>
"""


def _rollout(stepper, state, n, substeps=10):
  @jax.jit
  def one(s):
    return stepper.step(s, n_substeps=substeps)
  for _ in range(n):
    state = one(state)
  return state


def test_box_settles_on_plane(tmp_path):
  model, _ = _load(tmp_path, BOX_ON_PLANE.format(z0=0.1, mu=1.0))
  st = build_stepper(model)
  state = st.init_state(make_state(model))
  state = _rollout(state=state, stepper=st, n=25, substeps=20)  # 1 s
  z = float(state.qpos[2])
  assert 0.018 < z < 0.03, f'box rest height {z}'
  vel = np.abs(np.asarray(state.qvel)).max()
  assert vel < 0.05, f'residual velocity {vel}'
  # orientation stays upright
  np.testing.assert_allclose(np.asarray(state.qpos[3:7]), [1, 0, 0, 0],
                             atol=0.02)


def test_penetrating_box_pushed_out(tmp_path):
  model, _ = _load(tmp_path, BOX_ON_PLANE.format(z0=0.01, mu=1.0))
  st = build_stepper(model)
  state = st.init_state(make_state(model))
  state = _rollout(state=state, stepper=st, n=25, substeps=20)
  z = float(state.qpos[2])
  assert 0.015 < z < 0.035, f'box rest height {z}'
  assert np.isfinite(np.asarray(state.qvel)).all()


def test_friction_stops_sliding_box(tmp_path):
  model_mu, _ = _load(tmp_path, BOX_ON_PLANE.format(z0=0.0255, mu=1.0))
  st = build_stepper(model_mu)
  state = st.init_state(make_state(model_mu))
  state = state.replace(qvel=state.qvel.at[0].set(1.0))
  state = _rollout(state=state, stepper=st, n=50, substeps=10)  # 1 s
  # mu=1: decel ~ 9.81 m/s^2 -> stops after ~0.05 m... v0=1 -> d = v^2/2a ~ 0.051
  x_mu = float(state.qpos[0])
  vx = float(state.qvel[0])
  assert abs(vx) < 0.05, f'still sliding at {vx}'
  assert x_mu < 0.12, f'slid too far: {x_mu}'
  assert x_mu > 0.02


def test_frictionless_box_keeps_sliding(tmp_path):
  model, _ = _load(tmp_path, BOX_ON_PLANE.format(z0=0.0255, mu=0.0))
  st = build_stepper(model)
  state = st.init_state(make_state(model))
  state = state.replace(qvel=state.qvel.at[0].set(1.0))
  state = _rollout(state=state, stepper=st, n=25, substeps=10)  # 0.5 s
  assert float(state.qvel[0]) > 0.9
  assert float(state.qpos[0]) > 0.4


STACK = """
<mujoco>
  <option timestep="0.002" density="0"/>
  <worldbody>
    <geom name="floor" type="plane" pos="0 0 0" size="5 5 1" condim="6"/>
    <body name="lower" pos="0 0 0.025">
      <joint name="lower:joint" type="free"/>
      <geom type="box" size="0.025 0.025 0.025" condim="6" mass="2"/>
    </body>
    <body name="upper" pos="0.005 0 0.078">
      <joint name="upper:joint" type="free"/>
      <geom type="box" size="0.025 0.025 0.025" condim="6" mass="2"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_box_stack_stays_stacked(tmp_path):
  model, _ = _load(tmp_path, STACK)
  st = build_stepper(model)
  state = st.init_state(make_state(model))
  state = _rollout(state=state, stepper=st, n=25, substeps=20)  # 1 s
  z_lower = float(state.qpos[2])
  z_upper = float(state.qpos[9])
  assert 0.015 < z_lower < 0.035
  assert 0.06 < z_upper < 0.09, f'upper box at {z_upper}'
  # upper box still horizontally on top
  assert abs(float(state.qpos[7])) < 0.03


LIMIT = """
<mujoco>
  <option timestep="0.002" density="0"/>
  <worldbody>
    <body name="pole" pos="0 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0" range="-0.5 0.5"
             limited="true"/>
      <geom type="sphere" size="0.05" pos="0 0 -0.5" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_joint_limit_enforced(tmp_path):
  model, _ = _load(tmp_path, LIMIT)
  st = build_stepper(model)
  state = st.init_state(make_state(model))
  state = state.replace(qvel=jnp.array([4.0]))  # swing hard into the limit
  state = _rollout(state=state, stepper=st, n=30, substeps=10)
  q = float(state.qpos[0])
  assert q < 0.6, f'limit overshot: {q}'
  assert np.isfinite(np.asarray(state.qvel)).all()


WELD = """
<mujoco>
  <option timestep="0.002" density="0"/>
  <worldbody>
    <body mocap="true" name="target" pos="0.3 0.1 1.2">
      <geom type="sphere" size="0.01" contype="0" conaffinity="0"/>
    </body>
    <body name="hand" pos="0 0 1">
      <joint name="sx" type="slide" axis="1 0 0" damping="20"/>
      <joint name="sy" type="slide" axis="0 1 0" damping="20"/>
      <joint name="sz" type="slide" axis="0 0 1" damping="20"/>
      <geom type="box" size="0.03 0.03 0.03" mass="1" contype="0"
            conaffinity="0"/>
    </body>
  </worldbody>
  <equality>
    <weld body1="target" body2="hand" solimp="0.9 0.95 0.001"
          solref="0.02 1"/>
  </equality>
</mujoco>
"""


def test_weld_drags_body_to_mocap(tmp_path):
  model, _ = _load(tmp_path, WELD)
  st = build_stepper(model)
  state = st.init_state(make_state(model))
  state = _rollout(state=state, stepper=st, n=25, substeps=10)  # 0.5 s
  kin = st.fk(state)
  hand = model.body('hand')
  np.testing.assert_allclose(np.asarray(kin.xpos[hand]), [0.3, 0.1, 1.2],
                             atol=0.02)
  # follows when the mocap moves
  state = state.replace(mocap_pos=jnp.array([[0.1, -0.2, 0.9]]))
  state = _rollout(state=state, stepper=st, n=25, substeps=10)
  kin = st.fk(state)
  np.testing.assert_allclose(np.asarray(kin.xpos[hand]), [0.1, -0.2, 0.9],
                             atol=0.02)


@pytest.mark.slow
def test_pad2_cube2_step_stable():
  """Step the full Fetch scene from a realistic reset.

  Mirrors the reference env-setup flow (never steps with a metre-scale weld
  error): set the world slides, separate the initially-overlapping goal
  pads, snap the mocap onto the gripper, then simulate.
  (reference: src/geeco_gym/pickplace.py:532-549)
  """
  from geeco_tpu.core.model import set_joint_qpos
  model, _ = mjcf.load_model(
      reference_xml('geeco-pad2-cube2.xml'))
  st = build_stepper(model)
  state = st.init_state(make_state(model))
  qpos = state.qpos
  for name, val in (('robot0:slide0', 0.405), ('robot0:slide1', 0.48),
                    ('robot0:slide2', 0.0)):
    qpos = set_joint_qpos(model, qpos, name, val)
  # place task objects on the table, apart from each other
  for name, xy in (('object0:joint', (1.3, 0.6)), ('object1:joint', (1.3, 0.9)),
                   ('goal0:joint', (1.45, 0.6)), ('goal1:joint', (1.45, 0.9))):
    z = 0.3075 if name.startswith('object') else 0.296
    qpos = set_joint_qpos(model, qpos, name,
                          jnp.array([xy[0], xy[1], z, 1, 0, 0, 0]))
  state = state.replace(qpos=qpos)
  # position mocap like the reference: grip + (-0.498, 0.005, -0.231)
  # then let the weld drag the EE into place (pickplace.py:543-549)
  kin = st.fk(state)
  grip = model.site('robot0:grip')
  target = kin.site_xpos[grip] + jnp.array([-0.498, 0.005, -0.231])
  quat = jnp.array([1.0, 0, 1.0, 0]) / np.sqrt(2.0)
  state = state.replace(
      mocap_pos=target[None],
      mocap_quat=quat[None],
      ctrl=jnp.full((model.nu,), 0.05))

  step = jax.jit(lambda s: st.step(s, n_substeps=20))
  for _ in range(10):
    state = step(state)
  assert np.isfinite(np.asarray(state.qpos)).all()
  assert np.isfinite(np.asarray(state.qvel)).all()
  # world slides have not moved measurably (damping 1e11)
  lo, _ = model.jnt_qpos_slice('robot0:slide0')
  assert abs(float(state.qpos[lo]) - 0.405) < 1e-4
  # objects still on the table (not exploded / not fallen through)
  for name in ('object0:joint', 'object1:joint'):
    qlo, _ = model.jnt_qpos_slice(name)
    z = float(state.qpos[qlo + 2])
    assert 0.28 < z < 0.35, f'{name} z={z}'
  # gripper tracked the mocap target (soft weld: cm-level tolerance)
  kin = st.fk(state)
  d = np.linalg.norm(np.asarray(kin.site_xpos[grip] - state.mocap_pos[0]))
  assert d < 0.08, f'EE {d} m from mocap target'
  # gripper points down: gripper_link x-axis ~ -z world
  gl = model.body('robot0:gripper_link')
  xaxis = np.asarray(kin.ximat[gl][:, 0])
  assert xaxis[2] < -0.9, f'gripper not pointing down: x-axis={xaxis}'


SPHERE_ON_PLANE = """
<mujoco>
  <option timestep="0.002" density="0"/>
  <worldbody>
    <geom name="floor" type="plane" pos="0 0 0" size="5 5 1" condim="6"
          friction="1.0 0.005 {mu_roll}"/>
    <body name="ball" pos="0 0 0.05">
      <joint name="ball:joint" type="free"/>
      <geom type="sphere" size="0.05" condim="6" mass="1"
            friction="1.0 0.005 {mu_roll}"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_rolling_friction_stops_ball(tmp_path):
  """condim-6 rolling rows: a ball with high rolling friction decelerates;
  with MuJoCo's negligible default the rows are auto-skipped and the ball
  keeps rolling (solver.py docstring gating policy)."""
  from geeco_tpu.physics import solver as S

  def final_speed(mu_roll, rolling):
    model, _ = _load(tmp_path, SPHERE_ON_PLANE.format(mu_roll=mu_roll))
    st = build_stepper(model, rolling=rolling)
    state = st.init_state(make_state(model))
    # rolling without slipping: v = omega x r
    state = state.replace(
        qvel=state.qvel.at[0].set(0.5).at[4].set(0.5 / 0.05))
    state = _rollout(state=state, stepper=st, n=40, substeps=20)  # 1.6 s
    return float(np.linalg.norm(np.asarray(state.qvel[:2]))), st

  v_roll, st_roll = final_speed(0.2, rolling='auto')
  assert st_roll.cs.ngrp == 6  # auto-gate engages for large coefficients
  v_free, st_free = final_speed(1e-4, rolling='auto')
  assert st_free.cs.ngrp == 4  # negligible default -> no rolling rows
  assert v_roll < 0.05, f'rolling friction did not stop the ball: {v_roll}'
  assert v_free > 0.3, f'ball should keep rolling: {v_free}'


def test_collide_every_2_close_to_exact(tmp_path):
  """collide_every=2 (contact reuse across substep pairs) must track the
  exact per-substep collision trajectory closely on a dropping/settling
  box: the contact set moves O(v * dt) ~ 0.1 mm between substeps."""
  model, _ = _load(tmp_path, BOX_ON_PLANE.format(z0=0.06, mu=1.0))
  st = build_stepper(model)
  s0 = st.init_state(make_state(model))

  def roll(s, ce):  # ce is static python control flow -> jit the closure
    def body(s, _):
      return st.step(s, n_substeps=20, collide_every=ce), s.qpos
    return jax.lax.scan(body, s, None, length=15)

  _, traj1 = jax.jit(lambda s: roll(s, 1))(s0)
  _, traj2 = jax.jit(lambda s: roll(s, 2))(s0)
  # impact instant may differ by one substep; positions must agree to
  # sub-millimeter over the 0.6 s drop-and-settle
  err = np.abs(np.asarray(traj1[:, :3]) - np.asarray(traj2[:, :3])).max()
  assert err < 1e-3, f'collide_every=2 position drift {err}'
  # both end at the same rest height
  np.testing.assert_allclose(np.asarray(traj1[-1, 2]),
                             np.asarray(traj2[-1, 2]), atol=2e-4)
