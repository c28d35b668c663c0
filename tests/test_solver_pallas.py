"""Pallas fused-solve parity tests (interpret mode on CPU).

The pallas path must match the reference psd iteration (same math, VMEM-
resident layout) on scenes with and without weld equalities, unbatched and
vmapped at the kernel block size.
"""

from tests.conftest import reference_xml  # noqa: F401  (forces CPU)
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.core import mjcf
from geeco_tpu.core.model import make_state
from geeco_tpu.physics.step import build_stepper
from geeco_tpu.physics.solver_pallas import E_BLOCK

TWO_BOXES = """
<mujoco>
  <option timestep="0.002" density="0"/>
  <worldbody>
    <geom name="floor" type="plane" pos="0 0 0" size="5 5 1" condim="4"
          friction="1.0 0.005 0.0001"/>
    <body name="b1" pos="0 0 0.1">
      <joint type="free"/>
      <geom type="box" size="0.025 0.025 0.025" condim="4" mass="2"
            friction="1.0 0.005 0.0001"/>
    </body>
    <body name="b2" pos="0.02 0.01 0.18">
      <joint type="free"/>
      <geom type="box" size="0.025 0.025 0.025" condim="4" mass="1"
            friction="1.0 0.005 0.0001"/>
    </body>
  </worldbody>
</mujoco>
"""

WELD_ARM = """
<mujoco>
  <option timestep="0.002" density="0"/>
  <worldbody>
    <body name="mocap" mocap="true" pos="0.1 0 0.3"/>
    <body name="arm" pos="0 0 0.3">
      <joint type="free"/>
      <geom type="box" size="0.03 0.03 0.03" mass="1"/>
    </body>
    <body name="ball" pos="0.0 0 0.06">
      <joint type="free"/>
      <geom type="sphere" size="0.03" mass="0.5" condim="4"
            friction="0.8 0.005 0.0001"/>
    </body>
    <geom name="floor" type="plane" pos="0 0 0" size="5 5 1" condim="4"
          friction="0.8 0.005 0.0001"/>
  </worldbody>
  <equality>
    <weld body1="mocap" body2="arm" solref="0.02 1" solimp="0.9 0.95 0.001"/>
  </equality>
</mujoco>
"""


def _load(tmp_path, xml):
  p = tmp_path / 'scene.xml'
  p.write_text(xml)
  return mjcf.load_model(str(p))


def _settled(stepper, state, n=5):
  @jax.jit
  def one(s):
    return stepper.step(s, n_substeps=10)
  for _ in range(n):
    state = one(state)
  return state


@pytest.mark.parametrize('xml', [TWO_BOXES, WELD_ARM],
                         ids=['contacts_only', 'with_weld'])
def test_pallas_matches_psd_substep(tmp_path, xml):
  model, _ = _load(tmp_path, xml)
  st = build_stepper(model)
  state = _settled(st, st.init_state(make_state(model)))

  ref = jax.jit(lambda s: st.substep(s, 60, 'psd'))(state)
  got = jax.jit(lambda s: st.substep(s, 60, 'pallas'))(state)
  np.testing.assert_allclose(np.asarray(got.qvel), np.asarray(ref.qvel),
                             rtol=1e-3, atol=1e-4)
  np.testing.assert_allclose(np.asarray(got.efc_force),
                             np.asarray(ref.efc_force), rtol=1e-2,
                             atol=2e-3)


def test_pallas_batched_kernel_matches_unbatched(tmp_path):
  model, _ = _load(tmp_path, WELD_ARM)
  st = build_stepper(model)
  base = _settled(st, st.init_state(make_state(model)))
  B = E_BLOCK  # batch divisible by the block -> the real kernel runs
  noise = 1e-3 * jax.random.normal(jax.random.PRNGKey(0),
                                   (B,) + base.qvel.shape)
  states = jax.tree.map(
      lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), base)
  states = states.replace(qvel=states.qvel + noise)

  batched = jax.jit(jax.vmap(lambda s: st.substep(s, 30, 'pallas')))(states)
  single = jax.jit(lambda s: st.substep(s, 30, 'pallas'))
  for k in (0, B // 2, B - 1):
    one = single(jax.tree.map(lambda x: x[k], states))
    np.testing.assert_allclose(np.asarray(batched.qvel[k]),
                               np.asarray(one.qvel), rtol=1e-4, atol=1e-5)


def test_pallas_box_settles(tmp_path):
  model, _ = _load(tmp_path, TWO_BOXES)
  st = build_stepper(model)
  state = st.init_state(make_state(model))

  @jax.jit
  def one(s):
    return st.step(s, n_substeps=20, solver_method='pallas')
  for _ in range(25):
    state = one(state)
  z1, z2 = float(state.qpos[2]), float(state.qpos[9])
  assert 0.018 < z1 < 0.032, z1
  assert 0.065 < z2 < 0.085, z2  # stacked on top of b1
  assert np.abs(np.asarray(state.qvel)).max() < 0.1
