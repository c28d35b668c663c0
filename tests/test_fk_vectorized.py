"""Vectorized FK must match the reference per-body loop exactly."""

from tests.conftest import reference_xml
import jax
import jax.numpy as jnp
import numpy as np

from geeco_tpu.core import mjcf
from geeco_tpu.core.model import make_state
from geeco_tpu.physics import kinematics as K


def _rand_state(model, seed):
  rng = np.random.RandomState(seed)
  state = make_state(model)
  qpos = np.asarray(state.qpos).copy()
  qpos += rng.uniform(-0.2, 0.2, qpos.shape)
  # re-normalize free-joint quats
  for j in range(model.njnt):
    if model.jnt_type[j] == 0:  # FREE
      a = model.jnt_qposadr[j]
      q = qpos[a + 3:a + 7]
      qpos[a + 3:a + 7] = q / np.linalg.norm(q)
  mp = np.asarray(state.mocap_pos) + rng.uniform(-0.1, 0.1,
                                                 state.mocap_pos.shape)
  mq = np.asarray(state.mocap_quat) + rng.uniform(-0.1, 0.1,
                                                  state.mocap_quat.shape)
  return state.replace(qpos=jnp.asarray(qpos), mocap_pos=jnp.asarray(mp),
                       mocap_quat=jnp.asarray(mq))


def test_fk_matches_reference_loop():
  model, _ = mjcf.load_model(reference_xml('geeco-pad2-cube2.xml'))
  for seed in range(3):
    state = _rand_state(model, seed)
    ref = K.fk_reference(model, state)
    new = K.fk(model, state)
    for field in ('xpos', 'xquat', 'ximat', 'xipos', 'geom_xpos',
                  'geom_xquat', 'site_xpos', 'site_xmat'):
      a, b = np.asarray(getattr(ref, field)), np.asarray(getattr(new, field))
      np.testing.assert_allclose(a, b, atol=1e-5, err_msg=field)


def test_fk_matches_on_mesh_scene():
  model, _ = mjcf.load_model(reference_xml('geeco-nut-cone.xml'))
  state = _rand_state(model, 0)
  ref = K.fk_reference(model, state)
  new = K.fk(model, state)
  np.testing.assert_allclose(np.asarray(ref.geom_xpos),
                             np.asarray(new.geom_xpos), atol=1e-5)
  np.testing.assert_allclose(np.asarray(ref.xquat),
                             np.asarray(new.xquat), atol=1e-5)


def test_integrate_qpos_free_and_scalar():
  model, _ = mjcf.load_model(reference_xml('geeco-pad2-cube2.xml'))
  state = _rand_state(model, 1)
  qvel = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (model.nv,)),
                     jnp.float32)
  out = K.integrate_qpos(model, state.qpos, qvel, 0.002)
  tang = K.qpos_tangent(model, state.qpos, qvel)
  # finite-difference consistency: integrate ≈ qpos + dt * tangent
  np.testing.assert_allclose(np.asarray(out),
                             np.asarray(state.qpos + 0.002 * tang),
                             atol=1e-5)
