"""Per-island (block) line-search solver tests.

The block variants (psd_block / bb_block) give each quota-group island its
own step size so rank churn on one island's rows cannot perturb another
island's contact forces through a shared global alpha — the identified
root cause of mesh-scene rest creep (STATUS.md "hull rest creep").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.core import mjcf
from geeco_tpu.core.model import make_state
from geeco_tpu.physics import solver as S
from geeco_tpu.physics.step import build_stepper


TWO_BOXES = """
<mujoco>
  <option timestep="0.002" density="0"/>
  <worldbody>
    <geom name="floor" type="plane" pos="0 0 0" size="5 5 1"
          friction="1.0 0.005 0.0001"/>
    <body name="box_a" pos="-0.2 0 {z0}">
      <joint name="box_a:joint" type="free"/>
      <geom type="box" size="0.025 0.025 0.025" mass="2"
            friction="1.0 0.005 0.0001"/>
    </body>
    <body name="box_b" pos="0.2 0 {z0}">
      <joint name="box_b:joint" type="free"/>
      <geom type="box" size="0.025 0.025 0.025" mass="2"
            friction="1.0 0.005 0.0001"/>
    </body>
  </worldbody>
</mujoco>
"""


def _load(tmp_path, xml):
  p = tmp_path / 'scene.xml'
  p.write_text(xml)
  model, _ = mjcf.load_model(str(p))
  return model


def test_block_ids_layout(tmp_path):
  model = _load(tmp_path, TWO_BOXES.format(z0=0.024))
  st = build_stepper(model, select_mode='quota')
  cs = st.cs
  assert cs.quota_sel is not None
  # two free boxes, no robot/static-only rows -> two quota groups
  assert len(cs.quota_sel) == 2
  bid = S.block_ids(cs)
  K = sum(k for _, k in cs.quota_sel)
  assert bid.shape == (cs.ngrp * K + 2 * cs.nlim,)
  # group-major contact rows: each of the ngrp row groups repeats the
  # per-slot block assignment
  slot = bid[:K]
  for g in range(1, cs.ngrp):
    np.testing.assert_array_equal(bid[g * K:(g + 1) * K], slot)
  assert set(np.unique(slot)) == {0, 1}
  # topk selection has no static blocking
  st_topk = build_stepper(model)
  assert S.block_ids(st_topk.cs) is None


def test_block_method_requires_quota(tmp_path):
  model = _load(tmp_path, TWO_BOXES.format(z0=0.01))
  st = build_stepper(model)  # topk
  state = st.init_state(make_state(model))
  with pytest.raises(ValueError, match='quota'):
    jax.jit(lambda s: st.substep(s, solver_method='bb_block'))(state)


@pytest.mark.parametrize('method', ['psd_block', 'bb_block'])
def test_block_settles_like_psd(tmp_path, method):
  """Block rollouts reach the same rest state as the global-psd rollout."""
  model = _load(tmp_path, TWO_BOXES.format(z0=0.03))
  st = build_stepper(model, select_mode='quota')

  def rollout(m):
    state = st.init_state(make_state(model))
    step = jax.jit(lambda s: st.step(s, n_substeps=10,
                                     solver_iterations=60,
                                     solver_method=m))
    for _ in range(50):  # 1 s
      state = step(state)
    return state

  ref = rollout('psd')
  got = rollout(method)
  assert np.abs(np.asarray(got.qvel)).max() < 0.05
  for adr in (2, 9):  # z of each box
    z = float(got.qpos[adr])
    assert 0.018 < z < 0.032, f'{method} rest height {z}'
  np.testing.assert_allclose(np.asarray(got.qpos), np.asarray(ref.qpos),
                             atol=2e-3)


def test_decoupled_islands_converge_to_same_forces(tmp_path):
  """On disjoint islands the block solve matches a well-converged psd solve."""
  model = _load(tmp_path, TWO_BOXES.format(z0=0.024))
  st = build_stepper(model, select_mode='quota')
  state = st.init_state(make_state(model))

  qaccs = {}
  for m, iters in (('psd', 200), ('psd_block', 60), ('bb_block', 60)):
    s = jax.jit(lambda s_, m_=m, it_=iters: st.substep(
        s_, solver_iterations=it_, solver_method=m_))(state)
    # recover qacc from the integration: qvel' = qvel + h * qacc
    qaccs[m] = (np.asarray(s.qvel) - np.asarray(state.qvel)) / \
        float(model.opt.timestep)
  scale = np.abs(qaccs['psd']).max() + 1.0
  for m in ('psd_block', 'bb_block'):
    err = np.abs(qaccs[m] - qaccs['psd']).max() / scale
    assert err < 5e-3, f'{m} relative qacc error {err}'
