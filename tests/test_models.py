"""E2EVMC model, training-step and predictor tests (reduced image size)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.models import snapshots
from geeco_tpu.models.e2evmc import (GoalE2EVMC, E2EVMC, dynimg,
                                     dynimg_coefficients, init_lstm_carry)
from geeco_tpu.models.params import create_e2evmc_config
from geeco_tpu.models.train import _dummy_batch, make_train_fns

CFG = dict(img_height=64, img_width=64, batch_size=2, window_size=4,
           dim_s_obs=32, dim_s_dyn=32, dim_s_diff=32, dim_h_lstm=16,
           dim_h_fc=16, compute_dtype='float32')


def _cfg(**kw):
  d = dict(CFG)
  d.update(kw)
  return create_e2evmc_config(d)


def test_dynimg_coefficients():
  # K=2: alpha = (-0.5, +0.5) -> dynimg ~ normalized difference
  a = np.asarray(dynimg_coefficients(2))
  np.testing.assert_allclose(a, [-0.5, 0.5], atol=1e-6)
  # coefficients sum to ~0 for any K (zero-mean temporal filter)
  for K in (2, 4, 8):
    np.testing.assert_allclose(np.asarray(dynimg_coefficients(K)).sum(),
                               0.0, atol=1e-5)


def test_dynimg_is_normalized_difference():
  rng = np.random.RandomState(0)
  cur = rng.rand(1, 8, 8, 3).astype(np.float32)
  tgt = rng.rand(1, 8, 8, 3).astype(np.float32)
  seq = jnp.stack([jnp.asarray(cur), jnp.asarray(tgt)], axis=1)
  d = np.asarray(dynimg(seq))[0]
  diff = 0.5 * (tgt[0] - cur[0])
  expect = (diff - diff.min()) / (diff.max() - diff.min() + 1e-6)
  np.testing.assert_allclose(d, expect, atol=1e-5)
  assert d.min() >= 0.0 and d.max() <= 1.0


@pytest.mark.parametrize('goal,proc_obs,proc_tgt', [
    (False, 'sequence', 'constant'),
    (True, 'sequence', 'constant'),
    (True, 'sequence', 'residual'),
    (True, 'sequence', 'dyndiff'),
    (True, 'dynimg', 'dyndiff'),
])
def test_forward_shapes(goal, proc_obs, proc_tgt):
  cfg = _cfg(proc_obs=proc_obs, proc_tgt=proc_tgt)
  model = GoalE2EVMC(cfg) if goal else E2EVMC(cfg)
  n = 2
  frames = jnp.zeros((n, cfg.window_size, 64, 64, 3))
  jnt = jnp.zeros((n, cfg.window_size, 7))
  tgt = jnp.zeros((n, 64, 64, 3))
  carry = init_lstm_carry(cfg, n)
  rng = jax.random.PRNGKey(0)
  if goal:
    v = model.init(rng, frames, jnt, tgt, carry, jnp.asarray(True))
    ep, carry2 = model.apply(v, frames, jnt, tgt, carry, jnp.asarray(True))
  else:
    v = model.init(rng, frames, jnt, carry, jnp.asarray(True))
    ep, carry2 = model.apply(v, frames, jnt, carry, jnp.asarray(True))
  assert ep['pred_cmd_ee'].shape == (n, 3)
  assert ep['logits_cmd_grp'].shape == (n, 3)
  assert ep['pred_aux_ee'].shape == (n, 3)
  assert ep['pred_aux_obj'].shape == (n, 3)
  assert carry2[0].shape == (n, cfg.dim_h_lstm)
  if goal and proc_tgt == 'dyndiff':
    assert ep['dyndiff'].shape == (n, 64, 64, 3)
  if goal and proc_obs == 'dynimg':
    assert ep['dynbuff'].shape == (n, 64, 64, 3)


def test_lstm_reset_semantics():
  cfg = _cfg()
  model = E2EVMC(cfg)
  n = 2
  rng = np.random.RandomState(1)
  frames = jnp.asarray(rng.rand(n, 4, 64, 64, 3), jnp.float32)
  jnt = jnp.asarray(rng.rand(n, 4, 7), jnp.float32)
  carry0 = init_lstm_carry(cfg, n)
  v = model.init(jax.random.PRNGKey(0), frames, jnt, carry0,
                 jnp.asarray(True))
  # heads are zero-initialized (constant 0 output at init regardless of
  # carry); give the probed head a nonzero kernel so carry effects are
  # observable in pred_cmd_ee
  v = jax.tree.map(lambda x: x, v)  # shallow copy
  k = v['params']['LSTMDecoder']['pred_cmd_ee']['kernel']
  v['params']['LSTMDecoder']['pred_cmd_ee']['kernel'] = jnp.ones_like(k)
  _, c1 = model.apply(v, frames, jnt, carry0, jnp.asarray(True))
  # carry changes predictions when reset=False but not when reset=True
  ep_reset, _ = model.apply(v, frames, jnt, c1, jnp.asarray(True))
  ep_cont, _ = model.apply(v, frames, jnt, c1, jnp.asarray(False))
  ep_zero, _ = model.apply(v, frames, jnt, carry0, jnp.asarray(True))
  np.testing.assert_allclose(np.asarray(ep_reset['pred_cmd_ee']),
                             np.asarray(ep_zero['pred_cmd_ee']), atol=1e-6)
  assert not np.allclose(np.asarray(ep_cont['pred_cmd_ee']),
                         np.asarray(ep_reset['pred_cmd_ee']))


def test_train_step_decreases_loss():
  cfg = _cfg()
  init_fn, train_step, eval_step, _ = make_train_fns(cfg,
                                                     goal_conditioned=True)
  ts = init_fn(jax.random.PRNGKey(0), batch_size=2)
  rng = np.random.RandomState(0)
  feature, label = _dummy_batch(cfg, True, 2)
  feature = dict(feature)
  feature['rgb'] = jnp.asarray(rng.rand(2, 4, 64, 64, 3), jnp.float32)
  feature['target_rgb'] = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
  label = dict(label)
  label['cmd'] = jnp.asarray([[0.1, -0.2, 0.3, 1.0],
                              [0.0, 0.1, -0.1, -1.0]], jnp.float32)
  step = jax.jit(train_step)
  losses = []
  for _ in range(8):
    ts, metrics = step(ts, feature, label)
    losses.append(float(metrics['loss']))
  assert losses[-1] < losses[0], losses
  m = jax.jit(eval_step)(ts, feature, label)
  assert 0.0 <= float(m['acc_cmd_grp']) <= 1.0


def test_predictor_ring_buffer(tmp_path):
  from geeco_tpu.models.params import save_model_config
  from geeco_tpu.models.predictor import GoalE2EVMCPredictor
  cfg = _cfg(proc_obs='dynimg', proc_tgt='dyndiff')
  model_dir = str(tmp_path)
  save_model_config(cfg, f'{model_dir}/e2evmc_config.json')
  # random params checkpoint
  init_fn, _, _, _ = make_train_fns(cfg, goal_conditioned=True)
  ts = init_fn(jax.random.PRNGKey(0), batch_size=1)
  snapshots.save_checkpoint(model_dir, 0, ts.params)
  pred = GoalE2EVMCPredictor(model_dir)
  frame = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
  jnt = np.zeros(7, np.float32)
  pred.set_goal(frame)
  out = pred.predict(frame, jnt)
  assert out['cmd_ee'].shape == (3,)
  assert out['cmd_grp'].shape == (1,)
  assert float(out['cmd_grp'][0]) in (-1.0, 0.0, 1.0)
  assert 'dynbuff' in out and 'dyndiff' in out
  # range validation
  with pytest.raises(AssertionError):
    pred.predict(frame * 300.0, jnt)
  # reset clears the buffer
  pred.reset()
  assert pred._buffer_frames is None


def test_snapshot_manager(tmp_path):
  model_dir = str(tmp_path)
  cfg = _cfg()
  init_fn, _, _, _ = make_train_fns(cfg, goal_conditioned=False)
  ts = init_fn(jax.random.PRNGKey(0), batch_size=1)
  for step, loss in ((10, 0.5), (20, 0.3), (30, 0.8), (40, 0.2)):
    snapshots.save_checkpoint(model_dir, step, ts.params)
    snapshots.export_snapshot(model_dir, eval_loss=loss, num_best=2)
  index = snapshots.load_snapshot_index(model_dir)
  assert len(index) == 2
  assert {e['step'] for e in index} == {20, 40}  # two best losses kept
  best = snapshots.best_snapshot(model_dir)
  assert best and 'snapshot-00000040' in best
  # restore round-trips
  params2 = snapshots.restore_params(best, ts.params)
  jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
               jax.device_get(ts.params), params2)
