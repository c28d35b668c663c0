"""Episode-scan training path: pipeline layout, learning, scan/serving
equivalence (models/train.py::make_episode_train_fns,
data/dataset.py::episode_pipeline)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.data import dataset as D
from geeco_tpu.data.episode import save_episode_npz
from geeco_tpu.models.e2evmc import make_model
from geeco_tpu.models.params import create_e2evmc_config
from geeco_tpu.models.train import make_episode_train_fns

ARM = D.ARM_JOINTS
FINGERS = D.FINGER_JOINTS

H = W = 16
T = 10  # episode length
K = 3   # window size


def _episode(seed):
  rng = np.random.RandomState(seed)
  ep = {
      'step': np.arange(T, dtype=np.int64),
      'ts': np.arange(T, dtype=np.float32) * 0.04,
      'rgb': rng.randint(0, 255, (T, H, W, 3), dtype=np.uint8),
      'depth': rng.rand(T, H, W).astype(np.float32),
      'cmd': np.clip(rng.randn(T, 4), -1, 1).astype(np.float32),
      'ctrl': rng.randn(T, 2).astype(np.float32),
      'mocap_qpos-robot0:mocap': rng.randn(T, 7).astype(np.float32),
      'goal_qpos': rng.randn(T, 7).astype(np.float32),
      'obj_qpos': rng.randn(T, 7).astype(np.float32),
  }
  ep['cmd'][:, 3] = rng.choice([-1.0, 1.0], size=T)
  for j in ARM + FINGERS:
    ep[f'joint_qpos-{j}'] = rng.randn(T).astype(np.float32)
    ep[f'joint_qvel-{j}'] = rng.randn(T).astype(np.float32)
  # make cmd_ee a function of observable state (the jnt_state vector feeds
  # the features directly) so test_learns measures learning, not random-
  # label memorization
  jnt3 = np.stack([ep[f'joint_qpos-{j}'] for j in ARM[:3]], axis=1)
  ep['cmd'][:, :3] = np.tanh(jnt3)
  return ep


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
  root = str(tmp_path_factory.mktemp('eds') / 'ds')
  os.makedirs(os.path.join(root, 'meta'))
  with open(os.path.join(root, 'meta', 'meta_info.json'), 'w') as fp:
    json.dump({'episode_length': T, 'img_height': H, 'img_width': W}, fp)
  names = []
  for i in range(5):
    name = f'replay_buffer_{i + 1:04d}'
    save_episode_npz(os.path.join(root, 'data', name + '.npz'),
                     _episode(i), {'task_goal': 'goal0',
                                   'task_object': 'object0',
                                   'episode_length': T})
    names.append(name)
  os.makedirs(os.path.join(root, 'splits', 'default'))
  for mode, sel in (('train', names[:4]), ('eval', names[4:]),
                    ('test', names[4:])):
    with open(os.path.join(root, 'splits', 'default', mode + '.txt'),
              'w') as fp:
      fp.write('\n'.join(sel) + '\n')
  return root


def _config(**kw):
  base = dict(img_height=H, img_width=W, img_channels=3, window_size=K,
              proc_obs='dynimg', proc_tgt='dyndiff', dim_s_obs=16,
              dim_s_dyn=16, dim_s_diff=16, dim_h_lstm=16, dim_h_fc=16,
              lr=3e-3, compute_dtype='float32')
  base.update(kw)
  return create_e2evmc_config(base)


def test_pipeline_layout(ds):
  batches = list(D.episode_pipeline(ds, 'default', 'train',
                                    batch_episodes=2, window_size=K,
                                    fetch_target=True, seed=0))
  assert len(batches) == 2  # 4 train episodes / 2
  b = batches[0]
  F = T - 1  # droplast
  N = F  # (F - K + 1) + (K - 1) start-padded
  assert b['frames'].shape == (2, F, H, W, 3)
  assert b['frames'].dtype == np.uint8
  assert b['target_rgb'].shape == (2, H, W, 3)
  assert b['widx'].shape == (N, K)
  assert b['valid'].all()
  assert b['jnt_state'].shape == (2, F, 7)
  for k, d in (('cmd', 4), ('vel_target', 7), ('ee_target', 7),
               ('grp_target', 2), ('pos_ee', 3), ('pos_obj', 3)):
    assert b[k].shape == (2, N, d), k
  # label parity with the window pipeline: cmd label = cmd at the window's
  # last frame (_prepare_v4)
  feats, labels = D.episode_windows(
      os.path.join(ds, 'data', 'replay_buffer_0001.npz'), window_size=K,
      fetch_target=True)
  # find which batch/slot episode 1 landed in
  for bb in batches:
    for s in range(2):
      if np.array_equal(bb['cmd'][s], labels['cmd']):
        return
  raise AssertionError('episode 1 labels not found in any batch slot')


def test_stateless_matches_per_window_serving(ds):
  """stateless eval_step == per-window __call__ with fresh carry."""
  cfg = _config()  # train_carry defaults to 'stateless'
  init_fn, train_step, eval_step, _ = make_episode_train_fns(
      cfg, True, chunk_windows=4)
  ts = init_fn(jax.random.PRNGKey(3), 2)
  # nonzero head so outputs are carry/feature sensitive
  k = ts.params['LSTMDecoder']['pred_cmd_ee']['kernel']
  ts.params['LSTMDecoder']['pred_cmd_ee']['kernel'] = \
      jnp.ones_like(k) * 0.05
  b = next(iter(D.episode_pipeline(ds, 'default', 'train',
                                   batch_episodes=2, window_size=K,
                                   fetch_target=True, seed=0)))
  b = jax.tree.map(jnp.asarray, b)
  m = eval_step(ts, b)

  model = make_model(cfg, True)
  frames = b['frames'].astype(jnp.float32) / 255.0
  tgt = b['target_rgb'].astype(jnp.float32) / 255.0
  carry0 = (jnp.zeros((2, cfg.dim_h_lstm)), jnp.zeros((2, cfg.dim_h_lstm)))
  preds = []
  for t in range(b['widx'].shape[0]):
    idx = b['widx'][t]
    ep, _ = model.apply({'params': ts.params}, frames[:, idx],
                        b['jnt_state'][:, idx], tgt, carry0,
                        jnp.asarray(True))
    preds.append(ep['pred_cmd_ee'])
  preds = jnp.stack(preds)
  cmd = jnp.swapaxes(b['cmd'], 0, 1)[..., :3]
  naive = float(jnp.mean(jnp.square(preds - cmd)))
  # GroupNorm reduction order differs between the chunked and the
  # per-window path: allow small numerical slack
  assert abs(naive - float(m['loss_cmd_ee'])) < 2e-3


def test_scan_matches_sequential_serving(ds):
  """bptt eval_step's scan forward == sequential __call__ with carry."""
  cfg = _config(train_carry='bptt')
  init_fn, train_step, eval_step, _ = make_episode_train_fns(
      cfg, True, chunk_windows=4)
  ts = init_fn(jax.random.PRNGKey(0), 2)
  b = next(iter(D.episode_pipeline(ds, 'default', 'train',
                                   batch_episodes=2, window_size=K,
                                   fetch_target=True, seed=0)))
  b = jax.tree.map(jnp.asarray, b)
  m = eval_step(ts, b)
  assert float(m['canary_std']) >= 0

  # naive forward: thread the carry through consecutive windows
  model = make_model(cfg, True)
  carry = (jnp.zeros((2, cfg.dim_h_lstm)), jnp.zeros((2, cfg.dim_h_lstm)))
  frames = b['frames'].astype(jnp.float32) / 255.0
  tgt = b['target_rgb'].astype(jnp.float32) / 255.0
  preds = []
  for t in range(b['widx'].shape[0]):
    idx = b['widx'][t]
    ep, carry = model.apply({'params': ts.params}, frames[:, idx],
                            b['jnt_state'][:, idx], tgt, carry,
                            jnp.asarray(False))
    preds.append(ep['pred_cmd_ee'])
  preds = jnp.stack(preds)  # [N, B, 3]
  cmd = jnp.swapaxes(b['cmd'], 0, 1)[..., :3]
  naive = float(jnp.mean(jnp.square(preds - cmd)))
  # GroupNorm reduction order differs between the chunked and the
  # per-window path: allow small numerical slack
  assert abs(naive - float(m['loss_cmd_ee'])) < 2e-3


def test_learns(ds):
  cfg = _config()
  init_fn, train_step, eval_step, _ = make_episode_train_fns(
      cfg, True, chunk_windows=4)
  ts = init_fn(jax.random.PRNGKey(0), 2)
  train_step = jax.jit(train_step)
  b = next(iter(D.episode_pipeline(ds, 'default', 'train',
                                   batch_episodes=2, window_size=K,
                                   fetch_target=True, seed=0)))
  b = jax.tree.map(jnp.asarray, b)
  losses = []
  for _ in range(150):
    ts, m = train_step(ts, b)
    losses.append(float(m['loss_cmd_ee']))
  # cmd_ee is a deterministic function of jnt_state (see _episode): the
  # command head must learn it well below its zero-prediction floor
  # (zero-init heads make the first ~40 steps a slow ramp)
  assert losses[-1] < 0.35 * losses[0], losses[::30]
  assert float(m['canary_std']) > 1e-3  # not a constant predictor


def test_unconditional_variant(ds):
  cfg = _config(proc_obs='sequence', proc_tgt='constant')
  init_fn, train_step, eval_step, _ = make_episode_train_fns(
      cfg, False, chunk_windows=4)
  ts = init_fn(jax.random.PRNGKey(0), 2)
  b = next(iter(D.episode_pipeline(ds, 'default', 'train',
                                   batch_episodes=2, window_size=K,
                                   seed=0)))
  b = jax.tree.map(jnp.asarray, b)
  ts, m = jax.jit(train_step)(ts, b)
  assert np.isfinite(float(m['loss']))


def test_velocity_mode(ds):
  cfg = _config(control_mode='velocity')
  init_fn, train_step, eval_step, _ = make_episode_train_fns(
      cfg, True, chunk_windows=4)
  ts = init_fn(jax.random.PRNGKey(0), 2)
  b = next(iter(D.episode_pipeline(ds, 'default', 'train',
                                   batch_episodes=2, window_size=K,
                                   fetch_target=True, seed=0)))
  b = jax.tree.map(jnp.asarray, b)
  ts, m = jax.jit(train_step)(ts, b)
  for k in ('loss_cmd_vel', 'loss_cmd_ee', 'loss_cmd_grp'):
    assert np.isfinite(float(m[k])), k


def test_aug_shift_keeps_layout(ds):
  b0 = next(iter(D.episode_pipeline(ds, 'default', 'train',
                                    batch_episodes=2, window_size=K,
                                    fetch_target=True, seed=0)))
  ba = next(iter(D.episode_pipeline(ds, 'default', 'train',
                                    batch_episodes=2, window_size=K,
                                    fetch_target=True, seed=0,
                                    aug_shift=3)))
  assert ba['frames'].shape == b0['frames'].shape
  assert ba['frames'].dtype == np.uint8
  assert not np.array_equal(ba['frames'], b0['frames'])
  # labels unchanged by an image-space augmentation
  assert np.array_equal(ba['cmd'], b0['cmd'])


def test_train_state_roundtrip(ds, tmp_path):
  from geeco_tpu.models import snapshots
  cfg = _config()
  init_fn, train_step, _, _ = make_episode_train_fns(cfg, True,
                                                     chunk_windows=4)
  ts = init_fn(jax.random.PRNGKey(0), 2)
  b = next(iter(D.episode_pipeline(ds, 'default', 'train',
                                   batch_episodes=2, window_size=K,
                                   fetch_target=True, seed=0)))
  b = jax.tree.map(jnp.asarray, b)
  ts, _ = train_step(ts, b)
  path = snapshots.save_train_state(str(tmp_path), 1, ts)
  ts2 = snapshots.restore_train_state(path, init_fn(jax.random.PRNGKey(1),
                                                    2))
  assert int(ts2.step) == int(ts.step)
  leaves1 = jax.tree.leaves(ts.params)
  leaves2 = jax.tree.leaves(ts2.params)
  assert all(np.allclose(a, b) for a, b in zip(leaves1, leaves2))
  # optimizer moments restored too
  mu1 = jax.tree.leaves(ts.opt_state)
  mu2 = jax.tree.leaves(ts2.opt_state)
  assert len(mu1) == len(mu2)
  assert all(np.allclose(a, b) for a, b in zip(mu1, mu2)
             if hasattr(a, 'shape'))


def test_loss_weighting_cmd_mag(ds):
  """cmd_mag re-weights command losses, leaves aux losses untouched."""
  b = next(iter(D.episode_pipeline(ds, 'default', 'train',
                                   batch_episodes=2, window_size=K,
                                   fetch_target=True, seed=0)))
  b = jax.tree.map(jnp.asarray, b)
  outs = {}
  for lw in ('none', 'cmd_mag'):
    cfg = _config(loss_weighting=lw)
    init_fn, _, eval_step, _ = make_episode_train_fns(cfg, True,
                                                      chunk_windows=4)
    ts = init_fn(jax.random.PRNGKey(3), 2)
    k = ts.params['LSTMDecoder']['pred_cmd_ee']['kernel']
    ts.params['LSTMDecoder']['pred_cmd_ee']['kernel'] = \
        jnp.ones_like(k) * 0.05
    outs[lw] = eval_step(ts, b)
  for key, m in outs.items():
    for part, v in m.items():
      assert np.isfinite(float(v)), (key, part)
  # same params: aux (unweighted) losses identical, command losses differ
  np.testing.assert_allclose(float(outs['none']['loss_pos_ee']),
                             float(outs['cmd_mag']['loss_pos_ee']),
                             rtol=1e-6)
  assert abs(float(outs['none']['loss_cmd_ee']) -
             float(outs['cmd_mag']['loss_cmd_ee'])) > 1e-7
  # weights are renormalized to mean 1: same order of magnitude
  r = float(outs['cmd_mag']['loss_cmd_ee']) / \
      max(float(outs['none']['loss_cmd_ee']), 1e-9)
  assert 0.2 < r < 5.0, r


# ---------------------------------------------------- state-only datasets


_NQ = 9


def _render_stub(q, mc, rgba):
  """Deterministic pseudo-renderer: pixels are a pure function of the
  state, so frame-mode and state-only batches must produce identical
  losses (the real path uses envs/base.py render_from_qpos)."""
  v = jnp.sum(q) + 0.3 * jnp.sum(mc) + 0.1 * jnp.sum(rgba)
  x = jnp.sin(jnp.arange(H * W * 3, dtype=jnp.float32) * 0.13 + v)
  rgb = ((x.reshape(H, W, 3) * 0.5 + 0.5) * 255).astype(jnp.uint8)
  return rgb, jnp.zeros((H, W), jnp.float32)


def _state_episode(seed):
  ep = _episode(seed)
  rng = np.random.RandomState(seed + 1000)
  qpos = rng.randn(T, _NQ).astype(np.float32)
  rgba = rng.rand(4, 4).astype(np.float32)
  rgb = np.stack([
      np.asarray(_render_stub(qpos[t], ep['mocap_qpos-robot0:mocap'][t],
                              rgba)[0]) for t in range(T)])
  state_ep = {k: v for k, v in ep.items() if k not in ('rgb', 'depth')}
  state_ep['full_qpos'] = qpos
  state_ep['rgba'] = rgba
  frame_ep = dict(ep)
  frame_ep['rgb'] = rgb
  del frame_ep['depth']
  return state_ep, frame_ep


@pytest.fixture(scope='module')
def ds_pair(tmp_path_factory):
  """Two datasets with IDENTICAL trajectories: one state-only, one with
  the stub-rendered frames materialized on disk."""
  roots = {}
  for kind in ('states', 'frames'):
    root = str(tmp_path_factory.mktemp('sds') / kind)
    os.makedirs(os.path.join(root, 'meta'))
    with open(os.path.join(root, 'meta', 'meta_info.json'), 'w') as fp:
      json.dump({'episode_length': T, 'img_height': H, 'img_width': W,
                 'shapes': 'stub'}, fp)
    names = []
    for i in range(2):
      name = f'replay_buffer_{i + 1:04d}'
      state_ep, frame_ep = _state_episode(i)
      save_episode_npz(os.path.join(root, 'data', name + '.npz'),
                       state_ep if kind == 'states' else frame_ep,
                       {'task_goal': 'goal0', 'task_object': 'object0'})
      names.append(name)
    os.makedirs(os.path.join(root, 'splits', 'default'))
    for mode in ('train', 'eval', 'test'):
      with open(os.path.join(root, 'splits', 'default', mode + '.txt'),
                'w') as fp:
        fp.write('\n'.join(names) + '\n')
    roots[kind] = root
  return roots


def test_state_only_batch_layout(ds_pair):
  b = next(iter(D.episode_pipeline(ds_pair['states'], 'default', 'train',
                                   batch_episodes=2, window_size=K,
                                   fetch_target=True, seed=0,
                                   aug_shift=2)))
  F = T - 1
  assert 'frames' not in b
  assert b['qpos'].shape == (2, F, _NQ)
  assert b['mocap'].shape == (2, F, 7)
  assert b['rgba'].shape == (2, 4, 4)
  assert b['tgt_qpos'].shape == (2, _NQ)
  assert b['tgt_mocap'].shape == (2, 7)
  assert b['aug_shift'].shape == (2, 2)
  assert np.abs(b['aug_shift']).max() <= 2


def test_state_only_matches_frame_mode(ds_pair):
  """eval_step on a state-only batch (on-device re-render) must equal
  eval_step on the equivalent frames-on-disk batch exactly."""
  cfg = _config()
  init_fn, _, eval_f, _ = make_episode_train_fns(cfg, True,
                                                 chunk_windows=4)
  _, _, eval_s, _ = make_episode_train_fns(cfg, True, chunk_windows=4,
                                           render_fn=_render_stub)
  ts = init_fn(jax.random.PRNGKey(3), 2)
  kw = dict(batch_episodes=2, window_size=K, fetch_target=True,
            shuffle=False)
  bf = next(iter(D.episode_pipeline(ds_pair['frames'], 'default', 'train',
                                    **kw)))
  bs = next(iter(D.episode_pipeline(ds_pair['states'], 'default', 'train',
                                    **kw)))
  mf = eval_f(ts, jax.tree.map(jnp.asarray, bf))
  ms = eval_s(ts, jax.tree.map(jnp.asarray, bs))
  for k in mf:
    np.testing.assert_allclose(float(ms[k]), float(mf[k]), rtol=1e-5,
                               err_msg=k)


def test_state_only_aug_shift_matches_host_shift(ds_pair):
  """The on-device post-render shift must match the host-side numpy
  shift (data/dataset.py _shift2d) applied to the same frames."""
  cfg = _config()
  s = 3
  init_fn, _, eval_f, _ = make_episode_train_fns(cfg, True,
                                                 chunk_windows=4)
  _, _, eval_s, _ = make_episode_train_fns(cfg, True, chunk_windows=4,
                                           render_fn=_render_stub,
                                           aug_pad=s)
  ts = init_fn(jax.random.PRNGKey(3), 2)
  kw = dict(batch_episodes=2, window_size=K, fetch_target=True,
            shuffle=False)
  bf = next(iter(D.episode_pipeline(ds_pair['frames'], 'default', 'train',
                                    **kw)))
  bs = next(iter(D.episode_pipeline(ds_pair['states'], 'default', 'train',
                                    **kw)))
  shifts = np.asarray([[1, -2], [-3, 0]], np.int32)
  bs['aug_shift'] = shifts
  for bi in range(2):
    dy, dx = shifts[bi]
    bf['frames'][bi] = D._shift2d(bf['frames'][bi], dy, dx, s)
    bf['target_rgb'][bi] = D._shift2d(bf['target_rgb'][bi], dy, dx, s)
  mf = eval_f(ts, jax.tree.map(jnp.asarray, bf))
  ms = eval_s(ts, jax.tree.map(jnp.asarray, bs))
  for k in mf:
    np.testing.assert_allclose(float(ms[k]), float(mf[k]), rtol=1e-5,
                               err_msg=k)
