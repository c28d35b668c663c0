"""Native TFRecord writer round-trip tests (CRC framing, zlib, V4 schema)."""

import numpy as np
import pytest

from geeco_tpu.data.tfrecord_io import (TfrWriter, read_tfrecord,
                                        write_episode_tfrecord)


def test_roundtrip_basic(tmp_path):
  path = str(tmp_path / 'test.tfrecord.zlib')
  ctx = {
      'episode_length': 5,
      'img_height': 4,
      'task_goal': 'goal0',
      'monitored_joints': ['a', 'b'],
  }
  rng = np.random.RandomState(0)
  lists = {
      'step': np.arange(5, dtype=np.int64),
      'cmd': rng.randn(5, 4).astype(np.float32),
      'rgb': rng.randint(0, 255, (5, 4, 4, 3)).astype(np.float32),
  }
  with TfrWriter(path) as w:
    w.write_example(ctx, lists)
  out = read_tfrecord(path)
  assert len(out) == 1
  rctx, rlists = out[0]
  assert int(rctx['episode_length'][0]) == 5
  assert rctx['task_goal'] == [b'goal0']
  assert rctx['monitored_joints'] == [b'a', b'b']
  np.testing.assert_array_equal(
      np.asarray([f[0] for f in rlists['step']]), lists['step'])
  got_cmd = np.stack(rlists['cmd'])
  np.testing.assert_allclose(got_cmd, lists['cmd'])
  got_rgb = np.stack(rlists['rgb']).reshape(5, 4, 4, 3)
  np.testing.assert_allclose(got_rgb, lists['rgb'])


def test_multiple_examples(tmp_path):
  path = str(tmp_path / 'multi.tfrecord.zlib')
  with TfrWriter(path) as w:
    for i in range(3):
      w.write_example({'idx': i}, {'x': np.full((2, 3), i, np.float32)})
  out = read_tfrecord(path)
  assert len(out) == 3
  for i, (ctx, lists) in enumerate(out):
    assert int(ctx['idx'][0]) == i
    np.testing.assert_allclose(np.stack(lists['x']),
                               np.full((2, 3), i))


def test_uncompressed(tmp_path):
  path = str(tmp_path / 'raw.tfrecord')
  with TfrWriter(path, compression='none') as w:
    w.write_example({'a': 1.5}, {'y': np.ones((2, 2), np.float32)})
  out = read_tfrecord(path, compression='none')
  np.testing.assert_allclose(out[0][0]['a'], [1.5])


def test_episode_export_v4_keys(tmp_path):
  path = str(tmp_path / 'ep.tfrecord.zlib')
  T = 4
  records = {
      'step': np.arange(T),
      'ts': np.arange(T) * 0.04,
      'rgb': np.random.RandomState(0).randint(0, 255, (T, 4, 4, 3),
                                              dtype=np.uint8),
      'depth': np.zeros((T, 4, 4), np.float32),
      'cmd': np.zeros((T, 4), np.float32),
      'ctrl': np.zeros((T, 2), np.float32),
      'joint_qpos-robot0:slide0': np.zeros(T, np.float32),
      'mocap_qpos-robot0:mocap': np.zeros((T, 7), np.float32),
      'goal_qpos': np.zeros((T, 7), np.float32),
      'obj_qpos': np.zeros((T, 7), np.float32),
  }
  ctx = {'episode_length': T, 'img_height': 4, 'img_width': 4,
         'dim_cmd': 4, 'dim_ctrl': 2, 'task_goal': 'goal1',
         'task_object': 'object0',
         'monitored_joints': ['robot0:slide0']}
  write_episode_tfrecord(path, records, ctx)
  (rctx, rlists), = read_tfrecord(path)
  # V4 frame keys present (geeco_gym.py:135-157)
  for k in ('step', 'ts', 'rgb', 'depth', 'cmd', 'ctrl', 'goal_qpos',
            'obj_qpos', 'joint_qpos-robot0:slide0',
            'mocap_qpos-robot0:mocap'):
    assert k in rlists, k
  # rgb stored as float-encoded uint8 values (tfrecord.py:73 reference)
  rgb = np.stack(rlists['rgb']).reshape(T, 4, 4, 3)
  np.testing.assert_allclose(rgb, records['rgb'].astype(np.float32))
  assert rctx['task_goal'] == [b'goal1']


def test_crc_integrity(tmp_path):
  """Framing CRCs match the TFRecord spec (masked crc32c)."""
  import struct
  import zlib as _zlib
  path = str(tmp_path / 'crc.tfrecord')
  with TfrWriter(path, compression='none') as w:
    w.write_example({'a': 1}, {})
  raw = open(path, 'rb').read()
  (length,) = struct.unpack('<Q', raw[:8])
  (len_crc,) = struct.unpack('<I', raw[8:12])

  def masked_crc32c(data):
    # crc32c via manual table (mirror of the native implementation)
    table = []
    for i in range(256):
      c = i
      for _ in range(8):
        c = (0x82f63b78 ^ (c >> 1)) if c & 1 else c >> 1
      table.append(c)
    c = 0xffffffff
    for b in data:
      c = table[(c ^ b) & 0xff] ^ (c >> 8)
    c ^= 0xffffffff
    return (((c >> 15) | (c << 17)) + 0xa282ead8) & 0xffffffff

  assert masked_crc32c(raw[:8]) == len_crc
  data = raw[12:12 + length]
  (data_crc,) = struct.unpack('<I', raw[12 + length:16 + length])
  assert masked_crc32c(data) == data_crc


def test_train_step_from_tfrecord_only_dataset(tmp_path):
  """A dataset collected by the REFERENCE stack (.tfrecord.zlib records,
  no npz) feeds episode_pipeline and one training step directly
  (reference input contract: src/data/geeco_gym.py:401)."""
  import json
  import os

  import jax
  import jax.numpy as jnp

  from geeco_tpu.data import dataset as D
  from geeco_tpu.data.episode import load_episode
  from geeco_tpu.models.params import create_e2evmc_config
  from geeco_tpu.models.train import make_episode_train_fns

  H = W = 16
  T = 8
  K = 3
  root = str(tmp_path / 'ds')
  os.makedirs(os.path.join(root, 'meta'))
  with open(os.path.join(root, 'meta', 'meta_info.json'), 'w') as fp:
    json.dump({'episode_length': T, 'img_height': H, 'img_width': W}, fp)
  rng = np.random.RandomState(0)
  names = []
  for i in range(2):
    recs = {
        'step': np.arange(T, dtype=np.int64),
        'ts': np.arange(T, dtype=np.float32) * 0.04,
        'rgb': rng.randint(0, 255, (T, H, W, 3)).astype(np.uint8),
        'cmd': np.clip(rng.randn(T, 4), -1, 1).astype(np.float32),
        'ctrl': rng.randn(T, 2).astype(np.float32),
        'mocap_qpos-robot0:mocap': rng.randn(T, 7).astype(np.float32),
        'goal_qpos': rng.randn(T, 7).astype(np.float32),
        'obj_qpos': rng.randn(T, 7).astype(np.float32),
    }
    for j in D.ARM_JOINTS + D.FINGER_JOINTS:
      recs[f'joint_qpos-{j}'] = rng.randn(T).astype(np.float32)
      recs[f'joint_qvel-{j}'] = rng.randn(T).astype(np.float32)
    name = f'replay_buffer_{i + 1:04d}'
    write_episode_tfrecord(
        os.path.join(root, 'data', name + '.tfrecord.zlib'), recs,
        {'task_goal': 'goal0', 'task_object': 'object0',
         'episode_length': T, 'img_height': H, 'img_width': W})
    names.append(name)
  os.makedirs(os.path.join(root, 'splits', 'default'))
  for mode in ('train', 'eval', 'test'):
    with open(os.path.join(root, 'splits', 'default', mode + '.txt'),
              'w') as fp:
      fp.write('\n'.join(names) + '\n')

  # loader round-trips the npz schema (uint8 rgb, squeezed scalars)
  ep, ctx = load_episode(
      os.path.join(root, 'data', 'replay_buffer_0001.tfrecord.zlib'))
  assert ep['rgb'].shape == (T, H, W, 3) and ep['rgb'].dtype == np.uint8
  assert ep['ts'].shape == (T,)
  assert ctx['task_goal'] == 'goal0'

  batches = list(D.episode_pipeline(root, 'default', 'train',
                                    batch_episodes=2, window_size=K,
                                    fetch_target=True, seed=0))
  assert len(batches) == 1
  assert batches[0]['frames'].shape == (2, T - 1, H, W, 3)

  config = create_e2evmc_config(dict(
      img_height=H, img_width=W, img_channels=3, window_size=K,
      proc_obs='dynimg', proc_tgt='dyndiff', dim_s_obs=16, dim_s_dyn=16,
      dim_s_diff=16, dim_h_lstm=16, dim_h_fc=16, lr=3e-3,
      compute_dtype='float32'))
  init_fn, train_step, _, _ = make_episode_train_fns(config, True,
                                                     chunk_windows=4)
  ts = init_fn(jax.random.PRNGKey(0), 2)
  b = jax.tree.map(jnp.asarray, batches[0])
  ts, metrics = jax.jit(train_step)(ts, b)
  assert np.isfinite(float(metrics['loss_cmd_ee']))
