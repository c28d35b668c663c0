"""Data pipeline tests: schema, windows, splits, keyframes (synthetic)."""

import json
import os

import numpy as np
import pytest

from geeco_tpu.data import dataset as D
from geeco_tpu.data import keyframes as KF
from geeco_tpu.data import splits as S
from geeco_tpu.data.episode import load_episode_npz, save_episode_npz

ARM = D.ARM_JOINTS
FINGERS = D.FINGER_JOINTS


def _synthetic_episode(T=12, H=8, W=8, seed=0):
  rng = np.random.RandomState(seed)
  ep = {
      'step': np.arange(T, dtype=np.int64),
      'ts': np.arange(T, dtype=np.float32) * 0.04,
      'rgb': rng.randint(0, 255, (T, H, W, 3), dtype=np.uint8),
      'depth': rng.rand(T, H, W).astype(np.float32),
      'cmd': rng.randn(T, 4).astype(np.float32),
      'ctrl': rng.randn(T, 2).astype(np.float32),
      'mocap_qpos-robot0:mocap': rng.randn(T, 7).astype(np.float32),
      'goal_qpos': rng.randn(T, 7).astype(np.float32),
      'obj_qpos': rng.randn(T, 7).astype(np.float32),
  }
  for j in ARM + FINGERS + ('robot0:slide0',):
    ep[f'joint_qpos-{j}'] = rng.randn(T).astype(np.float32)
    ep[f'joint_qvel-{j}'] = rng.randn(T).astype(np.float32)
  ep['object_qpos-object0:joint'] = rng.randn(T, 7).astype(np.float32)
  return ep


def _make_dataset(tmp_path, n_records=4, T=12):
  root = str(tmp_path / 'ds')
  os.makedirs(os.path.join(root, 'meta'), exist_ok=True)
  with open(os.path.join(root, 'meta', 'meta_info.json'), 'w') as fp:
    json.dump({'episode_length': T, 'img_height': 8, 'img_width': 8}, fp)
  tasks = [('goal0', 'object0'), ('goal1', 'object0'),
           ('goal0', 'object1'), ('goal1', 'object1')]
  for i in range(n_records):
    ep = _synthetic_episode(T=T, seed=i)
    g, o = tasks[i % len(tasks)]
    save_episode_npz(
        os.path.join(root, 'data', f'replay_buffer_{i + 1:04d}.npz'), ep,
        {'task_goal': g, 'task_object': o, 'episode_length': T})
  return root


def test_episode_roundtrip(tmp_path):
  ep = _synthetic_episode()
  path = str(tmp_path / 'data' / 'replay_buffer_0001.npz')
  save_episode_npz(path, ep, {'task_goal': 'goal0'})
  back, ctx = load_episode_npz(path)
  assert ctx['task_goal'] == 'goal0'
  for k in ep:
    np.testing.assert_array_equal(back[k], ep[k])


def test_window_pipeline_alignment(tmp_path):
  root = _make_dataset(tmp_path, n_records=1, T=12)
  paths = D.list_records(root)
  f, l = D.episode_windows(paths[0], window_size=4, fetch_target=True)
  # 12 frames -> drop last -> 11 -> 8 sliding windows + 3 start-padded
  assert f['step'].shape == (11, 4)
  assert f['rgb'].shape == (11, 4, 8, 8, 3)
  assert f['rgb'].max() <= 1.0  # normalized from uint8
  assert f['target_rgb'].shape == (11, 8, 8, 3)
  assert l['cmd'].shape == (11, 4)
  ep, _ = load_episode_npz(paths[0])
  # start-padded windows repeat frame 0 (ring-buffer serving semantics)
  np.testing.assert_array_equal(f['step'][0], [0, 0, 0, 0])
  np.testing.assert_array_equal(f['step'][2], [0, 0, 1, 2])
  np.testing.assert_allclose(l['cmd'][0], ep['cmd'][0])
  np.testing.assert_allclose(l['cmd'][2], ep['cmd'][2])
  # label = last frame of window (first unpadded window at row 3)
  np.testing.assert_allclose(l['cmd'][3], ep['cmd'][3])
  np.testing.assert_allclose(l['cmd'][8], ep['cmd'][8])
  # vel_target = next-frame vel_state
  vel_state = np.stack([ep[f'joint_qvel-{j}'] for j in ARM], 1)
  np.testing.assert_allclose(l['vel_target'][3], vel_state[4], rtol=1e-6)
  # windows overlap correctly
  np.testing.assert_array_equal(f['step'][4], [1, 2, 3, 4])


def test_input_pipeline_batches(tmp_path):
  root = _make_dataset(tmp_path, n_records=8, T=12)
  S.create_split(root, 'default')
  batches = list(D.input_pipeline(root, 'default', 'train', batch_size=4,
                                  num_epochs=2, seed=0))
  assert batches, 'no batches yielded'
  f, l = batches[0]
  assert f['rgb'].shape == (4, 4, 8, 8, 3)
  assert l['cmd'].shape == (4, 4)


def test_splits_stratified(tmp_path):
  root = _make_dataset(tmp_path, n_records=8, T=6)
  out = S.create_split(root, 'balanced')
  n = sum(len(v) for v in out.values())
  assert n == 8
  # all three files written
  for mode in ('train', 'eval', 'test'):
    p = os.path.join(root, 'splits', 'balanced', f'{mode}.txt')
    assert os.path.exists(p)
  # fasttest puts everything in test
  out2 = S.create_split(root, 'fasttest')
  assert len(out2['test']) == 8 and not out2['train']


def test_keyframe_extraction(tmp_path):
  root = _make_dataset(tmp_path, n_records=2, T=6)
  # annotate keyframes for record 1
  with open(os.path.join(root, 'data', 'key_frames_0001.json'), 'w') as fp:
    json.dump([1, 3], fp)
  n = KF.extract_targets(root)
  assert n == 2
  tf = KF.load_target_frame(root, 'replay_buffer_0001', load_depth=True)
  assert tf.shape == (8, 8, 4)
  frames = KF.load_target_frames(root, 'replay_buffer_0001')
  assert len(frames) == 2  # the two annotated keyframes
  frames2 = KF.load_target_frames(root, 'replay_buffer_0002')
  assert len(frames2) == 1  # falls back to single target frame
  # target frame == last episode frame (round trip through PNG)
  ep, _ = load_episode_npz(
      os.path.join(root, 'data', 'replay_buffer_0002.npz'))
  tf2 = KF.load_target_frame(root, 'replay_buffer_0002', load_depth=False)
  np.testing.assert_allclose(tf2 * 255.0, ep['rgb'][-1].astype(np.float32),
                             atol=0.5)
