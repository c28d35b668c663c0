"""Checkpointing + best-K snapshot manager.

Reference semantics (scripts/train_e2evmc.py:143-205, 221-224):
  * rolling step checkpoints in <model_dir>/ckpt-<step>
  * after each epoch's eval, export the latest checkpoint into
    <model_dir>/snapshots/<name>/ together with config/runcmd JSONs,
    maintain snapshots/snapshot_index.json [{step, loss, dir}, ...] and
    garbage-collect the worst-loss snapshot beyond num_best_ckpt.

Storage: flax msgpack serialization of the parameter pytree (orbax is
available but msgpack files keep the round-1 dependency surface minimal and
are trivially portable).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import List, Optional

import jax
from flax import serialization


def save_checkpoint(model_dir: str, step: int, params,
                    keep_last: int = 2) -> str:
  os.makedirs(model_dir, exist_ok=True)
  path = os.path.join(model_dir, f'ckpt-{step:08d}.msgpack')
  with open(path, 'wb') as f:
    f.write(serialization.to_bytes(jax.device_get(params)))
  # rolling GC (keep_checkpoint_max semantics)
  ckpts = sorted(glob.glob(os.path.join(model_dir, 'ckpt-*.msgpack')))
  for old in ckpts[:-keep_last]:
    os.remove(old)
  return path


def latest_checkpoint(model_dir: str) -> Optional[str]:
  ckpts = sorted(glob.glob(os.path.join(model_dir, 'ckpt-*.msgpack')))
  return ckpts[-1] if ckpts else None


def restore_params(path: str, params_template):
  with open(path, 'rb') as f:
    return serialization.from_bytes(params_template, f.read())


def checkpoint_step(path: str) -> int:
  base = os.path.basename(path)
  return int(base.split('-')[1].split('.')[0])


# ------------------------------------------------- full train-state ckpts


def save_train_state(model_dir: str, step: int, train_state,
                     keep_last: int = 2) -> str:
  """Params + optimizer state + step, so a watchdog restart resumes the
  exact optimization trajectory (a params-only restore silently resets the
  Adam moments every restart)."""
  os.makedirs(model_dir, exist_ok=True)
  payload = {'params': jax.device_get(train_state.params),
             'opt_state': jax.device_get(train_state.opt_state),
             'step': int(train_state.step)}
  path = os.path.join(model_dir, f'state-{step:08d}.msgpack')
  with open(path, 'wb') as f:
    f.write(serialization.to_bytes(payload))
  states = sorted(glob.glob(os.path.join(model_dir, 'state-*.msgpack')))
  for old in states[:-keep_last]:
    os.remove(old)
  return path


def latest_train_state(model_dir: str) -> Optional[str]:
  states = sorted(glob.glob(os.path.join(model_dir, 'state-*.msgpack')))
  return states[-1] if states else None


def restore_train_state(path: str, train_state):
  """Restore a TrainState template saved by save_train_state."""
  template = {'params': jax.device_get(train_state.params),
              'opt_state': jax.device_get(train_state.opt_state),
              'step': 0}
  with open(path, 'rb') as f:
    payload = serialization.from_bytes(template, f.read())
  import jax.numpy as jnp
  return train_state.replace(
      params=payload['params'], opt_state=payload['opt_state'],
      step=jnp.asarray(payload['step'], jnp.int32))


# ------------------------------------------------------------- snapshots


def _index_path(model_dir: str) -> str:
  return os.path.join(model_dir, 'snapshots', 'snapshot_index.json')


def load_snapshot_index(model_dir: str) -> List[dict]:
  p = _index_path(model_dir)
  if os.path.exists(p):
    with open(p) as fp:
      return json.load(fp)
  return []


def export_snapshot(model_dir: str, eval_loss: float,
                    num_best: int = 3) -> Optional[str]:
  """Copy the latest checkpoint into snapshots/, keep the best-K by loss."""
  ckpt = latest_checkpoint(model_dir)
  if ckpt is None:
    return None
  step = checkpoint_step(ckpt)
  name = f'snapshot-{step:08d}'
  snap_dir = os.path.join(model_dir, 'snapshots', name)
  os.makedirs(snap_dir, exist_ok=True)
  shutil.copy(ckpt, snap_dir)
  # copy config + runcmd JSONs alongside (train_e2evmc.py:176)
  for fn in os.listdir(model_dir):
    if fn.endswith('config.json') or fn.endswith('runcmd.json'):
      shutil.copy(os.path.join(model_dir, fn), snap_dir)

  index = load_snapshot_index(model_dir)
  index = [e for e in index if e['step'] != step]
  index.append({'step': step, 'loss': float(eval_loss), 'dir': snap_dir})
  index.sort(key=lambda e: e['loss'])
  # GC worst beyond num_best
  while len(index) > num_best:
    worst = index.pop()
    if os.path.isdir(worst['dir']):
      shutil.rmtree(worst['dir'])
  with open(_index_path(model_dir), 'w') as fp:
    json.dump(index, fp, indent=2)
  return snap_dir


def best_snapshot(model_dir: str) -> Optional[str]:
  index = load_snapshot_index(model_dir)
  if not index:
    return None
  best = min(index, key=lambda e: e['loss'])
  ckpts = glob.glob(os.path.join(best['dir'], 'ckpt-*.msgpack'))
  return ckpts[0] if ckpts else None
