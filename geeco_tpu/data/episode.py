"""Episode capture: on-device per-step records -> host episode archives.

Schema parity with ``PickAndPlaceEncodingV4`` (reference:
src/data/geeco_gym.py:54-158): per-frame keys step/ts/rgb/depth/cmd/ctrl,
per-joint qpos/qvel, mocap qpos, per-object qpos and the task goal/object
qpos.  Recording happens with the PRE-step state and the action about to be
applied (reference order: pickplace.py:326-340).

TPU-native design: ``make_record_fn`` returns a pure function used inside
the rollout ``lax.scan`` — a whole episode's records come back as stacked
device arrays, and the host only touches them once per episode to write
the archive (recording is a side channel, never feeding back into control,
mirroring pickplace.py:336-338).

Storage: compressed ``.npz`` with a JSON context sidecar — the TPU-era
equivalent of the reference's zlib TFRecord SequenceExamples; RGB is stored
as uint8 (the loader normalizes to [0, 1] like _parse_v4, geeco_gym.py:310).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.model import get_joint_qpos
from ..envs.base import EnvState, GeecoEnv


def meta_info_dict(env: GeecoEnv) -> Dict:
  """Dataset meta (reference: pickplace.py:156-166)."""
  h = env.renderer.height
  w = env.renderer.width
  return {
      'episode_length': 100,
      'img_height': h,
      'img_width': w,
      'shapes': env.shapes,
      'monitored_joints': list(env.monitored_joints),
      'actuated_joints': list(env.actuated_joints),
      'monitored_mocaps': ['robot0:mocap'],
      'monitored_objects': list(env.obj_joint_names),
      'dim_cmd': 4,
      'dim_ctrl': len(env.actuated_joints),
      # renderer settings: a state-only dataset re-renders at train time,
      # so non-default rendering (--shadows/--tex_grid) must be recorded
      # for the 'exact pixels' guarantee to hold (ADVICE r4)
      'renderer_kwargs': dict(getattr(env, 'renderer_kwargs', {})),
  }


def make_record_fn(env: GeecoEnv, with_frames: bool = True,
                   with_depth: bool = True, with_state: bool = False):
  """Per-step record function for expert.rollout(record_fn=...).

  with_state records the full ``qpos`` vector per step: together with the
  recorded mocap pose and the per-episode recolor table this is enough to
  re-render the exact frame later (envs/base.py render_from_qpos), so a
  state-only dataset (~40 KB/episode vs ~20 MB with frames) trains with
  on-device re-rendering instead of shipping pixels over the host link.
  """

  m = env.model

  def record(env_, es: EnvState, action: jax.Array, xs,
             textures=None) -> Dict:
    rec = {
        'step': es.ts,
        'ts': es.phys.time,
        'cmd': jnp.asarray(action, jnp.float32),
        'ctrl': es.phys.ctrl,
    }
    if with_state:
      rec['full_qpos'] = es.phys.qpos
    if with_frames:
      tex = env.background_textures(textures) if textures is not None \
          else None
      rgb, depth = env.render(es, textures=tex)
      rec['rgb'] = rgb
      if with_depth:
        rec['depth'] = depth.astype(jnp.float32)
    for jname in env.monitored_joints:
      j = m.joint(jname)
      rec[f'joint_qpos-{jname}'] = es.phys.qpos[m.jnt_qposadr[j]]
      rec[f'joint_qvel-{jname}'] = es.phys.qvel[m.jnt_dofadr[j]]
    rec['mocap_qpos-robot0:mocap'] = jnp.concatenate(
        [es.phys.mocap_pos[0], es.phys.mocap_quat[0]])
    obj_qpos = []
    for jname in env.obj_joint_names:
      q = get_joint_qpos(m, es.phys.qpos, jname)
      rec[f'object_qpos-{jname}'] = q
      obj_qpos.append(q)
    obj_qpos = jnp.stack(obj_qpos)  # [n_objs, 7]
    goal_names = [env.obj_joint_names.index(f'{s}:joint')
                  for s in env.goal_sites]
    cube_names = [env.obj_joint_names.index(f'{s}:joint')
                  for s in env.cube_sites]
    rec['goal_qpos'] = obj_qpos[jnp.asarray(goal_names)][es.task_goal]
    rec['obj_qpos'] = obj_qpos[jnp.asarray(cube_names)][es.task_object]
    return rec

  return record


def save_episode_npz(path: str, records: Dict, context: Dict,
                     compress: bool = True):
  """Write stacked per-step records + context sidecar."""
  arrays = {k: np.asarray(v) for k, v in records.items()}
  os.makedirs(os.path.dirname(path), exist_ok=True)
  if compress:
    np.savez_compressed(path, **arrays)
  else:
    np.savez(path, **arrays)
  with open(path.replace('.npz', '.json'), 'w') as fp:
    json.dump(context, fp, indent=2, sort_keys=True)


def load_episode_npz(path: str):
  data = dict(np.load(path))
  ctx_path = path.replace('.npz', '.json')
  context = {}
  if os.path.exists(ctx_path):
    with open(ctx_path) as fp:
      context = json.load(fp)
  return data, context


def load_episode_tfrecord(path: str):
  """Load one episode from a reference-format ``.tfrecord[.zlib]`` file
  into the same stacked-array dict ``load_episode_npz`` returns, so a
  dataset collected by the REFERENCE stack trains directly
  (reference contract: src/data/geeco_gym.py:401 parses these
  SequenceExamples; writer side: tfrecord_io.write_episode_tfrecord)."""
  from .tfrecord_io import read_tfrecord
  comp = 'zlib' if path.endswith('.zlib') else 'none'
  examples = read_tfrecord(path, compression=comp)
  if not examples:
    raise ValueError(f'no SequenceExample in {path}')
  raw_ctx, lists = examples[0]
  # keys that are scalar strings in the npz JSON-sidecar schema; every
  # other bytes_list context entry stays a list even when it has one
  # element (e.g. monitored_mocaps=['robot0:mocap'] must not collapse to
  # a str whose iteration yields characters; ADVICE.md round 3)
  _scalar_str_keys = {'task_goal', 'task_object', 'encoding', 'scenario',
                      'task'}
  context = {}
  for key, val in raw_ctx.items():
    if isinstance(val, list):  # bytes_list -> str / list[str]
      decoded = [v.decode() for v in val]
      context[key] = (decoded[0]
                      if len(decoded) == 1 and key in _scalar_str_keys
                      else decoded)
    else:
      arr = np.asarray(val)
      context[key] = arr.item() if arr.size == 1 else arr.tolist()
  h = int(context.get('img_height', 0))
  w = int(context.get('img_width', 0))
  data = {}
  for key, frames in lists.items():
    arr = np.stack(frames)  # [T, D]
    if key == 'rgb':
      if not (h and w):
        raise ValueError(f'{path}: rgb present but img_height/img_width '
                         'missing from context')
      data['rgb'] = arr.reshape(len(frames), h, w, 3).astype(np.uint8)
    elif key == 'depth':
      data['depth'] = arr.reshape(len(frames), h, w).astype(np.float32)
    elif (arr.ndim == 2 and arr.shape[1] == 1
          and (key in ('step', 'ts')
               or key.startswith(('joint_qpos-', 'joint_qvel-')))):
      # only KNOWN per-frame scalars squeeze back to [T]; vector features
      # that happen to be 1-d (e.g. a dim_ctrl=1 'cmd') keep their [T, 1]
      # shape to match the npz schema (ADVICE.md round 3)
      data[key] = arr[:, 0]
    else:
      data[key] = arr
  return data, context


_RECORD_EXTS = ('.npz', '.tfrecord.zlib', '.tfrecord')


def load_episode(path: str):
  """Extension dispatch: npz (TPU-era storage) or reference tfrecord."""
  if path.endswith('.npz'):
    return load_episode_npz(path)
  if path.endswith(('.tfrecord', '.tfrecord.zlib')):
    return load_episode_tfrecord(path)
  raise ValueError(f'unknown episode record format: {path}')


def save_replay_buffer_pkl(path: str, env: GeecoEnv, records: Dict,
                           context: Dict):
  """Reference-compatible replay pickle (pickplace.py:226-246)."""
  rb = {
      'monitored_joints': list(env.monitored_joints),
      'actuated_joints': list(env.actuated_joints),
      'monitored_mocaps': ['robot0:mocap'],
      'monitored_objects': list(env.obj_joint_names),
      'step_buffer': list(np.asarray(records['step'])),
      'time_elapsed': list(np.asarray(records['ts'])),
      'rgb_buffer': [],
      'cmd_buffer': [np.asarray(c) for c in np.asarray(records['cmd'])],
      'ctrl_buffer': [np.asarray(c) for c in np.asarray(records['ctrl'])],
      'joint_qpos_buffer': {
          j: list(np.asarray(records[f'joint_qpos-{j}']))
          for j in env.monitored_joints},
      'joint_qvel_buffer': {
          j: list(np.asarray(records[f'joint_qvel-{j}']))
          for j in env.monitored_joints},
      'mocap_qpos_buffer': {
          'robot0:mocap':
          [np.asarray(q) for q in
           np.asarray(records['mocap_qpos-robot0:mocap'])]},
      'object_qpos_buffer': {
          j: [np.asarray(q) for q in
              np.asarray(records[f'object_qpos-{j}'])]
          for j in env.obj_joint_names},
  }
  with open(path, 'wb') as f:
    pickle.dump(rb, f)
