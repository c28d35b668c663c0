"""Simulation CLI engine: collect / replay / random / controller modes.

Shared implementation behind run/gym_pickplace.py and run/gym_pushing.py —
the TPU-native counterpart of the reference scripts (scripts/
gym_pickplace.py:608-977, gym_pushing.py:444-769): same modes, same
directory outputs (meta_info.json, replay_buffer_*.{npz,pkl}, eval_results
CSV, final_results.txt, videos), same eval protocol.

TPU-first extension: --num_envs vectorizes collection — resets, expert
FSMs, physics and rendering run vmapped in lockstep; episodes are written
out per env.  The reference equivalent is a single env stepping
sequentially (SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import csv
import json
import os
import pickle
import time
from typing import List, Optional

import numpy as np

from ..data import tasks as task_csv
from ..data.episode import (make_record_fn, meta_info_dict,
                            save_episode_npz, save_replay_buffer_pkl)
from ..data.tfrecord_io import write_episode_tfrecord
from ..data.keyframes import load_target_frames
from ..envs.base import GeecoEnv, ResetSpec
from ..expert.policies import make_expert, rollout
from ..render.video import VideoRecorder
from ..utils.runscript import save_run_command

EPISODE_STEPS_COLLECT = 100   # gym_pickplace.py:630
EPISODE_STEPS_CONTROL = 200   # gym_pickplace.py:626

EVAL_FIELDS = ('episode_id', 'obj_vicinity', 'grasp_success',
               'task_success', 'init_goal_dist', 'min_goal_dist',
               'max_goal_dist', 'final_goal_dist', 'video_file')


def build_env(args) -> GeecoEnv:
  rk = {}
  sh = getattr(args, 'shadows', -1)
  if sh is not None and sh >= 0:
    rk['shadows'] = bool(sh)
  tg = getattr(args, 'tex_grid', -1)
  if tg is not None and tg >= 0:
    rk['tex_grid'] = tg
  trim = getattr(args, 'renderer_trim', '')
  if trim:
    k1, k2 = (int(v) for v in trim.split(','))
    rk.update(coarse_k=k1, mid_k=k2)
  return GeecoEnv(shapes=args.shapes, frame_res=tuple(args.frame_res),
                  start_sphere_r=getattr(args, 'start_sphere', 0.03),
                  renderer_kwargs=rk)


def _episode_context(env: GeecoEnv, es) -> dict:
  ctx = dict(meta_info_dict(env))
  ctx['task_goal'] = env.goal_sites[int(es.task_goal)]
  ctx['task_object'] = env.cube_sites[int(es.task_object)]
  return ctx


def _reset(env, args, specs, episode_idx, rng):
  import jax
  if specs is not None:
    spec = jax.tree.map(lambda x: x[episode_idx], specs)
    return env.jit('reset_to')(spec, rng)
  return env.jit('reset_random')(rng)


def _load_specs(env, args):
  if args.init_states and os.path.isfile(args.init_states):
    return task_csv.load_reset_specs(env, args.init_states)
  if args.init_states:
    print(f">>> Couldn't load initial states from {args.init_states}! "
          'Defaulting to random initialization.')
  return None




def _env_mesh(args):
  """1-d device mesh for env-batch sharding (--num_devices > 1).

  Physics + render are embarrassingly parallel per env (SURVEY.md §5.8),
  so sharding the batch axis introduces no cross-chip traffic inside the
  step; XLA partitions the jitted rollout SPMD over the mesh.
  """
  n = getattr(args, 'num_devices', 1)
  if n <= 1:
    return None
  from ..parallel.mesh import make_mesh
  B = max(1, args.num_envs)
  if B % n:
    raise SystemExit(f'--num_envs {B} not divisible by --num_devices {n}')
  return make_mesh(n)


def _shard(es, mesh):
  if mesh is None:
    return es
  from ..parallel.mesh import shard_env_batch
  return shard_env_batch(es, mesh)


# ---------------------------------------------------------------- collect


def run_collect(args):
  import jax
  import jax.numpy as jnp
  wrk_dir = os.path.join(args.wrk_dir, 'collect')
  os.makedirs(wrk_dir, exist_ok=True)
  env = build_env(args)
  specs = _load_specs(env, args)
  expert = make_expert(env)
  # viewer mode needs frames too (live playback of the recorded episode,
  # the TPU stand-in for the reference GLFW window: pickplace.py:590-591)
  fmt = getattr(args, 'dataset_formats', 'all')
  state_only = fmt == 'states'
  if state_only and args.rendering_mode not in ('none', ''):
    # frameless collection records qpos only — no frames exist to feed a
    # viewer/video/tfrecord sink (ADVICE r4: say so instead of silently
    # producing nothing; 'tfrecord' is the argparse default, so a hard
    # error would reject plain `--dataset_formats states` invocations)
    print(f'WARNING: --dataset_formats states records no frames; '
          f'rendering_mode={args.rendering_mode} output will not be '
          f'produced')
  if state_only and getattr(args, 'background_video', ''):
    raise SystemExit('--background_video is incompatible with '
                     '--dataset_formats states: per-step background '
                     'texels are not recorded, so re-rendered training '
                     'frames could not reproduce them')
  with_frames = (not state_only
                 and args.rendering_mode in ('tfrecord', 'viewer'))
  fast = fmt in ('npz', 'states')
  record_fn = make_record_fn(env, with_frames=with_frames,
                             with_depth=not fast, with_state=state_only)

  # dataset meta (gym_pickplace.py:744-747); also placed under meta/ to
  # form a ready-to-train dataset directory (geeco_gym.py:283-289 layout)
  for meta_path in (os.path.join(wrk_dir, 'meta_info.json'),
                    os.path.join(wrk_dir, 'meta', 'meta_info.json')):
    os.makedirs(os.path.dirname(meta_path), exist_ok=True)
    with open(meta_path, 'w') as fp:
      json.dump(meta_info_dict(env), fp, indent=2, sort_keys=True)

  episode_steps = (args.max_episode_steps if args.max_episode_steps > 0
                   else EPISODE_STEPS_COLLECT)

  env.setup()
  B = max(1, args.num_envs)
  mesh = _env_mesh(args)

  reset_random_batch = jax.jit(jax.vmap(env.reset_random))
  reset_to_batch = jax.jit(jax.vmap(env.reset_to))

  # background-video domain randomization (reference VideoCycler +
  # TextureModder on wall_04; gym_pickplace.py:663-668,860-867)
  cycler = None
  if getattr(args, 'background_video', ''):
    from ..data.videos import VideoCycler
    cycler = VideoCycler(args.background_video)
    if env.background_slot() is None:
      print('WARNING: scene has no textured wall_04; '
            '--background_video ignored')
      cycler = None

  @jax.jit
  def run_episodes(es, tex_steps=None, noise=None):  # vmapped over envs
    def one(e, nz):
      return rollout(env, e, expert, length=episode_steps,
                     record_fn=record_fn, step_textures=tex_steps,
                     action_noise=nz)
    if noise is None:
      return jax.vmap(lambda e: one(e, None))(es)
    return jax.vmap(one)(es, noise)

  # DART-style noise-injected collection (--expert_noise): executed action
  # = expert + N(0, sigma) on the EE translation (gripper stays clean);
  # recorded cmd = the expert's clean corrective action.  Covers the
  # slightly-off states a closed-loop BC policy actually visits.
  sigma = max(0.0, getattr(args, 'expert_noise', 0.0))

  # perturbation-augmented starts: k random pre-roll steps per env (k ~
  # U[0, P]) before the expert episode begins.  Inactive steps apply the
  # no-op action so the whole batch stays lockstep under one compile.
  P = max(0, getattr(args, 'perturb_prefix', 0))

  @jax.jit
  def preroll(es, rngs):
    def one(e, r):
      rk, ra = jax.random.split(r)
      k = jax.random.randint(rk, (), 0, P + 1)
      acts = jax.random.uniform(ra, (P, 3), minval=-1.0, maxval=1.0)

      def body(e, ta):
        t, a = ta
        act = jnp.where(t < k, jnp.concatenate([a, jnp.zeros(1)]),
                        jnp.zeros(4))
        return env.step(e, act), None
      e, _ = jax.lax.scan(body, e, (jnp.arange(P), acts))
      # the recorded episode starts here: reset the step counter so frame
      # 0 of the demo is the post-perturbation state
      return e.replace(ts=jnp.zeros((), jnp.int32))
    return jax.vmap(one)(es, rngs)

  eval_batch = jax.jit(jax.vmap(env.eval_metrics))

  video = VideoRecorder('collect', wrk_dir) \
      if args.rendering_mode == 'video' else None
  viewer = None
  if args.rendering_mode == 'viewer':
    from ..render.viewer import TerminalViewer
    viewer = TerminalViewer()

  rng = jax.random.PRNGKey(args.seed)
  successes = []
  n_specs = int(jax.tree.leaves(specs)[0].shape[0]) if specs is not None \
      else 0

  def launch(chunk):
    """Enqueue one chunk's episodes on device (async dispatch)."""
    nonlocal rng
    n = min(B, args.end_idx - chunk)
    rng, sub = jax.random.split(rng)
    rngs = jax.random.split(sub, B)
    if specs is not None:
      idx = np.minimum(np.arange(chunk, chunk + B), n_specs - 1)
      spec_chunk = jax.tree.map(lambda x: x[jnp.asarray(idx)], specs)
      es = reset_to_batch(spec_chunk, rngs)
    else:
      es = reset_random_batch(rngs)
    if P > 0:
      rng, sub2 = jax.random.split(rng)
      es = preroll(es, jax.random.split(sub2, B))
    es = _shard(es, mesh)
    if args.dry_run:
      return dict(chunk=chunk, n=n, es=es)
    noise = None
    if sigma > 0:
      rng, subn = jax.random.split(rng)
      noise = sigma * jax.random.normal(subn, (B, episode_steps, 3))
      noise = jnp.concatenate(
          [noise, jnp.zeros((B, episode_steps, 1))], axis=-1)
    if cycler is not None:
      tex_steps = jnp.asarray(cycler.texel_steps(
          episode_steps, env.renderer.scene.tex_res))
      es_f, recs = run_episodes(es, tex_steps, noise)
    else:
      es_f, recs = run_episodes(es, None, noise)
    return dict(chunk=chunk, n=n, es=es, recs=recs,
                metrics=eval_batch(es_f))

  def write_episode(episode_id, rec_k, ctx):
    name = f'replay_buffer_{episode_id:04d}'
    save_episode_npz(os.path.join(wrk_dir, 'data', f'{name}.npz'),
                     rec_k, ctx, compress=not fast)
    if fast:  # npz-only fast path for large training collections
      return
    save_replay_buffer_pkl(os.path.join(wrk_dir, f'{name}.pkl'), env,
                           rec_k, ctx)
    if with_frames:  # reference-format zlib TFRecord (native encoder)
      write_episode_tfrecord(
          os.path.join(wrk_dir, 'data', f'{name}.tfrecord.zlib'), rec_k,
          ctx)

  def drain(job, pool):
    """Pull one finished chunk to host and write it out."""
    chunk, n = job['chunk'], job['n']
    if args.dry_run:  # save initial configuration images only
      rgb, _ = jax.jit(jax.vmap(env.render))(job['es'])
      from PIL import Image
      for k in range(n):
        Image.fromarray(np.asarray(rgb[k])).save(
            os.path.join(wrk_dir, f'init_{chunk + k + 1:04d}.png'))
      return
    recs = jax.device_get(job['recs'])
    metrics = jax.device_get(job['metrics'])
    futures = []
    for k in range(n):
      episode_id = chunk + k + 1
      rec_k = jax.tree.map(lambda x: x[k], recs)
      es_k = jax.tree.map(lambda x: x[k], job['es'])
      ctx = _episode_context(env, es_k)
      if sigma > 0:
        ctx['expert_noise'] = sigma   # provenance: DART episode
      if state_only:
        # per-episode recolor table: with full_qpos + mocap this is the
        # complete render input (envs/base.py render_from_qpos)
        rec_k = dict(rec_k)
        rec_k['rgba'] = np.asarray(es_k.rgba)
      futures.append(pool.submit(write_episode, episode_id, rec_k, ctx))
      if video is not None and 'rgb' in rec_k:
        for frame in rec_k['rgb']:
          video.feed(frame)
        video.flush()
      if viewer is not None and k == 0 and 'rgb' in rec_k:
        for t, frame in enumerate(rec_k['rgb']):
          viewer.feed(frame, hud=f'episode {episode_id} t={t}')
      success = float(metrics['task_success'][k])
      successes.append(success)
      print(f'episode {episode_id}: task_success={success:.0f} '
            f'goal_dist={float(metrics["goal_dist"][k]):.4f}')
    for fu in futures:
      fu.result()  # surface writer errors

  # double-buffered pipeline: the device computes chunk k+1 while chunk
  # k's ~2 GB of frames cross the (measured ~39 MB/s) host link and the
  # npz writers stream to disk — transfer/IO hide behind compute instead
  # of serializing with it (round-3 collection was 3.5 h for 74 GB).
  from concurrent.futures import ThreadPoolExecutor
  with ThreadPoolExecutor(max_workers=4) as pool:
    pending = None
    for chunk in range(args.start_idx, args.end_idx, B):
      job = launch(chunk)
      if pending is not None:
        drain(pending, pool)
      pending = job
    if pending is not None:
      drain(pending, pool)
  if video is not None:
    video.finalize()
  if viewer is not None:
    viewer.close()
  if successes:
    print(f'>>> expert success rate: {np.mean(successes) * 100:.2f}% '
          f'({len(successes)} episodes)')
  return np.mean(successes) if successes else None


# ---------------------------------------------------------------- replay


def run_replay(args):
  import jax
  import jax.numpy as jnp
  wrk_dir = os.path.join(args.wrk_dir, 'replay')
  os.makedirs(wrk_dir, exist_ok=True)
  env = build_env(args)

  # load recorded commands + initial object/mocap state
  if args.replay_buffer.endswith('.pkl'):
    with open(args.replay_buffer, 'rb') as f:
      rb = pickle.load(f)
    cmd_buffer = np.stack(rb['cmd_buffer'])
    obj_qpos0 = {k: np.asarray(v[0])
                 for k, v in rb['object_qpos_buffer'].items()}
    mocap0 = np.asarray(rb['mocap_qpos_buffer']['robot0:mocap'][0])
  else:
    from ..data.episode import load_episode
    ep, _ = load_episode(args.replay_buffer)
    cmd_buffer = ep['cmd']
    obj_qpos0 = {j: ep[f'object_qpos-{j}'][0] for j in env.obj_joint_names}
    mocap0 = ep['mocap_qpos-robot0:mocap'][0]

  import jax.numpy as jnp
  obj_qpos = np.stack([obj_qpos0[j] for j in env.obj_joint_names])
  # reset_to adds the queue z-adjust; replay sets raw state, so undo it
  obj_qpos = obj_qpos.copy()
  obj_qpos[:, 2] -= 0.025
  spec = ResetSpec(obj_qpos=jnp.asarray(obj_qpos),
                   mocap_qpos=jnp.asarray(mocap0),
                   task_goal=jnp.asarray(0, jnp.int32),
                   task_object=jnp.asarray(0, jnp.int32))
  es = env.reset_to(spec, jax.random.PRNGKey(0))

  @jax.jit
  def replay_all(es, cmds):
    import jax as _jax
    def body(es, cmd):
      return env.step(es, cmd), None
    es, _ = _jax.lax.scan(body, es, cmds)
    return es

  es_f = replay_all(es, jnp.asarray(cmd_buffer))
  m = env.eval_metrics(es_f)
  print(f'>>> replay: task_success={float(m["task_success"]):.0f} '
        f'goal_dist={float(m["goal_dist"]):.4f}')
  return m


# ---------------------------------------------------------------- random


def run_random(args):
  import jax
  import jax.numpy as jnp
  env = build_env(args)
  es = env.reset_random(jax.random.PRNGKey(args.seed))
  steps = (args.max_episode_steps if args.max_episode_steps > 0
           else EPISODE_STEPS_COLLECT)
  rng = jax.random.PRNGKey(args.seed + 1)

  @jax.jit
  def wiggle(es, rng):
    r1, r2 = jax.random.split(rng)
    action = jnp.concatenate([
        jax.random.normal(r1, (3,)) * 0.5,
        jax.random.randint(r2, (1,), -1, 2).astype(jnp.float32)])
    return env.step(es, action)

  for _ in range(steps):
    rng, sub = jax.random.split(rng)
    es = wiggle(es, sub)
  assert np.isfinite(np.asarray(es.phys.qpos)).all(), 'physics diverged'
  print('>>> random wiggle smoke test OK')
  return es


# ---------------------------------------------------------------- controller


def _dataset_eval_set(env, dataset_dir: str, split_name: str, n_eps: int):
  """Queued resets + recorded target frames from the test split.

  The reference controller protocol (gym_pickplace.py:655, 3.2 in
  SURVEY.md) replays recorded initial states and conditions on the
  episode's target frame; here both come straight from collected npz
  episodes.
  """
  import jax
  import jax.numpy as jnp
  from ..data.dataset import list_records
  from ..data.episode import load_episode
  from ..envs.base import ResetSpec
  paths = list_records(dataset_dir, split_name, 'test')
  if n_eps > 0:
    paths = paths[:n_eps]
  objq, mocapq, goals, objs, tgts, tgt_depths = [], [], [], [], [], []
  armq = []
  render_states = []   # state-only episodes: goal frames re-rendered below
  for p in paths:
    ep, ctx = load_episode(p)
    oq = np.stack([np.asarray(ep[f'object_qpos-{j}'][0])
                   for j in env.obj_joint_names])
    oq = oq.copy()
    oq[:, 2] -= 0.025          # reset_to re-adds the table-height adjust
    objq.append(oq)
    mocapq.append(np.asarray(ep['mocap_qpos-robot0:mocap'][0]))
    armq.append(np.asarray([ep[f'joint_qpos-{j}'][0]
                            for j in env.monitored_joints]))
    goals.append(env.goal_sites.index(ctx['task_goal']))
    objs.append(env.cube_sites.index(ctx['task_object']))
    if 'rgb' in ep:
      tgts.append(ep['rgb'][-1].astype(np.float32) / 255.0)
      if 'depth' in ep:
        tgt_depths.append(np.asarray(ep['depth'][-1], np.float32))
    elif 'full_qpos' in ep:
      # placeholder keeps tgts aligned with the spec/path order when the
      # split mixes frame-mode and state-only episodes; filled in place
      # after the batched re-render below.
      tgts.append(None)
      render_states.append((len(tgts) - 1,
                            np.asarray(ep['full_qpos'][-1], np.float32),
                            np.asarray(ep['mocap_qpos-robot0:mocap'][-1],
                                       np.float32),
                            np.asarray(ep['rgba'], np.float32)))
    else:
      raise ValueError(f'{p}: episode has neither frames nor full_qpos')
  if render_states:
    # re-render the goal frames on device from the recorded final states
    # (state-only datasets; exact pixels of the frame-mode recording)
    env.setup()
    slots = [r[0] for r in render_states]
    rq = jnp.asarray(np.stack([r[1] for r in render_states]))
    rm = jnp.asarray(np.stack([r[2] for r in render_states]))
    rr = jnp.asarray(np.stack([r[3] for r in render_states]))
    render_b = jax.jit(jax.vmap(env.render_from_qpos))
    rendered = []
    for s in range(0, rq.shape[0], 64):
      rgb, _ = render_b(rq[s:s + 64], rm[s:s + 64], rr[s:s + 64])
      rendered.extend(np.asarray(rgb).astype(np.float32) / 255.0)
    for slot, frame in zip(slots, rendered):
      tgts[slot] = frame
  specs = ResetSpec(
      obj_qpos=jnp.asarray(np.stack(objq), jnp.float32),
      mocap_qpos=jnp.asarray(np.stack(mocapq), jnp.float32),
      task_goal=jnp.asarray(goals, jnp.int32),
      task_object=jnp.asarray(objs, jnp.int32),
      # restore the recorded arm/gripper pose: settling the default pose
      # against the recorded mocap does not reach it (see ResetSpec)
      arm_qpos=jnp.asarray(np.stack(armq), jnp.float32))
  depths = (np.stack(tgt_depths) if len(tgt_depths) == len(paths) else None)
  return specs, np.stack(tgts), depths, len(paths)


def run_controller_batched(args):
  """Fully on-device closed-loop eval: policy + physics + render inside one
  jitted rollout, vmapped over --num_envs.  With --dataset_dir set, resets
  and goal frames come from the test split (reference protocol); otherwise
  resets are random and goal frames are synthesized renders."""
  import jax
  import jax.numpy as jnp
  from ..models.closed_loop import evaluate_batched
  from ..models.params import load_model_config
  from ..models.predictor import GoalE2EVMCPredictor, E2EVMCPredictor

  wrk_dir = os.path.join(args.wrk_dir, 'controller')
  os.makedirs(wrk_dir, exist_ok=True)
  env = build_env(args)
  goal_conditioned = args.goal_condition == 'target'
  # reuse the predictor's config/checkpoint loading
  pred_cls = GoalE2EVMCPredictor if goal_conditioned else E2EVMCPredictor
  predictor = pred_cls(args.model_dir, args.checkpoint_name)
  config, params = predictor.cfg, predictor.params

  B = args.num_envs
  mesh = _env_mesh(args)
  n_eps = args.end_idx - args.start_idx
  specs = tgt_all = tgt_depth_all = None
  if args.dataset_dir:
    specs, tgt_all, tgt_depth_all, n_eps = _dataset_eval_set(
        env, args.dataset_dir, getattr(args, 'split_name', 'default'),
        n_eps)
    env.setup()
    reset_to_batch = jax.jit(jax.vmap(env.reset_to))
  cycler = None
  if getattr(args, 'background_video', ''):
    from ..data.videos import VideoCycler
    cycler = VideoCycler(args.background_video)
    if env.background_slot() is None:
      print('WARNING: scene has no textured wall_04; '
            '--background_video ignored')
      cycler = None
  rng = jax.random.PRNGKey(args.seed)
  rows = []
  # --rendering_mode video: per-episode eval videos for the first chunk's
  # first envs, with real paths in the eval CSV (reference protocol:
  # gym_pickplace.py:941-945, 705-720)
  n_video = 8 if args.rendering_mode == 'video' else 0
  for chunk in range(0, n_eps, B):
    n = min(B, n_eps - chunk)
    V = min(n_video, n) if chunk == 0 else 0
    rng, sub = jax.random.split(rng)
    rngs = jax.random.split(sub, B)
    episode_steps = (args.max_episode_steps if args.max_episode_steps > 0
                     else EPISODE_STEPS_CONTROL)
    step_textures = (jnp.asarray(cycler.texel_steps(
        episode_steps, env.renderer.scene.tex_res))
        if cycler is not None else None)
    if specs is not None:
      idx = np.minimum(np.arange(chunk, chunk + B), n_eps - 1)
      spec_chunk = jax.tree.map(lambda x: x[jnp.asarray(idx)], specs)
      es0 = _shard(reset_to_batch(spec_chunk, rngs), mesh)
      tgt = jnp.asarray(tgt_all[idx])
      if config.img_channels == 4:
        if tgt_depth_all is not None:
          d = jnp.asarray(tgt_depth_all[idx])[..., None]
        else:
          # episodes recorded without depth: zero-fill with a warning (an
          # RGBD policy was trained on real goal depth; reference
          # conditions on the recorded RGBD target frame)
          print('WARNING: dataset episodes have no depth channel; '
                'zero-filling the goal depth for an RGBD model')
          d = jnp.zeros(tgt.shape[:-1] + (1,))
        tgt = jnp.concatenate([tgt, d], axis=-1)
      agg = evaluate_batched(env, config, params, goal_conditioned, rngs,
                             tgt_frames=tgt, n_steps=episode_steps,
                             es0=es0, step_textures=step_textures,
                             carry_mode=getattr(args, 'carry_mode',
                                                'auto'), mesh=mesh,
                             collect_frames=V)
    else:
      agg = evaluate_batched(env, config, params, goal_conditioned, rngs,
                             n_steps=episode_steps,
                             step_textures=step_textures,
                             carry_mode=getattr(args, 'carry_mode',
                                                'auto'), mesh=mesh,
                             collect_frames=V)
    frames = None
    if V:
      agg, frames = agg  # [T, V, H, W, 3] uint8
    agg = {k: np.asarray(v) for k, v in agg.items()}
    for k in range(n):
      video_file = ''
      if frames is not None and k < V:
        episode_id = args.start_idx + chunk + k + 1
        vid = VideoRecorder(f'observation_{episode_id:04d}', wrk_dir)
        for frame in frames[:, k]:
          vid.feed(frame)
        video_file = vid.finalize() or ''
      rows.append({
          'episode_id': args.start_idx + chunk + k + 1,
          'obj_vicinity': int(agg['obj_vicinity'][k]),
          'grasp_success': int(agg['grasp_success'][k]),
          'task_success': int(agg['task_success'][k]),
          'init_goal_dist': float(agg['max_goal_dist'][k]),
          'min_goal_dist': float(agg['min_goal_dist'][k]),
          'max_goal_dist': float(agg['max_goal_dist'][k]),
          'final_goal_dist': float(agg['final_goal_dist'][k]),
          'video_file': video_file,
          '_steps_grasped': int(agg['steps_grasped'][k]),
          '_max_obj_z': float(agg['max_obj_z'][k]),
          '_drop_goal_dist': float(agg['drop_goal_dist'][k]),
          '_rng': np.asarray(rngs[k]),
      })
  if args.rendering_mode == 'video' and specs is not None:
    _record_failure_videos(args, env, config, params, goal_conditioned,
                           specs, tgt_all, tgt_depth_all, n_eps, rows,
                           wrk_dir, mesh)
  _write_triage(wrk_dir, rows)
  with open(os.path.join(wrk_dir, 'eval_results.csv'), 'w',
            newline='') as fp:
    writer = csv.DictWriter(fp, fieldnames=EVAL_FIELDS, delimiter=';',
                            extrasaction='ignore')
    writer.writeheader()
    for r in rows:
      writer.writerow(r)
  with open(os.path.join(wrk_dir, 'final_results.txt'), 'w') as fp:
    for k in ('obj_vicinity', 'grasp_success', 'task_success'):
      avg = np.mean([r[k] for r in rows]) * 100
      fp.write(f'{k}\t{avg:.2f}\n')
      print(f'>>> {k}: {avg:.2f}%')
  return rows


# episode phase ladder derived from the triage metrics: how far along
# reach->grasp->lift->transport->place did each episode get?
def _phase_reached(r):
  if r['task_success']:
    return 'placed'
  if r['_drop_goal_dist'] >= 0 and r['_drop_goal_dist'] <= 0.0625:
    return 'dropped_near_goal'
  if r['_max_obj_z'] > 0.47:          # table top ~0.425 + half cube
    return 'lifted'
  if r['grasp_success']:
    return 'grasped'
  if r['obj_vicinity']:
    return 'reached'
  return 'none'


def _write_triage(wrk_dir, rows):
  """Per-episode failure triage (round-5 ask #4): phase-reached ladder +
  drop distance, written beside the reference-format eval CSV."""
  fields = ('episode_id', 'phase', 'steps_grasped', 'max_obj_z',
            'drop_goal_dist', 'min_goal_dist', 'final_goal_dist',
            'video_file')
  counts = {}
  with open(os.path.join(wrk_dir, 'triage_results.csv'), 'w',
            newline='') as fp:
    writer = csv.writer(fp, delimiter=';')
    writer.writerow(fields)
    for r in rows:
      phase = _phase_reached(r)
      counts[phase] = counts.get(phase, 0) + 1
      writer.writerow([r['episode_id'], phase, r['_steps_grasped'],
                       f"{r['_max_obj_z']:.4f}",
                       f"{r['_drop_goal_dist']:.4f}",
                       f"{r['min_goal_dist']:.4f}",
                       f"{r['final_goal_dist']:.4f}", r['video_file']])
  order = ('placed', 'dropped_near_goal', 'lifted', 'grasped', 'reached',
           'none')
  summary = '  '.join(f'{p}={counts.get(p, 0)}' for p in order)
  with open(os.path.join(wrk_dir, 'triage_summary.txt'), 'w') as fp:
    fp.write(summary + '\n')
  print(f'>>> phase ladder: {summary}')


def _record_failure_videos(args, env, config, params, goal_conditioned,
                           specs, tgt_all, tgt_depth_all, n_eps, rows,
                           wrk_dir, mesh):
  """Second pass: record videos for FAILING episodes (grasped but not
  placed), not just the first chunk (round-5 ask #4; the reference logs a
  video per eval episode, gym_pickplace.py:941-945)."""
  import jax
  import jax.numpy as jnp
  from ..models.closed_loop import evaluate_batched
  fail = [i for i, r in enumerate(rows)
          if r['grasp_success'] and not r['task_success']]
  if not fail:
    return
  sel = fail[:16]
  V = len(sel)
  idx = jnp.asarray(np.asarray(sel))
  spec_chunk = jax.tree.map(lambda x: x[idx], specs)
  # reuse each episode's original reset rng so the failure reproduces
  rngs = jnp.asarray(np.stack([rows[i]['_rng'] for i in sel]))
  es0 = _shard(jax.jit(jax.vmap(env.reset_to))(spec_chunk, rngs), mesh)
  tgt = jnp.asarray(tgt_all[np.asarray(sel)])
  if config.img_channels == 4:
    d = (jnp.asarray(tgt_depth_all[np.asarray(sel)])[..., None]
         if tgt_depth_all is not None else jnp.zeros(tgt.shape[:-1] + (1,)))
    tgt = jnp.concatenate([tgt, d], axis=-1)
  episode_steps = (args.max_episode_steps if args.max_episode_steps > 0
                   else EPISODE_STEPS_CONTROL)
  _, frames = evaluate_batched(
      env, config, params, goal_conditioned, rngs, tgt_frames=tgt,
      n_steps=episode_steps, es0=es0,
      carry_mode=getattr(args, 'carry_mode', 'auto'), mesh=mesh,
      collect_frames=V)
  for v, i in enumerate(sel):
    episode_id = rows[i]['episode_id']
    vid = VideoRecorder(f'failure_{episode_id:04d}', wrk_dir)
    for frame in frames[:, v]:
      vid.feed(frame)
    rows[i]['video_file'] = vid.finalize() or rows[i]['video_file']


def run_controller(args):
  import jax
  import jax.numpy as jnp
  from ..models.predictor import E2EVMCPredictor, GoalE2EVMCPredictor

  if args.num_envs > 1:
    return run_controller_batched(args)

  wrk_dir = os.path.join(args.wrk_dir, 'controller')
  os.makedirs(wrk_dir, exist_ok=True)
  env = build_env(args)
  specs = _load_specs(env, args)

  if args.goal_condition == 'none':
    predictor = E2EVMCPredictor(args.model_dir, args.checkpoint_name)
  elif args.goal_condition == 'target':
    predictor = GoalE2EVMCPredictor(args.model_dir, args.checkpoint_name)
  else:
    raise ValueError(f'unknown goal condition {args.goal_condition}')

  # target frames aligned with the reset CSV rows (gym_pickplace.py:220-261)
  target_frames = None
  if args.goal_condition == 'target' and args.tfrecord_list:
    with open(args.tfrecord_list) as fp:
      record_names = [l.strip() for l in fp if l.strip()]
    target_frames = [
        load_target_frames(args.dataset_dir, n, load_depth=False)[0]
        for n in record_names]

  episode_steps = (args.max_episode_steps if args.max_episode_steps > 0
                   else EPISODE_STEPS_CONTROL)

  report_path = os.path.join(wrk_dir, 'eval_results.csv')
  csv_report = open(report_path, 'w', newline='')
  writer = csv.DictWriter(csv_report, fieldnames=EVAL_FIELDS, delimiter=';')
  writer.writeheader()

  step_jit = env.jit('step')
  render_jit = env.jit('render')
  eval_jit = env.jit('eval_metrics')

  viewer = None
  if args.rendering_mode == 'viewer':  # live display (pickplace.py:590-591)
    from ..render.viewer import TerminalViewer
    viewer = TerminalViewer()

  rng = jax.random.PRNGKey(args.seed)
  eval_results = []
  for i in range(args.start_idx, args.end_idx):
    episode_id = i + 1
    rng, sub = jax.random.split(rng)
    es = _reset(env, args, specs, i, sub)
    spec_row = {
        'episode_id': episode_id, 'obj_vicinity': 0, 'grasp_success': 0,
        'task_success': 0,
        'init_goal_dist': float(eval_jit(es)['goal_dist']),
        'min_goal_dist': 1000.0, 'max_goal_dist': 0.0,
        'final_goal_dist': 0.0, 'video_file': '',
    }
    video = VideoRecorder(f'observation_{episode_id:04d}', wrk_dir) \
        if args.rendering_mode == 'video' else None
    predictor.reset()
    if args.goal_condition == 'target' and target_frames is not None:
      predictor.set_goal(np.asarray(target_frames[i], np.float32))
    for t in range(episode_steps):
      rgb, depth = render_jit(es)
      rgb = np.asarray(rgb)
      if video is not None:
        video.feed(rgb)
      if viewer is not None:
        viewer.feed(rgb, hud=f'episode {episode_id} t={t}')
      obs_frame = rgb.astype(np.float32) / 255.0
      if args.observation_format == 'rgbd':
        obs_frame = np.concatenate(
            [obs_frame, np.asarray(depth)[..., None]], axis=-1)
      proprio = np.asarray(env.proprioception(es))
      pred = predictor.predict(obs_frame, proprio)
      action = np.concatenate([pred['cmd_ee'], pred['cmd_grp']])
      es = step_jit(es, jnp.asarray(action, jnp.float32))
      m = eval_jit(es)
      spec_row['obj_vicinity'] = max(spec_row['obj_vicinity'],
                                     int(m['obj_vicinity']))
      spec_row['grasp_success'] = max(spec_row['grasp_success'],
                                      int(m['grasp_success']))
      gd = float(m['goal_dist'])
      spec_row['min_goal_dist'] = min(spec_row['min_goal_dist'], gd)
      spec_row['max_goal_dist'] = max(spec_row['max_goal_dist'], gd)
    m = eval_jit(es)
    spec_row['final_goal_dist'] = float(m['goal_dist'])
    spec_row['task_success'] = int(m['task_success'])
    if video is not None:
      spec_row['video_file'] = video.finalize() or ''
    eval_results.append(spec_row)
    for k in ('obj_vicinity', 'grasp_success', 'task_success'):
      avg = np.mean([r[k] for r in eval_results]) * 100
      print(f'>>> Current average success rate for {k}: {avg:.2f}')
    writer.writerow(spec_row)
  csv_report.close()
  if viewer is not None:
    viewer.close()

  with open(os.path.join(wrk_dir, 'final_results.txt'), 'w') as fp:
    for k in ('obj_vicinity', 'grasp_success', 'task_success'):
      avg = np.mean([r[k] for r in eval_results]) * 100
      fp.write(f'{k}\t{avg:.2f}\n')
  return eval_results


def main(args):
  wrk_dir = os.path.join(args.wrk_dir, args.sim_mode)
  os.makedirs(wrk_dir, exist_ok=True)
  save_run_command(argparser=args._parser, run_dir=wrk_dir)
  if args.sim_mode == 'collect':
    return run_collect(args)
  if args.sim_mode == 'replay':
    return run_replay(args)
  if args.sim_mode == 'random':
    return run_random(args)
  if args.sim_mode == 'controller':
    return run_controller(args)
  raise ValueError(f'Unknown simulation mode: {args.sim_mode}')
