"""Fully on-device closed-loop policy evaluation.

The reference controller loop round-trips through the host every step:
render -> numpy -> TF session -> numpy -> env.step (scripts/
gym_pickplace.py:858-934).  Here the entire control loop — render, frame
ring buffer, CNN+LSTM forward, action, 20 physics substeps — is one
`lax.scan` inside one jit, vmapped over an env batch.  This is the
TPU-native serving path; the host receives only final states and metrics.

Policy-state pytree mirrors the predictor semantics
(src/models/e2evmc/predictor.py:127-200): window_size frame buffer padded
with the first frame, LSTM carry persisted across steps, argmax -> {-1,0,1}
gripper remap.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..envs.base import EnvState, GeecoEnv
from .e2evmc import init_lstm_carry, make_model
from .params import E2EVMCConfig


class PolicyState(NamedTuple):
  frames: jax.Array   # [K, H, W, C] ring buffer
  jnt: jax.Array      # [K, 7]
  carry: Tuple[jax.Array, jax.Array]
  started: jax.Array  # bool: buffer initialized


def init_policy_state(config: E2EVMCConfig) -> PolicyState:
  K = config.window_size
  return PolicyState(
      frames=jnp.zeros((K, config.img_height, config.img_width,
                        config.img_channels)),
      jnt=jnp.zeros((K, config.dim_jnt_state)),
      carry=init_lstm_carry(config, 1),
      started=jnp.asarray(False),
  )


def make_closed_loop(env: GeecoEnv, config: E2EVMCConfig,
                     goal_conditioned: bool,
                     carry_mode: Optional[str] = None):
  """Returns rollout_fn(params, es, tgt_frame, n_steps) -> (es_f, aux).

  The per-step policy+env transition is compiled once; vmap over envs and
  feed per-env target frames for the goal-conditioned variant.

  carry_mode: serving must match the carry semantics the model was
  TRAINED with (config.train_carry — see models/params.py).  None/'auto'
  derives it: 'window' (fresh carry per step) for stateless-trained
  models, 'persistent' (reference predictor accumulate-across-steps,
  src/models/e2evmc/predictor.py:127-200) for BPTT-trained ones.
  """
  if carry_mode in (None, 'auto'):
    carry_mode = ('window' if config.train_carry == 'stateless'
                  else 'persistent')
  model = make_model(config, goal_conditioned)

  def policy_step(params, ps: PolicyState, obs_frame, jnt_state, tgt_frame):
    K = config.window_size
    # ring buffer with first-frame padding (predictor.py:192-200)
    frames0 = jnp.broadcast_to(obs_frame[None], ps.frames.shape)
    jnt0 = jnp.broadcast_to(jnt_state[None], ps.jnt.shape)
    frames = jnp.where(ps.started,
                       jnp.concatenate([ps.frames[1:], obs_frame[None]]),
                       frames0)
    jnt = jnp.where(ps.started,
                    jnp.concatenate([ps.jnt[1:], jnt_state[None]]), jnt0)
    if carry_mode == 'window':
      in_carry = init_lstm_carry(config, 1)
      reset = jnp.asarray(True)
    else:
      in_carry = ps.carry
      reset = jnp.logical_not(ps.started)
    if goal_conditioned:
      ep, carry = model.apply({'params': params}, frames[None], jnt[None],
                              tgt_frame[None], in_carry, reset)
    else:
      ep, carry = model.apply({'params': params}, frames[None], jnt[None],
                              in_carry, reset)
    cmd_ee = ep['pred_cmd_ee'][0]
    cmd_grp = (jnp.argmax(ep['logits_cmd_grp'][0]) - 1).astype(jnp.float32)
    action = jnp.concatenate([cmd_ee, cmd_grp[None]])
    return action, PolicyState(frames=frames, jnt=jnt, carry=carry,
                               started=jnp.asarray(True))

  def step_fn(params, es: EnvState, ps: PolicyState, tgt_frame,
              textures=None):
    """One closed-loop control step (single env; vmap over the batch).

    `textures` ([R, R, 3] or None): per-step background texel frame for
    video domain randomization (shared across the batch)."""
    tex = env.background_textures(textures) if textures is not None else None
    rgb, depth = env.render(es, textures=tex)
    obs = rgb.astype(jnp.float32) / 255.0
    if config.img_channels == 4:
      obs = jnp.concatenate([obs, depth[..., None]], axis=-1)
    jnt = env.proprioception(es)
    action, ps = policy_step(params, ps, obs, jnt, tgt_frame)
    es = env.step(es, action)
    m = env.eval_metrics(es)
    # failure-triage extras (not part of the reference eval contract):
    # object height tells lift apart from floor-drag; reference analogue
    # is manual video inspection (gym_pickplace.py:703-720 CSV rows).
    kin = env.kin(es)
    m['obj_z'] = env.task_object_pos(es, kin)[2]
    return es, ps, m, rgb

  return step_fn


def synth_target_frames(env: GeecoEnv, config: E2EVMCConfig, es):
  """Goal/target frames for a batch of (randomly reset) envs.

  The reference conditions on an image of the accomplished task (target
  frame of a recorded episode, predictor.py:206-208).  For random resets
  no recording exists, so render one: teleport the task object onto its
  task goal site, render, and restore nothing (pure function on a copy).
  """

  def one(e):
    kin = env.kin(e)
    goal = kin.site_xpos[jnp.asarray(env.goal_site_ids)][e.task_goal]
    qpos = e.phys.qpos
    m = env.model
    for i, site in enumerate(env.cube_sites):
      jname = f'{site}:joint'
      j = m.joint(jname)
      adr = m.jnt_qposadr[j]
      cur = jax.lax.dynamic_slice(qpos, (adr,), (7,))
      new = jnp.concatenate([goal[:2], cur[2:3], cur[3:7]])
      sel = (e.task_object == i)
      qpos = jax.lax.dynamic_update_slice(
          qpos, jnp.where(sel, new, cur), (adr,))
    kin_t = env.stepper.fk(e.phys.replace(qpos=qpos))
    rgb, depth = env.renderer.render(kin_t, e.rgba)
    obs = rgb.astype(jnp.float32) / 255.0
    if config.img_channels == 4:
      obs = jnp.concatenate([obs, depth[..., None]], axis=-1)
    return obs

  return jax.jit(jax.vmap(one))(es)


def evaluate_batched(env: GeecoEnv, config: E2EVMCConfig, params,
                     goal_conditioned: bool, rngs, tgt_frames=None,
                     n_steps: int = 200, es0=None,
                     step_textures=None,
                     carry_mode: Optional[str] = None,
                     mesh=None, collect_frames: int = 0):
  """Reset + closed-loop rollout for a batch of envs; returns metrics.

  One batched policy+env step is jit-compiled and iterated from the host
  (device-resident state; only the final metrics come back) — compiling the
  whole episode as a single scan makes the XLA graph too large.

  collect_frames=V > 0 additionally pulls the first V envs' observation
  frames to the host every step (~V*0.2 MB/step) and returns
  (metrics, frames [n_steps, V, H, W, 3] uint8) for eval videos — the
  reference controller loop records per-episode videos and logs the path
  in the eval CSV (gym_pickplace.py:941-945, 705-720).
  """
  env.setup()
  step_fn = make_closed_loop(env, config, goal_conditioned, carry_mode)
  es = es0 if es0 is not None else \
      jax.jit(jax.vmap(env.reset_random))(rngs)
  B = rngs.shape[0]
  if tgt_frames is None:
    if goal_conditioned:
      tgt_frames = synth_target_frames(env, config, es)
    else:
      tgt_frames = jnp.zeros((B, config.img_height, config.img_width,
                              config.img_channels))

  batched = jax.jit(jax.vmap(step_fn, in_axes=(None, 0, 0, 0, None)))
  ps = jax.tree.map(lambda x: jnp.stack([x] * B), init_policy_state(config))
  if mesh is not None:  # shard the env batch over a 1-d device mesh
    from ..parallel.mesh import shard_env_batch
    es, ps, tgt_frames = (shard_env_batch(x, mesh)
                          for x in (es, ps, tgt_frames))

  agg = {
      'obj_vicinity': jnp.zeros(B), 'grasp_success': jnp.zeros(B),
      'min_goal_dist': jnp.full(B, 1e3), 'max_goal_dist': jnp.zeros(B),
      'final_goal_dist': jnp.zeros(B), 'task_success': jnp.zeros(B),
      # triage extras: where in grasp->transport->place does it fail?
      'steps_grasped': jnp.zeros(B), 'max_obj_z': jnp.zeros(B),
      'drop_goal_dist': jnp.full(B, -1.0), 'last_grasp': jnp.zeros(B),
  }
  frames = [] if collect_frames > 0 else None
  for t in range(n_steps):
    tex = step_textures[t] if step_textures is not None else None
    es, ps, m, rgb = batched(params, es, ps, tgt_frames, tex)
    if frames is not None:
      import numpy as np
      frames.append(np.asarray(jax.device_get(rgb[:collect_frames])))
    agg['obj_vicinity'] = jnp.maximum(agg['obj_vicinity'],
                                      m['obj_vicinity'])
    agg['grasp_success'] = jnp.maximum(agg['grasp_success'],
                                       m['grasp_success'])
    agg['min_goal_dist'] = jnp.minimum(agg['min_goal_dist'], m['goal_dist'])
    agg['max_goal_dist'] = jnp.maximum(agg['max_goal_dist'], m['goal_dist'])
    agg['final_goal_dist'] = m['goal_dist']
    agg['task_success'] = m['task_success']
    agg['steps_grasped'] = agg['steps_grasped'] + m['grasp_success']
    agg['max_obj_z'] = jnp.maximum(agg['max_obj_z'], m['obj_z'])
    # goal_dist at the (last) moment the grasp was lost: -1 = never lost
    dropped = (agg['last_grasp'] > 0) & (m['grasp_success'] == 0)
    agg['drop_goal_dist'] = jnp.where(dropped, m['goal_dist'],
                                      agg['drop_goal_dist'])
    agg['last_grasp'] = m['grasp_success']
  if frames is not None:
    import numpy as np
    return agg, np.stack(frames)
  return agg
