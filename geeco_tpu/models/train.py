"""Training: losses, Adam train/eval steps, data-parallel sharding.

Loss/metric parity with the reference estimator model_fns
(src/models/e2evmc/estimator.py:14-141, 144-279):
  cartesian: loss = mse(cmd_ee) + softmax_ce(cmd_grp in {0,1,2})
             + lambda_aux * (mse(pos_ee) + mse(pos_obj))  (+ L2 reg)
  velocity:  sum of MSEs over cmd_vel/cmd_ee/cmd_grp/pos_ee/pos_obj
  reset flag: prod(features['step']) == 0  (estimator.py:41-42)
  eval: per-head MSE + gripper-command accuracy (estimator.py:108-120)

TPU-native: the LSTM memory is an explicit TrainState field (the reference
persists it in a non-trainable tf.Variable, graph.py:217-226); the train
step is one jit-compiled function; data parallelism shards the batch over a
1-d 'data' mesh axis with replicated params — gradients are averaged by
XLA-inserted collectives (no NCCL-style code).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .e2evmc import init_lstm_carry, make_model
from .params import E2EVMCConfig


@struct.dataclass
class TrainState:
  params: dict
  opt_state: optax.OptState
  lstm_carry: Tuple[jax.Array, jax.Array]
  step: jax.Array


def _dummy_batch(config: E2EVMCConfig, goal_conditioned: bool, n: int):
  H, W, C = config.img_height, config.img_width, config.img_channels
  K = config.window_size
  feature = {
      'step': jnp.ones((n, K), jnp.int32),
      'rgb': jnp.zeros((n, K, H, W, 3), jnp.float32),
      'depth': jnp.zeros((n, K, H, W, 1), jnp.float32),
      'jnt_state': jnp.zeros((n, K, config.dim_jnt_state), jnp.float32),
      'ee_state': jnp.zeros((n, K, 7), jnp.float32),
      'obj_state': jnp.zeros((n, K, 7), jnp.float32),
  }
  if goal_conditioned:
    feature['target_rgb'] = jnp.zeros((n, H, W, 3), jnp.float32)
    feature['target_depth'] = jnp.zeros((n, H, W, 1), jnp.float32)
  label = {
      'cmd': jnp.zeros((n, 4), jnp.float32),
      'vel_target': jnp.zeros((n, config.dim_jnt_state), jnp.float32),
      'ee_target': jnp.zeros((n, 7), jnp.float32),
      'grp_target': jnp.zeros((n, 2), jnp.float32),
  }
  return feature, label


def _norm_rgb(x: jax.Array) -> jax.Array:
  """uint8 frames -> [0,1] float (normalization on device; the pipeline
  ships uint8 to quarter the host->device traffic)."""
  if jnp.issubdtype(x.dtype, jnp.integer):
    return x.astype(jnp.float32) / 255.0
  return x


def obs_frames(config: E2EVMCConfig, feature: Dict) -> jax.Array:
  """RGB or RGB-D observation stack (estimator.py:30-39).

  Accepts either dense frames ('rgb' [B, K, H, W, 3]) or the deduplicated
  form the input pipeline ships ('rgb_frames' [F, H, W, 3] uint8 +
  'rgb_idx' [B, K]): consecutive windows of one episode share K-1 frames,
  so the dense form re-ships every frame ~K times — and the axon client
  retains every shipped buffer, so host RSS scales with bytes shipped."""
  if 'rgb_idx' in feature:
    rgb = _norm_rgb(feature['rgb_frames'])[feature['rgb_idx']]
  else:
    rgb = _norm_rgb(feature['rgb'])
  if config.img_channels == 3:
    return rgb
  return jnp.concatenate([rgb, feature['depth']], axis=-1)


def tgt_frame(config: E2EVMCConfig, feature: Dict) -> jax.Array:
  rgb = _norm_rgb(feature['target_rgb'])
  if 'rgb_idx' in feature and rgb.shape[0] == 1:
    # pipeline ships one shared target frame per (single-episode) batch
    rgb = jnp.broadcast_to(rgb, (feature['rgb_idx'].shape[0],) +
                           rgb.shape[1:])
  if config.img_channels == 3:
    return rgb
  return jnp.concatenate([rgb, feature['target_depth']], axis=-1)


def make_train_fns(config: E2EVMCConfig, goal_conditioned: bool):
  """Returns (init_fn, train_step, eval_step, apply_fn)."""
  model = make_model(config, goal_conditioned)
  # global-norm clipping: outlier batches (episode boundaries, fast-motion
  # windows) spiked the unclipped loss to ~26-29 and collapsed the network
  # into a dead-ReLU constant predictor; the reference's TF1 Adam survived
  # by luck of init (estimator.py:104-106 has no clipping either).
  tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(config.lr))

  def apply(params, feature, carry, reset):
    frames = obs_frames(config, feature)
    jnt = feature['jnt_state']
    if goal_conditioned:
      ep, carry = model.apply({'params': params}, frames, jnt,
                              tgt_frame(config, feature), carry, reset)
    else:
      ep, carry = model.apply({'params': params}, frames, jnt, carry, reset)
    return ep, carry

  def targets_of(feature, label):
    if config.control_mode == 'cartesian':
      cmd_grp = jnp.rint(label['cmd'][:, 3]).astype(jnp.int32) + 1
      return {
          'cmd_ee': label['cmd'][:, :3],
          'cmd_grp': cmd_grp,
          'pos_ee': feature['ee_state'][:, -1, :3],
          'pos_obj': feature['obj_state'][:, -1, :3],
      }
    return {
        'cmd_vel': label['vel_target'],
        'cmd_ee': label['ee_target'][:, :3],
        'cmd_grp': label['grp_target'],
        'pos_ee': feature['ee_state'][:, -1, :3],
        'pos_obj': feature['obj_state'][:, -1, :3],
    }

  def loss_of(ep, tgt):
    mse = lambda a, b: jnp.mean(jnp.square(a - b))
    parts = {}
    if config.control_mode == 'cartesian':
      parts['loss_cmd_ee'] = mse(ep['pred_cmd_ee'], tgt['cmd_ee'])
      oh = jax.nn.one_hot(tgt['cmd_grp'], config.num_grp_states)
      parts['loss_cmd_grp'] = jnp.mean(optax.softmax_cross_entropy(
          ep['logits_cmd_grp'], oh))
      parts['loss_pos_ee'] = mse(ep['pred_aux_ee'], tgt['pos_ee'])
      parts['loss_pos_obj'] = mse(ep['pred_aux_obj'], tgt['pos_obj'])
      loss = (parts['loss_cmd_ee'] + parts['loss_cmd_grp'] +
              config.lambda_aux * (parts['loss_pos_ee'] +
                                   parts['loss_pos_obj']))
    else:
      parts['loss_cmd_vel'] = mse(ep['pred_cmd_vel'], tgt['cmd_vel'])
      parts['loss_cmd_ee'] = mse(ep['pred_cmd_ee'], tgt['cmd_ee'])
      parts['loss_cmd_grp'] = mse(ep['pred_cmd_grp'], tgt['cmd_grp'])
      parts['loss_pos_ee'] = mse(ep['pred_aux_ee'], tgt['pos_ee'])
      parts['loss_pos_obj'] = mse(ep['pred_aux_obj'], tgt['pos_obj'])
      loss = sum(parts.values())
    return loss, parts

  def init_fn(rng, batch_size: Optional[int] = None) -> TrainState:
    n = batch_size or config.batch_size
    feature, _ = _dummy_batch(config, goal_conditioned, 1)
    carry1 = init_lstm_carry(config, 1)
    frames = obs_frames(config, feature)
    if goal_conditioned:
      variables = model.init(rng, frames, feature['jnt_state'],
                             tgt_frame(config, feature), carry1,
                             jnp.asarray(True))
    else:
      variables = model.init(rng, frames, feature['jnt_state'], carry1,
                             jnp.asarray(True))
    params = variables['params']
    return TrainState(params=params, opt_state=tx.init(params),
                      lstm_carry=init_lstm_carry(config, n),
                      step=jnp.zeros((), jnp.int32))

  def train_step(ts: TrainState, feature: Dict, label: Dict
                 ) -> Tuple[TrainState, Dict]:
    reset = jnp.prod(feature['step']) == 0

    def lf(params):
      ep, carry = apply(params, feature, ts.lstm_carry, reset)
      tgt = targets_of(feature, label)
      loss, parts = loss_of(ep, tgt)
      if config.l2_regularizer > 0:
        l2 = sum(jnp.sum(jnp.square(p))
                 for p in jax.tree.leaves(params))
        loss = loss + config.l2_regularizer * l2
      return loss, (parts, carry)

    (loss, (parts, carry)), grads = jax.value_and_grad(
        lf, has_aux=True)(ts.params)
    updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
    params = optax.apply_updates(ts.params, updates)
    metrics = dict(parts, loss=loss)
    return ts.replace(params=params, opt_state=opt_state, lstm_carry=carry,
                      step=ts.step + 1), metrics

  def eval_step(ts: TrainState, feature: Dict, label: Dict) -> Dict:
    reset = jnp.prod(feature['step']) == 0
    ep, _ = apply(ts.params, feature, ts.lstm_carry, reset)
    tgt = targets_of(feature, label)
    loss, parts = loss_of(ep, tgt)
    metrics = dict(parts, loss=loss)
    mse = lambda a, b: jnp.mean(jnp.square(a - b))
    metrics['mse_cmd_ee'] = mse(ep['pred_cmd_ee'], tgt['cmd_ee'])
    metrics['mse_pos_ee'] = mse(ep['pred_aux_ee'], tgt['pos_ee'])
    metrics['mse_pos_obj'] = mse(ep['pred_aux_obj'], tgt['pos_obj'])
    if config.control_mode == 'cartesian':
      pred = jnp.argmax(ep['logits_cmd_grp'], axis=-1)
      metrics['acc_cmd_grp'] = jnp.mean(
          (pred == tgt['cmd_grp']).astype(jnp.float32))
    return metrics

  return init_fn, train_step, eval_step, apply


# ---------------------------------------------------------------- sharding


def data_parallel_sharding(mesh: Mesh):
  """(batch_sharding, replicated_sharding) for a 1-d 'data' mesh."""
  return (NamedSharding(mesh, P('data')), NamedSharding(mesh, P()))


def shard_train_state(ts: TrainState, mesh: Mesh) -> TrainState:
  repl = NamedSharding(mesh, P())
  batch_sh = NamedSharding(mesh, P('data'))
  ts = jax.tree.map(lambda x: jax.device_put(x, repl), ts)
  # LSTM carry is batch-indexed -> shard over data axis
  carry = jax.tree.map(lambda x: jax.device_put(x, batch_sh),
                       ts.lstm_carry)
  return ts.replace(lstm_carry=carry)


# Features that are shared across the batch rather than batch-indexed:
# 'rgb_frames' is the deduplicated frame slab ([F, H, W, 3], F = B+K-1),
# 'target_rgb'/'target_depth' may be a single shared goal frame ([1, ...]).
_REPLICATED_FEATURES = frozenset({'rgb_frames'})


def shard_batch(batch, mesh: Mesh):
  sh = NamedSharding(mesh, P('data'))
  repl = NamedSharding(mesh, P())
  n = mesh.devices.size

  def put(path, x):
    x = jnp.asarray(x)
    key = path[-1].key if path and hasattr(path[-1], 'key') else None
    shared = (key in _REPLICATED_FEATURES
              or (key in ('target_rgb', 'target_depth') and x.shape[0] == 1))
    if shared or x.ndim == 0:
      return jax.device_put(x, repl)
    if x.shape[0] % n != 0:
      raise ValueError(
          f'batch leaf {key!r} has leading dim {x.shape[0]} not divisible '
          f'by the {n}-device data axis')
    return jax.device_put(x, sh)
  return jax.tree_util.tree_map_with_path(put, batch)
