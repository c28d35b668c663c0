"""E2E-VMC visuomotor controller in Flax (CNN encoder + LSTM decoder).

Architecture parity with the reference TF-1 graph (src/models/e2evmc/
graph.py): 8-layer stride-2 conv encoder 256^2 -> 2x2xC (:61-117), dynamic
image preprocessing with harmonic-number coefficients (:17-55), state
concatenation variants (:123-192), 128-unit LSTM decoder + FC-128 and
cartesian/velocity prediction heads with auxiliary EE/object pose heads
(:198-260), and the goal-conditioned variants (goal_e2evmc, :321-416) with
proc_obs in {sequence, dynimg} and proc_tgt in {constant, residual, dyndiff}.

TPU-first differences:
  * the LSTM memory is an explicit carry (c, h) threaded through the train
    loop / predictor instead of a hidden tf.Variable — same reset-on-new-
    sequence semantics (estimator.py:41-42: reset when prod(step)==0),
    but functional, shardable and scan-friendly.
  * convolutions run in bfloat16 (configurable) with float32 params; heads
    and losses in float32 — MXU-native precision policy.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .params import E2EVMCConfig

# 8-layer encoder: (filters, stride); 256x256 -> 2x2 (graph.py:76-116)
_ENC_SPEC = ((32, 1), (48, 2), (64, 2), (128, 2), (192, 2), (256, 2),
             (256, 2))  # + final (dim_out, 2)


def _harmonic(t: int) -> float:
  return float(sum(1.0 / k for k in range(1, t + 1)))


def dynimg_coefficients(K: int) -> jnp.ndarray:
  """alpha_t = 2(T - t + 1) - (T + 1)(H(T) - H(t-1)), t in 1..K
  (reference graph.py:17-28)."""
  return jnp.asarray([
      2.0 * (K - t + 1) - (K + 1) * (_harmonic(K) - _harmonic(t - 1))
      for t in range(1, K + 1)], jnp.float32)


def dynimg(frames: jax.Array) -> jax.Array:
  """Normalized dynamic image of a frame sequence.

  frames: [N, K, H, W, C] in [0, 1] -> [N, H, W, C] in [0, 1]
  (reference graph.py:30-55).
  """
  K = frames.shape[1]
  w = dynimg_coefficients(K).reshape(1, K, 1, 1, 1)
  dyn = jnp.sum(w * frames, axis=1)
  mn = jnp.min(dyn, axis=(1, 2, 3), keepdims=True)
  mx = jnp.max(dyn, axis=(1, 2, 3), keepdims=True)
  return (dyn - mn) / (mx - mn + 1e-6)


class ConvEncoder(nn.Module):
  """8x stride-2 conv stack 256x256xC -> [N, 2, 2, dim_out].

  norm='group' inserts GroupNorm before each ReLU.  The reference's raw
  conv+ReLU stack (graph.py:76-116) trains only by luck of TF-1's init:
  rebuilt, it reliably degenerates — measured round 2 as near-constant
  features (3.5%% relative difference between frames of different task
  phases after 1k steps) and dead-ReLU collapse under outlier batches.
  Normalization makes the encoder robust to init/lr; parity with the
  reference is behavioral (task success), not architectural.
  """
  dim_out: int = 256
  dtype: jnp.dtype = jnp.bfloat16
  norm: str = 'group'

  @nn.compact
  def __call__(self, x: jax.Array) -> jax.Array:
    x = x.astype(self.dtype)

    def gn(x, i):
      if self.norm != 'group':
        return x
      groups = 8 if x.shape[-1] % 8 == 0 else 1
      return nn.GroupNorm(num_groups=groups, dtype=self.dtype,
                          name=f'gn{i}')(x)

    for i, (filters, stride) in enumerate(_ENC_SPEC):
      x = nn.Conv(filters, (3, 3), strides=(stride, stride), padding='SAME',
                  dtype=self.dtype, name=f'conv{i + 1}')(x)
      x = nn.relu(gn(x, i + 1))
    x = nn.Conv(self.dim_out, (3, 3), strides=(2, 2), padding='SAME',
                dtype=self.dtype, name='conv8')(x)
    x = nn.relu(gn(x, 8))
    return x.astype(jnp.float32)


def _tile_state(feat: jax.Array, state: jax.Array) -> jax.Array:
  """Tile a state vector over the 2x2 spatial grid and concat channels
  (state_concatenation, graph.py:123-144)."""
  n, h, w, _ = feat.shape
  st = jnp.broadcast_to(state[:, None, None, :],
                        (n, h, w, state.shape[-1]))
  return jnp.concatenate([feat, st], axis=-1).reshape(n, -1)


class LSTMDecoder(nn.Module):
  """LSTM over the per-frame feature list + FC + prediction heads."""
  config: E2EVMCConfig

  @nn.compact
  def __call__(self, feat_list, carry, reset):
    cfg = self.config
    cell = nn.LSTMCell(features=cfg.dim_h_lstm, name='lstm')
    n = feat_list[0].shape[0]
    zero = (jnp.zeros((n, cfg.dim_h_lstm)), jnp.zeros((n, cfg.dim_h_lstm)))
    if carry is None:
      carry = zero
    carry = jax.tree.map(
        lambda z, c: jnp.where(reset, z, c), zero, carry)
    out = None
    for feat in feat_list:
      carry, out = cell(carry, feat)
    net = nn.relu(nn.Dense(cfg.dim_h_fc, name='fc1')(out))
    # zero-init head kernels: initial predictions are exactly 0 so the
    # first-step loss is the target variance (~1), not ~26 — the huge
    # early gradients of default-init heads through the 3k-dim feature
    # concat drove every upstream ReLU dead (catastrophic collapse to a
    # constant predictor; observed at step-15k: output exactly
    # input-independent).  Clipping in train.py guards the rest of the run.
    head = lambda d, name: nn.Dense(d, name=name,
                                    kernel_init=nn.initializers.zeros)
    ep: Dict[str, jax.Array] = {}
    if cfg.control_mode == 'cartesian':
      ep['pred_cmd_ee'] = head(3, 'pred_cmd_ee')(net)
      ep['logits_cmd_grp'] = head(cfg.num_grp_states, 'logits_cmd_grp')(net)
    elif cfg.control_mode == 'velocity':
      ep['pred_cmd_vel'] = head(cfg.dim_jnt_state, 'pred_cmd_vel')(net)
      ep['pred_cmd_ee'] = head(3, 'pred_cmd_ee')(net)
      ep['pred_cmd_grp'] = head(cfg.dim_grp_command, 'pred_cmd_grp')(net)
    else:
      raise ValueError(f'unknown control mode {cfg.control_mode}')
    ep['pred_aux_ee'] = head(3, 'pred_aux_ee')(net)
    ep['pred_aux_obj'] = head(3, 'pred_aux_obj')(net)
    return ep, carry


class E2EVMC(nn.Module):
  """Unconditional reflex (reference e2e_vmc, graph.py:268-319).

  ``window_features`` (pure conv work, no recurrence) and ``decode`` (LSTM +
  heads) are exposed separately so the training loop can batch all window
  encodings into large MXU-friendly conv passes and scan only the tiny LSTM
  over the window sequence (models/train.py episode-scan path).
  """
  config: E2EVMCConfig

  def setup(self):
    cfg = self.config
    dtype = jnp.dtype(cfg.compute_dtype)
    self.enc_obs = ConvEncoder(cfg.dim_s_obs, dtype=dtype,
                               norm=cfg.encoder_norm, name='ConvEncoder')
    self.decoder = LSTMDecoder(cfg, name='LSTMDecoder')

  def window_features(self, rgb_frames, jnt_states):
    """[N, K, H, W, C] frames -> (list of per-step features, extras)."""
    feats = []
    for k in range(self.config.window_size):
      f = self.enc_obs(rgb_frames[:, k])
      feats.append(_tile_state(f, jnt_states[:, k]))
    return feats, {}

  def decode(self, feats, carry, reset):
    return self.decoder(feats, carry, reset)

  def __call__(self, rgb_frames, jnt_states, carry=None,
               reset: jax.Array = jnp.asarray(True)):
    feats, extras = self.window_features(rgb_frames, jnt_states)
    ep, carry = self.decode(feats, carry, reset)
    ep = dict(extras, **ep)
    return ep, carry


class GoalE2EVMC(nn.Module):
  """Goal-conditioned reflex (reference goal_e2evmc, graph.py:321-416).

  Same ``window_features``/``decode`` split as E2EVMC (see there).
  """
  config: E2EVMCConfig

  def setup(self):
    cfg = self.config
    dtype = jnp.dtype(cfg.compute_dtype)
    self.enc_obs = ConvEncoder(cfg.dim_s_obs, dtype=dtype,
                               norm=cfg.encoder_norm, name='ConvEncoder')
    if cfg.proc_obs == 'dynimg':
      self.enc_dyn = ConvEncoder(cfg.dim_s_dyn, dtype=dtype,
                                 norm=cfg.encoder_norm,
                                 name='DynBuffEncoder')
    if cfg.proc_tgt == 'dyndiff':
      self.enc_diff = ConvEncoder(cfg.dim_s_diff, dtype=dtype,
                                  norm=cfg.encoder_norm,
                                  name='DynDiffEncoder')
    self.decoder = LSTMDecoder(cfg, name='LSTMDecoder')

  def window_features(self, rgb_frames, jnt_states, tgt_frame):
    cfg = self.config
    extras: Dict[str, jax.Array] = {}

    if cfg.proc_tgt in ('constant', 'residual'):
      tgt_feat = self.enc_obs(tgt_frame)

    feats = []
    if cfg.proc_obs == 'sequence':
      for k in range(cfg.window_size):
        frame = rgb_frames[:, k]
        feat = self.enc_obs(frame)
        if cfg.proc_tgt == 'constant':
          state = _tile_state(
              jnp.concatenate([feat, tgt_feat], -1), jnt_states[:, k])
        elif cfg.proc_tgt == 'residual':
          state = _tile_state(tgt_feat - feat, jnt_states[:, k])
        elif cfg.proc_tgt == 'dyndiff':
          seq = jnp.stack([frame, tgt_frame], axis=1)
          dd = dynimg(seq)
          extras['dyndiff'] = dd
          tfeat = self.enc_diff(dd)
          state = _tile_state(
              jnp.concatenate([feat, tfeat], -1), jnt_states[:, k])
        else:
          raise ValueError(f'unknown proc_tgt {cfg.proc_tgt}')
        feats.append(state)
    elif cfg.proc_obs == 'dynimg':
      frame = rgb_frames[:, -1]
      feat = self.enc_obs(frame)
      dyn_buff = dynimg(rgb_frames)
      extras['dynbuff'] = dyn_buff
      dyn_feat = self.enc_dyn(dyn_buff)
      seq = jnp.stack([frame, tgt_frame], axis=1)
      dyn_diff = dynimg(seq)
      extras['dyndiff'] = dyn_diff
      tgt_feat = self.enc_diff(dyn_diff)
      # representation_concatenation_v2 (graph.py:169-192)
      state = _tile_state(
          jnp.concatenate([feat, dyn_feat, tgt_feat], -1),
          jnt_states[:, -1])
      feats.append(state)
    else:
      raise ValueError(f'unknown proc_obs {cfg.proc_obs}')
    return feats, extras

  def decode(self, feats, carry, reset):
    return self.decoder(feats, carry, reset)

  def __call__(self, rgb_frames, jnt_states, tgt_frame, carry=None,
               reset: jax.Array = jnp.asarray(True)):
    feats, extras = self.window_features(rgb_frames, jnt_states, tgt_frame)
    heads, carry = self.decode(feats, carry, reset)
    ep = dict(extras, **heads)
    return ep, carry


def make_model(config: E2EVMCConfig, goal_conditioned: bool):
  return GoalE2EVMC(config) if goal_conditioned else E2EVMC(config)


def init_lstm_carry(config: E2EVMCConfig, batch_size: int):
  return (jnp.zeros((batch_size, config.dim_h_lstm)),
          jnp.zeros((batch_size, config.dim_h_lstm)))


def count_parameters(params) -> int:
  return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
