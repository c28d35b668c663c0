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

  def _reset_flag(step):
    # window contains the episode start (estimator.py:41-42 uses
    # prod(step)==0; jnp.any(step==0) is the same predicate without the
    # int64 overflow a 128-element product incurs)
    return jnp.any(step == 0)

  def train_step(ts: TrainState, feature: Dict, label: Dict
                 ) -> Tuple[TrainState, Dict]:
    reset = _reset_flag(feature['step'])

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
    reset = _reset_flag(feature['step'])
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


# ------------------------------------------------------- episode-scan path


def make_episode_train_fns(config: E2EVMCConfig, goal_conditioned: bool,
                           chunk_windows: int = 8, render_fn=None,
                           aug_pad: int = 0, render_chunk: int = 100):
  """Train/eval steps over whole-episode batches (the TPU-native path).

  The reference pipeline batches 32 CONSECUTIVE windows of one episode
  (geeco_gym.py:465-472; the element-level shuffle is commented out at
  :447-448), so every optimizer step sees near-identical labels — online
  SGD on maximally-correlated batches. TF-1's init survived that by luck;
  here it reliably collapsed the network into a constant predictor
  (round-2 run: 91k steps, eval loss frozen at init value, output
  batch-std exactly 0 on every head).

  This path restructures the same data TPU-first instead:
    * a batch = B whole episodes; every gradient step averages ALL task
      phases (balanced gradient, no catastrophic interference);
    * all conv encodings are carry-independent, so they run as large
      batched MXU passes (lax.map over window chunks, rematerialized);
    * only the tiny LSTM cell scans over the window sequence — true BPTT
      with exactly the serving carry semantics (the predictor carries
      (c,h) across consecutive stride-1 windows, predictor.py:192-200).

  Batch layout (produced by data/dataset.py::episode_pipeline):
    frames       [B, F, H, W, 3] uint8   (F = T-1 frames after droplast)
    depth        [B, F, H, W, 1] f32     (img_channels == 4 only)
    target_rgb   [B, H, W, 3]   uint8    (goal-conditioned only)
    target_depth [B, H, W, 1]   f32      (goal + rgbd only)
    jnt_state    [B, F, J]      f32
    widx         [N, K] int32            (shared window index matrix)
    valid        [N] bool                (False on chunk padding rows)
    labels: cmd [B,N,4] vel_target [B,N,J] ee_target [B,N,7]
            grp_target [B,N,2] pos_ee [B,N,3] pos_obj [B,N,3]
  """
  model = make_model(config, goal_conditioned)
  tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(config.lr))
  C = chunk_windows

  def _shift_frames(img, dy, dx, s):
    """Edge-padded translation of [..., H, W, C] by (dy, dx) in [-s, s] —
    the on-device counterpart of data/dataset.py _shift2d."""
    H, W = img.shape[-3:-1]
    pad = [(0, 0)] * (img.ndim - 3) + [(s, s), (s, s), (0, 0)]
    p = jnp.pad(img, pad, mode='edge')
    start = [0] * (img.ndim - 3) + [s + dy, s + dx, 0]
    return jax.lax.dynamic_slice(p, [jnp.asarray(i) for i in start],
                                 img.shape)

  def _materialize_frames(batch: Dict) -> Dict:
    """State-only batches -> frame batches, fully on device.

    Input keys (data/dataset.py state-only episode batches):
      qpos [B, T, nq], mocap [B, T, 7], rgba [B, ngeom, 4],
      tgt_qpos/tgt_mocap [B, ...] (goal-conditioned),
      aug_shift [B, 2] (optional per-episode pixel translation).
    The recorded trajectory is re-rendered with the SAME renderer that
    produced (or would produce) the frame-mode dataset, so the pixels are
    identical to a frames-on-disk collect — but only ~100 floats/step
    cross the host link instead of 196 KB/step.
    """
    if 'qpos' not in batch:
      return batch
    assert render_fn is not None, (
        'state-only dataset batches need make_episode_train_fns('
        'render_fn=env.render_from_qpos)')
    b = dict(batch)
    qpos = b.pop('qpos')
    mocap = b.pop('mocap')
    rgba = b.pop('rgba')
    B, T = qpos.shape[:2]
    n = B * T
    flat_q = qpos.reshape(n, -1)
    flat_m = mocap.reshape(n, -1)
    flat_r = jnp.repeat(rgba, T, axis=0)
    CH = min(render_chunk, n)
    n_pad = (-n) % CH
    if n_pad:
      # clamped index pad (works even when n_pad > n, e.g. tiny tests)
      idx = jnp.minimum(jnp.arange(n + n_pad), n - 1)
      flat_q, flat_m, flat_r = flat_q[idx], flat_m[idx], flat_r[idx]

    def rchunk(args):
      rgb, _ = jax.vmap(render_fn)(*args)
      return rgb

    frames = jax.lax.map(rchunk, (flat_q.reshape(-1, CH, flat_q.shape[-1]),
                                  flat_m.reshape(-1, CH, flat_m.shape[-1]),
                                  flat_r.reshape((-1, CH) + rgba.shape[1:])))
    frames = frames.reshape((-1,) + frames.shape[2:])[:n]
    frames = frames.reshape((B, T) + frames.shape[1:])
    tgt = None
    if 'tgt_qpos' in b:
      tgt, _ = jax.vmap(render_fn)(b.pop('tgt_qpos'), b.pop('tgt_mocap'),
                                   rgba)
    if 'aug_shift' in b:
      sh = b.pop('aug_shift')
      if aug_pad <= 0:
        # lax.dynamic_slice clamps out-of-range starts, so an aug_shift
        # batch fed to fns built with aug_pad=0 would silently truncate
        # the shifts instead of applying them (ADVICE r4): fail loudly.
        raise ValueError(
            'batch carries aug_shift offsets but make_episode_train_fns '
            'was built with aug_pad=0; pass aug_pad >= the pipeline\'s '
            'aug_shift so _shift_frames has real padding to slide over')
      s = max(aug_pad, 1)
      frames = jax.vmap(lambda f, d: _shift_frames(f, d[0], d[1], s))(
          frames, sh)
      if tgt is not None:
        tgt = jax.vmap(lambda f, d: _shift_frames(f, d[0], d[1], s))(
            tgt, sh)
    b['frames'] = frames
    if tgt is not None:
      b['target_rgb'] = tgt
    return b

  def _frames_of(batch, idx):
    """Gather window frames [B, n, K, H, W, C] in [0,1] float."""
    rgb = _norm_rgb(batch['frames'][:, idx])
    if config.img_channels == 4:
      return jnp.concatenate([rgb, batch['depth'][:, idx]], axis=-1)
    return rgb

  def _tgt_of(batch):
    rgb = _norm_rgb(batch['target_rgb'])
    if config.img_channels == 4:
      return jnp.concatenate([rgb, batch['target_depth']], axis=-1)
    return rgb

  def _window_feats(params, batch):
    """All window features, chunked: -> [N_pad, L, B, D] f32."""
    B = batch['frames'].shape[0]
    widx = batch['widx']
    N, K = widx.shape
    n_pad = (-N) % C
    widx_p = jnp.concatenate(
        [widx, jnp.broadcast_to(widx[-1:], (n_pad, K))]) if n_pad else widx
    chunks = widx_p.reshape(-1, C, K)
    tgt = _tgt_of(batch) if goal_conditioned else None

    def chunk_fn(idxc):  # [C, K] -> [C, L, B, D]
      win = _frames_of(batch, idxc)          # [B, C, K, H, W, ch]
      jnt = batch['jnt_state'][:, idxc]      # [B, C, K, J]
      H, W, ch = win.shape[-3:]
      win = win.swapaxes(0, 1).reshape(C * B, K, H, W, ch)
      jnt = jnt.swapaxes(0, 1).reshape(C * B, K, -1)
      if goal_conditioned:
        tgt_b = jnp.broadcast_to(tgt[None], (C,) + tgt.shape)
        tgt_b = tgt_b.reshape((C * B,) + tgt.shape[1:])
        feats, _ = model.apply({'params': params}, win, jnt, tgt_b,
                               method='window_features')
      else:
        feats, _ = model.apply({'params': params}, win, jnt,
                               method='window_features')
      # L per-step features, each [C*B, D]
      out = jnp.stack(feats)                 # [L, C*B, D]
      return out.reshape(out.shape[0], C, B, -1).swapaxes(0, 1)

    feats = jax.lax.map(jax.checkpoint(chunk_fn), chunks)  # [nc, C, L, B, D]
    return feats.reshape((-1,) + feats.shape[2:])          # [N_pad, L, B, D]

  def _decode_all(params, feats_n):
    """Decode all windows. feats_n [N, L, B, D] -> dict of [N, B, ...].

    train_carry='stateless': fresh zero carry per window; no sequential
    dependency, so the decode runs as one batched pass over N*B windows.
    train_carry='bptt': lax.scan the LSTM cell over the window sequence
    (true BPTT; serving must use persistent carry).
    """
    N, L, B, D = feats_n.shape
    if config.train_carry == 'stateless':
      flat = feats_n.transpose(1, 0, 2, 3).reshape(L, N * B, D)
      feats = [flat[i] for i in range(L)]
      carry0 = (jnp.zeros((N * B, config.dim_h_lstm)),
                jnp.zeros((N * B, config.dim_h_lstm)))
      ep, _ = model.apply({'params': params}, feats, carry0,
                          jnp.asarray(True), method='decode')
      return jax.tree.map(
          lambda x: x.reshape((N, B) + x.shape[1:]), ep)
    carry0 = (jnp.zeros((B, config.dim_h_lstm)),
              jnp.zeros((B, config.dim_h_lstm)))

    def step(carry, feat_l):
      feats = [feat_l[i] for i in range(feat_l.shape[0])]
      ep, carry = model.apply({'params': params}, feats, carry,
                              jnp.asarray(False), method='decode')
      return carry, ep

    _, eps = jax.lax.scan(step, carry0, feats_n)
    return eps  # dict of [N_pad, B, ...]

  def _masked_mean(x, mask, w=None):
    # x [N, B, ...], mask [N], w optional per-sample weights [N, B]
    m = mask.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    if w is not None:  # w is renormalized to masked mean 1, so the
      m = m * w.reshape(w.shape + (1,) * (x.ndim - 2))  # denominator holds
    return jnp.sum(x * m) / (jnp.sum(mask) * float(np.prod(x.shape[1:])))

  def _window_weights(batch, mask, pad):
    """Per-window command-loss weights [N_pad, B] (config.loss_weighting).

    'cmd_mag': weight ∝ the window's labeled command magnitude, clipped to
    [0.25, 4] x mean and renormalized to masked mean 1 — up-weights the
    ~30 large-action approach windows an expert episode has against its
    ~70 near-idle tail windows without changing the loss scale.
    """
    boost = config.start_boost
    if config.loss_weighting == 'none' and boost == 1.0:
      return None
    if config.loss_weighting not in ('none', 'cmd_mag'):
      raise ValueError(f'unknown loss_weighting {config.loss_weighting!r}')

    def wmean(a, m):
      # masked PER-ELEMENT mean (broadcasting-correct: the round-3 code
      # summed a over [N, B] but counted only sum(mask)=N_m, inflating the
      # mean by B -> every weight hit the 0.25 clip floor and, after the
      # equally-miscounted renormalization, scaled the command losses down
      # by 1/B relative to the aux losses)
      a_b, m_b = jnp.broadcast_arrays(a, m)
      return jnp.sum(a_b * m_b) / jnp.maximum(jnp.sum(m_b), 1.0)

    m = mask.astype(jnp.float32)[:, None]
    if config.loss_weighting == 'cmd_mag':
      cmd = pad(jnp.swapaxes(batch['cmd'], 0, 1))        # [N_pad, B, 4]
      mag = (jnp.linalg.norm(cmd[..., :3], axis=-1) +
             jnp.abs(cmd[..., 3]))                        # [N_pad, B]
      w = jnp.clip(mag / jnp.maximum(wmean(mag, m), 1e-8), 0.25, 4.0)
    else:
      w = jnp.ones(mask.shape + (1,))
    if boost != 1.0:
      # multiply the first start_boost_windows windows of the episode (the
      # K-1 padded starts + early near-static ones — the closed-loop escape
      # set, see params.py start_boost) by the boost factor
      idx = jnp.arange(mask.shape[0])[:, None]           # [N_pad, 1]
      w = w * jnp.where(idx < config.start_boost_windows, boost, 1.0)
    # [N_pad, B] (cmd_mag) or [N_pad, 1] (uniform+boost); _masked_mean
    # broadcasts either against [N_pad, B, ...] losses.  Renormalized to
    # masked per-element mean 1 so the weighted losses keep the loss scale.
    return w / jnp.maximum(wmean(w, m), 1e-8)

  def _loss_all(ep, batch):
    """Per-part masked losses over [N_pad, B, ...] predictions."""
    N = batch['widx'].shape[0]
    n_pad = (-N) % C
    mask = batch['valid']
    if n_pad:
      mask = jnp.concatenate([mask, jnp.zeros((n_pad,), bool)])
    lbl = lambda k: jnp.swapaxes(batch[k], 0, 1)  # [B,N,...] -> [N,B,...]
    if n_pad:
      pad = lambda x: jnp.concatenate(
          [x, jnp.zeros((n_pad,) + x.shape[1:], x.dtype)])
    else:
      pad = lambda x: x
    mse = lambda a, b: _masked_mean(jnp.square(a - pad(b)), mask)
    # command losses optionally re-weighted toward large-action windows
    w = _window_weights(batch, mask, pad)
    msew = lambda a, b: _masked_mean(jnp.square(a - pad(b)), mask, w)
    parts = {}
    if config.control_mode == 'cartesian':
      cmd = lbl('cmd')
      parts['loss_cmd_ee'] = msew(ep['pred_cmd_ee'], cmd[..., :3])
      grp = jnp.rint(pad(cmd)[..., 3]).astype(jnp.int32) + 1
      oh = jax.nn.one_hot(grp, config.num_grp_states)
      ce = optax.softmax_cross_entropy(ep['logits_cmd_grp'], oh)  # [N, B]
      parts['loss_cmd_grp'] = _masked_mean(ce, mask, w)
      parts['loss_pos_ee'] = mse(ep['pred_aux_ee'], lbl('pos_ee'))
      parts['loss_pos_obj'] = mse(ep['pred_aux_obj'], lbl('pos_obj'))
      loss = (parts['loss_cmd_ee'] + parts['loss_cmd_grp'] +
              config.lambda_aux * (parts['loss_pos_ee'] +
                                   parts['loss_pos_obj']))
      acc = (jnp.argmax(ep['logits_cmd_grp'], -1) == grp).astype(jnp.float32)
      parts['acc_cmd_grp'] = _masked_mean(acc, mask)
    else:
      parts['loss_cmd_vel'] = msew(ep['pred_cmd_vel'], lbl('vel_target'))
      parts['loss_cmd_ee'] = msew(ep['pred_cmd_ee'],
                                  lbl('ee_target')[..., :3])
      parts['loss_cmd_grp'] = msew(ep['pred_cmd_grp'], lbl('grp_target'))
      parts['loss_pos_ee'] = mse(ep['pred_aux_ee'], lbl('pos_ee'))
      parts['loss_pos_obj'] = mse(ep['pred_aux_obj'], lbl('pos_obj'))
      loss = sum(v for k, v in parts.items() if k.startswith('loss_'))
    # collapse canary: a healthy policy's commands vary across windows;
    # batch-std ~0 on every head = dead constant predictor
    parts['canary_std'] = jnp.std(ep['pred_cmd_ee'])
    # start-basin diagnostics: cmd_ee quality restricted to the first
    # start_boost_windows windows (padded starts + early near-static) —
    # the windows closed-loop escape depends on.  cos>0 on the padded
    # first window is the necessary condition for leaving the start state.
    cmd_ee = (pad(lbl('cmd'))[..., :3] if config.control_mode == 'cartesian'
              else pad(lbl('ee_target'))[..., :3])
    start = (jnp.arange(mask.shape[0]) <
             config.start_boost_windows) & mask          # [N_pad]
    parts['mse_cmd_ee_start'] = _masked_mean(
        jnp.square(ep['pred_cmd_ee'] - cmd_ee), start)
    dot = jnp.sum(ep['pred_cmd_ee'] * cmd_ee, axis=-1)
    denom = (jnp.linalg.norm(ep['pred_cmd_ee'], axis=-1) *
             jnp.linalg.norm(cmd_ee, axis=-1) + 1e-8)
    parts['cos_cmd_ee_start'] = _masked_mean(dot / denom, start)
    return loss, parts

  def _forward_loss(params, batch):
    feats = _window_feats(params, batch)
    ep = _decode_all(params, feats)
    loss, parts = _loss_all(ep, batch)
    if config.l2_regularizer > 0:
      l2 = sum(jnp.sum(jnp.square(p)) for p in jax.tree.leaves(params))
      loss = loss + config.l2_regularizer * l2
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

  def train_step(ts: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
    batch = _materialize_frames(batch)
    (loss, parts), grads = jax.value_and_grad(
        _forward_loss, has_aux=True)(ts.params, batch)
    updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
    params = optax.apply_updates(ts.params, updates)
    metrics = dict(parts, loss=loss)
    return ts.replace(params=params, opt_state=opt_state,
                      step=ts.step + 1), metrics

  def eval_step(ts: TrainState, batch: Dict) -> Dict:
    loss, parts = _forward_loss(ts.params, _materialize_frames(batch))
    return dict(parts, loss=loss)

  return init_fn, train_step, eval_step, tx


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
# 'target_rgb'/'target_depth' may be a single shared goal frame ([1, ...]),
# 'widx'/'valid' are the shared window-index matrix of the episode-scan
# batch layout (make_episode_train_fns).
_REPLICATED_FEATURES = frozenset({'rgb_frames', 'widx', 'valid'})


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
