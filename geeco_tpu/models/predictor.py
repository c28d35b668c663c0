"""Closed-loop predictors: frame ring buffer + jitted forward pass.

Serving parity with the reference Predictor API
(src/models/e2evmc/predictor.py): batch size 1, a ring buffer of
``window_size`` frames padded with the first frame (:192-200, 367-375),
input shape + [0,1] range validation with 1e-6 tolerance (:127-138),
argmax -> {-1, 0, +1} gripper remap (:183-189), ``set_goal`` target frame
for the goal-conditioned variant (:206-208), and LSTM state persisted
across ``predict`` calls, zeroed by ``reset`` (the reference restores
checkpoints excluding the lstm_memory variable, :87-94 — here the carry is
explicit so exclusion is structural).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .e2evmc import init_lstm_carry, make_model
from .params import E2EVMCConfig, load_model_config
from .snapshots import latest_checkpoint, restore_params

VALUE_TOL = 1e-6  # predictor.py:17


class _BasePredictor:
  goal_conditioned = False

  def __init__(self, model_dir: str, checkpoint_name: Optional[str] = None,
               config: Optional[E2EVMCConfig] = None, params=None,
               carry_mode: Optional[str] = None):
    """carry_mode: serving must match the carry semantics the model was
    TRAINED with (config.train_carry — see models/params.py).  None/'auto'
    derives it from the config: 'window' (fresh carry per predict) for
    stateless-trained models, 'persistent' (reference predictor behavior,
    predictor.py:127-200) for BPTT-trained ones.
    """
    if config is None:
      config = load_model_config(os.path.join(model_dir,
                                              'e2evmc_config.json'))
    self.cfg = config
    if carry_mode in (None, 'auto'):
      carry_mode = ('window' if config.train_carry == 'stateless'
                    else 'persistent')
    self.carry_mode = carry_mode
    self.model = make_model(config, self.goal_conditioned)
    if params is None:
      if checkpoint_name:
        ckpt = os.path.join(model_dir, checkpoint_name)
      else:
        ckpt = latest_checkpoint(model_dir)
        if ckpt is None:
          raise FileNotFoundError(f'no checkpoint in {model_dir}')
      template = self._init_params(jax.random.PRNGKey(0))
      params = restore_params(ckpt, template)
    self.params = params
    self._apply = jax.jit(self._forward)
    self.reset()

  # ---- graph helpers

  def _dummy_inputs(self):
    cfg = self.cfg
    frames = jnp.zeros((1, cfg.window_size, cfg.img_height, cfg.img_width,
                        cfg.img_channels))
    jnt = jnp.zeros((1, cfg.window_size, cfg.dim_jnt_state))
    tgt = jnp.zeros((1, cfg.img_height, cfg.img_width, cfg.img_channels))
    return frames, jnt, tgt

  def _init_params(self, rng):
    frames, jnt, tgt = self._dummy_inputs()
    carry = init_lstm_carry(self.cfg, 1)
    if self.goal_conditioned:
      v = self.model.init(rng, frames, jnt, tgt, carry, jnp.asarray(True))
    else:
      v = self.model.init(rng, frames, jnt, carry, jnp.asarray(True))
    return v['params']

  def _forward(self, params, frames, jnt, tgt, carry, reset):
    if self.goal_conditioned:
      return self.model.apply({'params': params}, frames, jnt, tgt, carry,
                              reset)
    return self.model.apply({'params': params}, frames, jnt, carry, reset)

  # ---- serving API

  def reset(self):
    self._buffer_frames = None  # [K, H, W, C]
    self._buffer_jnt = None     # [K, 7]
    self._carry = init_lstm_carry(self.cfg, 1)
    self._needs_reset = True
    self._tgt = np.zeros((self.cfg.img_height, self.cfg.img_width,
                          self.cfg.img_channels), np.float32)

  def set_goal(self, target_frame: np.ndarray):
    cfg = self.cfg
    expect = (cfg.img_height, cfg.img_width, cfg.img_channels)
    assert target_frame.shape == expect, \
        f'target frame shape {target_frame.shape} != {expect}'
    self._tgt = np.asarray(target_frame, np.float32)

  def _feed_frame(self, obs_frame: np.ndarray, jnt_state: np.ndarray):
    cfg = self.cfg
    expect = (cfg.img_height, cfg.img_width, cfg.img_channels)
    assert obs_frame.shape == expect, \
        f'obs frame shape {obs_frame.shape} != {expect}'
    assert obs_frame.min() >= 0.0 - VALUE_TOL and \
        obs_frame.max() <= 1.0 + VALUE_TOL, \
        'obs frame values must be normalized to [0, 1]'
    obs_frame = np.asarray(obs_frame, np.float32)
    jnt_state = np.asarray(jnt_state, np.float32)
    if self._buffer_frames is None:  # pad with first frame
      self._buffer_frames = np.stack([obs_frame] * cfg.window_size)
      self._buffer_jnt = np.stack([jnt_state] * cfg.window_size)
    else:
      self._buffer_frames = np.concatenate(
          [self._buffer_frames[1:], obs_frame[None]], axis=0)
      self._buffer_jnt = np.concatenate(
          [self._buffer_jnt[1:], jnt_state[None]], axis=0)

  def predict(self, obs_frame: np.ndarray, jnt_state: np.ndarray
              ) -> Dict[str, np.ndarray]:
    self._feed_frame(obs_frame, jnt_state)
    frames = jnp.asarray(self._buffer_frames)[None]
    jnt = jnp.asarray(self._buffer_jnt)[None]
    tgt = jnp.asarray(self._tgt)[None]
    if self.carry_mode == 'window':
      in_carry, reset = init_lstm_carry(self.cfg, 1), True
    else:
      in_carry, reset = self._carry, self._needs_reset
    ep, carry = self._apply(self.params, frames, jnt, tgt, in_carry,
                            jnp.asarray(reset))
    self._carry = carry
    self._needs_reset = False
    out: Dict[str, np.ndarray] = {}
    if self.cfg.control_mode == 'cartesian':
      out['cmd_ee'] = np.asarray(ep['pred_cmd_ee'][0])
      grp = int(np.argmax(np.asarray(ep['logits_cmd_grp'][0]))) - 1
      out['cmd_grp'] = np.asarray([float(grp)], np.float32)
    else:
      out['cmd_vel'] = np.asarray(ep['pred_cmd_vel'][0])
      out['cmd_ee'] = np.asarray(ep['pred_cmd_ee'][0])
      out['cmd_grp'] = np.asarray(ep['pred_cmd_grp'][0])
    out['pos_ee'] = np.asarray(ep['pred_aux_ee'][0])
    out['pos_obj'] = np.asarray(ep['pred_aux_obj'][0])
    for k in ('dynbuff', 'dyndiff'):
      if k in ep:
        out[k] = np.asarray(ep[k][0])
    return out


class E2EVMCPredictor(_BasePredictor):
  """Unconditional reflex predictor (reference E2EVMCPredictor, :212)."""
  goal_conditioned = False


class GoalE2EVMCPredictor(_BasePredictor):
  """Goal-conditioned predictor (reference GoalE2EVMCPredictor, :43)."""
  goal_conditioned = True
