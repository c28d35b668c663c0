"""Dev: open-loop action-prediction probe for a training checkpoint.

Runs the model sequentially over one or more recorded test episodes
(persistent carry, serving semantics) and reports cmd_ee correlation /
MSE and gripper accuracy vs the recorded expert commands. A policy with
high open-loop agreement has a chance closed-loop; one without has none.

CPU-friendly (tiny batch): run while the chip is busy training.

Env: MODEL_DIR (default /root/models/geeco-f2), DS, N_EP (default 3).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_platforms', 'cpu')

from geeco_tpu.data import dataset as D
from geeco_tpu.models import snapshots
from geeco_tpu.models.e2evmc import init_lstm_carry, make_model
from geeco_tpu.models.params import load_model_config

MODEL_DIR = os.environ.get('MODEL_DIR', '/root/models/geeco-f2')
DS = os.environ.get('DS', '/root/ds_fixed/collect')
N_EP = int(os.environ.get('N_EP', '3'))

cfg = load_model_config(os.path.join(MODEL_DIR, 'e2evmc_config.json'))
model = make_model(cfg, True)
ckpt = snapshots.latest_checkpoint(MODEL_DIR)
print(f'ckpt: {ckpt}')

# template params
K = cfg.window_size
f0 = jnp.zeros((1, K, cfg.img_height, cfg.img_width, 3))
j0 = jnp.zeros((1, K, 7))
t0 = jnp.zeros((1, cfg.img_height, cfg.img_width, 3))
c0 = init_lstm_carry(cfg, 1)
tmpl = model.init(jax.random.PRNGKey(0), f0, j0, t0, c0,
                  jnp.asarray(True))['params']
params = snapshots.restore_params(ckpt, tmpl)

# serving carry semantics must match training (models/predictor.py:36-49):
# stateless-trained models serve with a fresh carry per window.
STATELESS = getattr(cfg, 'train_carry', 'bptt') == 'stateless'
print(f'carry mode: {"window (fresh per predict)" if STATELESS else "persistent"}')
fwd = jax.jit(lambda p, f, j, t, c, r: model.apply(
    {'params': p}, f, j, t, c, r))

paths = D.list_records(DS, 'default', 'test')[:N_EP]
all_pred, all_true, all_gp, all_gt = [], [], [], []
for path in paths:
  feats, labels = D.episode_windows(path, window_size=K, fetch_target=True)
  N = feats['step'].shape[0]
  carry = init_lstm_carry(cfg, 1)
  tgt = jnp.asarray(feats['target_rgb'][0][None])
  for t in range(N):
    if STATELESS:
      carry, reset = init_lstm_carry(cfg, 1), jnp.asarray(True)
    else:
      reset = jnp.asarray(False)
    ep, carry = fwd(params, jnp.asarray(feats['rgb'][t][None]),
                    jnp.asarray(feats['jnt_state'][t][None]), tgt, carry,
                    reset)
    all_pred.append(np.asarray(ep['pred_cmd_ee'][0]))
    all_gp.append(int(np.argmax(np.asarray(ep['logits_cmd_grp'][0]))) - 1)
    all_true.append(labels['cmd'][t][:3])
    all_gt.append(int(round(float(labels['cmd'][t][3]))))
  print(f'{os.path.basename(path)}: {N} windows done')

P = np.asarray(all_pred)
T = np.asarray(all_true)
G = np.asarray(all_gp)
GT = np.asarray(all_gt)
print(f'pred std {P.std(0)}  true std {T.std(0)}')
print(f'mse {np.mean((P - T) ** 2):.4f}  '
      f'(zero baseline {np.mean(T ** 2):.4f})')
for d, name in enumerate('xyz'):
  c = np.corrcoef(P[:, d], T[:, d])[0, 1]
  print(f'corr {name}: {c:.3f}')
print(f'grp acc: {np.mean(G == GT):.3f}  '
      f'(majority baseline {max(np.mean(GT == v) for v in (-1, 0, 1)):.3f})')
