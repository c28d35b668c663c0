"""Diagnose the frozen-eval-loss training run.

1. Overfit test: fresh init, 300 Adam steps on ONE fixed batch. A healthy
   wiring drives loss to ~0; a broken one plateaus at marginal stats.
2. Checkpoint probe: load the trained ckpt, measure output variance across
   a batch (input-dependence) and per-part eval losses vs baselines.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from geeco_tpu.data.dataset import input_pipeline
from geeco_tpu.models.params import load_model_config
from geeco_tpu.models.train import make_train_fns, obs_frames, tgt_frame
from geeco_tpu.models import snapshots

MODEL_DIR = os.environ.get('MODEL_DIR', '/root/models/geeco-f')
DS = os.environ.get('DS', '/root/ds_fixed/collect')

config = load_model_config(os.path.join(MODEL_DIR, 'e2evmc_config.json'))
print('config:', config)
goal = True
init_fn, train_step, eval_step, apply_fn = make_train_fns(config, goal)
train_step = jax.jit(train_step)

it = input_pipeline(DS, 'default', 'train', window_size=config.window_size,
                    fetch_target=True, batch_size=config.batch_size,
                    num_epochs=1, seed=123,
                    with_depth=config.img_channels == 4)
batches = []
for i, b in enumerate(it):
    batches.append(jax.tree.map(jnp.asarray, b))
    if i >= 5:
        break

f0, l0 = batches[2]  # mid-episode batch (motion phase)
print('label cmd stats: mean', np.asarray(l0['cmd']).mean(0),
      'var', np.asarray(l0['cmd']).var(0))

# ---- 2. checkpoint probe first (cheap)
ts = init_fn(jax.random.PRNGKey(0), config.batch_size)
latest = snapshots.latest_checkpoint(MODEL_DIR)
if latest:
    params = snapshots.restore_params(latest, ts.params)
    print(f'probing ckpt {latest}')
    ep, _ = jax.jit(lambda p, f: apply_fn(p, f, ts.lstm_carry,
                                          jnp.asarray(False)))(params, f0)
    for k in ('pred_cmd_ee', 'logits_cmd_grp', 'pred_aux_ee', 'pred_aux_obj'):
        v = np.asarray(ep[k])
        print(f'  {k}: batch-std {v.std(axis=0)} mean {v.mean(axis=0)}')

# ---- 1. overfit test
ts = init_fn(jax.random.PRNGKey(0), config.batch_size)
print('overfit test: 300 steps on one fixed batch')
for i in range(301):
    ts, m = train_step(ts, f0, l0)
    if i % 25 == 0:
        parts = {k: round(float(v), 5) for k, v in m.items()}
        print(f'  step {i}: {parts}')
print('done')
