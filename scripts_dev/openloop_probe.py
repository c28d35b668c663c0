"""Dev: open-loop action-error probe for a trained checkpoint (CPU).

Feeds recorded windows from dataset episodes through the checkpoint
exactly as training does (same input_pipeline) and reports predicted vs
expert command statistics.  Distinguishes "undertrained" (predictions
near zero / prior everywhere) from "serve-time mismatch" (good open-loop
predictions but 0% closed-loop).

Run:  env -u PYTHONPATH JAX_PLATFORMS=cpu python \
        scripts_dev/openloop_probe.py <model_dir> <dataset_dir> [n_batches]
"""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import numpy as np

from geeco_tpu.data.dataset import input_pipeline
from geeco_tpu.models.params import load_model_config
from geeco_tpu.models import snapshots
from geeco_tpu.models.e2evmc import init_lstm_carry
from geeco_tpu.models.train import make_train_fns


def main(model_dir, dataset_dir, n_batches=6, split='test'):
  cfg = load_model_config(os.path.join(model_dir, 'e2evmc_config.json'))
  init_fn, _, _, apply_fn = make_train_fns(cfg, goal_conditioned=True)
  ts = init_fn(jax.random.PRNGKey(0), cfg.batch_size)
  latest = snapshots.latest_checkpoint(model_dir)
  params = snapshots.restore_params(latest, ts.params)
  print(f'checkpoint: {latest}')

  errs, mags, tmags, grp_hits, grp_counts = [], [], [], [], []
  it = input_pipeline(dataset_dir, 'default', split,
                      window_size=cfg.window_size, fetch_target=True,
                      batch_size=cfg.batch_size, num_epochs=1,
                      shuffle=False, seed=0, with_depth=False)
  for bi, (f, l) in enumerate(it):
    if bi >= n_batches:
      break
    f = jax.tree.map(np.asarray, f)
    carry = init_lstm_carry(cfg, cfg.batch_size)
    reset = np.prod(np.asarray(f['step'])) == 0
    ep, _ = apply_fn(params, f, carry, reset)
    pred_ee = np.asarray(ep['pred_cmd_ee'])
    tgt_ee = np.asarray(l['cmd'][:, :3])
    pred_grp = np.argmax(np.asarray(ep['logits_cmd_grp']), -1) - 1
    tgt_grp = np.rint(np.asarray(l['cmd'][:, 3])).astype(int)
    errs.append(np.abs(pred_ee - tgt_ee).mean())
    mags.append(np.abs(pred_ee).mean())
    tmags.append(np.abs(tgt_ee).mean())
    grp_hits.append((pred_grp == tgt_grp).sum())
    grp_counts.append(tgt_grp.size)
    print(f'batch {bi}: |pred-tgt|={errs[-1]:.4f} |pred|={mags[-1]:.4f} '
          f'|tgt|={tmags[-1]:.4f} grp_acc={grp_hits[-1] / grp_counts[-1]:.2f}')
  print(f'TOTAL: mean|pred-tgt|={np.mean(errs):.4f} '
        f'mean|pred|={np.mean(mags):.4f} mean|tgt|={np.mean(tmags):.4f} '
        f'grp_acc={sum(grp_hits) / sum(grp_counts):.3f}')


if __name__ == '__main__':
  main(sys.argv[1], sys.argv[2],
       int(sys.argv[3]) if len(sys.argv) > 3 else 6)
