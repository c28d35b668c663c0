"""Append newly collected DART episodes (ids > 3000) to the train split.

Failures are moved to data_failed/ first (same policy as pipeline_r4b.sh);
eval/test lists are left byte-identical so the r4/r5 eval curves stay
comparable.  Run after the --expert_noise collect finishes:

    python scripts_dev/add_dart_to_train.py /tmp/collect_dart.log
"""
import os
import re
import shutil
import sys

DS = '/root/ds4/collect'
SPLIT = os.path.join(DS, 'splits', 'default')
LOG = sys.argv[1] if len(sys.argv) > 1 else '/tmp/collect_dart.log'
SIGMA = os.environ.get('DART_SIGMA', '0.1')

succ, fail = [], []
with open(LOG) as fp:
  for line in fp:
    m = re.match(r'episode (\d+): task_success=(\d)', line)
    if m and int(m.group(1)) > 3000:
      (succ if m.group(2) == '1' else fail).append(int(m.group(1)))

os.makedirs(os.path.join(DS, 'data_failed'), exist_ok=True)
moved = 0
for eid in fail:
  for ext in ('npz', 'json'):
    src = os.path.join(DS, 'data', f'replay_buffer_{eid:04d}.{ext}')
    if os.path.exists(src):
      shutil.move(src, os.path.join(DS, 'data_failed',
                                    f'replay_buffer_{eid:04d}.{ext}'))
      moved += ext == 'npz'

with open(os.path.join(SPLIT, 'train.txt')) as fp:
  have = [line.strip() for line in fp if line.strip()]
# create_splits may have run AFTER the DART collect, in which case the
# DART ids (incl. the just-filtered failures) are already listed: drop
# every name whose npz is gone so the trainer never sees a dangling path
# (list_records does no existence check — a stale entry crashes the
# prefetch thread mid-epoch).
kept = [n for n in have
        if os.path.exists(os.path.join(DS, 'data', n))]
dropped = len(have) - len(kept)
added = 0
seen = set(kept)
for eid in succ:
  name = f'replay_buffer_{eid:04d}.npz'
  if name not in seen and os.path.exists(os.path.join(DS, 'data', name)):
    kept.append(name)
    seen.add(name)
    added += 1
with open(os.path.join(SPLIT, 'train.txt'), 'w') as fp:
  fp.write('\n'.join(kept) + '\n')
n = len(succ) + len(fail)
print(f'DART collect: {len(succ)}/{n} task_success '
      f'({100.0 * len(succ) / max(n, 1):.2f}%); '
      f'{moved} failures filtered, {added} episodes appended to train, '
      f'{dropped} dangling entries dropped')
with open('/root/repo/artifacts/r5/dart_collect_stats.txt', 'w') as out:
  out.write(f'pad2-cube2 DART collect (expert_noise sigma={SIGMA}): '
            f'{len(succ)}/{n} task_success '
            f'({100.0 * len(succ) / max(n, 1):.2f}%); '
            f'{added} appended to train split (train-only)\n')
