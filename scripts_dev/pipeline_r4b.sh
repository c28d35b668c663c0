#!/bin/bash
# Round-4b controller pipeline (state-only datasets, on-device re-render):
# collect (frameless states; standard + perturbation-augmented starts) ->
# splits (perturbed episodes train-only) -> train geeco-f with start-window
# boost under a wall-clock budget (STOP file) -> 129-episode closed-loop
# controller eval with videos.
#
# Usage: nohup bash scripts_dev/pipeline_r4b.sh > /tmp/pipeline.log 2>&1 &
set -u
cd /root/repo

DS=/root/ds4/collect
MODEL=/root/models/geeco-f-r4
EVAL=/root/eval/geeco-f-r4
N_STD=${N_STD:-2500}       # standard-start episodes (ids 1..N_STD)
N_PERT=${N_PERT:-500}      # perturbed-start episodes (ids N_STD+1..)
TRAIN_SECONDS=${TRAIN_SECONDS:-5400}
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== [pipeline] collect: $N_STD standard episodes ($(date +%T))"
python -u -m geeco_tpu.run.gym_pickplace --sim_mode collect \
    --shapes pad2-cube2 --wrk_dir /root/ds4 --num_envs 250 \
    --start_idx 0 --end_idx "$N_STD" --dataset_formats states --seed 0 \
    2>&1 | tee /tmp/collect.log | grep -v 'episode ' || exit 1

echo "=== [pipeline] collect: $N_PERT perturbation-augmented ($(date +%T))"
python -u -m geeco_tpu.run.gym_pickplace --sim_mode collect \
    --shapes pad2-cube2 --wrk_dir /root/ds4 --num_envs 250 \
    --start_idx "$N_STD" --end_idx $((N_STD + N_PERT)) \
    --dataset_formats states --seed 1 \
    --start_sphere 0.10 --perturb_prefix 8 \
    2>&1 | tee -a /tmp/collect.log | grep -v 'episode ' || exit 1

N_EPS=$(ls "$DS/data" | grep -c '\.npz$')
echo "=== [pipeline] collection done: $N_EPS episodes ($(date +%T))"

echo "=== [pipeline] expert success stats"
python - <<'PYEOF'
import re
succ = fail = 0
with open('/tmp/collect.log') as fp:
  for line in fp:
    m = re.search(r'task_success=(\d)', line)
    if m:
      succ += m.group(1) == '1'
      fail += m.group(1) == '0'
n = succ + fail
with open('/root/repo/artifacts/r4/collect_stats.txt', 'w') as out:
  out.write(f'pad2-cube2 expert collect (exec-clip fixed): {succ}/{n} '
            f'task_success ({100.0*succ/max(n,1):.2f}%)\n')
print(open('/root/repo/artifacts/r4/collect_stats.txt').read())
PYEOF

echo "=== [pipeline] filtering failed expert episodes"
mkdir -p "$DS/data_failed"
python - <<'PYEOF'
import os, re, shutil
ds = '/root/ds4/collect'
failed = []
with open('/tmp/collect.log') as fp:
  for line in fp:
    m = re.match(r'episode (\d+): task_success=0', line)
    if m:
      failed.append(int(m.group(1)))
moved = 0
for eid in failed:
  for ext in ('npz', 'json'):
    src = os.path.join(ds, 'data', f'replay_buffer_{eid:04d}.{ext}')
    if os.path.exists(src):
      shutil.move(src, os.path.join(ds, 'data_failed',
                                    f'replay_buffer_{eid:04d}.{ext}'))
      moved += ext == 'npz'
print(f'moved {moved}/{len(failed)} failed episodes out of data/')
PYEOF

echo "=== [pipeline] creating splits"
python -m geeco_tpu.run.dataset_tools create_splits --dataset_dir "$DS" \
    --split_name default || exit 1
# perturbed-start episodes train only: eval/test must use standard starts
# (the reference protocol evaluates from the canonical reset distribution)
python - "$N_STD" <<'PYEOF'
import sys, os
n_std = int(sys.argv[1])
sd = '/root/ds4/collect/splits/default'
def eid(name):
    return int(name.split('_')[-1].split('.')[0])
moved = []
for part in ('eval', 'test'):
    keep = []
    with open(os.path.join(sd, f'{part}.txt')) as fp:
        for line in fp:
            name = line.strip()
            if not name:
                continue
            (moved if eid(name) > n_std else keep).append(name)
    with open(os.path.join(sd, f'{part}.txt'), 'w') as fp:
        fp.write('\n'.join(keep) + '\n')
with open(os.path.join(sd, 'train.txt'), 'a') as fp:
    for name in moved:
        fp.write(name + '\n')
print(f'moved {len(moved)} perturbed episodes from eval/test into train')
PYEOF

echo "=== [pipeline] training geeco-f-r4 for ${TRAIN_SECONDS}s ($(date +%T))"
mkdir -p "$MODEL"
( sleep "$TRAIN_SECONDS"; touch "$MODEL/STOP"; \
  echo "=== [pipeline] train budget reached; STOP dropped" ) &
STOPPER=$!
for attempt in $(seq 1 40); do
  python -u -m geeco_tpu.run.train_e2evmc \
      --dataset_dir "$DS" --model_dir "$MODEL" \
      --goal_condition target --proc_obs dynimg --proc_tgt dyndiff \
      --lr 2e-4 --train_mode episode --episodes_per_batch 8 \
      --aug_shift 10 --loss_weighting cmd_mag \
      --start_boost 6.0 --start_boost_windows 13 \
      --num_epochs 1000 --max_total_steps 40000 \
      --ckpt_steps 200 --log_steps 25 --max_rss_gb 95 --seed 0
  rc=$?
  echo "=== [pipeline] trainer exited rc=$rc (attempt $attempt, $(date +%T))"
  if [ $rc -eq 0 ]; then break; fi
  if [ $rc -ne 3 ]; then
    echo "=== [pipeline] unexpected trainer failure; retrying once after 30s"
    sleep 30
  fi
done
kill "$STOPPER" 2>/dev/null

echo "=== [pipeline] controller eval on test split ($(date +%T))"
mkdir -p "$EVAL"
python -u -m geeco_tpu.run.gym_pickplace --sim_mode controller \
    --model_dir "$MODEL" --goal_condition target \
    --dataset_dir "$DS" --split_name default \
    --wrk_dir "$EVAL" --num_envs 43 --end_idx 129 --seed 7 \
    --rendering_mode video
echo "=== [pipeline] eval done ($(date +%T))"
cat "$EVAL"/*/final_results.txt 2>/dev/null || true
echo "=== [pipeline] all done"
