#!/bin/bash
# Round-3 controller pipeline: waits for the running 4000-episode
# collection, filters failed expert demos, builds splits/targets, trains
# geeco-f (episode-scan, stateless carry, GroupNorm, cmd_mag weighting)
# with RSS-watchdog restarts, then runs the 301-episode closed-loop
# controller eval and the throughput bench.  Evidence is committed into
# the repo by scripts_dev/evidence_sync.sh running alongside.
#
# Usage: nohup bash scripts_dev/pipeline_r3.sh > /tmp/pipeline.log 2>&1 &
set -u
cd /root/repo

DS=/root/ds2/collect
MODEL=/root/models/geeco-f
EVAL=/root/eval/geeco-f
STEPS=${STEPS:-6000}
MIN_EPS=${MIN_EPS:-3200}
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== [pipeline] waiting for collection (pid $(cat /tmp/collect.pid))"
while kill -0 "$(cat /tmp/collect.pid)" 2>/dev/null; do sleep 60; done
N_EPS=$(ls "$DS/data" | grep -c '\.npz$')
echo "=== [pipeline] collection done: $N_EPS episodes"
if [ "$N_EPS" -lt "$MIN_EPS" ]; then
  echo "=== [pipeline] too few episodes; aborting"; exit 1
fi

echo "=== [pipeline] expert success stats (free n=$N_EPS behavioral gate)"
python - <<'EOF'
import re
succ = fail = 0
with open('/tmp/collect.log') as fp:
  for line in fp:
    m = re.search(r'task_success=(\d)', line)
    if m:
      succ += m.group(1) == '1'
      fail += m.group(1) == '0'
n = succ + fail
with open('/tmp/collect_stats.txt', 'w') as out:
  out.write(f'pad2-cube2 expert collect: {succ}/{n} task_success '
            f'({100.0*succ/max(n,1):.2f}%)\n')
print(open('/tmp/collect_stats.txt').read())
EOF

echo "=== [pipeline] filtering failed expert episodes"
mkdir -p "$DS/data_failed"
python - <<'EOF'
import os, re, shutil
ds = '/root/ds2/collect'
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
EOF

echo "=== [pipeline] creating splits + extracting targets"
python -m geeco_tpu.run.dataset_tools create_splits --dataset_dir "$DS" \
    --split_name default || exit 1
python -m geeco_tpu.run.dataset_tools extract_keyframes --dataset_dir "$DS" \
    || exit 1

echo "=== [pipeline] training geeco-f to $STEPS steps"
mkdir -p "$MODEL"
for attempt in $(seq 1 40); do
  python -m geeco_tpu.run.train_e2evmc \
      --dataset_dir "$DS" --model_dir "$MODEL" \
      --goal_condition target --proc_obs dynimg --proc_tgt dyndiff \
      --lr 2e-4 --train_mode episode --episodes_per_batch 8 \
      --aug_shift 10 --loss_weighting cmd_mag \
      --num_epochs 100 --max_total_steps "$STEPS" \
      --ckpt_steps 200 --log_steps 25 --max_rss_gb 95 --seed 0
  rc=$?
  echo "=== [pipeline] trainer exited rc=$rc (attempt $attempt)"
  if [ $rc -eq 0 ]; then break; fi
  if [ $rc -ne 3 ]; then
    echo "=== [pipeline] unexpected trainer failure; retrying once after 30s"
    sleep 30
  fi
done

echo "=== [pipeline] controller eval on test split"
mkdir -p "$EVAL"
python -m geeco_tpu.run.gym_pickplace --sim_mode controller \
    --model_dir "$MODEL" --goal_condition target \
    --dataset_dir "$DS" --split_name default \
    --wrk_dir "$EVAL" --num_envs 43 --end_idx 301 --seed 7
echo "=== [pipeline] eval done"
cat "$EVAL"/*/final_results.txt 2>/dev/null || true

echo "=== [pipeline] bench"
BENCH_NUM_ENVS=${BENCH_NUM_ENVS:-256} timeout 1800 python bench.py || true
echo "=== [pipeline] all done"
