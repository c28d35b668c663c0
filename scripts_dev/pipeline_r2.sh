#!/bin/bash
# Round-2 controller pipeline: waits for the running collection, builds
# splits/targets, trains geeco-f with an RSS watchdog (the axon relay leaks
# host transfer buffers; trainer exits 3 at --max_rss_gb and is resumed
# from the latest full train state), then runs the closed-loop controller
# eval on the test split and the throughput bench.
#
# Usage: nohup bash scripts_dev/pipeline_r2.sh > /tmp/pipeline.log 2>&1 &
set -u
cd /root/repo

DS=/root/ds2/collect
MODEL=/root/models/geeco-f
EVAL=/root/eval/geeco-f
STEPS=${STEPS:-6000}
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== [pipeline] waiting for collection (pid $(cat /tmp/collect.pid))"
while kill -0 "$(cat /tmp/collect.pid)" 2>/dev/null; do sleep 60; done
N_EPS=$(ls "$DS/data" | grep -c '\.npz$')
echo "=== [pipeline] collection done: $N_EPS episodes"
if [ "$N_EPS" -lt 2900 ]; then
  echo "=== [pipeline] too few episodes; aborting"; exit 1
fi

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
timeout 3600 python bench.py || true
echo "=== [pipeline] all done"
