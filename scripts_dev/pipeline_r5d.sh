#!/bin/bash
# Round-5 pipeline, stage 2 (takes over from pipeline_r5c.sh once the
# three collect stages are done — the r5c script would next spend ~25 min
# of chip time compiling the clutter/nut/ball gate scenes; those small
# gates (n=100/10/10) run on the idle CPU instead, concurrently with
# training: scripts_dev/cpu_gates.sh).
#
#   1. push expert gate n=1000 on TPU (the only gate big enough to need it)
#   2. failure filtering + splits (+ DART train-only append)
#   3. train/eval cycles until /tmp/r5_train_until (re-read every cycle)
#   4. final 129-episode eval with videos + failure triage
#
# Usage: TRAIN_UNTIL=<epoch> nohup bash scripts_dev/pipeline_r5d.sh > /tmp/pipeline_r5d.log 2>&1 &
set -u
cd /root/repo

DS=/root/ds4/collect
MODEL=/root/models/geeco-f-r5
EVAL_BASE=/root/eval
ART=/root/repo/artifacts/r5
N_STD=${N_STD:-2500}
N_PERT=${N_PERT:-500}
CHUNK_SECONDS=${CHUNK_SECONDS:-1100}
TRAIN_UNTIL=${TRAIN_UNTIL:?set TRAIN_UNTIL (unix epoch seconds)}
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p "$ART"

collect() {  # collect <module> <log> <args...>
  local mod="$1" log="$2"; shift 2
  python -u -m "geeco_tpu.run.$mod" --sim_mode collect \
      --dataset_formats states "$@" >> "$log" 2>&1 || {
    echo "!!! collect failed ($mod $*); tail:"; tail -5 "$log"; exit 1; }
  tail -1 "$log"
}

gate_stats() {  # gate_stats <shapes> <n> <log>
  python - "$1" "$2" "$3" >> "$ART/expert_gates.txt" <<'PYEOF'
import re, sys
shapes, n, log = sys.argv[1], int(sys.argv[2]), sys.argv[3]
succ = tot = 0
for line in open(log):
    m = re.match(r'episode (\d+): task_success=(\d)', line)
    if m:
        tot += 1
        succ += m.group(2) == '1'
print(f'{shapes}: expert task_success {succ}/{tot} '
      f'({100.0*succ/max(tot,1):.2f}%)  [reference protocol n={n}]')
PYEOF
  tail -1 "$ART/expert_gates.txt"
}

if [ ! -f /tmp/gate_push_done ]; then
  echo "=== [r5d] push expert gate n=1000 ($(date +%T))"
  : > /tmp/gate_push-pad2-cube2.log
  collect gym_pushing /tmp/gate_push-pad2-cube2.log --shapes push-pad2-cube2 \
      --wrk_dir /root/gates/push-pad2-cube2 --num_envs 250 \
      --start_idx 0 --end_idx 1000 --seed 11
  gate_stats push-pad2-cube2 1000 /tmp/gate_push-pad2-cube2.log
  touch /tmp/gate_push_done
fi

echo "=== [r5d] expert success stats + failure filtering ($(date +%T))"
python - "$N_STD" "$N_PERT" <<'PYEOF'
import os, re, shutil, sys
n_std, n_pert = int(sys.argv[1]), int(sys.argv[2])
ds = '/root/ds4/collect'
succ = {}
for line in open('/tmp/collect.log'):
    m = re.match(r'episode (\d+): task_success=(\d)', line)
    if m:
        succ[int(m.group(1))] = m.group(2) == '1'
std = [succ[e] for e in succ if e <= n_std]
pert = [succ[e] for e in succ if e > n_std]
with open('/root/repo/artifacts/r5/collect_stats.txt', 'w') as out:
    out.write(f'pad2-cube2 expert collect: {sum(std)}/{len(std)} task_success '
              f'({100.0*sum(std)/max(len(std),1):.2f}%)\n')
    out.write(f'pad2-cube2 perturbed-start collect (sphere 0.10, prefix 8): '
              f'{sum(pert)}/{len(pert)} task_success '
              f'({100.0*sum(pert)/max(len(pert),1):.2f}%)\n')
print(open('/root/repo/artifacts/r5/collect_stats.txt').read())
os.makedirs(os.path.join(ds, 'data_failed'), exist_ok=True)
moved = 0
for eid, ok in succ.items():
    if ok:
        continue
    for ext in ('npz', 'json'):
        src = os.path.join(ds, 'data', f'replay_buffer_{eid:04d}.{ext}')
        if os.path.exists(src):
            shutil.move(src, os.path.join(ds, 'data_failed',
                                          f'replay_buffer_{eid:04d}.{ext}'))
            moved += ext == 'npz'
print(f'moved {moved} failed episodes out of data/')
PYEOF

echo "=== [r5d] creating splits ($(date +%T))"
python -m geeco_tpu.run.dataset_tools create_splits --dataset_dir "$DS" \
    --split_name default || exit 1
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
python scripts_dev/add_dart_to_train.py /tmp/collect_dart.log || exit 1

latest_step() {
  ls "$MODEL" | sed -n 's/^state-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1
}

run_eval() {  # $1 = n_episodes, $2 = eval tag, extra args pass through
  local n="$1"; local tag="$2"; shift 2
  local dir="$EVAL_BASE/$tag"
  mkdir -p "$dir"
  python -u -m geeco_tpu.run.gym_pickplace --sim_mode controller \
      --model_dir "$MODEL" --goal_condition target \
      --dataset_dir "$DS" --split_name default \
      --wrk_dir "$dir" --num_envs 43 --end_idx "$n" --seed 7 \
      --renderer_trim 192,96 "$@" \
      2>&1 | tail -25
  local step; step=$(latest_step)
  python - "$dir/controller" "$step" "$n" <<'PYEOF'
import csv, os, sys
d, step, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
vals = {}
with open(os.path.join(d, 'final_results.txt')) as fp:
    for line in fp:
        k, v = line.split()
        vals[k] = float(v)
curve = '/root/repo/artifacts/r5/eval_curve.csv'
new = not os.path.exists(curve)
with open(curve, 'a', newline='') as fp:
    w = csv.writer(fp)
    if new:
        w.writerow(['step', 'n_episodes', 'obj_vicinity', 'grasp_success',
                    'task_success'])
    w.writerow([step, n, vals['obj_vicinity'], vals['grasp_success'],
                vals['task_success']])
print(f'>>> eval_curve += step={step} task={vals["task_success"]:.2f}% '
      f'grasp={vals["grasp_success"]:.2f}%')
PYEOF
}

mkdir -p "$MODEL"
echo "$TRAIN_UNTIL" > /tmp/r5_train_until
cycle=0
while TRAIN_UNTIL=$(cat /tmp/r5_train_until) && [ "$(date +%s)" -lt "$TRAIN_UNTIL" ]; do
  cycle=$((cycle + 1))
  rm -f "$MODEL/STOP"
  left=$((TRAIN_UNTIL - $(date +%s)))
  chunk=$((left < CHUNK_SECONDS ? left : CHUNK_SECONDS))
  echo "=== [r5d] cycle $cycle: train ${chunk}s (until $(date -u +%T -d @$TRAIN_UNTIL) UTC) ($(date +%T))"
  ( sleep "$chunk"; touch "$MODEL/STOP" ) &
  STOPPER=$!
  for attempt in 1 2 3; do
    python -u -m geeco_tpu.run.train_e2evmc \
        --dataset_dir "$DS" --model_dir "$MODEL" \
        --goal_condition target --proc_obs dynimg --proc_tgt dyndiff \
        --lr 2e-4 --train_mode episode --episodes_per_batch 8 \
        --aug_shift 10 --loss_weighting cmd_mag \
        --start_boost 6.0 --start_boost_windows 13 \
        --renderer_trim 192,96 \
        --num_epochs 1000 --max_total_steps 40000 \
        --ckpt_steps 200 --log_steps 25 --max_rss_gb 95 --seed 0
    rc=$?
    echo "=== [r5d] trainer exited rc=$rc (attempt $attempt, $(date +%T))"
    [ $rc -eq 0 ] && break       # STOP seen or step cap reached
    [ $rc -eq 3 ] || sleep 30    # 3 = RSS watchdog restart: loop at once
  done
  kill "$STOPPER" 2>/dev/null
  step=$(latest_step)
  echo "=== [r5d] cycle $cycle: eval at step $step ($(date +%T))"
  run_eval 43 "curve_$step"
  while [ -e /tmp/r5_pause ]; do
    echo "=== [r5d] paused (/tmp/r5_pause present) $(date +%T)"; sleep 30
  done
done

echo "=== [r5d] final eval: 129 episodes + videos + triage ($(date +%T))"
run_eval 129 "final_$(latest_step)" --rendering_mode video
echo "=== [r5d] pipeline done ($(date +%T))"
