#!/bin/bash
# Round-5 pipeline: resume geeco-f-r4 training (now including the DART
# noise-injected episodes) and interleave closed-loop evals so the round
# produces an eval-over-checkpoints curve (VERDICT r4 ask #1).
#
#   train CHUNK_SECONDS -> STOP -> controller eval (43 episodes, latest
#   ckpt) -> append artifacts/r5/eval_curve.csv -> repeat until
#   TRAIN_UNTIL (epoch unix time) -> final 129-episode eval with videos +
#   failure triage.
#
# Touch /tmp/r5_pause to keep the TPU free after the next eval (for perf
# experiments); rm it to resume training.
#
# Usage: nohup bash scripts_dev/pipeline_r5.sh > /tmp/pipeline_r5.log 2>&1 &
set -u -o pipefail
cd /root/repo

DS=/root/ds4/collect
MODEL=/root/models/geeco-f-r4
EVAL_BASE=/root/eval
ART=/root/repo/artifacts/r5
CHUNK_SECONDS=${CHUNK_SECONDS:-2400}
TRAIN_UNTIL=${TRAIN_UNTIL:?set TRAIN_UNTIL (unix epoch seconds)}
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p "$ART"

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
      --wrk_dir "$dir" --num_envs 43 --end_idx "$n" --seed 7 "$@" \
      2>&1 | tail -20
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

cycle=0
while [ "$(date +%s)" -lt "$TRAIN_UNTIL" ]; do
  cycle=$((cycle + 1))
  rm -f "$MODEL/STOP"
  left=$((TRAIN_UNTIL - $(date +%s)))
  chunk=$((left < CHUNK_SECONDS ? left : CHUNK_SECONDS))
  echo "=== [r5] cycle $cycle: train ${chunk}s (until $(date +%T -d @$TRAIN_UNTIL)) ($(date +%T))"
  ( sleep "$chunk"; touch "$MODEL/STOP" ) &
  STOPPER=$!
  for attempt in 1 2 3; do
    python -u -m geeco_tpu.run.train_e2evmc \
        --dataset_dir "$DS" --model_dir "$MODEL" \
        --goal_condition target --proc_obs dynimg --proc_tgt dyndiff \
        --lr 2e-4 --train_mode episode --episodes_per_batch 8 \
        --aug_shift 10 --loss_weighting cmd_mag \
        --start_boost 6.0 --start_boost_windows 13 \
        --num_epochs 1000 --max_total_steps 40000 \
        --ckpt_steps 200 --log_steps 25 --max_rss_gb 95 --seed 0
    rc=$?
    echo "=== [r5] trainer exited rc=$rc (attempt $attempt, $(date +%T))"
    [ $rc -eq 0 ] && break       # STOP seen or step cap reached
    [ $rc -eq 3 ] || sleep 30    # 3 = RSS watchdog restart: loop at once
  done
  kill "$STOPPER" 2>/dev/null
  step=$(latest_step)
  echo "=== [r5] cycle $cycle: eval at step $step ($(date +%T))"
  run_eval 43 "curve_$step"
  while [ -e /tmp/r5_pause ]; do
    echo "=== [r5] paused (/tmp/r5_pause present) $(date +%T)"; sleep 30
  done
done

echo "=== [r5] final eval: 129 episodes + videos + triage ($(date +%T))"
run_eval 129 "final_$(latest_step)" --rendering_mode video
echo "=== [r5] pipeline done ($(date +%T))"
