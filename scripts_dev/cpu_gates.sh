#!/bin/bash
# Expert gates at reference evaluation scale for the SMALL test sets,
# on CPU (JAX_PLATFORMS=cpu) so they can run concurrently with TPU
# training.  Reference test sizes: clutter n=100, nut-cone n=10,
# ball-cup n=10 (/root/reference/scripts/gym_pickplace.py:571-573).
# The push gate (n=1000) runs on TPU in pipeline_r5d.sh.
#
# Usage: nohup bash scripts_dev/cpu_gates.sh > /tmp/cpu_gates.log 2>&1 &
set -u
cd /root/repo
ART=/root/repo/artifacts/r5
mkdir -p "$ART"

gate() {  # gate <module> <shapes> <n> <num_envs>
  local mod="$1" shapes="$2" n="$3" ne="$4"
  local log="/tmp/gate_${shapes}.log"
  : > "$log"
  echo "=== [cpu_gates] $shapes n=$n ($(date +%T))"
  env -u PYTHONPATH JAX_PLATFORMS=cpu \
  python -u -m "geeco_tpu.run.$mod" --sim_mode collect \
      --dataset_formats states --shapes "$shapes" \
      --wrk_dir "/root/gates/$shapes" --num_envs "$ne" \
      --start_idx 0 --end_idx "$n" --seed 11 >> "$log" 2>&1 || {
    echo "!!! gate failed ($shapes); tail:"; tail -5 "$log"; return 1; }
  python - "$shapes" "$n" "$log" >> "$ART/expert_gates.txt" <<'PYEOF'
import re, sys
shapes, n, log = sys.argv[1], int(sys.argv[2]), sys.argv[3]
succ = tot = 0
for line in open(log):
    m = re.match(r'episode (\d+): task_success=(\d)', line)
    if m:
        tot += 1
        succ += m.group(2) == '1'
print(f'{shapes}: expert task_success {succ}/{tot} '
      f'({100.0*succ/max(tot,1):.2f}%)  [reference protocol n={n}, cpu]')
PYEOF
  tail -1 "$ART/expert_gates.txt"
}

# smallest compiles first so partial results land early
gate gym_pickplace nut-cone 10 10
gate gym_pickplace ball-cup 10 10
gate gym_pickplace pad2-cube2-clutter4 100 50
echo "=== [cpu_gates] done ($(date +%T))"
