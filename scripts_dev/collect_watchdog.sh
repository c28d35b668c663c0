#!/bin/bash
# Restart the collection process from the last finished CHUNK when its
# host RSS crosses a cap (the axon relay retains shipped transfer buffers;
# see STATUS.md "Infra").  The pipeline waits on /tmp/collect.pid and
# re-reads it every poll, so swapping the pid here is safe.
#
# Restart details:
#  * resumes at a chunk boundary (multiple of B=100) and deletes any npz
#    written past it, so a mid-chunk kill can't leave torn files;
#  * uses a fresh --seed per restart: run_collect derives episode RNG from
#    PRNGKey(seed) split per chunk from the stream start, so resuming with
#    the original seed would duplicate the first chunks' initial states.
#
# Usage: nohup bash scripts_dev/collect_watchdog.sh > /tmp/collect_wd.log 2>&1 &
set -u
CAP_KB=$((90 * 1024 * 1024))
END_IDX=${END_IDX:-3000}
B=100
while :; do
  pid=$(cat /tmp/collect.pid 2>/dev/null) || exit 0
  kill -0 "$pid" 2>/dev/null || exit 0
  rss=$(awk '/VmRSS/{print $2}' /proc/"$pid"/status 2>/dev/null || echo 0)
  # grep -c prints "0" AND exits 1 on zero matches, so `|| echo 0` would
  # yield "0\n0"; take the last line and default empty to 0.
  done_eps=$(grep -c task_success /tmp/collect.log 2>/dev/null | tail -1)
  done_eps=${done_eps:-0}
  if [ "$done_eps" -ge "$END_IDX" ]; then exit 0; fi
  if [ "${rss:-0}" -gt "$CAP_KB" ]; then
    eps=$(( done_eps / B * B ))
    echo "$(date -u +%H:%M:%S) RSS ${rss}kB > cap; restart at episode $eps"
    kill "$pid"; sleep 20; kill -9 "$pid" 2>/dev/null
    python - "$eps" <<'EOF'
import glob, os, re, sys
eps = int(sys.argv[1])
for f in glob.glob('/root/ds2/collect/data/replay_buffer_*'):
  eid = int(re.search(r'(\d+)\.', os.path.basename(f)).group(1))
  if eid > eps:
    os.remove(f)
EOF
    cd /root/repo
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache nohup python -m \
      geeco_tpu.run.gym_pickplace --sim_mode collect --shapes pad2-cube2 \
      --wrk_dir /root/ds2 --num_envs 100 --start_idx "$eps" \
      --end_idx "$END_IDX" --dataset_formats npz --seed $((1000 + eps)) \
      >> /tmp/collect.log 2>&1 &
    echo $! > /tmp/collect.pid
    echo "$(date -u +%H:%M:%S) restarted as pid $(cat /tmp/collect.pid)"
  fi
  sleep 60
done
