#!/bin/bash
# Round-5 TPU perf window (VERDICT r4 ask #2): run when the chip frees up
# after the final eval.  Highest-value measurements first in case the
# round ends mid-script.  Writes artifacts/r5/perf_sweep.txt as it goes.
#
# Usage: nohup bash scripts_dev/r5_perf_window.sh > /tmp/perf_window.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=/root/repo/artifacts/r5/perf_sweep.txt
: > "$OUT"
log() { echo "$*" | tee -a "$OUT"; }

log "# r5 perf sweep ($(date -u +%FT%TZ)) — pad2-cube2, 20 substeps @2ms + 256x256 render"
log "# config: collide_every=2 + binning 192/96 (both fidelity-gated; bench.py defaults)"

log ""
log "## B-sweep, scan timing (no host-dispatch gaps — the vectorized-collect regime)"
BENCH_SCAN=1 BENCH_SWEEP=256,512,1024,2048 BENCH_STEPS=8 BENCH_TRAIN=0 \
  timeout 1200 python bench.py 2>&1 | grep -E "^#|^\{" | tee -a "$OUT"

log ""
log "## lever variants at B=1024 (scan timing)"
for V in "BENCH_RK=96,48" "BENCH_COLLIDE_EVERY=1 BENCH_RK=512,192"; do
  log "--- $V"
  env $V BENCH_SCAN=1 BENCH_NUM_ENVS=1024 BENCH_STEPS=8 BENCH_TRAIN=0 \
    timeout 600 python bench.py 2>&1 | grep -E "^#|^\{" | tee -a "$OUT"
done

log ""
log "## per-dispatch timing at B=256 (the r4-comparable number) + train steps/s"
BENCH_SWEEP=256 BENCH_STEPS=8 \
  timeout 900 python bench.py 2>&1 | grep -E "^#|^\{" | tee -a "$OUT"

log "# done ($(date -u +%FT%TZ))"
