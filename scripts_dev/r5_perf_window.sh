#!/bin/bash
# Round-5 TPU perf window (VERDICT r4 ask #2): run while the trainer is
# paused/done.  ONE TPU process at a time; compile cache shared.
# Writes the sweep table to artifacts/r5/perf_sweep.txt as it goes.
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
log "## B-sweep, per-dispatch timing (BENCH_SCAN=0)"
BENCH_SWEEP=256,512,1024,2048 BENCH_STEPS=8 BENCH_TRAIN=0 \
  timeout 1500 python bench.py 2>&1 | grep -E "^#|^\{" | tee -a "$OUT"

log ""
log "## B-sweep, scan timing (no host-dispatch gaps — the vectorized-collect regime)"
BENCH_SCAN=1 BENCH_SWEEP=256,512,1024,2048 BENCH_STEPS=8 BENCH_TRAIN=0 \
  timeout 1500 python bench.py 2>&1 | grep -E "^#|^\{" | tee -a "$OUT"

log ""
log "## lever variants at B=1024 (scan timing)"
# deeper binning trim (96/48: still pixel-exact per binning_fidelity.py),
# substep unroll, and the r4-default config for the before/after delta
for V in "BENCH_RK=96,48" "BENCH_SUBSTEP_UNROLL=2" "BENCH_RK=96,48 BENCH_SUBSTEP_UNROLL=2" "BENCH_COLLIDE_EVERY=1 BENCH_RK=512,192"; do
  log "--- $V"
  env $V BENCH_SCAN=1 BENCH_NUM_ENVS=1024 BENCH_STEPS=8 BENCH_TRAIN=0 \
    timeout 900 python bench.py 2>&1 | grep -E "^#|^\{" | tee -a "$OUT"
done

log ""
log "## per-stage profile at B=1024 (binning/raster/physics split)"
B=1024 N=6 timeout 900 python scripts_dev/profile_render_stages.py 2>&1 | tee -a "$OUT"

log "# done ($(date -u +%FT%TZ))"
