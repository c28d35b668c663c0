#!/bin/bash
# Periodically copy the cheap training/eval evidence into the repo and
# commit it, so VM recycles can never again destroy the round's results
# (round-2 verdict weak #6).  Runs forever; stop with: kill $(cat /tmp/evsync.pid)
#
# Usage: nohup bash scripts_dev/evidence_sync.sh > /tmp/evsync.log 2>&1 &
#        echo $! > /tmp/evsync.pid
set -u
cd /root/repo
ART=artifacts/r3
mkdir -p "$ART"
while :; do
  cp -f /root/models/geeco-f/metrics.jsonl      "$ART/" 2>/dev/null
  cp -f /root/models/geeco-f/*config*.json      "$ART/" 2>/dev/null
  cp -f /root/models/geeco-f/*runcmd.json       "$ART/" 2>/dev/null
  cp -f /tmp/collect_stats.txt                  "$ART/" 2>/dev/null
  cp -f /tmp/pipeline.log                       "$ART/pipeline.log" 2>/dev/null
  # eval outputs land under /root/eval/<run>/controller/
  for f in /root/eval/geeco-f/*/final_results.txt; do
    [ -e "$f" ] && cp -f "$f" "$ART/final_results.txt"
  done
  for f in /root/eval/geeco-f/*/eval_results.csv; do
    [ -e "$f" ] && cp -f "$f" "$ART/eval_results.csv"
  done
  for f in /root/eval/geeco-f-legacy/*/final_results.txt; do
    [ -e "$f" ] && cp -f "$f" "$ART/final_results_legacy_rerun.txt"
  done
  for f in /root/eval/geeco-f-legacy/*/eval_results.csv; do
    [ -e "$f" ] && cp -f "$f" "$ART/eval_results_legacy_rerun.csv"
  done
  if ! git diff --quiet -- "$ART" 2>/dev/null || \
     [ -n "$(git status --porcelain "$ART")" ]; then
    nlines=0
    [ -f "$ART/metrics.jsonl" ] && nlines=$(wc -l < "$ART/metrics.jsonl")
    git add "$ART"
    # path-scoped commit: never sweep up unrelated staged changes
    # (ADVICE.md round 3)
    git commit -q -m "evidence sync: $(date -u +%H:%M) $nlines metric lines" \
      -- "$ART" || true
  fi
  sleep 600
done
