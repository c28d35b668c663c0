#!/bin/bash
# Compact one-screen status of the round-2 pipeline (collect/train/eval/bench).
echo "== $(date -u +%H:%M:%S) =="
if [ -f /tmp/pytest.log ]; then
  printf 'pytest: '; tail -c 120 /tmp/pytest.log | tr -d '\n'; echo
fi
n=$(ls /root/ds2/collect/data 2>/dev/null | grep -c '\.npz$')
echo "collect: $n/3000 eps (pid alive: $(kill -0 $(cat /tmp/collect.pid 2>/dev/null) 2>/dev/null && echo yes || echo no))"
tail -2 /tmp/collect.log 2>/dev/null | head -1
if [ -f /root/models/geeco-f/metrics.jsonl ]; then
  echo "train: $(wc -l < /root/models/geeco-f/metrics.jsonl) metric lines; last:"
  tail -1 /root/models/geeco-f/metrics.jsonl | head -c 400; echo
fi
grep '=== \[pipeline\]' /tmp/pipeline.log 2>/dev/null | tail -3
ls /root/eval/geeco-f/*/final_results.txt 2>/dev/null && cat /root/eval/geeco-f/*/final_results.txt
free -g | awk 'NR==2{print "mem: " $3 "G used / " $2 "G"}'
df -h / | awk 'NR==2{print "disk: " $4 " free"}'
