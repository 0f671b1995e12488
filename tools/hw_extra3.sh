#!/bin/bash
# Fifth hardware pass: the new bare `bench.py --train` default-vs-preset
# pairing (VERDICT r4 #6 "covers both in one run").
set -u
cd /root/repo
mkdir -p /tmp/hw_logs
RESULTS=/tmp/hw_results.jsonl
STATUS=/tmp/hw_status.txt
export BENCH_PROBE_DEADLINE_S=600

for i in $(seq 1 480); do
  if grep -q "extra2 pass complete" "$STATUS" 2>/dev/null; then break; fi
  sleep 30
done
echo "$(date -u +%H:%M:%S) extra3 pass starting" >> "$STATUS"

echo "$(date -u +%H:%M:%S) START train_pair" >> "$STATUS"
timeout 4000 python bench.py --train > /tmp/hw_logs/train_pair.log 2>&1
rc=$?
line=$(grep -h '^{' /tmp/hw_logs/train_pair.log | tail -1)
echo "{\"label\": \"train_pair\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
echo "$(date -u +%H:%M:%S) DONE  train_pair rc=$rc" >> "$STATUS"

echo "$(date -u +%H:%M:%S) extra3 pass complete" >> "$STATUS"
