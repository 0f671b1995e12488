#!/bin/bash
# Clean re-measure of the b8 latent-cache cell (its first pass overlapped a
# host-side VAE compile) after the final sweep.
set -u
cd /root/repo
mkdir -p /tmp/hw_logs
RESULTS=/tmp/hw_results.jsonl
STATUS=/tmp/hw_status.txt
export BENCH_PROBE_DEADLINE_S=900

for i in $(seq 1 480); do
  if grep -q "final sweep complete" "$STATUS" 2>/dev/null; then break; fi
  sleep 30
done
echo "$(date -u +%H:%M:%S) final2 starting" >> "$STATUS"
echo "$(date -u +%H:%M:%S) START train_b8_lp_latents_clean" >> "$STATUS"
timeout 2800 env MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 \
  python bench.py --train > /tmp/hw_logs/train_b8_lp_latents_clean.log 2>&1
rc=$?
line=$(grep -h '^{' /tmp/hw_logs/train_b8_lp_latents_clean.log | tail -1)
echo "{\"label\": \"train_b8_lp_latents_clean\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
echo "$(date -u +%H:%M:%S) DONE  train_b8_lp_latents_clean rc=$rc" >> "$STATUS"
echo "$(date -u +%H:%M:%S) final2 complete" >> "$STATUS"
