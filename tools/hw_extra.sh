#!/bin/bash
# Third hardware pass: exploration cells for round-5 perf pushes.
# - dots remat policy under the flash backward (r4 only tested it vs XLA bwd)
# - larger latent-cache batches now that bf16 nu frees ~3.7 GB (r4 b12/b16
#   OOM'd under f32 nu)
# - scene_batch=8 headline confirmation
set -u
cd /root/repo
mkdir -p /tmp/hw_logs
RESULTS=/tmp/hw_results.jsonl
STATUS=/tmp/hw_status.txt
export BENCH_PROBE_DEADLINE_S=600

run_one() {
  local label="$1"; shift
  echo "$(date -u +%H:%M:%S) START $label" >> "$STATUS"
  local log="/tmp/hw_logs/${label}.log"
  timeout 2800 env "$@" > "$log" 2>&1
  local rc=$?
  local line
  line=$(grep -h '^{' "$log" | tail -1)
  echo "{\"label\": \"${label}\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
  echo "$(date -u +%H:%M:%S) DONE  $label rc=$rc" >> "$STATUS"
}

for i in $(seq 1 480); do
  if grep -q "followup complete" "$STATUS" 2>/dev/null; then break; fi
  sleep 30
done
echo "$(date -u +%H:%M:%S) extra pass starting" >> "$STATUS"

run_one train_b8_lp_dots      MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_REMAT_POLICY=dots python bench.py --train
run_one train_b12_lp_latents  MVLDM_TRAIN_BENCH_BATCH=12 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 python bench.py --train
run_one train_b16_lp_latents  MVLDM_TRAIN_BENCH_BATCH=16 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 python bench.py --train
run_one train_b12_lp          MVLDM_TRAIN_BENCH_BATCH=12 MVLDM_TRAIN_BENCH_LP=1 python bench.py --train
run_one headline_scene_batch8 python bench.py --scene-batch 8

echo "$(date -u +%H:%M:%S) extra pass complete" >> "$STATUS"
