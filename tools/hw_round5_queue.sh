#!/bin/bash
# Consolidated round-5 bench queue. Replaces the individually-chained
# hw_extra2/extra3/final/final2/final3 scripts: those each waited on a
# status-file sentinel with a 4h timeout and would have STARTED ANYWAY on
# expiry, overlapping each other on the chip — the exact contention mode
# that poisoned round-4's training cells. This script waits (indefinitely)
# for the in-flight hw_extra pass to finish, then runs every remaining cell
# strictly sequentially.
set -u
cd /root/repo
mkdir -p /tmp/hw_logs
RESULTS=/tmp/hw_results.jsonl
STATUS=/tmp/hw_status.txt
export BENCH_PROBE_DEADLINE_S=900

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

# Wait for the running hw_extra pass (no expiry — sequential or nothing).
while ! grep -q "extra pass complete" "$STATUS" 2>/dev/null; do sleep 30; done
echo "$(date -u +%H:%M:%S) round5 consolidated queue starting" >> "$STATUS"

# -- ex-extra2: no-remat exploration under bf16 nu --
run_one train_b4_lp_noremat          MVLDM_TRAIN_BENCH_BATCH=4 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_NOREMAT=1 python bench.py --train
run_one train_b8_lp_latents_noremat  MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 MVLDM_TRAIN_BENCH_NOREMAT=1 python bench.py --train
run_one train_b8_lp_noremat          MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_NOREMAT=1 python bench.py --train

# -- retry: AR sequential-floor decomposition (r5 first attempt died to a
#    tunnel broken-pipe mid-run) --
echo "$(date -u +%H:%M:%S) START ar_decompose_retry" >> "$STATUS"
timeout 3600 python tools/bench_ar_decompose.py > /tmp/hw_logs/ar_decompose_retry.log 2>&1
rc=$?
echo "$(date -u +%H:%M:%S) DONE  ar_decompose_retry rc=$rc" >> "$STATUS"

# -- ex-extra3: the bare default-vs-preset training pairing (one run) --
echo "$(date -u +%H:%M:%S) START train_pair" >> "$STATUS"
timeout 4000 python bench.py --train > /tmp/hw_logs/train_pair.log 2>&1
rc=$?
line=$(grep -h '^{' /tmp/hw_logs/train_pair.log | tail -1)
echo "{\"label\": \"train_pair\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
echo "$(date -u +%H:%M:%S) DONE  train_pair rc=$rc" >> "$STATUS"

# -- ex-final: clean re-measures of cells whose first pass hit contention --
run_one train_b3_default_clean  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one train_b3_lp_clean       MVLDM_TRAIN_BENCH_BATCH=3 MVLDM_TRAIN_BENCH_LP=1 python bench.py --train
run_one train_b1_default_clean  MVLDM_TRAIN_BENCH_BATCH=1 python bench.py --train
run_one train_b8_f32            MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_F32=1 python bench.py --train

# -- ex-final2: clean b8 latent-cache cell --
run_one train_b8_lp_latents_clean MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 python bench.py --train

# -- ex-final3: variance-discrimination pairs (sampling vs training,
#    back-to-back, twice) --
run_one pair1_headline  python bench.py
run_one pair1_train_b3  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one pair2_headline  python bench.py
run_one pair2_train_b3  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train

echo "$(date -u +%H:%M:%S) round5 consolidated queue complete" >> "$STATUS"
