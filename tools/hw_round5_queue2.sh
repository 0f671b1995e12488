#!/bin/bash
# Round-5 consolidated queue, take 2: the tunnel died mid-queue and each
# cell then burned its whole 900s probe deadline. This version gates every
# cell on a cheap chip-up probe (150s) and pauses while the tunnel is down,
# so an outage costs waiting time, not measurement cells. Still strictly
# sequential. Includes the two cells lost to the outage
# (headline_scene_batch8, train_b4_lp_noremat).
set -u
cd /root/repo
mkdir -p /tmp/hw_logs
RESULTS=/tmp/hw_results.jsonl
STATUS=/tmp/hw_status.txt
export BENCH_PROBE_DEADLINE_S=900

probe() {
  timeout 150 python - <<'EOF' >/dev/null 2>&1
import jax.numpy as jnp, numpy as np
assert float(np.asarray(jnp.asarray(1.0) + 1.0)) == 2.0
EOF
}

wait_up() {
  until probe; do
    echo "$(date -u +%H:%M:%S) tunnel down, waiting" >> "$STATUS"
    sleep 90
  done
}

run_one() {
  local label="$1"; shift
  wait_up
  echo "$(date -u +%H:%M:%S) START $label" >> "$STATUS"
  local log="/tmp/hw_logs/${label}.log"
  timeout 2800 env "$@" > "$log" 2>&1
  local rc=$?
  local line
  line=$(grep -h '^{' "$log" | tail -1)
  echo "{\"label\": \"${label}\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
  echo "$(date -u +%H:%M:%S) DONE  $label rc=$rc" >> "$STATUS"
}

echo "$(date -u +%H:%M:%S) round5 queue2 starting (probe-gated)" >> "$STATUS"

# -- no-remat exploration under bf16 nu --
run_one train_b4_lp_noremat          MVLDM_TRAIN_BENCH_BATCH=4 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_NOREMAT=1 python bench.py --train
run_one train_b8_lp_latents_noremat  MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 MVLDM_TRAIN_BENCH_NOREMAT=1 python bench.py --train
run_one train_b8_lp_noremat          MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_NOREMAT=1 python bench.py --train

# -- scene_batch=8 headline confirmation (lost to the outage earlier) --
run_one headline_scene_batch8 python bench.py --scene-batch 8

# -- AR sequential-floor decomposition retry --
wait_up
echo "$(date -u +%H:%M:%S) START ar_decompose_retry" >> "$STATUS"
timeout 3600 python tools/bench_ar_decompose.py > /tmp/hw_logs/ar_decompose_retry.log 2>&1
rc=$?
echo "$(date -u +%H:%M:%S) DONE  ar_decompose_retry rc=$rc" >> "$STATUS"

# -- the bare default-vs-preset training pairing (one run) --
wait_up
echo "$(date -u +%H:%M:%S) START train_pair" >> "$STATUS"
timeout 4000 python bench.py --train > /tmp/hw_logs/train_pair.log 2>&1
rc=$?
line=$(grep -h '^{' /tmp/hw_logs/train_pair.log | tail -1)
echo "{\"label\": \"train_pair\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
echo "$(date -u +%H:%M:%S) DONE  train_pair rc=$rc" >> "$STATUS"

# -- clean re-measures of cells whose first pass hit contention --
run_one train_b3_default_clean  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one train_b3_lp_clean       MVLDM_TRAIN_BENCH_BATCH=3 MVLDM_TRAIN_BENCH_LP=1 python bench.py --train
run_one train_b1_default_clean  MVLDM_TRAIN_BENCH_BATCH=1 python bench.py --train
run_one train_b8_f32            MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_F32=1 python bench.py --train
run_one train_b8_lp_latents_clean MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 python bench.py --train

# -- variance-discrimination pairs (sampling vs training, back to back, x2) --
run_one pair1_headline  python bench.py
run_one pair1_train_b3  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one pair2_headline  python bench.py
run_one pair2_train_b3  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train

# Same sentinel the contention probe watcher waits on.
echo "$(date -u +%H:%M:%S) round5 consolidated queue complete" >> "$STATUS"
