#!/bin/bash
# Round-5 queue, take 3: same probe-gated protocol as queue2, reordered so
# the highest-value cells run first — the tunnel is flapping on a ~20min-up
# cycle and the round has a deadline, so cell priority now matters:
#   1. train_pair      (the default-vs-preset pairing, VERDICT r4 #6)
#   2. ar_decompose    (the AR floor table, VERDICT r4 #7)
#   3. variance pairs  (sampling-vs-training discrimination)
#   4. clean re-measures (contended first-pass cells)
#   5. scene_batch8 + the last no-remat cell (exploration)
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

echo "$(date -u +%H:%M:%S) round5 queue3 starting (priority order)" >> "$STATUS"

# 1. default-vs-preset pairing (one run, two subprocesses)
wait_up
echo "$(date -u +%H:%M:%S) START train_pair" >> "$STATUS"
timeout 4000 python bench.py --train > /tmp/hw_logs/train_pair.log 2>&1
rc=$?
line=$(grep -h '^{' /tmp/hw_logs/train_pair.log | tail -1)
echo "{\"label\": \"train_pair\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
echo "$(date -u +%H:%M:%S) DONE  train_pair rc=$rc" >> "$STATUS"

# 2. AR sequential-floor decomposition retry
wait_up
echo "$(date -u +%H:%M:%S) START ar_decompose_retry" >> "$STATUS"
timeout 3600 python tools/bench_ar_decompose.py > /tmp/hw_logs/ar_decompose_retry.log 2>&1
rc=$?
echo "$(date -u +%H:%M:%S) DONE  ar_decompose_retry rc=$rc" >> "$STATUS"

# 3. variance-discrimination pairs
run_one pair1_headline  python bench.py
run_one pair1_train_b3  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one pair2_headline  python bench.py
run_one pair2_train_b3  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train

# 4. clean re-measures
run_one train_b3_lp_clean       MVLDM_TRAIN_BENCH_BATCH=3 MVLDM_TRAIN_BENCH_LP=1 python bench.py --train
run_one train_b3_default_clean  MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one train_b8_f32            MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_F32=1 python bench.py --train
run_one train_b1_default_clean  MVLDM_TRAIN_BENCH_BATCH=1 python bench.py --train
run_one train_b8_lp_latents_clean MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 python bench.py --train

# 5. exploration leftovers
run_one headline_scene_batch8 python bench.py --scene-batch 8
run_one train_b8_lp_noremat   MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_NOREMAT=1 python bench.py --train

# Same sentinel the contention probe watcher waits on.
echo "$(date -u +%H:%M:%S) round5 consolidated queue complete" >> "$STATUS"
