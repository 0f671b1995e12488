#!/bin/bash
# Round-5 durable queue: same probe-gated protocol as hw_round5_queue3.sh,
# but per-cell results and logs persist INSIDE the repo (bench_results/r5/)
# so a host swap no longer wipes the evidence (/tmp did exactly that between
# round-5 sessions). Priority order unchanged: the tunnel flaps on a ~20min
# cycle, so the highest-value cells run first:
#   1. headline sampling (driver metric; also warms the compile cache)
#   2. train_pair (default-vs-preset pairing, VERDICT r4 #6)
#   3. single-scene + AR sampling (the r3-lineage comparison numbers)
#   4. b3 variance pair + r3-snapshot replay + current-tree XLA-bwd control
#      (the BENCHMARKS regression-note evidence, VERDICT r4 #1)
#   5. AR decomposition floor (VERDICT r4 #7), exploration leftovers
set -u
cd /root/repo
OUT=bench_results/r5
mkdir -p "$OUT/logs"
RESULTS="$OUT/results.jsonl"
STATUS="$OUT/status.txt"
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
  local log="$OUT/logs/${label}.log"
  timeout 2800 env "$@" > "$log" 2>&1
  local rc=$?
  local line
  line=$(grep -h '^{' "$log" | tail -1)
  echo "{\"label\": \"${label}\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
  echo "$(date -u +%H:%M:%S) DONE  $label rc=$rc" >> "$STATUS"
}

echo "$(date -u +%H:%M:%S) round5 durable queue starting" >> "$STATUS"

# 1. headline (production scene_batch=4 anchored)
run_one headline python bench.py

# 2. default-vs-preset training pairing (one run, two subprocesses; longer
#    budget since it compiles two configurations)
wait_up
echo "$(date -u +%H:%M:%S) START train_pair" >> "$STATUS"
timeout 4000 python bench.py --train > "$OUT/logs/train_pair.log" 2>&1
rc=$?
line=$(grep -h '^{' "$OUT/logs/train_pair.log" | tail -1)
echo "{\"label\": \"train_pair\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
echo "$(date -u +%H:%M:%S) DONE  train_pair rc=$rc" >> "$STATUS"

# 3. r3-lineage sampling comparisons
run_one single_scene python bench.py --single-scene
run_one ar_single    python bench.py --single-scene --autoregressive

# 4. regression-note evidence: paired same-window cells
run_one pair1_headline python bench.py
run_one pair1_train_b3 MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
if [ ! -d /tmp/r3replay ]; then
  git worktree add --detach /tmp/r3replay be6465f >> "$STATUS" 2>&1
fi
wait_up
echo "$(date -u +%H:%M:%S) START r3replay_train_b3" >> "$STATUS"
( cd /tmp/r3replay && \
  timeout 2800 env MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train \
      > /root/repo/$OUT/logs/r3replay_train_b3.log 2>&1 )
rc=$?
line=$(grep -h '^{' "$OUT/logs/r3replay_train_b3.log" | tail -1)
echo "{\"label\": \"r3replay_train_b3\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
echo "$(date -u +%H:%M:%S) DONE  r3replay_train_b3 rc=$rc" >> "$STATUS"
run_one train_b3_xla_bwd MVLDM_FLASH_BWD=0 MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train

# 5. AR floor decomposition + exploration
wait_up
echo "$(date -u +%H:%M:%S) START ar_decompose" >> "$STATUS"
timeout 3600 python tools/bench_ar_decompose.py > "$OUT/logs/ar_decompose.log" 2>&1
echo "$(date -u +%H:%M:%S) DONE  ar_decompose rc=$?" >> "$STATUS"
run_one pair2_headline python bench.py
run_one pair2_train_b3 MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one scene_batch8   python bench.py --scene-batch 8
run_one train_b8_lp_latents MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 python bench.py --train

echo "$(date -u +%H:%M:%S) round5 durable queue complete" >> "$STATUS"
