#!/bin/bash
# Wait for the flaky TPU tunnel, then run the full round-5 hardware matrix.
# Each result is appended to /tmp/hw_results.jsonl with a label; per-run
# logs in /tmp/hw_logs/. Designed to be launched detached (setsid nohup).
set -u
cd /root/repo
mkdir -p /tmp/hw_logs
RESULTS=/tmp/hw_results.jsonl
STATUS=/tmp/hw_status.txt

probe() {
  timeout 150 python - <<'EOF' >/dev/null 2>&1
import jax.numpy as jnp, numpy as np
assert float(np.asarray(jnp.asarray(1.0) + 1.0)) == 2.0
EOF
}

run_one() {
  local label="$1"; shift
  echo "$(date -u +%H:%M:%S) START $label" >> "$STATUS"
  local log="/tmp/hw_logs/${label}.log"
  timeout 2400 env "$@" > "$log" 2>&1
  local rc=$?
  local line
  line=$(grep -h '^{' "$log" | tail -1)
  echo "{\"label\": \"${label}\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
  echo "$(date -u +%H:%M:%S) DONE  $label rc=$rc" >> "$STATUS"
}

echo "$(date -u +%H:%M:%S) waiting for tunnel" >> "$STATUS"
for i in $(seq 1 720); do
  if probe; then break; fi
  sleep 45
done
echo "$(date -u +%H:%M:%S) tunnel up, running matrix" >> "$STATUS"

# Sampling headline + variants (most important first in case tunnel dies).
run_one headline_scene_batch4      python bench.py
run_one single_scene_anchored      python bench.py --single-scene
run_one single_scene_ar            python bench.py --single-scene --autoregressive
run_one scene_batch4_ar            python bench.py --scene-batch 4 --autoregressive

# Training matrix: defaults (bf16 mu, f32 nu) then the tpu_fast preset
# (bf16 mu+nu) and the XLA-backward control at b3 (the r4 regression cell).
run_one train_b1_default           MVLDM_TRAIN_BENCH_BATCH=1 python bench.py --train
run_one train_b3_default           MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one train_b8_default           MVLDM_TRAIN_BENCH_BATCH=8 python bench.py --train
run_one train_b3_lp                MVLDM_TRAIN_BENCH_BATCH=3 MVLDM_TRAIN_BENCH_LP=1 python bench.py --train
run_one train_b8_lp                MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 python bench.py --train
run_one train_b8_lp_latents        MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 python bench.py --train
run_one train_b3_xla_bwd           MVLDM_TRAIN_BENCH_BATCH=3 MVLDM_FLASH_BWD=0 python bench.py --train
run_one train_b1_xla_bwd           MVLDM_TRAIN_BENCH_BATCH=1 MVLDM_FLASH_BWD=0 python bench.py --train

echo "$(date -u +%H:%M:%S) matrix complete" >> "$STATUS"
