#!/bin/bash
# Round-5 queue part 3: waits for the v2 sentinel, then re-runs every cell
# that failed (non-zero rc — the v2 skip logic treats any recorded label as
# done, including failures) plus the cells the v2 list lacked. Labels carry
# a _r suffix so the retry results coexist with the first-pass record.
set -u
cd /root/repo
OUT=bench_results/r5
mkdir -p "$OUT/logs"
RESULTS="$OUT/results.jsonl"
STATUS="$OUT/status.txt"
export BENCH_PROBE_DEADLINE_S=900

probe() {
  timeout 600 python - <<'EOF' >/dev/null 2>&1
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

ok_already() {
  grep "\"label\": \"$1\"" "$RESULTS" 2>/dev/null | grep -q '"rc": 0'
}

run_one() {
  local label="$1" tmo="$2"; shift 2
  local wd=/root/repo
  if [ "$1" != "--" ]; then wd="$1"; shift; fi
  shift
  if ok_already "$label" || ok_already "${label%_r}"; then
    echo "$(date -u +%H:%M:%S) SKIP  $label (rc=0 recorded)" >> "$STATUS"
    return
  fi
  wait_up
  echo "$(date -u +%H:%M:%S) START $label" >> "$STATUS"
  local log="$OUT/logs/${label}.log"
  ( cd "$wd" && timeout "$tmo" env "$@" ) > "$log" 2>&1
  local rc=$?
  local line
  line=$(grep -h '^{' "$log" | tail -1)
  echo "{\"label\": \"${label}\", \"rc\": ${rc}, \"result\": ${line:-null}}" >> "$RESULTS"
  echo "$(date -u +%H:%M:%S) DONE  $label rc=$rc" >> "$STATUS"
}

while ! grep -q "round5 durable queue v2 complete" "$STATUS" 2>/dev/null; do sleep 60; done
echo "$(date -u +%H:%M:%S) part 3 (retries + missing cells) starting" >> "$STATUS"

# Missing from v2: the standalone parity-default b8 cell (train_pair's
# second subprocess died rc=3 when the tunnel flapped mid-pair).
run_one train_b8_f32 2800 -- env MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_F32=1 python bench.py --train
# A second preset cell for a same-day repeat of the pair's first half.
run_one train_b8_lp_repeat 2800 -- env MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 python bench.py --train

# Retries of any first-pass failures (ok_already skips rc=0 cells).
run_one headline_r 2800 -- python bench.py
run_one single_scene_r 2800 -- python bench.py --single-scene
run_one ar_single_r    2800 -- python bench.py --single-scene --autoregressive
run_one pair1_headline_r 2800 -- python bench.py
run_one pair1_train_b3_r 2800 -- env MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one r3replay_train_b3_r 2800 /tmp/r3replay -- env MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one train_b3_xla_bwd_r 2800 -- env MVLDM_FLASH_BWD=0 MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one ctl_b3_quiet1_r 2800 -- env MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one ctl_b3_quiet2_r 2800 -- env MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one ar_decompose_r 3600 -- python tools/bench_ar_decompose.py
run_one ar_sb4_r        2800 -- python bench.py --scene-batch 4 --autoregressive
run_one ar_sb4_latent_r 2800 -- python bench.py --scene-batch 4 --autoregressive --latent
run_one scene_batch8_r  2800 -- python bench.py --scene-batch 8
run_one train_b8_lp_latents_r 2800 -- env MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 python bench.py --train

echo "$(date -u +%H:%M:%S) part 3 complete" >> "$STATUS"
