#!/bin/bash
# Round-5 durable queue (v2): per-cell results and logs persist INSIDE the
# repo (bench_results/r5/) so a host swap no longer wipes the evidence
# (/tmp did exactly that between round-5 sessions). Changes vs the /tmp
# queues:
#   - resume-safe: a cell whose label already has a result line is skipped,
#     so the queue can be killed/restarted freely;
#   - probe gate waits out slow first-contact: the gating probe gets 600s
#     (chip bring-up after a tunnel flap is routinely 2-10 min; a 150s gate
#     reports a healthy-but-initialising chip as "down" forever — the r4
#     driver bench died exactly this way).
# Priority order: the tunnel flaps on a ~20min-up cycle, so the
# highest-value cells run first:
#   1. headline sampling (driver metric; also warms the compile cache)
#   2. train_pair (default-vs-preset pairing, VERDICT r4 #6)
#   3. single-scene + AR sampling (the r3-lineage comparison numbers)
#   4. b3 variance pair + r3-snapshot replay + current-tree XLA-bwd control
#      (the BENCHMARKS regression-note evidence, VERDICT r4 #1)
#   5. controlled host-contention bracket (causal variance evidence)
#   6. AR floor decomposition (VERDICT r4 #7), AR scene-batch/feedthrough,
#      exploration leftovers
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

done_already() {
  grep -q "\"label\": \"$1\"" "$RESULTS" 2>/dev/null
}

# run_one LABEL TIMEOUT_S [WORKDIR] -- ENV... CMD...
run_one() {
  local label="$1" tmo="$2"; shift 2
  local wd=/root/repo
  if [ "$1" != "--" ]; then wd="$1"; shift; fi
  shift  # the --
  if done_already "$label"; then
    echo "$(date -u +%H:%M:%S) SKIP  $label (already recorded)" >> "$STATUS"
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

echo "$(date -u +%H:%M:%S) round5 durable queue v2 starting" >> "$STATUS"

# 1. headline (production scene_batch=4 anchored)
run_one headline 2800 -- python bench.py

# 2. default-vs-preset training pairing (one run, two subprocesses)
run_one train_pair 4000 -- python bench.py --train

# 3. r3-lineage sampling comparisons
run_one single_scene 2800 -- python bench.py --single-scene
run_one ar_single    2800 -- python bench.py --single-scene --autoregressive

# 4. regression-note evidence: paired same-window cells + snapshot replay
run_one pair1_headline 2800 -- python bench.py
run_one pair1_train_b3 2800 -- env MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
if [ ! -d /tmp/r3replay ]; then
  git worktree add --detach /tmp/r3replay be6465f >> "$STATUS" 2>&1
fi
run_one r3replay_train_b3 2800 /tmp/r3replay -- env MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one train_b3_xla_bwd 2800 -- env MVLDM_FLASH_BWD=0 MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train

# 5. causal contention bracket: identical b3 default cells, quiet / with a
#    single-core CPU hog (this VM exposes ONE vCPU) / quiet again.
run_one ctl_b3_quiet1 2800 -- env MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
if ! done_already ctl_b3_hogged; then
  ( while :; do :; done ) & HOG=$!
  run_one ctl_b3_hogged 2800 -- env MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
  kill "$HOG" 2>/dev/null
fi
run_one ctl_b3_quiet2 2800 -- env MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train

# 6. AR floor decomposition + remaining AR cells + exploration
run_one ar_decompose 3600 -- python tools/bench_ar_decompose.py
run_one ar_sb4           2800 -- python bench.py --scene-batch 4 --autoregressive
run_one ar_sb4_latent    2800 -- python bench.py --scene-batch 4 --autoregressive --latent
run_one pair2_headline   2800 -- python bench.py
run_one pair2_train_b3   2800 -- env MVLDM_TRAIN_BENCH_BATCH=3 python bench.py --train
run_one scene_batch8     2800 -- python bench.py --scene-batch 8
run_one train_b8_lp_latents 2800 -- env MVLDM_TRAIN_BENCH_BATCH=8 MVLDM_TRAIN_BENCH_LP=1 MVLDM_TRAIN_BENCH_LATENTS=1 python bench.py --train

echo "$(date -u +%H:%M:%S) round5 durable queue v2 complete" >> "$STATUS"
