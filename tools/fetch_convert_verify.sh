#!/bin/bash
# Released-checkpoint parity, end to end (VERDICT r4 #5). Run on a machine
# WITH network + torch; only step 1 needs the network. Everything else is
# reproducible offline and pre-verified in-image by tests/test_ckpt_manifest.py
# (structure) and tests/test_torch_goldens.py (conversion numerics).
#
#   bash tools/fetch_convert_verify.sh [workdir]
#
# Steps:
#  1. Download asimbluemoon/mvldm-1.0 from HuggingFace (reference README.md:40).
#  2. Structural pre-check against the committed manifest
#     (assets/mvldm_1.0_manifest.json — exact key/shape census).
#  3. Dump a torch-side fixture: fixed-seed context latents, initial noise,
#     and the reference's 25-step DDIM output (tools/make_parity_fixture_torch.py;
#     needs the reference repo's torch deps).
#  4. Convert + sample + diff in this framework (scripts/verify_parity.py);
#     PASS iff worst rel_max < 2e-2 on latents and pixels.
set -euo pipefail
WORK=${1:-outputs/parity_run}
mkdir -p "$WORK"

CKPT="$WORK/mvldm-1.0.ckpt"
if [ ! -f "$CKPT" ]; then
  # hf_hub_download keeps the original filename; normalize to $CKPT.
  python - "$CKPT" <<'EOF'
import sys, shutil
from huggingface_hub import hf_hub_download
path = hf_hub_download("asimbluemoon/mvldm-1.0", "mvldm-1.0.ckpt")
shutil.copy(path, sys.argv[1])
print("downloaded ->", sys.argv[1])
EOF
fi

python -m mvldm_tpu.utils.ckpt_manifest --check "$CKPT"

# Smoke mode dumps the fixed-seed scene (context latents + initial noise)
# the torch side replays, so both frameworks denoise the same inputs.
JAX_FIXTURE="$WORK/jax_fixture.npz"
if [ ! -f "$JAX_FIXTURE" ]; then
  python -m mvldm_tpu.scripts.verify_parity ckpt="$CKPT" out="$WORK"
fi

FIXTURE="$WORK/torch_fixture.npz"
if [ ! -f "$FIXTURE" ]; then
  python tools/make_parity_fixture_torch.py --ckpt "$CKPT" \
      --jax-fixture "$JAX_FIXTURE" --output "$FIXTURE"
fi

python -m mvldm_tpu.scripts.verify_parity ckpt="$CKPT" fixtures="$FIXTURE" \
    out="$WORK"
