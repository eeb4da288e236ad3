#!/bin/bash
# One-shot serial TPU measurement batch (run when the axon tunnel is up).
# Serialise everything: the 1-CPU host cannot overlap TPU compiles.
set -u
cd "$(dirname "$0")/.."
# APPEND to PYTHONPATH (the axon plugin lives at /root/.axon_site).
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${1:-/tmp/tpu_batch.log}
: > "$LOG"

run() {
  local t="$1"; shift
  echo "=== $* ===" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tee -a "$LOG"
  # Real command status, not tee's (PIPESTATUS); 124 = hit the timeout.
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

# The gate compiles ~8 Mosaic kernels serially on a 1-CPU host: give it time.
run 1500 python -u scripts/tpu_gate.py
run 900 python -u scripts/diag_lightweight.py --tiles
run 580 python -u scripts/diag_lightweight.py
run 900 python -u scripts/diag_lightweight.py --tiles --pet
run 580 python -u scripts/diag_corr.py
# Round-3 RDB store/VPU-gap candidates vs the production schedule
# (flat_strips): dx-major packing and/or bf16 matmul emission.
DIAG_TILES=32x240 run 1200 python -u scripts/diag_rdb.py \
  flat_strips,flat_dx_strips,flat_dy_pet_strips,flat_dx_pet_strips
# Warp gather formulation: per-run vs per-element issue cost
run 580 python -u scripts/diag_warp.py
run 900 python -u bench.py
echo "DONE $LOG"
