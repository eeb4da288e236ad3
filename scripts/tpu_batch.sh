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
  echo "=== $* ===" | tee -a "$LOG"
  timeout 580 "$@" 2>&1 | tee -a "$LOG"
  echo "--- exit $? ---" | tee -a "$LOG"
}

run python -u scripts/tpu_gate.py
run python -u scripts/diag_lightweight.py --tiles
run python -u scripts/diag_lightweight.py
run python -u scripts/diag_lightweight.py --tiles --pet
run python -u scripts/diag_corr.py
# Round-3 RDB store/VPU-gap candidates vs the production schedule
# (flat_strips): dx-major packing and/or bf16 matmul emission.
DIAG_TILES=32x240 run python -u scripts/diag_rdb.py \
  flat_strips,flat_dx_strips,flat_dy_pet_strips,flat_dx_pet_strips
# Warp gather formulation: per-run vs per-element issue cost
run python -u scripts/diag_warp.py
run python -u bench.py
echo "DONE $LOG"
