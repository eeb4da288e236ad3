#!/bin/bash
# One-shot serial TPU measurement batch (run when the axon tunnel is up).
# Serialise everything: the 1-CPU host cannot overlap TPU compiles.
set -u
cd "$(dirname "$0")/.."
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
run python -u scripts/diag_corr.py
run python -u bench.py
echo "DONE $LOG"
