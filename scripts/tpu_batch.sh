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
run 900 python -u bench.py
# Round-3b RDB schedule A/Bs (hardware decision points):
DIAG_TILES=32x240 run 1500 python -u scripts/diag_rdb.py \
  flat_dx_strips,flat_dx_strips_xonce,flat_dx_strips_f32y,flat_dx_strips_accbf16
run 900 python -u scripts/diag_rdb_int8.py --skip-bf16
run 900 python -u scripts/diag_rdb_int8.py --skip-bf16 --dx-major
# Round-3 refresh: DX_MAJOR RDB packing and the planar correlation kernel
# are now the production defaults — re-record every BASELINE config.
run 1200 python -u bench_suite.py sr_full
run 1200 python -u bench_suite.py sr_full_int8
run 900 python -u bench_suite.py engine
run 900 python -u bench_suite.py train
run 900 python -u bench_suite.py continual federated abr
# Quality at the benched config (VERDICT weak #3): the 60 fps model's PSNR.
run 1200 python -u scripts/eval_parity.py --model lightweight --epochs 40
echo "DONE $LOG"
