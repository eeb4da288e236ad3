#!/bin/bash
# Round-4 measurement batch (VERDICT r3 item #1: measure FIRST, not last).
# Records every BASELINE config on current defaults + the int8 quality cost.
# Serialise everything: the 1-CPU host cannot overlap TPU compiles.
set -u
cd "$(dirname "$0")/.."
# APPEND to PYTHONPATH (the axon plugin lives at /root/.axon_site).
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${1:-/tmp/tpu_batch_r4.log}
: > "$LOG"

run() {
  local t="$1"; shift
  echo "=== $* ===" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

# 1. Headline FIRST (its preamble runs the QUICK gate; a flapping tunnel
#    should cost us the least-valuable items, not the headline).
run 900 python -u bench.py
# 2. Full kernel gate (Mosaic lowering/parity on the real chip).
run 1500 python -u scripts/tpu_gate.py
# 3. Round-4 headroom A/Bs (layouts, batching, stages).
run 1500 python -u scripts/diag_lightweight2.py
# 3. Every BASELINE config on current defaults (DX_MAJOR RDB, planar corr).
run 1500 python -u bench_suite.py sr_full
run 1500 python -u bench_suite.py sr_full_int8
run 1500 python -u bench_suite.py sr_full_int8full
run 900 python -u bench_suite.py engine
run 900 python -u bench_suite.py train
run 1200 python -u bench_suite.py continual federated abr
# 4. int8 + coarse-flow quality cost in dB on the full model
#    (psnr_int8 / psnr_delta_int8_vs_coarse — coded in r2, never recorded).
run 2400 python -u scripts/eval_parity.py --epochs 40
# 5. Round-4 int8 extensions: conv-chain sites bf16 vs int8 at serving
#    shapes, and the dx-major schedule on the int8 RDB kernel (the bf16
#    kernel's −12 % win, never yet timed on the int8 variant).
run 1800 python -u scripts/diag_chain_int8.py
run 1200 python -u scripts/diag_rdb_int8.py --skip-bf16
run 1200 python -u scripts/diag_rdb_int8.py --skip-bf16 --dx-major
run 1200 python -u scripts/diag_rdb_int8.py --skip-bf16 --per-channel
run 1200 python -u scripts/diag_rdb_int8.py --skip-bf16 --per-channel --dx-major
if [ -f /tmp/cpu_heavy.pid ] && kill -0 "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null; then
  kill -CONT "$(cat /tmp/cpu_heavy.pid)"
fi
echo "DONE $LOG"
