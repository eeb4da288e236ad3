#!/bin/bash
# Round-4 measurement batch (VERDICT r3 item #1: measure FIRST, not last).
# Records every BASELINE config on current defaults + the int8 quality cost.
#
# The axon tunnel FLAPS (r4: healthy at 00:41, wedged by 00:42), so the
# batch is a PROBE-GATED QUEUE: before every item, a 90 s dispatch probe
# (matmul + Pallas kernel) must pass; wedged → sleep and retry the probe,
# never burn a 25-min item timeout measuring nothing. An item that exits
# 124 (its own timeout — likely a mid-item wedge) is retried once at the
# end of the queue. Serialise everything: 1-CPU host.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${1:-/tmp/tpu_batch_r4.log}
: > "$LOG"
DEADLINE=$(( $(date +%s) + ${BATCH_BUDGET_S:-18000} ))  # default 5 h

probe() {
  # Shared probe (scripts/tpu_probe.py). 150 s: a healthy probe costs
  # 60-90 s of first-compile over the tunnel on this loaded 1-CPU host;
  # 90 s misclassified healthy as wedged.
  timeout 150 python scripts/tpu_probe.py >/dev/null 2>&1
}

# "timeout_s<TAB>command" — headline first, cheapest-to-recompile early.
ITEMS=(
  $'900\tpython -u bench.py'
  $'1500\tpython -u scripts/tpu_gate.py'
  $'1500\tpython -u scripts/diag_lightweight2.py'
  $'1500\tpython -u bench_suite.py sr_full'
  $'1500\tpython -u bench_suite.py sr_full_int8'
  $'1500\tpython -u bench_suite.py sr_full_int8full'
  $'900\tpython -u bench_suite.py engine'
  $'900\tpython -u bench_suite.py train'
  $'1200\tpython -u bench_suite.py continual federated abr'
  $'2400\tpython -u scripts/eval_parity.py --epochs 40'
  $'1800\tpython -u scripts/diag_chain_int8.py'
  $'1200\tpython -u scripts/diag_rdb_int8.py --skip-bf16'
  $'1200\tpython -u scripts/diag_rdb_int8.py --skip-bf16 --dx-major'
  $'1200\tpython -u scripts/diag_rdb_int8.py --skip-bf16 --per-channel'
  $'1200\tpython -u scripts/diag_rdb_int8.py --skip-bf16 --per-channel --dx-major'
)

queue=("${ITEMS[@]}")
retried=""
while [ ${#queue[@]} -gt 0 ]; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "BATCH DEADLINE reached; ${#queue[@]} items unrun" | tee -a "$LOG"
    break
  fi
  item="${queue[0]}"; queue=("${queue[@]:1}")
  t="${item%%$'\t'*}"; cmd="${item#*$'\t'}"
  until probe; do
    # 420 s: a KILLED probe client seems to wedge the tunnel server for
    # minutes — re-probing too often re-poisons it (observed r4).
    echo "$(date -u +%H:%M:%S) tunnel wedged; holding '$cmd' (retry 420s)" | tee -a "$LOG"
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then break 2; fi
    sleep 420
  done
  # Settle: a client connecting within seconds of the previous client's
  # teardown hangs (observed twice: probe green, item wedged <1 s later).
  sleep 45
  # Pause any registered CPU-heavy job while an item compiles/runs
  # (1-CPU host); resume it while we hold for a wedged tunnel.
  if [ -f /tmp/cpu_heavy.pid ] && kill -0 "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null; then
    kill -STOP "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null
  fi
  echo "=== $(date -u +%H:%M:%S) $cmd ===" | tee -a "$LOG"
  timeout "$t" $cmd 2>&1 | tee -a "$LOG"
  rc=${PIPESTATUS[0]}
  echo "--- exit $rc ---" | tee -a "$LOG"
  if [ -f /tmp/cpu_heavy.pid ] && kill -0 "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null; then
    kill -CONT "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null
  fi
  if [ "$rc" -eq 124 ] && [[ "$retried" != *"|$cmd|"* ]]; then
    retried="$retried|$cmd|"
    queue+=("$item")
    echo "(requeued after timeout: $cmd)" | tee -a "$LOG"
  fi
done

if [ -f /tmp/cpu_heavy.pid ] && kill -0 "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null; then
  kill -CONT "$(cat /tmp/cpu_heavy.pid)"
fi
echo "DONE $LOG"
