#!/bin/bash
# Probe for a tunnel-admission window, then run the ONE-SESSION measurement
# sweep (scripts/tpu_mega.py). If the session dies early (tunnel drop), go
# back to probing and rerun with the completed sections skipped.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${1:-/tmp/tpu_mega.log}
: > "$LOG"
DEADLINE=$(( $(date +%s) + ${BATCH_BUDGET_S:-18000} ))

probe() {
  # Shared probe (scripts/tpu_probe.py). 150 s: a healthy probe costs
  # 60-90 s of first-compile over the tunnel on this loaded 1-CPU host.
  timeout 150 python scripts/tpu_probe.py >/dev/null 2>&1
}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if probe; then
    echo "$(date -u +%H:%M:%S) admission window open; settling 45s" | tee -a "$LOG"
    sleep 45
    # Skip sections already completed in a previous partial run.
    done_sections=$(grep -oP '##### END \K\S+(?= ok)' "$LOG" | sort -u | paste -sd, -)
    if [ -f /tmp/cpu_heavy.pid ] && kill -0 "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null; then
      kill -STOP "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null
    fi
    NERVE_MEGA_SKIP="$done_sections" timeout "${MEGA_TIMEOUT_S:-14400}" \
      python -u scripts/tpu_mega.py 2>&1 | tee -a "$LOG"
    rc=${PIPESTATUS[0]}
    if [ -f /tmp/cpu_heavy.pid ] && kill -0 "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null; then
      kill -CONT "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null
    fi
    echo "$(date -u +%H:%M:%S) mega exited rc=$rc" | tee -a "$LOG"
    grep -q '##### MEGA DONE' "$LOG" && break
  else
    echo "$(date -u +%H:%M:%S) no admission window (probe failed); retry 420s" | tee -a "$LOG"
    sleep 420
  fi
done
if [ -f /tmp/cpu_heavy.pid ] && kill -0 "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null; then
  kill -CONT "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null
fi
echo "WATCH DONE $LOG"
