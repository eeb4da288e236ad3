#!/bin/bash
# Poll the axon tunnel until REAL dispatches complete, then run the given
# batch script. Wedge mode 2 (init OK, dispatch hangs) burns batch timeouts
# measuring nothing — don't start the batch until the chip answers.
#
# The tunnel FLAPS (observed r4: probe green at 00:01, gate wedged by 00:02),
# so one cheap matmul is not evidence of health. The probe now requires, in
# one process: an XLA matmul, a Mosaic-compiled Pallas kernel dispatch, and
# a second matmul after a 20 s sleep — and TWO consecutive probe passes
# 30 s apart before launching.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
BATCH=${1:-scripts/tpu_batch_r4.sh}
LOG=${2:-/tmp/tpu_batch_r4.log}
PROBE_EVERY=${PROBE_EVERY:-300}

probe() {
  # Shared probe (scripts/tpu_probe.py); --delay 20 exercises the
  # delayed-second-dispatch flap mode.
  timeout 240 python scripts/tpu_probe.py --delay 20 >/dev/null 2>&1
}

while true; do
  if probe; then
    echo "$(date -u +%H:%M:%S) probe 1/2 ok; confirming in 30s"
    sleep 30
    if probe; then
      echo "$(date -u +%H:%M:%S) tunnel healthy (2/2); launching $BATCH"
      # Pause any registered CPU-heavy job for the batch's host-side
      # compiles (1-CPU host); the batch resumes it when done.
      if [ -f /tmp/cpu_heavy.pid ] && kill -0 "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null; then
        kill -STOP "$(cat /tmp/cpu_heavy.pid)"
      fi
      exec bash "$BATCH" "$LOG"
    fi
    echo "$(date -u +%H:%M:%S) probe 2/2 FAILED (flapping tunnel)"
  else
    echo "$(date -u +%H:%M:%S) tunnel wedged (dispatch probe failed)"
  fi
  echo "$(date -u +%H:%M:%S) retry in ${PROBE_EVERY}s"
  sleep "$PROBE_EVERY"
done
