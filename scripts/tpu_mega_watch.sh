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
  timeout 150 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
x = jnp.ones((256, 256))
assert float((x @ x).sum()) == 256.0 ** 3
from jax.experimental import pallas as pl
def k(a, o):
    o[...] = a[...] * 2.0
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(
    jnp.ones((8, 128), jnp.float32))
assert float(y.sum()) == 2048.0
" >/dev/null 2>&1
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
