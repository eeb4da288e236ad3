#!/bin/bash
# Poll the axon tunnel until a REAL dispatch completes, then run the given
# batch script. Wedge mode 2 (init OK, dispatch hangs) burns batch timeouts
# measuring nothing — don't start the batch until the chip answers.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
BATCH=${1:-scripts/tpu_batch_r4.sh}
LOG=${2:-/tmp/tpu_batch_r4.log}
PROBE_EVERY=${PROBE_EVERY:-300}

while true; do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
x = jnp.ones((256, 256))
print(float((x @ x).sum()))
" >/dev/null 2>&1; then
    echo "$(date -u +%H:%M:%S) tunnel healthy; launching $BATCH"
    exec bash "$BATCH" "$LOG"
  fi
  echo "$(date -u +%H:%M:%S) tunnel wedged (dispatch probe failed); retry in ${PROBE_EVERY}s"
  sleep "$PROBE_EVERY"
done
