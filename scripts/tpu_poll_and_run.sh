#!/bin/bash
# Poll the TPU relay; when it recovers, fire the full runbook once.
#   bash scripts/tpu_poll_and_run.sh [outdir] &
# Logs probes to /tmp/tpu_poll.log. The probe is a 90s-timeout jit(x+1)
# in a subprocess (the relay wedge mode hangs forever, never errors —
# see CLAUDE.md "Environment traps").
set -u
OUT=${1:-tpu_reports}
cd "$(dirname "$0")/.."
while true; do
  if timeout 90 python -c "
import numpy as np, jax, jax.numpy as jnp
y = jax.jit(lambda a: a + 1)(jnp.ones((8, 8)))
assert float(np.asarray(y).sum()) == 128.0
" >/dev/null 2>&1; then
    echo "$(date +%H:%M:%S) ALIVE - firing runbook" >> /tmp/tpu_poll.log
    bash scripts/tpu_runbook.sh "$OUT"
    echo "$(date +%H:%M:%S) runbook finished" >> /tmp/tpu_poll.log
    exit 0
  fi
  echo "$(date +%H:%M:%S) wedged" >> /tmp/tpu_poll.log
  sleep 300
done
