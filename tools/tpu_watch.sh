#!/bin/bash
# Tunnel watchdog: probe the axon TPU tunnel every PERIOD seconds; when a
# trivial compile+fetch succeeds, run the validation queue
# (tools/tpu_queue.sh).  The queue is idempotent (per-step .ok stamps), so
# if the tunnel drops mid-queue the watchdog keeps probing and re-runs the
# remaining steps until every step has passed.  ONE tunnel process at a
# time — the probe and the queue are strictly serial.
#
# Usage: bash tools/tpu_watch.sh [out_dir] [period_s]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue}
PERIOD=${2:-300}
mkdir -p "$OUT"

probe() {
  timeout 240 python - <<'EOF' >"$OUT/probe.log" 2>&1
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((8, 128))
y = (x @ x.T).sum()
v = float(np.asarray(y))
assert v == 8 * 128 * 8, v
print("TUNNEL OK", jax.devices())
EOF
}

while true; do
  if probe; then
    echo "tunnel up at $(date -u); running queue"
    cat "$OUT/probe.log"
    if bash tools/tpu_queue.sh "$OUT"; then
      echo "queue complete at $(date -u)"
      exit 0
    fi
    echo "queue had failures at $(date -u); will retry remaining steps"
  else
    echo "tunnel still down at $(date -u) (probe rc=$?)"
  fi
  sleep "$PERIOD"
done
