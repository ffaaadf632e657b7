#!/bin/bash
# Tunnel watchdog: probe the axon TPU tunnel every PERIOD seconds; when a
# trivial compile+fetch succeeds, run the validation queue
# (tools/tpu_queue.sh) once and exit.  ONE tunnel process at a time — the
# probe and the queue are strictly serial.
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
    bash tools/tpu_queue.sh "$OUT"
    exit 0
  fi
  echo "tunnel still down at $(date -u) (probe rc=$?)"
  sleep "$PERIOD"
done
