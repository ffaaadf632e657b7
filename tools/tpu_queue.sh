#!/bin/bash
# TPU validation queue (CLAUDE.md "In-flight"): run serially when the axon
# tunnel returns.  ONE tunnel process at a time — this script is the only
# TPU user while it runs.  Logs per step under $OUT (default /tmp/tpu_queue).
#
# Idempotent: a step whose $OUT/<name>.ok stamp exists is skipped, so the
# watchdog can re-run the queue after a mid-queue tunnel drop and only the
# failed/remaining steps execute.  Exits nonzero if any step failed.
#
# Usage: bash tools/tpu_queue.sh [out_dir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue}
mkdir -p "$OUT"
FAILED=0

run() {
  local name=$1 tmo=$2; shift 2
  if [ -e "$OUT/$name.ok" ]; then
    echo "=== $name: already passed, skipping"
    return 0
  fi
  echo "=== $name: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name exit=$rc"
  tail -5 "$OUT/$name.log" | sed 's/^/    /'
  if [ $rc -eq 0 ]; then touch "$OUT/$name.ok"; else FAILED=1; fi
  return $rc
}

# 1. two-block kernel: Mosaic compile + micro numbers (decides the default)
run two128   1200 python tools/bench_fused.py two 128
run two256   1200 python tools/bench_fused.py two 256
# 1b. integration exactness on the real device (flag on vs off)
run fused_check 1800 python tools/check_fused.py
# 2. single-block t=256 bisect
run level0_256 1200 python tools/bench_fused.py level0 256
# 3. re-trace the batched forward at HEAD (s2d stem included)
run trace_forward 1800 python tools/trace_forward.py
# 4. streaming trace: device-vs-dispatch decomposition, incl. the scanned
#    frame step (north-star program) and the detection read
run trace_streaming 2400 python tools/trace_streaming.py
# 5. refresh headline numbers from ONE process (also pre-warms the
#    compile cache for the driver)
run bench        1800 python bench.py
run bench_stream 1800 python bench_streaming.py
run bench_det    1800 python bench_detector.py
run profile      1800 python tools/profile_stages.py
# 6. training throughput: f32 (reference regime) + bf16 frozen-feature path
run train_f32    1800 python tools/bench_train.py 16384 20 float32
run train_bf16   1800 python tools/bench_train.py 16384 20 bfloat16

echo "QUEUE DONE failed=$FAILED $(date -u)"
exit $FAILED
