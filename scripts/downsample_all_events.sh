#!/usr/bin/env bash
# Batch wrapper over downsample_events.py: downsamples every sequence's
# events/left/events.h5 under a dataset root into events_2x.h5
# (reference scripts/downsample_all_events.sh equivalent).
#
# Usage: downsample_all_events.sh <dataset_root> [factor]
set -euo pipefail

root="${1:?usage: downsample_all_events.sh <dataset_root> [factor]}"
factor="${2:-2}"
here="$(dirname "$0")"

for seq in "$root"/*/; do
    in="$seq/events/left/events.h5"
    out="$seq/events/left/events_${factor}x.h5"
    [ -f "$in" ] || continue
    if [ -f "$out" ]; then
        echo "skip  $out (exists)"
        continue
    fi
    echo "downsample $in -> $out"
    python "$here/downsample_events.py" "$in" "$out" --factor "$factor"
done
