#!/usr/bin/env python
"""Build images/timestamps.txt aligning frames to the event stream
(reference scripts/timestamps.py: one timestamp per frame bin, taken from
the minimum event time inside each bin)."""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from eventad_tpu.data.h5io import EventFile  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("events_h5", type=Path)
    ap.add_argument("out", type=Path)
    ap.add_argument("--bin_ms", type=float, default=50.0)
    args = ap.parse_args()
    f = EventFile(args.events_h5)
    t = f.f["events/t"][:]
    if len(t) == 0:
        raise SystemExit("no events")
    bin_us = int(args.bin_ms * 1000)
    edges = np.arange(t[0], t[-1] + bin_us, bin_us)
    idx = np.searchsorted(t, edges, side="left")
    stamps = []
    for i in range(len(edges) - 1):
        if idx[i] < idx[i + 1]:
            stamps.append(int(t[idx[i]]) + f.t_offset)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    np.savetxt(args.out, np.array(stamps, dtype=np.int64), fmt="%d")
    print(f"wrote {len(stamps)} timestamps to {args.out}")


if __name__ == "__main__":
    main()
