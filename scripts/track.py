#!/usr/bin/env python
"""Package per-frame detections (.npz) into the structured ``tracks.npy``
consumed by the data layer (reference scripts/track.py: dtype
t,x,y,w,h,class_id,class_confidence,track_id)."""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from eventad_tpu.data.tracks import TRACK_DTYPE  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("detections_npz", type=Path,
                    help="npz with arrays t, x, y, w, h, class_id, "
                         "class_confidence, track_id (flat, per detection)")
    ap.add_argument("out", type=Path)
    args = ap.parse_args()
    d = np.load(args.detections_npz)
    n = len(d["t"])
    out = np.zeros((n,), dtype=TRACK_DTYPE)
    for k in ("t", "x", "y", "w", "h", "class_id", "track_id"):
        out[k] = d[k]
    out["class_confidence"] = d.get("class_confidence", np.ones(n))
    order = np.argsort(out["t"], kind="stable")
    np.save(args.out, out[order])
    print(f"wrote {n} tracks to {args.out}")


if __name__ == "__main__":
    main()
