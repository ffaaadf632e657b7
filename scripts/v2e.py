#!/usr/bin/env python
"""Synthesize an events H5 from a video via SensorsINI/v2e (reference
scripts/v2e.py drives the external v2e CLI). v2e is an external tool; when
it is unavailable this falls back to a simple intensity-difference event
camera model so the rest of the pipeline stays runnable."""
import argparse
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from eventad_tpu.data.h5io import write_events  # noqa: E402


def v2e_external(video: Path, out: Path, args):
    cmd = [
        "v2e", "-i", str(video), "-o", str(out.parent),
        "--dvs_h5", out.name, "--no_preview", "--skip_video_output",
        "--pos_thres", str(args.pos_thres), "--neg_thres",
        str(args.neg_thres), "--cutoff_hz", "15",
        "--output_width", str(args.width), "--output_height",
        str(args.height),
    ]
    subprocess.run(cmd, check=True)


def difference_model(video: Path, out: Path, args):
    """Log-intensity difference events (crude fallback model)."""
    import cv2
    cap = cv2.VideoCapture(str(video))
    fps = cap.get(cv2.CAP_PROP_FPS) or 20.0
    prev = None
    xs, ys, ts, ps = [], [], [], []
    fi = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        g = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float32)
        g = cv2.resize(g, (args.width, args.height))
        logi = np.log(g + 1.0)
        if prev is not None:
            d = logi - prev
            for pol, thr in ((1, args.pos_thres), (0, -args.neg_thres)):
                mask = d > thr if pol else d < thr
                yy, xx = np.nonzero(mask)
                n = len(xx)
                if n:
                    xs.append(xx.astype(np.uint16))
                    ys.append(yy.astype(np.uint16))
                    # spread within the inter-frame interval
                    ts.append((fi / fps * 1e6
                               + np.sort(np.random.randint(
                                   0, int(1e6 / fps), n))).astype(np.int64))
                    ps.append(np.full(n, pol, np.uint8))
            prev = np.where(np.abs(d) > min(args.pos_thres, args.neg_thres),
                            logi, prev)
        else:
            prev = logi
        fi += 1
    ev = {k: (np.concatenate(v) if v else np.zeros(0, np.int64))
          for k, v in zip("xytp", (xs, ys, ts, ps))}
    order = np.argsort(ev["t"], kind="stable")
    write_events(out, {k: v[order] for k, v in ev.items()})
    print(f"wrote {len(ev['t'])} events to {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video", type=Path)
    ap.add_argument("out", type=Path)
    ap.add_argument("--width", type=int, default=360)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--pos_thres", type=float, default=0.2)
    ap.add_argument("--neg_thres", type=float, default=0.2)
    args = ap.parse_args()
    if shutil.which("v2e"):
        v2e_external(args.video, args.out, args)
    else:
        print("v2e not found; using the difference-model fallback")
        difference_model(args.video, args.out, args)


if __name__ == "__main__":
    main()
