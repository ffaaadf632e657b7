#!/usr/bin/env python
"""Extract PNG frames from a video at a fixed rate (reference
scripts/video2rgb.py: mp4 -> 20 fps PNGs in images/left/rectified)."""
import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video", type=Path)
    ap.add_argument("outdir", type=Path)
    ap.add_argument("--fps", type=float, default=20.0)
    args = ap.parse_args()
    import cv2
    cap = cv2.VideoCapture(str(args.video))
    if not cap.isOpened():
        raise SystemExit(f"cannot open {args.video}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or args.fps
    step = max(src_fps / args.fps, 1.0)
    args.outdir.mkdir(parents=True, exist_ok=True)
    i = out = 0
    next_keep = 0.0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i >= next_keep:
            cv2.imwrite(str(args.outdir / f"{out:06d}.png"), frame)
            out += 1
            next_keep += step
        i += 1
    print(f"wrote {out} frames to {args.outdir}")


if __name__ == "__main__":
    main()
