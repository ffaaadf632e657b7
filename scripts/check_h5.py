#!/usr/bin/env python
"""Scan event H5 files for corruption; optionally repair via h5repack
(reference scripts/check_h5.py:11-44,96-118). Also prints schemas like
scripts/h5.py when --show is given."""
import argparse
import shutil
import subprocess
import sys
from pathlib import Path

import h5py


def check_file(path: Path, show=False) -> bool:
    try:
        with h5py.File(path, "r") as f:
            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    _ = obj.shape, obj.dtype
                    if show:
                        print(f"  {name}: {obj.shape} {obj.dtype}")
            f.visititems(visit)
            if "events/t" in f:
                t = f["events/t"]
                _ = t[0] if t.shape[0] else None
                _ = t[-1] if t.shape[0] else None
        return True
    except Exception as e:
        print(f"CORRUPT {path}: {e}")
        return False


def repair(path: Path) -> bool:
    if shutil.which("h5repack") is None:
        print("h5repack not available")
        return False
    tmp = path.with_suffix(".repacked.h5")
    r = subprocess.run(["h5repack", str(path), str(tmp)],
                       capture_output=True)
    if r.returncode == 0 and check_file(tmp):
        tmp.replace(path)
        print(f"repaired {path}")
        return True
    tmp.unlink(missing_ok=True)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path)
    ap.add_argument("--pattern", default="**/events_2x.h5")
    ap.add_argument("--fix", action="store_true")
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args()
    bad = 0
    for p in sorted(args.root.glob(args.pattern)):
        if args.show:
            print(p)
        if not check_file(p, args.show):
            bad += 1
            if args.fix:
                repair(p)
    print(f"scan complete, {bad} corrupt file(s)")
    sys.exit(1 if bad and not args.fix else 0)


if __name__ == "__main__":
    main()
