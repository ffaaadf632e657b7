#!/usr/bin/env python
"""Build config/toa_values.json (video id -> first-anomaly frame) from
per-video toa npz files (reference scripts/extract_toa_value.py, including
the alias ids it emits for basename variants)."""
import argparse
import json
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("toa_dir", type=Path, help="directory of <vid>.npz files"
                    " each containing a scalar 'toa'")
    ap.add_argument("out", type=Path)
    args = ap.parse_args()
    table = {}
    for p in sorted(args.toa_dir.glob("*.npz")):
        d = np.load(p)
        toa = int(np.asarray(d["toa"]).reshape(-1)[0])
        vid = p.stem
        table[vid] = toa
        # alias without common suffixes, mirroring the reference aliases
        for suffix in ("_events", "_frames"):
            if vid.endswith(suffix):
                table[vid[: -len(suffix)]] = toa
    args.out.parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=1)
    print(f"wrote {len(table)} toa entries to {args.out}")


if __name__ == "__main__":
    main()
