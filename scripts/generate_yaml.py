#!/usr/bin/env python
"""Generate a train/val/test split yaml from a dataset directory listing
(reference scripts/generate_yaml.py)."""
import argparse
from pathlib import Path

import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path)
    ap.add_argument("out", type=Path)
    ap.add_argument("--val_frac", type=float, default=0.2)
    ap.add_argument("--test_frac", type=float, default=0.2)
    args = ap.parse_args()
    names = sorted(p.name for p in args.root.iterdir() if p.is_dir())
    n = len(names)
    n_val = max(int(n * args.val_frac), 1)
    n_test = max(int(n * args.test_frac), 1)
    split = {
        "train": names[: n - n_val - n_test],
        "val": names[n - n_val - n_test: n - n_test],
        "test": names[n - n_test:],
    }
    with open(args.out, "w") as f:
        yaml.safe_dump(split, f)
    print({k: len(v) for k, v in split.items()})


if __name__ == "__main__":
    main()
