#!/usr/bin/env python
"""Spatially downsample an events H5 file (reference
scripts/downsample_events.py): coordinates are divided by ``factor`` and
events landing on the same pixel within the accumulator refractory window are
merged per polarity. The reference uses a sequential numba accumulator
(:108-123); this is the vectorized equivalent with identical keep semantics:
an event is kept iff it is the first of its (pixel, polarity) pair within
``refractory_us``."""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from eventad_tpu.data.h5io import EventFile, write_events  # noqa: E402


def downsample(events, factor=2, refractory_us=0):
    x = (events["x"] // factor).astype(np.uint16)
    y = (events["y"] // factor).astype(np.uint16)
    t = events["t"]
    p = events["p"]
    if refractory_us <= 0:
        return dict(x=x, y=y, t=t, p=p)
    code = (y.astype(np.int64) << 17) | (x.astype(np.int64) << 1) \
        | p.astype(np.int64)
    order = np.lexsort((t, code))
    cs, ts = code[order], t[order]
    first = np.ones(len(cs), bool)
    same = cs[1:] == cs[:-1]
    close = (ts[1:] - ts[:-1]) < refractory_us
    first[1:] = ~(same & close)
    keep = np.zeros(len(cs), bool)
    keep[order] = first
    return {k: v[keep] for k, v in dict(x=x, y=y, t=t, p=p).items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", type=Path)
    ap.add_argument("output", type=Path)
    ap.add_argument("--factor", type=int, default=2)
    ap.add_argument("--refractory_us", type=int, default=0)
    args = ap.parse_args()
    f = EventFile(args.input)
    ev = {k: f.f[f"events/{k}"][:] for k in "xytp"}
    out = downsample(ev, args.factor, args.refractory_us)
    write_events(args.output, out, t_offset=f.t_offset)
    print(f"{len(ev['t'])} -> {len(out['t'])} events, {args.output}")


if __name__ == "__main__":
    main()
