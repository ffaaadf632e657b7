#!/usr/bin/env python
"""Host input-pipeline throughput microbench (no TPU needed).

Generates a fixture dataset at the flagship geometry, then measures decode +
collate throughput of the Loader at several worker counts. The pipeline must
sustain more frames/s than the device consumes (bench.py frames_per_sec) or
real blosc-h5 data will starve the chip (SURVEY.md 7.4 hard-part #6).

Usage: python tools/bench_loader.py [events_per_window] [n_frames]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from eventad_tpu.config import Config
    from eventad_tpu.data.batching import Loader
    from eventad_tpu.data.dataset import SequenceDataset
    from eventad_tpu.data.fixtures import generate_dataset

    events = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    with tempfile.TemporaryDirectory() as root:
        cfg = Config(batch_size=6, event_buckets=(16384,))
        t0 = time.perf_counter()
        generate_dataset(root, cfg, n_train=0, n_val=2, n_frames=n_frames,
                         events_per_window=events)
        print(f"fixture generated in {time.perf_counter()-t0:.1f}s")
        cfg = cfg.replace(split=os.path.join(root, "rol_split.yaml"))
        ds = SequenceDataset(cfg, root, "val")
        print(f"dataset: {len(ds)} items")

        for workers, prefetch in ((0, 0), (0, 2), (2, 0), (4, 0), (8, 0)):
            ldr = Loader(ds, cfg, shuffle=False, prefetch=prefetch,
                         num_workers=workers)
            tag = (f"{workers} procs" if workers >= 2
                   else ("1 thread" if prefetch else "serial"))
            # epoch 0 pays pool spawn + page-cache warm; epoch 1 is the
            # steady state a multi-epoch training run sees
            for epoch in range(2):
                n_items = 0
                t0 = time.perf_counter()
                for batch, meta in ldr:
                    n_items += meta.n_items
                dt = time.perf_counter() - t0
                warm = "warm" if epoch else "cold"
                print(f"{tag:10s} [{warm}]: {n_items/dt:8.1f} items/s "
                      f"({n_items} items in {dt:.2f}s)")
            ldr.close()


if __name__ == "__main__":
    main()
