"""In-memory synthetic batches (no file IO) for benchmarks and dry-runs."""
from __future__ import annotations

import numpy as np

from ..config import Config
from .batching import EventBatch


def make_synthetic_batch(cfg: Config, seed: int = 0,
                         events_per_item: int = None,
                         boxes_per_item: int = 4) -> EventBatch:
    rng = np.random.RandomState(seed)
    b = cfg.batch_size
    w, h = cfg.model_width, cfg.model_height
    n = events_per_item or cfg.event_buckets[0]
    s = cfg.max_boxes + 1
    d = 64

    x = rng.randint(0, w, (b, n)).astype(np.int32)
    y = rng.randint(0, h, (b, n)).astype(np.int32)
    t = np.sort(rng.randint(0, cfg.time_window_us, (b, n)), axis=1) \
        .astype(np.int32)
    pos = np.stack([x, y, t], axis=-1)
    pol = rng.choice([-1.0, 1.0], (b, n)).astype(np.float32)
    valid = np.ones((b, n), bool)
    from .. import native
    rank = np.stack([native.queue_ranks(x[i], y[i], w, h)
                     for i in range(b)])
    image = rng.rand(b, h, w, 3).astype(np.float32)

    boxes = np.zeros((b, 2, s, 4), np.float32)
    present = np.zeros((b, 2, s), bool)
    labels = np.zeros((b, s), np.int32)
    bbox = np.zeros((b, d, 6), np.float32)
    bbox_m = np.zeros((b, d), bool)
    bbox0 = np.zeros((b, d, 6), np.float32)
    bbox0_m = np.zeros((b, d), bool)
    for bi in range(b):
        for k in range(boxes_per_item):
            tid = k + 1
            bw, bh = rng.randint(8, max(w // 4, 9)), rng.randint(8, max(h // 4, 9))
            bx = rng.randint(0, max(w - bw, 1))
            by = rng.randint(0, max(h - bh, 1))
            cls = int(rng.rand() > 0.7)
            for f in range(2):
                boxes[bi, f, tid] = (bx, by, bw, bh)
                present[bi, f, tid] = True
            labels[bi, tid] = cls
            bbox[bi, k] = (bx, by, bw, bh, cls, tid)
            bbox_m[bi, k] = True
            bbox0[bi, k] = (bx, by, bw, bh, cls, tid)
            bbox0_m[bi, k] = True
    from .pool_tables import batch_pool_tables
    tables = batch_pool_tables(pos, valid, cfg.grid_dims(), w, h,
                               cfg.time_window_us)
    from .batching import staged_inputs
    starts, s2d = staged_inputs(pos, image, cfg)
    return EventBatch(pos, pol, valid, rank, image, boxes, present,
                      labels, bbox, bbox_m, bbox0, bbox0_m, tables,
                      starts, s2d)
