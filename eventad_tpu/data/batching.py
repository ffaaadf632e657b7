"""Batch assembly: padded event buckets + track-slot tensors.

The reference relies on torch_geometric's ragged ``Batch`` +
``DataLoader(follow_batch=['bbox', 'bbox0'])`` (utils/base.py:97-132); TPU
needs static shapes, so a batch is:

* events padded to the smallest bucket that fits the largest item
  (bounded set of jit signatures),
* boxes scattered into ``max_boxes+1`` track slots per frame (the dense form
  the vectorized anomaly head consumes),
* plus fixed-size raw bbox lists for detection metrics.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, List, NamedTuple, Optional, Sequence

import numpy as np

from ..config import Config
from .dataset import Item


class EventBatch(NamedTuple):
    """Device-side batch (all arrays static shape)."""
    pos: np.ndarray          # [B, N, 3] int32 (x, y, t_us)
    polarity: np.ndarray     # [B, N] float32 +-1
    valid: np.ndarray        # [B, N] bool
    rank: np.ndarray         # [B, N] int32 per-pixel recency rank (host-
                             # computed by the native evio path; the device
                             # kernels consume it directly)
    image: np.ndarray        # [B, H, W, 3] float32 in [0,1]
    # slotted boxes for the anomaly head (slot = track id 0..max_boxes)
    boxes: np.ndarray        # [B, 2, S, 4] float32 xywh pixels
    box_present: np.ndarray  # [B, 2, S] bool
    box_labels: np.ndarray   # [B, S] int32 class of current-frame slot
    # raw lists for detection / metrics paths
    bbox: np.ndarray         # [B, D, 6] float32
    bbox_mask: np.ndarray    # [B, D] bool
    bbox0: np.ndarray        # [B, D, 6]
    bbox0_mask: np.ndarray   # [B, D]


@dataclasses.dataclass
class BatchMeta:
    """Host-side metadata the metrics pipeline needs."""
    sequences: List[str]
    frame_ids: List[int]
    n_items: int


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _slot_boxes(bbox: np.ndarray, max_boxes: int):
    """First box per track id -> slot arrays (EventAD.py:237-239 takes the
    first matching bbox index)."""
    s = max_boxes + 1
    out = np.zeros((s, 4), np.float32)
    present = np.zeros((s,), bool)
    labels = np.zeros((s,), np.int32)
    for row in bbox:
        tid = int(row[5])
        if tid < 1 or tid > max_boxes or present[tid]:
            continue
        out[tid] = row[:4]
        present[tid] = True
        labels[tid] = int(row[4])
    return out, present, labels


def collate(items: List[Item], cfg: Config,
            max_detections: int = 64) -> tuple:
    """Pads a list of Items into an EventBatch + BatchMeta."""
    bsz = cfg.batch_size
    s = cfg.max_boxes + 1
    n_max = max((len(it.events["t"]) for it in items), default=1)
    n_cap = pick_bucket(max(n_max, 1), cfg.event_buckets)
    h, w = cfg.model_height, cfg.model_width

    pos = np.zeros((bsz, n_cap, 3), np.int32)
    pol = np.zeros((bsz, n_cap), np.float32)
    valid = np.zeros((bsz, n_cap), bool)
    rank = np.full((bsz, n_cap), 2**30, np.int32)
    image = np.zeros((bsz, h, w, 3), np.float32)
    boxes = np.zeros((bsz, 2, s, 4), np.float32)
    present = np.zeros((bsz, 2, s), bool)
    labels = np.zeros((bsz, s), np.int32)
    bbox = np.zeros((bsz, max_detections, 6), np.float32)
    bbox_m = np.zeros((bsz, max_detections), bool)
    bbox0 = np.zeros((bsz, max_detections, 6), np.float32)
    bbox0_m = np.zeros((bsz, max_detections), bool)

    seqs, fids = [], []
    for b, it in enumerate(items[:bsz]):
        n = min(len(it.events["t"]), n_cap)
        # keep the most recent events when over budget (the reference's
        # sliding window favours recency)
        sl = slice(len(it.events["t"]) - n, len(it.events["t"]))
        pos[b, :n, 0] = it.events["x"][sl]
        pos[b, :n, 1] = it.events["y"][sl]
        pos[b, :n, 2] = it.events["t"][sl]
        pol[b, :n] = it.events["p"][sl].astype(np.float32).reshape(-1)
        valid[b, :n] = True
        from .. import native
        rank[b, :n] = native.queue_ranks(pos[b, :n, 0], pos[b, :n, 1],
                                         w, h)
        image[b] = it.image.astype(np.float32) / 255.0
        b1, p1, l1 = _slot_boxes(it.bbox, cfg.max_boxes)
        b0, p0, _ = _slot_boxes(it.bbox0, cfg.max_boxes)
        boxes[b, 1], present[b, 1], labels[b] = b1, p1, l1
        boxes[b, 0], present[b, 0] = b0, p0
        d1 = min(len(it.bbox), max_detections)
        bbox[b, :d1] = it.bbox[:d1]
        bbox_m[b, :d1] = True
        d0 = min(len(it.bbox0), max_detections)
        bbox0[b, :d0] = it.bbox0[:d0]
        bbox0_m[b, :d0] = True
        seqs.append(it.sequence)
        fids.append(it.frame_id)

    batch = EventBatch(pos, pol, valid, rank, image, boxes, present,
                       labels, bbox, bbox_m, bbox0, bbox0_m)
    return batch, BatchMeta(seqs, fids, len(items[:bsz]))


class Loader:
    """Minimal host loader: sequential or shuffled batching with optional
    thread prefetch (replaces torch DataLoader workers)."""

    def __init__(self, dataset, cfg: Config, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False,
                 prefetch: int = 2):
        self.ds = dataset
        self.cfg = cfg
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.ds)
        b = self.cfg.batch_size
        return n // b if self.drop_last else -(-n // b)

    def _order(self):
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[tuple]:
        import queue
        import threading

        order = self._order()
        self._epoch += 1
        b = self.cfg.batch_size
        n_batches = len(self)

        def produce(q):
            try:
                for i in range(n_batches):
                    chunk = order[i * b:(i + 1) * b]
                    items = [self.ds[int(j)] for j in chunk]
                    q.put(collate(items, self.cfg))
                q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)

        if self.prefetch > 0:
            q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
            th = threading.Thread(target=produce, args=(q,), daemon=True)
            th.start()
            while True:
                out = q.get()
                if out is None:
                    break
                if isinstance(out, BaseException):
                    raise out
                yield out
        else:
            for i in range(n_batches):
                chunk = order[i * b:(i + 1) * b]
                items = [self.ds[int(j)] for j in chunk]
                yield collate(items, self.cfg)
