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
import os
from typing import Iterator, List, NamedTuple, Optional, Sequence

import numpy as np

import ml_dtypes

from ..config import Config
from .dataset import Item

_BF16 = ml_dtypes.bfloat16


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
    # host-precomputed pooled-position tables [B, sum_l nx*ny, 4]
    # (data/pool_tables.py) — parameter-independent halves of the voxel
    # poolings, computed while the batch is assembled like `rank`
    pool_tables: np.ndarray = None
    # host-staged kernel-native inputs (pure reformatting of fields above;
    # the device programs fall back to deriving them when None):
    # per-chunk temporal search bounds for the Pallas neighbour search at
    # Config.search_chunk (ops/event_graph_pallas.chunk_starts_host)
    search_starts: np.ndarray = None   # [B, ceil(N/chunk)] int32
    # space-to-depth bf16 image for the CNN stem (resnet.s2d_format of the
    # bf16-cast image — bit-identical input to the device-side formatting),
    # shipped NCHW so the staged device array keeps a clean tiling
    image_s2d: np.ndarray = None       # [B, 12, H/2, W/2] bfloat16


@dataclasses.dataclass
class BatchMeta:
    """Host-side metadata the metrics pipeline needs."""
    sequences: List[str]
    frame_ids: List[int]
    n_items: int
    # events dropped because an item overflowed the largest padding bucket
    # (most recent kept); surfaced so truncation is never silent
    truncated_events: int = 0


# raw-detection slots per item; single source of truth for both the batch
# arrays (collate) and the shared-memory slot layout (_batch_specs) — the
# two desynchronizing would shape-mismatch np.copyto in the decode workers
MAX_DETECTIONS = 64


def _batch_specs(cfg, n_cap: int, d: int = MAX_DETECTIONS):
    """(field, dtype, shape) of every EventBatch array at a given bucket."""
    b, s = cfg.batch_size, cfg.max_boxes + 1
    h, w = cfg.model_height, cfg.model_width
    return [
        ("pos", np.int32, (b, n_cap, 3)),
        ("polarity", np.float32, (b, n_cap)),
        ("valid", np.bool_, (b, n_cap)),
        ("rank", np.int32, (b, n_cap)),
        ("image", np.float32, (b, h, w, 3)),
        ("boxes", np.float32, (b, 2, s, 4)),
        ("box_present", np.bool_, (b, 2, s)),
        ("box_labels", np.int32, (b, s)),
        ("bbox", np.float32, (b, d, 6)),
        ("bbox_mask", np.bool_, (b, d)),
        ("bbox0", np.float32, (b, d, 6)),
        ("bbox0_mask", np.bool_, (b, d)),
        ("pool_tables", np.float32,
         (b, sum(nx * ny for nx, ny in cfg.grid_dims()), 4)),
        ("search_starts", np.int32, (b, -(-n_cap // cfg.search_chunk))),
    ] + ([("image_s2d", _BF16, (b, 12, h // 2, w // 2))]
         if h % 2 == 0 and w % 2 == 0 else [])


def _slot_layout(cfg):
    """Field -> (offset, dtype, max_shape) within one shared-memory slot,
    sized for the largest event bucket."""
    specs = _batch_specs(cfg, cfg.event_buckets[-1])
    layout, off = {}, 0
    for name, dt, shape in specs:
        nbytes = int(np.prod(shape)) * np.dtype(dt).itemsize
        layout[name] = (off, dt, shape)
        off += -(-nbytes // 128) * 128     # keep fields 128B-aligned
    return layout, off


def _slot_views(buf, layout, n_cap, search_chunk):
    """numpy views into a slot for the actual bucket size ``n_cap``."""
    views = {}
    for name, (off, dt, shape) in layout.items():
        a = np.ndarray(shape, dtype=dt, buffer=buf, offset=off)
        if name in ("pos", "polarity", "valid", "rank"):
            a = a[:, :n_cap]
        elif name == "search_starts":
            # chunk count follows the bucket; layout sized for the largest
            a = a[:, :-(-n_cap // search_chunk)]
        views[name] = a
    return views


def _decode_worker(ds, cfg, shm_names, taskq, freeq, outq):
    """Persistent decode worker (module-level so "spawn" can pickle it by
    reference). Loops on ``taskq`` tasks ``(batch_idx, item_indices)``,
    decodes+collates into a free shared-memory slot and sends only
    ``(batch_idx, slot, n_cap, meta)`` — queue pipes on this class of VM
    move ~23 MB/s, far below what the chip consumes, so the arrays ride
    shared memory. A ``None`` task shuts the worker down. Decode errors are
    reported as ``(None, 0, 0, exception)`` and the worker keeps serving."""
    from multiprocessing import shared_memory, resource_tracker
    shms = []
    try:
        layout, _ = _slot_layout(cfg)
        for nm in shm_names:
            shm = shared_memory.SharedMemory(name=nm)
            # the parent owns the segments; stop the child's tracker from
            # double-unlinking them at exit
            try:
                resource_tracker.unregister(shm._name, "shared_memory")
            except Exception:
                pass
            shms.append(shm)
        while True:
            task = taskq.get()
            if task is None:
                break
            ep, i, idx = task
            try:
                items = [ds[int(j)] for j in idx]
                batch, meta = collate(items, cfg)
                slot = freeq.get()
                try:
                    views = _slot_views(shms[slot].buf, layout,
                                        batch.pos.shape[1],
                                        cfg.search_chunk)
                    for name, arr in batch._asdict().items():
                        if arr is None:
                            continue   # optional field absent (odd geometry)
                        np.copyto(views[name], arr)
                except BaseException:
                    # never leak the slot: a copy failure would otherwise
                    # permanently shrink the pool
                    freeq.put(slot)
                    raise
                outq.put((ep, i, slot, batch.pos.shape[1], meta))
            except BaseException as e:
                outq.put((ep, None, 0, 0, e))
    finally:
        for shm in shms:
            shm.close()


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


def staged_inputs(pos: np.ndarray, image: np.ndarray, cfg: Config):
    """Host-staged kernel-native inputs (EventBatch.search_starts /
    .image_s2d): pure reformatting of ``pos``/``image`` the device would
    otherwise do per step (a searchsorted while-loop of ~15 index gathers;
    the sub-lane-shaped cast+space-to-depth relayout of the image)."""
    from ..ops.event_graph_pallas import chunk_starts_host, effective_chunk
    n = pos.shape[1]
    chunk = effective_chunk(cfg.search_chunk, n)
    starts = chunk_starts_host(pos[:, :, 2], chunk, cfg.delta_t_us)
    s2d = None
    if image.shape[1] % 2 == 0 and image.shape[2] % 2 == 0:
        from ..models.resnet import s2d_format
        # shipped NCHW [B, 12, H/2, W/2]: bf16 arrays whose trailing dims
        # are smaller than the (8, 128) tile get a transposed default
        # device layout (the transfer itself relayouts) — with the spatial
        # dims trailing, the staged array keeps a clean row-major tiling
        s2d = np.ascontiguousarray(
            s2d_format(image.astype(_BF16)).transpose(0, 3, 1, 2))
    return starts, s2d


def collate(items: List[Item], cfg: Config,
            max_detections: int = MAX_DETECTIONS) -> tuple:
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
    truncated = 0
    for b, it in enumerate(items[:bsz]):
        n = min(len(it.events["t"]), n_cap)
        truncated += len(it.events["t"]) - n
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

    from .pool_tables import batch_pool_tables
    tables = batch_pool_tables(pos, valid, cfg.grid_dims(), w, h,
                               cfg.time_window_us)
    starts, s2d = staged_inputs(pos, image, cfg)
    batch = EventBatch(pos, pol, valid, rank, image, boxes, present,
                       labels, bbox, bbox_m, bbox0, bbox0_m, tables,
                       starts, s2d)
    return batch, BatchMeta(seqs, fids, len(items[:bsz]), truncated)


class Loader:
    """Host loader: sequential or shuffled batching with thread prefetch and
    optional multi-process decode (replaces torch ``DataLoader`` with
    ``num_workers=4``, reference config/eventad_config.py:121).

    ``num_workers >= 2`` spawns a persistent pool of decode processes
    (decode + collate per batch, results via shared-memory slots); the
    parent reorders and yields in batch order. The dataset pickles with
    its h5 handles dropped and each worker reopens its own.
    """

    def __init__(self, dataset, cfg: Config, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False,
                 prefetch: int = 2, num_workers: Optional[int] = None):
        self.ds = dataset
        self.cfg = cfg
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        requested = cfg.num_workers if num_workers is None else num_workers
        # more decode processes than cores only adds overhead; on a 1-CPU
        # host this degrades to the prefetch thread
        self.num_workers = min(requested, os.cpu_count() or 1) \
            if num_workers is None else requested
        self._epoch = 0
        self.truncated_events = 0   # running counter, never silent
        self._warned_truncation = False

    def _note_truncation(self, meta: "BatchMeta"):
        self.truncated_events += meta.truncated_events
        if meta.truncated_events and not self._warned_truncation:
            import warnings
            warnings.warn(
                f"event window exceeded the largest padding bucket "
                f"({self.cfg.event_buckets[-1]}); dropped "
                f"{meta.truncated_events} oldest events (counter on "
                f"Loader.truncated_events)")
            self._warned_truncation = True

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
        order = self._order()
        self._epoch += 1
        n_batches = len(self)
        # process decode only when there is enough work to amortize the
        # spawn cost; small/synthetic epochs stay on the prefetch thread
        if self.num_workers >= 2 and n_batches >= 2 * self.num_workers:
            it = self._iter_processes(order, n_batches)
        elif self.prefetch > 0:
            it = self._iter_thread(order, n_batches)
        else:
            it = self._iter_serial(order, n_batches)
        for batch, meta in it:
            self._note_truncation(meta)
            yield batch, meta

    def _chunk(self, order, i):
        b = self.cfg.batch_size
        return order[i * b:(i + 1) * b]

    def _iter_serial(self, order, n_batches):
        for i in range(n_batches):
            items = [self.ds[int(j)] for j in self._chunk(order, i)]
            yield collate(items, self.cfg)

    def _iter_thread(self, order, n_batches):
        import queue
        import threading

        def produce(q):
            try:
                for out in self._iter_serial(order, n_batches):
                    q.put(out)
                q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)

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

    def _ensure_pool(self):
        """Lazily spawn the persistent decode pool (spawn costs seconds on
        this class of VM — pay it once per Loader, not per epoch)."""
        if getattr(self, "_pool", None) is not None:
            return self._pool
        import multiprocessing as mp
        from multiprocessing import shared_memory
        ctx = mp.get_context("spawn")
        nw = self.num_workers
        layout, slot_bytes = _slot_layout(self.cfg)
        n_slots = 2 * nw + 2
        shms = [shared_memory.SharedMemory(create=True, size=slot_bytes)
                for _ in range(n_slots)]
        taskq = ctx.Queue()
        freeq = ctx.Queue()
        for s in range(n_slots):
            freeq.put(s)
        outq = ctx.Queue()
        procs = [ctx.Process(target=_decode_worker,
                             args=(self.ds, self.cfg,
                                   [m.name for m in shms], taskq, freeq,
                                   outq),
                             daemon=True)
                 for _ in range(nw)]
        # the axon sitecustomize registers a TPU tunnel session in EVERY
        # python process when this var is set (~12 s startup + it would
        # contend for the single tunnel); decode workers must not
        saved_axon = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        try:
            for p in procs:
                p.start()
        finally:
            if saved_axon is not None:
                os.environ["PALLAS_AXON_POOL_IPS"] = saved_axon
        self._pool = dict(procs=procs, shms=shms, layout=layout,
                          taskq=taskq, freeq=freeq, outq=outq)
        return self._pool

    def close(self):
        """Shut down the persistent decode pool (idempotent)."""
        pool = getattr(self, "_pool", None)
        if pool is None:
            return
        self._pool = None
        for _ in pool["procs"]:
            try:
                pool["taskq"].put(None)
            except Exception:
                pass
        for p in pool["procs"]:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        for m in pool["shms"]:
            m.close()
            try:
                m.unlink()
            except FileNotFoundError:
                pass

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _iter_processes(self, order, n_batches):
        pool = self._ensure_pool()
        # epoch tag: results of an abandoned earlier epoch (caller broke out
        # of the iterator) are drained, their slots recycled
        ep = self._epoch
        for i in range(n_batches):
            pool["taskq"].put((ep, i,
                               [int(j) for j in self._chunk(order, i)]))
        import queue as _queue
        pending: dict = {}
        nxt = 0
        while nxt < n_batches:
            if nxt in pending:
                yield pending.pop(nxt)
                nxt += 1
                continue
            try:
                rep, i, slot, n_cap, meta = pool["outq"].get(timeout=30)
            except _queue.Empty:
                # liveness check: a worker killed by the OS (OOM) would
                # otherwise block the consumer forever
                dead = [p for p in pool["procs"] if not p.is_alive()]
                if dead:
                    raise RuntimeError(
                        f"{len(dead)} decode worker(s) died "
                        f"(exitcodes {[p.exitcode for p in dead]})")
                continue
            if i is None:
                if rep == ep:
                    raise meta
                continue                     # stale-epoch error: drop
            if rep != ep:
                pool["freeq"].put(slot)      # stale-epoch result: recycle
                continue
            views = _slot_views(pool["shms"][slot].buf, pool["layout"],
                                n_cap, self.cfg.search_chunk)
            batch = EventBatch(**{k: np.array(v)
                                  for k, v in views.items()})
            pool["freeq"].put(slot)
            pending[i] = (batch, meta)
