"""Sequence dataset: image pairs + event windows + tracks.

Mirrors the reference ``DSEC`` dataset (src/dagr/data/dsec_data.py:51-192)
on the same on-disk layout (one directory per sequence):

    <root>/<sequence>/
        events/left/events_2x.h5            (events + ms_to_idx)
        images/left/rectified/NNNNN.png     (20 fps frames)
        images/timestamps.txt               (us timestamp per frame)
        object_detections/left/tracks.npy   (TRACK_DTYPE structured array)

One item = consecutive image pair (i, i+1): tracks at both timestamps,
image i, and the events of the window ending at image i+1
(dsec_data.py:139-181). Event timestamps are rebased so the window ends at
``time_window`` (preprocess_events, dsec_data.py:124-130) and polarity is
mapped to +-1.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import yaml

from ..config import Config
from .h5io import EventFile
from .tracks import (DEFAULT_MAPPING, DSEC_CLASSES, compute_class_mapping,
                     filter_small_bboxes, interpolate_tracks,
                     preprocess_tracks, tracks_to_array)


@dataclasses.dataclass
class SequenceDir:
    root: Path

    @property
    def name(self):
        return self.root.name

    @property
    def event_file(self):
        return self.root / "events/left/events_2x.h5"

    @property
    def image_dir(self):
        return self.root / "images/left/rectified"

    @property
    def timestamps_file(self):
        return self.root / "images/timestamps.txt"

    @property
    def tracks_file(self):
        return self.root / "object_detections/left/tracks.npy"


@dataclasses.dataclass
class Item:
    """One training/eval sample (host-side, numpy)."""
    events: Dict[str, np.ndarray]      # x, y int; t int us in [0, Tw]; p +-1
    image: np.ndarray                  # [H, W, 3] uint8
    bbox: np.ndarray                   # [n, 6] x,y,w,h,class,track (frame i+1)
    bbox0: np.ndarray                  # [m, 6] (frame i)
    sequence: str
    frame_id: int
    width: int
    height: int
    time_window: int


def load_split(split_yaml: str) -> Dict[str, List[str]]:
    with open(split_yaml) as f:
        return yaml.safe_load(f)


class SequenceDataset:
    def __init__(self, cfg: Config, root: Path, split: str,
                 transform=None, classes=("car", "pedestrian"),
                 min_bbox_height: float = 0, min_bbox_diag: float = 0,
                 all_classes: Sequence[str] = DSEC_CLASSES,
                 mapping: Optional[dict] = None):
        self.cfg = cfg
        root = Path(root)
        self.scale = cfg.scale
        self.time_window = cfg.time_window_us
        self.num_us = -1
        self.no_eval = cfg.no_eval
        self.transform = transform
        self.min_bbox_height = min_bbox_height
        self.min_bbox_diag = min_bbox_diag
        self.remap = compute_class_mapping(classes, all_classes,
                                           mapping or DEFAULT_MAPPING)

        # A dangling split file must be a hard error: silently degrading to
        # "every subdirectory" (the round-1 behavior) would evaluate on
        # train sequences without warning. split="" explicitly opts into
        # the all-directories mode.
        if cfg.split:
            if not Path(cfg.split).exists():
                raise FileNotFoundError(
                    f"split file {cfg.split!r} does not exist; pass "
                    f"--split '' to use every subdirectory of {root}")
            split_cfg = load_split(cfg.split)
            if split not in split_cfg:
                raise KeyError(
                    f"split {split!r} not in {cfg.split!r} "
                    f"(has: {sorted(split_cfg)})")
            names = list(split_cfg[split])
            self.dirs = [SequenceDir(root / n) for n in names
                         if (root / n).exists()]
        else:
            self.dirs = [SequenceDir(p) for p in sorted(root.iterdir())
                         if p.is_dir()]

        self._events: Dict[str, EventFile] = {}
        self._tracks: Dict[str, np.ndarray] = {}
        self._timestamps: Dict[str, np.ndarray] = {}
        self.index: List[tuple] = []   # (seq_idx, image_index_0)
        for si, d in enumerate(self.dirs):
            ts = np.loadtxt(d.timestamps_file, dtype=np.int64, ndmin=1)
            self._timestamps[d.name] = ts
            self._tracks[d.name] = np.load(d.tracks_file)
            for i in range(len(ts) - 1):
                self.index.append((si, i))

        # model geometry: dims are derived from the sensor size like
        # dsec_data.py:83-84 (width // scale)
        self.width = cfg.model_width
        self.height = cfg.model_height

    def __len__(self):
        return len(self.index)

    def set_num_us(self, num_us: int):
        self.num_us = num_us

    def _event_file(self, name: str, d: SequenceDir) -> EventFile:
        if name not in self._events:
            self._events[name] = EventFile(d.event_file)
        return self._events[name]

    def _preloaded_events(self, name: str, d: SequenceDir):
        """Whole-sequence event arrays held in RAM; per-item windows are
        then cut by the native C++ path (eventad_tpu.native.window_rebase)
        instead of per-item h5 reads."""
        if not hasattr(self, "_preload_cache"):
            self._preload_cache = {}
        if name not in self._preload_cache:
            ef = self._event_file(name, d)
            self._preload_cache[name] = (
                {k: ef.f[f"events/{k}"][:] for k in "xytp"}, ef.t_offset)
        return self._preload_cache[name]

    def _tracks_at(self, name: str, t_us: int) -> np.ndarray:
        tr = self._tracks[name]
        return tr[tr["t"] == t_us]

    def _load_image(self, d: SequenceDir, idx: int) -> np.ndarray:
        import cv2
        path = d.image_dir / f"{idx:06d}.png"
        img = cv2.imread(str(path))
        if img is None:
            img = np.zeros((self.height * self.scale,
                            self.width * self.scale, 3), np.uint8)
        img = img[:self.scale * self.height]
        img = cv2.resize(img, (self.width, self.height),
                         interpolation=cv2.INTER_CUBIC)
        return img

    def __getitem__(self, idx: int) -> Item:
        si, i0 = self.index[idx]
        d = self.dirs[si]
        name = d.name
        ts = self._timestamps[name]
        t0, t1 = int(ts[i0]), int(ts[i0 + 1])

        det0 = self._tracks_at(name, t0)
        det1 = self._tracks_at(name, t1)
        det0 = preprocess_tracks(det0, self.scale, self.width, self.height,
                                 self.remap)
        det1 = preprocess_tracks(det1, self.scale, self.width, self.height,
                                 self.remap)

        image = self._load_image(d, i0)

        t1_eff = t0 + self.num_us if self.num_us >= 0 else t1
        if self.num_us >= 0 and not self.no_eval:
            det1 = interpolate_tracks(det0, det1, t1_eff)

        if getattr(self, "preload_events", True):
            # native hot path: slice + rebase + polarity map in C++
            from .. import native
            raw, toff = self._preloaded_events(name, d)
            ev = native.window_rebase(raw, t0 - toff, t1_eff - toff,
                                      self.time_window, self.height)
        else:
            ef = self._event_file(name, d)
            toff = ef.t_offset
            ev = ef.load_window(t0 - toff, t1_eff - toff)
            # preprocess_events (dsec_data.py:124-130): keep y < height,
            # rebase t so the window ends at time_window, polarity -> +-1
            mask = ev["y"] < self.height
            ev = {k: v[mask] for k, v in ev.items()}
            t = ev["t"].astype(np.int64)
            if len(t) > 0:
                t = self.time_window + t - t[-1]
            ev = dict(x=ev["x"].astype(np.int32),
                      y=ev["y"].astype(np.int32), t=t.astype(np.int32),
                      p=(2 * ev["p"].astype(np.int32) - 1).astype(np.int8))

        bbox = tracks_to_array(det1)
        bbox0 = tracks_to_array(det0)

        item = Item(events=ev, image=image, bbox=bbox, bbox0=bbox0,
                    sequence=name, frame_id=i0 + 1, width=self.width,
                    height=self.height, time_window=self.time_window)
        if self.transform is not None:
            item = self.transform(item)
        # drop degenerate boxes (dsec_data.py:175-179)
        for attr in ("bbox", "bbox0"):
            b = getattr(item, attr)
            if len(b):
                keep = filter_small_bboxes(b[:, 2], b[:, 3],
                                           self.min_bbox_height,
                                           self.min_bbox_diag)
                setattr(item, attr, b[keep])
        return item


def check_dataset_balance(loaders) -> dict:
    """Class-balance report over loaders (reference utils/data.py:67-96:
    counts normal/anomaly boxes and their ratio; invocation commented out at
    reference train.py:66)."""
    import numpy as np
    out = {}
    for name, loader in loaders.items():
        normal = anomaly = 0
        for batch, _meta in loader:
            labels = batch.bbox[batch.bbox_mask][:, 4]
            anomaly += int((labels > 0.5).sum())
            normal += int((labels <= 0.5).sum())
        total = max(normal + anomaly, 1)
        out[name] = dict(normal=normal, anomaly=anomaly,
                         anomaly_ratio=anomaly / total)
        print(f"{name}: normal {normal}, anomaly {anomaly} "
              f"({anomaly / total:.1%})")
    return out
