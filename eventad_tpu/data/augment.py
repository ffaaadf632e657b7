"""Graph-native data augmentations on host-side numpy items.

Reference: src/dagr/data/augment.py — RandomHFlip (:85-104), Crop (:107-136),
RandomZoom with polarity-balanced event subsampling (:13-37,139-189),
RandomCrop (:192-229), RandomTranslate (:232-269). The reference's numba
accumulator kernels become vectorized numpy here (the subsample filter keeps
the same polarity-balance semantics via per-polarity budgets).

Reference quirk preserved at the pipeline level: training uses the *testing*
transform (utils/data.py:27-30), i.e. none of the random augs run by default.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from .dataset import Item


def _flip_item(item: Item) -> Item:
    w = item.width
    item.events["x"] = (w - 1 - item.events["x"]).astype(item.events["x"].dtype)
    item.image = item.image[:, ::-1].copy()
    for attr in ("bbox", "bbox0"):
        b = getattr(item, attr)
        if len(b):
            b = b.copy()
            b[:, 0] = w - 1 - (b[:, 0] + b[:, 2])
            setattr(item, attr, b)
    return item


class RandomHFlip:
    def __init__(self, p: float = 0.5, seed: int = 0):
        self.p = p
        self.rng = np.random.RandomState(seed)

    def __call__(self, item: Item) -> Item:
        if self.rng.rand() < self.p:
            item = _flip_item(item)
        return item


def subsample_events(events: dict, target: int,
                     rng: np.random.RandomState) -> dict:
    """Polarity-balanced subsampling (reference augment.py:13-37): keep at
    most ``target`` events, balancing positive/negative counts."""
    n = len(events["t"])
    if n <= target:
        return events
    pos_mask = events["p"].reshape(-1) > 0
    n_pos = int(pos_mask.sum())
    n_neg = n - n_pos
    budget_pos = min(n_pos, target // 2 + max(0, target // 2 - n_neg))
    budget_neg = target - budget_pos
    keep = np.zeros(n, bool)
    pos_idx = np.where(pos_mask)[0]
    neg_idx = np.where(~pos_mask)[0]
    keep[rng.choice(pos_idx, budget_pos, replace=False)] = True
    keep[rng.choice(neg_idx, min(budget_neg, n_neg), replace=False)] = True
    return {k: v[keep] for k, v in events.items()}


class RandomZoom:
    """Zoom in/out around the image center; events outside are dropped,
    density preserved via subsampling on zoom-in (reference :139-189)."""

    def __init__(self, max_zoom: float = 1.5, p: float = 0.5, seed: int = 0,
                 subsample: bool = True):
        self.max_zoom = max_zoom
        self.p = p
        self.subsample = subsample
        self.rng = np.random.RandomState(seed)

    def __call__(self, item: Item) -> Item:
        if self.rng.rand() >= self.p:
            return item
        z = 1.0 + self.rng.rand() * (self.max_zoom - 1.0)
        w, h = item.width, item.height
        cx, cy = w / 2.0, h / 2.0
        n0 = len(item.events["t"])
        ex = (item.events["x"] - cx) * z + cx
        ey = (item.events["y"] - cy) * z + cy
        ok = (ex >= 0) & (ex < w) & (ey >= 0) & (ey < h)
        item.events = {k: (v[ok] if k != "x" and k != "y" else None)
                       for k, v in item.events.items()}
        item.events["x"] = ex[ok].astype(np.int32)
        item.events["y"] = ey[ok].astype(np.int32)
        if self.subsample and len(item.events["t"]) > n0:
            item.events = subsample_events(item.events, n0, self.rng)
        import cv2
        m = np.float32([[z, 0, cx * (1 - z)], [0, z, cy * (1 - z)]])
        item.image = cv2.warpAffine(item.image, m, (w, h))
        for attr in ("bbox", "bbox0"):
            b = getattr(item, attr)
            if len(b):
                b = b.copy()
                b[:, 0] = (b[:, 0] - cx) * z + cx
                b[:, 1] = (b[:, 1] - cy) * z + cy
                b[:, 2:4] *= z
                # clip to image
                x2 = np.clip(b[:, 0] + b[:, 2], 0, w - 1)
                y2 = np.clip(b[:, 1] + b[:, 3], 0, h - 1)
                b[:, 0] = np.clip(b[:, 0], 0, w - 1)
                b[:, 1] = np.clip(b[:, 1], 0, h - 1)
                b[:, 2] = x2 - b[:, 0]
                b[:, 3] = y2 - b[:, 1]
                setattr(item, attr, b)
        return item


class RandomTranslate:
    def __init__(self, max_frac: float = 0.1, p: float = 0.5, seed: int = 0):
        self.max_frac = max_frac
        self.p = p
        self.rng = np.random.RandomState(seed)

    def __call__(self, item: Item) -> Item:
        if self.rng.rand() >= self.p:
            return item
        w, h = item.width, item.height
        dx = int((self.rng.rand() * 2 - 1) * self.max_frac * w)
        dy = int((self.rng.rand() * 2 - 1) * self.max_frac * h)
        ex = item.events["x"] + dx
        ey = item.events["y"] + dy
        ok = (ex >= 0) & (ex < w) & (ey >= 0) & (ey < h)
        item.events = {k: v[ok] for k, v in item.events.items()}
        item.events["x"] = ex[ok].astype(np.int32)
        item.events["y"] = ey[ok].astype(np.int32)
        item.image = np.roll(np.roll(item.image, dy, axis=0), dx, axis=1)
        for attr in ("bbox", "bbox0"):
            b = getattr(item, attr)
            if len(b):
                b = b.copy()
                b[:, 0] = np.clip(b[:, 0] + dx, 0, w - 1)
                b[:, 1] = np.clip(b[:, 1] + dy, 0, h - 1)
                setattr(item, attr, b)
        return item


class Compose:
    def __init__(self, transforms: List):
        self.transforms = transforms

    def __call__(self, item: Item) -> Item:
        for t in self.transforms:
            item = t(item)
        return item


def training_transform(cfg, seed: int = 0) -> Compose:
    return Compose([
        RandomHFlip(cfg.aug_p_flip, seed),
        RandomZoom(cfg.aug_zoom, seed=seed + 1),
        RandomTranslate(cfg.aug_trans, seed=seed + 2),
    ])


def testing_transform(cfg) -> Optional[Compose]:
    """The reference test transform is Crop-only (augment.py:272-284); our
    dataset already crops/resizes in preprocessing, so this is identity."""
    return None
