"""ctypes bindings for the native event-IO library (evio.cpp), with
transparent numpy fallbacks when no compiler is available."""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_i64 = ctypes.c_int64
_i32 = ctypes.c_int32


def _build() -> Optional[Path]:
    src = _HERE / "evio.cpp"
    out = _HERE / "libevio.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(out)],
            check=True, capture_output=True, timeout=120)
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build()
        if path is not None:
            lib = ctypes.CDLL(str(path))
            u16p = np.ctypeslib.ndpointer(np.uint16, flags="C")
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
            i8p = np.ctypeslib.ndpointer(np.int8, flags="C")
            lib.window_rebase.restype = _i64
            lib.window_rebase.argtypes = [
                u16p, u16p, i64p, u8p, _i64, _i64, _i64, _i64, _i32,
                i32p, i32p, i32p, i8p, _i64]
            lib.downsample_filter.restype = _i64
            lib.downsample_filter.argtypes = [
                u16p, u16p, i64p, u8p, _i64, _i32, _i32, _i32, _i64,
                u16p, u16p, i64p, u8p]
            lib.subsample_balanced.restype = _i64
            lib.subsample_balanced.argtypes = [
                i32p, i32p, i32p, i8p, _i64, _i64, i32p, i32p, i32p, i8p]
            lib.queue_ranks.restype = None
            lib.queue_ranks.argtypes = [i32p, i32p, _i64, _i32, _i32, i32p]
            lib.zoom_subsample.restype = _i64
            lib.zoom_subsample.argtypes = [
                i32p, i32p, i8p, _i64, _i32, _i32, ctypes.c_float, u8p]
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
            lib.pool_tables.restype = None
            lib.pool_tables.argtypes = [
                i32p, u8p, _i64, _i32, _i32, _i32, i32p, _i32, f32p]
            _LIB = lib
    return _LIB


def pool_tables(pos: np.ndarray, valid: np.ndarray, grids,
                width: int, height: int,
                time_window: int) -> Optional[np.ndarray]:
    """Cascaded pooled-position tables for one item (see
    data/pool_tables.py for the contract). Returns None when the native
    library is unavailable (caller falls back to the numpy oracle)."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.int32)
    valid = np.ascontiguousarray(valid, np.uint8)
    g = np.ascontiguousarray(np.asarray(grids, np.int32).reshape(-1))
    total = int(sum(nx * ny for nx, ny in grids))
    out = np.empty((total, 4), np.float32)
    lib.pool_tables(pos, valid, len(valid), width, height, time_window,
                    g, len(grids), out)
    return out


def queue_ranks(x: np.ndarray, y: np.ndarray, width: int,
                height: int) -> np.ndarray:
    """Per-pixel recency rank (number of later events at the same pixel)."""
    x = np.ascontiguousarray(x, np.int32)
    y = np.ascontiguousarray(y, np.int32)
    n = len(x)
    lib = get_lib()
    out = np.empty(n, np.int32)
    if lib is not None:
        lib.queue_ranks(x, y, n, width, height, out)
        return out
    # numpy fallback: stable sort by pixel, rank from group end
    pix = y.astype(np.int64) * width + x
    order = np.argsort(pix, kind="stable")
    sp = pix[order]
    pos = np.arange(n)
    is_last = np.concatenate([sp[1:] != sp[:-1], [True]])
    last_pos = np.where(is_last, pos, n)
    last_pos = np.minimum.accumulate(last_pos[::-1])[::-1]
    out[order] = (last_pos - pos).astype(np.int32)
    return out


def window_rebase(events: dict, t0: int, t1: int, time_window: int,
                  height: int) -> dict:
    """Window slice + rebase + polarity map (the data layer's per-item hot
    path; see dataset.SequenceDataset.__getitem__)."""
    x = np.ascontiguousarray(events["x"], np.uint16)
    y = np.ascontiguousarray(events["y"], np.uint16)
    t = np.ascontiguousarray(events["t"], np.int64)
    p = np.ascontiguousarray(events["p"], np.uint8)
    lib = get_lib()
    n = len(t)
    if lib is not None:
        ox = np.empty(n, np.int32)
        oy = np.empty(n, np.int32)
        ot = np.empty(n, np.int32)
        op = np.empty(n, np.int8)
        m = lib.window_rebase(x, y, t, p, n, t0, t1, time_window, height,
                              ox, oy, ot, op, n)
        return dict(x=ox[:m], y=oy[:m], t=ot[:m], p=op[:m])
    # numpy fallback
    i0, i1 = np.searchsorted(t, (t0, t1))
    sel = slice(i0, i1)
    keep = y[sel] < height
    tt = t[sel][keep]
    if len(tt):
        tt = time_window + tt - tt[-1]
    return dict(x=x[sel][keep].astype(np.int32),
                y=y[sel][keep].astype(np.int32),
                t=tt.astype(np.int32),
                p=(2 * p[sel][keep].astype(np.int32) - 1).astype(np.int8))


def zoom_subsample_mask(x: np.ndarray, y: np.ndarray, p: np.ndarray,
                        width: int, height: int,
                        threshold: float) -> np.ndarray:
    """Keep-mask of the reference's density-preserving zoom-out subsample
    (augment.py:13-37 on integer positions): per-pixel signed polarity
    counter over a (height+1, width+1) grid, emit on +-threshold crossing."""
    x = np.ascontiguousarray(x, np.int32)
    y = np.ascontiguousarray(y, np.int32)
    p = np.ascontiguousarray(p, np.int8).reshape(-1)
    n = len(x)
    keep = np.zeros(n, np.uint8)
    lib = get_lib()
    if lib is not None:
        lib.zoom_subsample(x, y, p, n, width, height,
                           float(threshold), keep)
        return keep.astype(bool)
    # sequential python fallback (the oracle the C++ path is tested against)
    count = np.zeros((height + 1, width + 1), np.float32)
    for i in range(n):
        xi, yi = int(x[i]), int(y[i])
        if xi < 0 or xi > width or yi < 0 or yi > height:
            continue
        count[yi, xi] += float(p[i])
        pol = 1.0 if count[yi, xi] > 0 else -1.0
        if pol * count[yi, xi] > threshold:
            count[yi, xi] -= pol * threshold
            keep[i] = 1
    return keep.astype(bool)


def subsample_balanced(events: dict, target: int) -> dict:
    x = np.ascontiguousarray(events["x"], np.int32)
    y = np.ascontiguousarray(events["y"], np.int32)
    t = np.ascontiguousarray(events["t"], np.int32)
    p = np.ascontiguousarray(events["p"], np.int8).reshape(-1)
    lib = get_lib()
    n = len(t)
    if lib is not None and n > target:
        ox = np.empty(n, np.int32)
        oy = np.empty(n, np.int32)
        ot = np.empty(n, np.int32)
        op = np.empty(n, np.int8)
        m = lib.subsample_balanced(x, y, t, p, n, target, ox, oy, ot, op)
        return dict(x=ox[:m], y=oy[:m], t=ot[:m], p=op[:m])
    if n <= target:
        return dict(x=x, y=y, t=t, p=p)
    idx = np.linspace(0, n - 1, target).astype(np.int64)
    return dict(x=x[idx], y=y[idx], t=t[idx], p=p[idx])
