"""Host-side pooled-position tables.

The position half of voxel pooling (ops/pooling.pool_graph) is
parameter-independent: per-cell position sums and member counts depend only
on the raw event stream, so the whole cascade (level 1 cells from event
positions, level l+1 cells from level-l pooled positions) can be computed
on the host while the batch is assembled and shipped with it — like the
per-pixel recency ranks (native/evio.cpp).  On TPU that deletes one
per-index-bound add-scatter per pooled level from the forward
(~0.67 ms at event scale, see tools/trace_forward.py).

Exactness contract with the device path: every arithmetic step here is the
same f32 operation `pool_graph` performs (divide-by-size normalization,
clip, floor-cell assignment, pixel rounding), and the sums accumulate in
event order — the order the numpy test oracle uses.  The division
psum/count and the pixel rounding are NOT performed here for the tables
themselves; `pool_graph` keeps doing those on device, so the downstream
graph is bit-identical to a device-scatter run up to scatter summation
order.  Mirrors the clustering of the reference Pooling module
(src/dagr/model/layers/pooling.py:19-49).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

_CLIP_HI = np.float32(0.9999999)   # pool_graph's clip constant
_EPS = np.float32(1e-5)            # _round_to_pixel epsilon


def _cells(posn: np.ndarray, nx: int, ny: int) -> np.ndarray:
    """f32 position -> cell index, replicating pool_graph exactly."""
    pc = np.clip(posn, np.float32(0.0), _CLIP_HI)
    ix = np.floor(pc[:, 0] * np.float32(nx)).astype(np.int32)
    iy = np.floor(pc[:, 1] * np.float32(ny)).astype(np.int32)
    return iy * nx + ix


def _round_to_pixel(p: np.ndarray, size: int) -> np.ndarray:
    return (np.floor((p + _EPS) * np.float32(size))
            / np.float32(size)).astype(np.float32)


def item_pool_tables(pos_int: np.ndarray, valid: np.ndarray,
                     grids: Sequence[Tuple[int, int]],
                     width: int, height: int,
                     time_window: int) -> List[np.ndarray]:
    """Cascaded per-level position tables for ONE item.

    Args:
      pos_int: ``[N, 3]`` int32 (x, y, t_us) raw events.
      valid: ``[N]`` bool.
      grids: (nx, ny) per pooled level (cfg.grid_dims()).
    Returns one ``[nx*ny, 4]`` f32 array per level: columns
    ``[sum_x, sum_y, sum_t, count]`` over the member nodes of each cell.

    The native path (evio.cpp pool_tables) runs the same loop ~100x faster
    than ``np.add.at``; :func:`item_pool_tables_np` is its tested oracle.
    """
    from .. import native
    nat = native.pool_tables(pos_int, valid, list(grids), width, height,
                             time_window)
    if nat is not None:
        sizes = [nx * ny for nx, ny in grids]
        stops = np.cumsum(sizes)
        return [nat[stop - size:stop]
                for size, stop in zip(sizes, stops)]
    return item_pool_tables_np(pos_int, valid, grids, width, height,
                               time_window)


def item_pool_tables_np(pos_int: np.ndarray, valid: np.ndarray,
                        grids: Sequence[Tuple[int, int]],
                        width: int, height: int,
                        time_window: int) -> List[np.ndarray]:
    """Numpy fallback/oracle for :func:`item_pool_tables` (event-order f32
    accumulation via ``np.add.at``)."""
    denom = np.array([width, height, time_window], np.float32)
    posn = (pos_int.astype(np.float32) / denom)[valid.astype(bool)]
    tables = []
    for nx, ny in grids:
        m = nx * ny
        cell = _cells(posn, nx, ny)
        acc = np.zeros((m, 4), np.float32)
        rows = np.concatenate(
            [posn, np.ones((posn.shape[0], 1), np.float32)], axis=1)
        np.add.at(acc, cell, rows)
        tables.append(acc)
        # next level pools the pooled positions of ACTIVE cells, after the
        # same mean + pixel rounding pool_graph applies on device
        cnt = np.maximum(acc[:, 3], np.float32(1.0))
        pp = (acc[:, :3] / cnt[:, None]).astype(np.float32)
        pp[:, 0] = _round_to_pixel(pp[:, 0], width)
        pp[:, 1] = _round_to_pixel(pp[:, 1], height)
        posn = pp[acc[:, 3] > 0]
    return tables


def batch_pool_tables(pos_int: np.ndarray, valid: np.ndarray,
                      grids: Sequence[Tuple[int, int]],
                      width: int, height: int,
                      time_window: int) -> np.ndarray:
    """Stacked tables for a batch: ``[B, sum_l nx_l*ny_l, 4]`` f32.

    Levels are concatenated along dim 1 in `grids` order; slice boundaries
    are ``np.cumsum([nx*ny for nx, ny in grids])``.
    """
    b = pos_int.shape[0]
    out = np.zeros((b, sum(nx * ny for nx, ny in grids), 4), np.float32)
    for i in range(b):
        tabs = item_pool_tables(pos_int[i], valid[i], grids, width, height,
                                time_window)
        out[i] = np.concatenate(tabs, axis=0)
    return out


def table_slices(grids: Sequence[Tuple[int, int]]) -> List[Tuple[int, int]]:
    """(start, stop) of each level's rows inside the stacked dim."""
    sizes = [nx * ny for nx, ny in grids]
    stops = np.cumsum(sizes)
    return [(int(stop - size), int(stop))
            for size, stop in zip(sizes, stops)]
