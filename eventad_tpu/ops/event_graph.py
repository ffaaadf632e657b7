"""Event-graph construction (TPU-native replacement of the reference's CUDA
``ev_graph.cu`` + ``AsyncGraph``/``SlidingWindowGraph``).

Reference semantics (src/dagr/graph/ev_graph.cu:15-80, ev_graph.py:62-103):
events of a window are first all inserted into per-pixel FIFO queues of depth
``Q`` (most recent first); then, for every event ``i`` (the *destination*),
neighbours are collected in this priority order until ``max_neighbors`` is
reached:

1. a self edge ``(i, i)`` (ev_graph.cu:44-46);
2. pixels enumerated in square-spiral order around ``(x_i, y_i)``
   (spiral.h:1-16), and within each pixel the queue slots from most recent to
   oldest; an event ``j`` qualifies iff it is *older in data order*
   (``indices[i] > idx``), within the temporal radius
   (``t_i - t_j <= delta_t_us``) and still resident in the pixel queue
   (its recency rank at that pixel is ``< Q``).

Because all events are inserted before any search, the queue-residency
condition is global per window: event ``j`` is reachable iff fewer than ``Q``
events with larger index share its pixel.

TPU design: instead of ragged ``[2, E]`` edge lists we emit fixed-shape
neighbour tables ``nbr[N, K]`` + ``nbr_mask[N, K]`` (slot 0 = self edge).
Selection = top-K over a windowed lookback by the scalar key
``spiral_index(dx, dy) * Q + queue_rank(j)``, which reproduces the scan order
exactly (spiral ring first, recency second).  The lookback window bounds the
work per event; candidates further back than ``lookback`` events are dropped
(they would have to out-prioritise ``lookback`` more recent events across at
most ``(2r+1)^2`` pixels x ``Q`` slots to matter).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INVALID_KEY = np.int32(2**31 - 1)


# ---------------------------------------------------------------------------
# spiral enumeration (reference src/dagr/graph/spiral.h)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def spiral_index_table(radius: int) -> np.ndarray:
    """``table[dy + r, dx + r]`` = visit order of offset (dx, dy) in the square
    spiral of the reference kernel. Offsets outside the square get a large
    sentinel."""
    side = 2 * radius + 1
    table = np.full((side, side), _INVALID_KEY, dtype=np.int32)
    x = y = 0
    layer, leg = 1, 0
    for order in range(side * side):
        if abs(x) <= radius and abs(y) <= radius:
            table[y + radius, x + radius] = order
        # goNext (spiral.h:8-14)
        if leg == 0:
            x += 1
            if x == layer:
                leg = 1
        elif leg == 1:
            y += 1
            if y == layer:
                leg = 2
        elif leg == 2:
            x -= 1
            if -x == layer:
                leg = 3
        else:
            y -= 1
            if -y == layer:
                leg = 0
                layer += 1
    return table


# ---------------------------------------------------------------------------
# per-pixel queue rank
# ---------------------------------------------------------------------------
def queue_rank(pix: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """For every event, the number of *later* valid events sharing its pixel
    (its slot in the reference's per-pixel FIFO after the whole window was
    inserted, ev_graph.cu:169-212). Invalid events get a huge rank."""
    n = pix.shape[0]
    big = jnp.int32(n + 1)
    pixv = jnp.where(valid, pix, jnp.int32(2**30))
    # stable sort by pixel keeps original (time) order within a pixel group,
    # so rank-from-end = (last position of group) - position.
    sorted_idx = jnp.argsort(pixv, stable=True).astype(jnp.int32)
    sorted_pix = pixv[sorted_idx]
    pos = jnp.arange(n, dtype=jnp.int32)
    # last position of each pixel group via reverse cummax over group starts
    is_last = jnp.concatenate(
        [sorted_pix[1:] != sorted_pix[:-1], jnp.ones((1,), dtype=bool)])
    last_pos = jnp.where(is_last, pos, jnp.int32(n))
    # nearest group-end at-or-after each position: reverse cummin
    last_pos = jax.lax.cummin(last_pos[::-1])[::-1]
    rank_sorted = last_pos - pos
    ranks = jnp.zeros((n,), dtype=jnp.int32).at[sorted_idx].set(rank_sorted)
    return jnp.where(valid, ranks, big)


# ---------------------------------------------------------------------------
# main builder
# ---------------------------------------------------------------------------
def build_graph_single(pos: jnp.ndarray,
                       valid: jnp.ndarray,
                       *,
                       radius: int,
                       delta_t_us: int,
                       max_neighbors: int = 16,
                       max_queue_size: int = 128,
                       lookback: int = 1024,
                       chunk: int = 512):
    """Neighbour search for one batch item.

    Args:
      pos: ``[N, 3]`` int32 (x, y, t_us), in stream order (the reference feeds
        events in file order, nondecreasing t).
      valid: ``[N]`` bool padding mask.
      radius: pixel radius (``int(radius * width) + 1``, ev_tgn.py:29).
      delta_t_us: temporal radius (``int(radius * time_window)``).
      max_neighbors: total neighbour cap including the self edge.
      max_queue_size: per-pixel FIFO depth Q.
      lookback: how many preceding events are candidate sources.

    Returns:
      nbr ``[N, max_neighbors]`` int32 source indices (slot 0 = self),
      nbr_mask ``[N, max_neighbors]`` bool.
    """
    n = pos.shape[0]
    k_other = max_neighbors - 1
    table = jnp.asarray(spiral_index_table(radius))
    q_cap = jnp.int32(max_queue_size)

    x, y, t = pos[:, 0], pos[:, 1], pos[:, 2]
    # pixel code; width bound not needed, any injective code works
    pix = y.astype(jnp.int32) * jnp.int32(2**15) + x.astype(jnp.int32)
    ranks = queue_rank(pix, valid)

    lookback = min(lookback, n)
    offs = jnp.arange(1, lookback + 1, dtype=jnp.int32)  # j = i - offs

    def chunk_fn(i0):
        ii = i0 + jnp.arange(chunk, dtype=jnp.int32)          # [C]
        jj = ii[:, None] - offs[None, :]                      # [C, L]
        j_ok = jj >= 0
        jc = jnp.clip(jj, 0, n - 1)
        dx = x[jc] - x[ii][:, None]
        dy = y[jc] - y[ii][:, None]
        dt = t[ii][:, None] - t[jc]
        in_sq = (jnp.abs(dx) <= radius) & (jnp.abs(dy) <= radius)
        ok = (j_ok & valid[jc] & valid[ii][:, None] & in_sq
              & (dt <= delta_t_us) & (ranks[jc] < q_cap) & (ii[:, None] < n))
        dxc = jnp.clip(dx + radius, 0, 2 * radius)
        dyc = jnp.clip(dy + radius, 0, 2 * radius)
        key = table[dyc, dxc] * q_cap + ranks[jc]
        key = jnp.where(ok, key, _INVALID_KEY)
        # smallest k_other keys == first neighbours in reference scan order
        neg_top, arg_top = jax.lax.top_k(-key, k_other)       # [C, k_other]
        sel_key = -neg_top
        nbr = jnp.take_along_axis(jc, arg_top, axis=1)
        mask = sel_key < _INVALID_KEY
        return nbr, mask

    n_chunks = (n + chunk - 1) // chunk
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    nbrs, masks = jax.lax.map(chunk_fn, starts)
    nbrs = nbrs.reshape(n_chunks * chunk, k_other)[:n]
    masks = masks.reshape(n_chunks * chunk, k_other)[:n]

    self_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    nbr = jnp.concatenate([self_idx, nbrs], axis=1)
    nbr_mask = jnp.concatenate([valid[:, None], masks], axis=1)
    nbr = jnp.where(nbr_mask, nbr, 0)
    return nbr, nbr_mask


def build_graph(pos: jnp.ndarray, valid: jnp.ndarray, **kw):
    """Batched neighbour search: ``pos [B, N, 3]``, ``valid [B, N]``."""
    fn = functools.partial(build_graph_single, **kw)
    return jax.vmap(fn)(pos, valid)


# ---------------------------------------------------------------------------
# brute-force reference for tests (mirrors the CUDA kernel literally)
# ---------------------------------------------------------------------------
def build_graph_numpy(pos: np.ndarray,
                      valid: np.ndarray,
                      *,
                      radius: int,
                      delta_t_us: int,
                      max_neighbors: int = 16,
                      max_queue_size: int = 128,
                      width: int = 1 << 14,
                      height: int = 1 << 14):
    """Literal simulation of ev_graph.cu:15-80 with full queue insertion
    first (ev_graph.py:85-98). Returns (nbr, nbr_mask) in the same layout as
    :func:`build_graph_single`."""
    n = len(valid)
    queues: dict = {}
    for j in range(n):
        if not valid[j]:
            continue
        key = (int(pos[j, 0]), int(pos[j, 1]))
        queues.setdefault(key, []).insert(0, j)   # most recent first
    for key in queues:
        queues[key] = queues[key][:max_queue_size]

    table = spiral_index_table(radius)
    side = 2 * radius + 1
    # enumerate offsets in spiral order
    order = np.argsort(table, axis=None)
    offsets = [(int(o % side) - radius, int(o // side) - radius)
               for o in order[: side * side]]

    nbr = np.zeros((n, max_neighbors), dtype=np.int32)
    mask = np.zeros((n, max_neighbors), dtype=bool)
    for i in range(n):
        if not valid[i]:
            continue
        nbr[i, 0] = i
        mask[i, 0] = True
        cnt = 1
        xi, yi, ti = int(pos[i, 0]), int(pos[i, 1]), int(pos[i, 2])
        for dx, dy in offsets:
            if cnt >= max_neighbors:
                break
            xn, yn = xi + dx, yi + dy
            if not (0 <= xn < width and 0 <= yn < height):
                continue   # CUDA breaks the q loop only; cell skipped
            for j in queues.get((xn, yn), []):
                if j >= i:   # only older events (indices[i] > idx)
                    continue
                if ti - int(pos[j, 2]) > delta_t_us:
                    continue
                nbr[i, cnt] = j
                mask[i, cnt] = True
                cnt += 1
                if cnt >= max_neighbors:
                    break
    return nbr, mask
