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


def spiral_offset(s: jnp.ndarray):
    """Inverse of :func:`spiral_index`: visit order -> (dx, dy), pure VPU
    arithmetic (float sqrt + integer fix-ups; no table gather).  Lets the
    search kernel's packed priority key be decoded into the edge's pixel
    offset — so edge attrs and source positions become arithmetic instead of
    a position gather."""
    sf = s.astype(jnp.float32)
    r = jnp.floor((jnp.sqrt(jnp.maximum(sf, 0.0)) + 1.0) * 0.5) \
        .astype(jnp.int32)
    # float-sqrt boundary fix-ups: enforce (2r-1)^2 <= s < (2r+1)^2
    r = jnp.where((2 * r - 1) ** 2 > s, r - 1, r)
    r = jnp.where((2 * r + 1) ** 2 <= s, r + 1, r)
    p = s - (2 * r - 1) ** 2
    leg = jnp.clip(p // jnp.maximum(2 * r, 1), 0, 3)
    # nested where (not jnp.select): select lowers through argmax, which
    # Mosaic cannot vectorize — this form runs inside the Pallas search
    # kernel's decode epilogue
    dx = jnp.where(leg == 0, r,
                   jnp.where(leg == 1, 3 * r - 1 - p,
                             jnp.where(leg == 2, -r, p - 7 * r + 1)))
    dy = jnp.where(leg == 0, p - r + 1,
                   jnp.where(leg == 1, r,
                             jnp.where(leg == 2, 5 * r - 1 - p, -r)))
    zero = s <= 0
    return jnp.where(zero, 0, dx), jnp.where(zero, 0, dy)


def spiral_index(dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Closed-form spiral visit order of offset (dx, dy) — equals
    ``spiral_index_table(r)[dy+r, dx+r]`` for any covering radius, without a
    table gather (TPU gathers cost ~1 element/cycle; this is pure VPU
    arithmetic).

    Ring r starts at (r, -r+1) with index (2r-1)^2 and walks
    up the right edge, left along the top, down the left edge, right along
    the bottom, ending at (r, -r) with index (2r+1)^2 - 1 (spiral.h:8-14).
    """
    # Rotated-coordinate form (~18 VPU ops vs ~33 for the 4-edge select):
    # with u = dx+dy, s = dy-dx, the ring is r = (|u|+|s|)/2 and the four
    # per-edge linear pieces collapse to two:
    #   right/top edges:  idx = 4r^2 - 2r + s   (dx==r & dy>-r, or dy==r)
    #   left/bottom:      idx = 4r^2 + 2r - s
    # The branch condition is u > 0, with the two u == 0 corners split by
    # the sign of s (top-left s=2r>0 belongs right/top; bottom-right
    # s=-2r<0 belongs left/bottom). r = 0 falls out naturally (idx = 0).
    u = dx + dy
    s = dy - dx
    r = (jnp.abs(u) + jnp.abs(s)) >> 1
    v = s - 2 * r
    upper = (u > 0) | ((u == 0) & (s > 0))
    return 4 * r * r + jnp.where(upper, v, -v)


# ---------------------------------------------------------------------------
# main builder
# ---------------------------------------------------------------------------
def build_graph_single(pos: jnp.ndarray,
                       valid: jnp.ndarray,
                       ranks: jnp.ndarray = None,
                       *,
                       radius: int,
                       delta_t_us: int,
                       max_neighbors: int = 16,
                       max_queue_size: int = 128,
                       lookback: int = 1024,
                       chunk: int = 512,
                       grid_wh: tuple = None):
    """Neighbour search for one batch item. ``grid_wh`` is accepted for
    call-site symmetry with the Pallas kernel (which packs pixel keys and
    needs the static coordinate bound); this formulation keeps x/y separate
    and does not use it.

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
      nbr_mask ``[N, max_neighbors]`` bool,
      doff ``[N, max_neighbors, 2]`` int32 pixel offsets
      ``(x_dst - x_src, y_dst - y_src)`` per edge (0 at masked/self slots) —
      attrs and source positions derive from these arithmetically, no
      position gather needed downstream.
    """
    n = pos.shape[0]
    k_other = max_neighbors - 1
    q_cap = jnp.int32(max_queue_size)

    x, y, t = pos[:, 0], pos[:, 1], pos[:, 2]
    if ranks is None:
        # pixel code; width bound not needed, any injective code works
        pix = y.astype(jnp.int32) * jnp.int32(2**15) + x.astype(jnp.int32)
        ranks = queue_rank(pix, valid)
    else:
        ranks = jnp.where(valid, ranks, jnp.int32(n + 1))

    lookback = min(lookback, n)
    offs = jnp.arange(1, lookback + 1, dtype=jnp.int32)  # j = i - offs
    big_rank = jnp.int32(n + 1)

    # Candidate windows are Toeplitz (row i looks at i-1 .. i-L): realize
    # them as L dynamic slices of length C instead of [C, L] element gathers
    # (XLA lowers vmapped dynamic_slice to a slice-sized gather — contiguous
    # row copies instead of per-element fetches). Front-pad with L invalid
    # entries so j < 0 falls on sentinels; end-pad to a whole number of
    # chunks so no slice ever clamps.
    n_chunks = (n + chunk - 1) // chunk
    n_pad = n_chunks * chunk
    tail = n_pad - n

    def pad(arr, front_fill, tail_fill):
        return jnp.concatenate([
            jnp.full((lookback,), front_fill, arr.dtype), arr,
            jnp.full((tail,), tail_fill, arr.dtype)])

    x_p = pad(x, 0, 0)
    y_p = pad(y, 0, 0)
    t_p = pad(t, 0, 0)
    valid_p = pad(valid, False, False)
    ranks_p = pad(ranks, big_rank, big_rank)
    x_e, y_e, t_e = x_p[lookback:], y_p[lookback:], t_p[lookback:]
    valid_e = valid_p[lookback:]

    def chunk_fn(i0):
        ii = i0 + jnp.arange(chunk, dtype=jnp.int32)          # [C]

        def win(arr):
            return jax.vmap(
                lambda d: jax.lax.dynamic_slice(
                    arr, (i0 + lookback - d,), (chunk,)))(offs)   # [L, C]

        xi = jax.lax.dynamic_slice(x_e, (i0,), (chunk,))
        yi = jax.lax.dynamic_slice(y_e, (i0,), (chunk,))
        ti = jax.lax.dynamic_slice(t_e, (i0,), (chunk,))
        vi = jax.lax.dynamic_slice(valid_e, (i0,), (chunk,))
        dx = win(x_p) - xi[None, :]
        dy = win(y_p) - yi[None, :]
        dt = ti[None, :] - win(t_p)
        rk = win(ranks_p)
        in_sq = (jnp.abs(dx) <= radius) & (jnp.abs(dy) <= radius)
        ok = (win(valid_p) & vi[None, :] & in_sq
              & (dt <= delta_t_us) & (rk < q_cap))
        key = spiral_index(dx, dy) * q_cap + rk
        key = jnp.where(ok, key, _INVALID_KEY)                # [L, C]
        # smallest k_other keys == first neighbours in reference scan order.
        # lax.top_k lowers to a full per-row sort (ruinous on TPU at L=1024);
        # k_other rounds of argmin+mask are pure VPU work.
        lanes = jnp.arange(lookback, dtype=jnp.int32)[:, None]
        nbrs, masks, off_list = [], [], []
        for _ in range(k_other):
            idx = jnp.argmin(key, axis=0)                     # [C]
            kmin = jnp.min(key, axis=0)
            nbrs.append(ii - (idx + 1))                       # j = i - d
            masks.append(kmin < _INVALID_KEY)
            sel = lanes == idx[None, :]
            # dst - src pixel offset of the selected edge (dx here is
            # src - dst, hence the negation)
            off_list.append(jnp.stack(
                [-jnp.sum(jnp.where(sel, dx, 0), axis=0),
                 -jnp.sum(jnp.where(sel, dy, 0), axis=0)], axis=-1))
            key = jnp.where(sel, _INVALID_KEY, key)
        nbr = jnp.stack(nbrs, axis=1)
        mask = jnp.stack(masks, axis=1)
        off = jnp.stack(off_list, axis=1)                     # [C, k, 2]
        return jnp.where(mask, nbr, 0), mask, \
            jnp.where(mask[..., None], off, 0)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    nbrs, masks, offs = jax.lax.map(chunk_fn, starts)
    nbrs = nbrs.reshape(n_pad, k_other)[:n]
    masks = masks.reshape(n_pad, k_other)[:n]
    offs = offs.reshape(n_pad, k_other, 2)[:n]

    self_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    nbr = jnp.concatenate([self_idx, nbrs], axis=1)
    nbr_mask = jnp.concatenate([valid[:, None], masks], axis=1)
    nbr = jnp.where(nbr_mask, nbr, 0)
    doff = jnp.concatenate(
        [jnp.zeros((n, 1, 2), jnp.int32), offs], axis=1)
    return nbr, nbr_mask, doff


def build_graph(pos: jnp.ndarray, valid: jnp.ndarray, ranks=None, **kw):
    """Batched neighbour search: ``pos [B, N, 3]``, ``valid [B, N]``."""
    fn = functools.partial(build_graph_single, **kw)
    if ranks is None:
        return jax.vmap(lambda p, v: fn(p, v))(pos, valid)
    return jax.vmap(fn)(pos, valid, ranks)


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
    doff = np.zeros((n, max_neighbors, 2), dtype=np.int32)
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
                doff[i, cnt] = (-dx, -dy)   # dst - src
                cnt += 1
                if cnt >= max_neighbors:
                    break
    return nbr, mask, doff


def build_graph_auto(pos, valid, ranks=None, **kw):
    """Batched neighbour search dispatching to the Pallas kernel on TPU and
    the XLA formulation elsewhere. ``pos [B, N, 3]``.

    ``starts`` (host-precomputed per-chunk temporal bounds) and ``chunk``
    are Pallas-kernel knobs; the XLA formulation derives its own bounds."""
    if jax.default_backend() == "tpu":
        from .event_graph_pallas import build_graph_pallas
        return build_graph_pallas(pos, valid, ranks, **kw)
    kw.pop("starts", None)
    kw.pop("chunk", None)
    return build_graph(pos, valid, ranks, **kw)
