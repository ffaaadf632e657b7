"""Pallas TPU kernel for the event-graph neighbour search.

Same contract as :func:`eventad_tpu.ops.event_graph.build_graph` (the XLA
formulation) with explicit data movement tuned to the TPU:

* the time-sorted stream is cut into chunks of ``chunk`` destinations; each
  chunk's candidate window (the ``lookback`` preceding events + the chunk
  itself) is laid out with the *window position on sublanes* and *128 chunks
  on lanes*, so the per-offset candidate row is a dynamic **sublane** slice
  of a VMEM block — no HBM gathers, no lane shifts;
* a running top-K per destination is maintained with a vectorized
  sorted-insertion (pure VPU) over the offset loop;
* a scalar-prefetched per-program lookback bound derived from the temporal
  cutoff (events are time-sorted) shortens the loop to offsets that can
  still satisfy ``dt <= delta_t_us``.

Priority key (identical to the XLA path and the reference CUDA scan order,
ev_graph.cu:49-77): ``spiral_index(dx, dy) * Q + queue_rank``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .event_graph import queue_rank, spiral_offset

_INVALID = np.int32(2**31 - 1)
_LANES = 128

def _batcher_network(n: int):
    """Comparator pairs of Batcher's odd-even mergesort for ``n`` a power
    of two (19 comparators at n=8, 63 at n=16).  Verified against the 0-1
    principle in tests/test_event_graph_pallas.py."""
    pairs = []

    def merge(lo, m, r):
        step = r * 2
        if step < m:
            merge(lo, m, step)
            merge(lo + r, m, step)
            pairs.extend((i, i + r) for i in range(lo + r, lo + m - r, step))
        else:
            pairs.append((lo, lo + r))

    def sort(lo, m):
        if m > 1:
            half = m // 2
            sort(lo, half)
            sort(lo + half, half)
            merge(lo, m, 1)

    sort(0, n)
    return pairs


def _select_kernel(lmax_ref, pr_ref, t_ref,
                   d_out_ref, *, lookback, chunk, k_pad,
                   radius, delta_t_us, q_cap, x_bits):
    """Refs: windows ``[W, 128]`` (W = lookback + chunk, lanes = chunks);
    ``pr = (y * 2^x_bits + x) * 256 + rank`` packs pixel AND queue rank in
    one int32 (pix < 2^23, rank <= Q+1 <= 255) — one window array + relayout
    instead of two; outputs ``[k_pad, chunk, 128]`` (packed keys)."""
    l, cs = lookback, chunk
    x_mask = (1 << x_bits) - 1
    y_shift = 8 + x_bits
    pid = pl.program_id(0)
    pri = pr_ref[l:l + cs, :]
    xi = (pri >> 8) & x_mask
    yi = pri >> y_shift
    ti = t_ref[l:l + cs, :]
    rki = pri & 255
    # fold destination validity (rki <= q_cap) into the radius check by
    # poisoning x: dx becomes ~2^20 so the ring test fails — saves an AND
    # per candidate over the whole scan
    xip = jnp.where(rki <= q_cap, xi, jnp.int32(1 << 20))
    tth = ti - delta_t_us          # candidate passes iff ts >= tth

    # key and offset packed in one int32: packed = key * (2*lookback) + d.
    # keys are unique per destination, so the d low bits never change the
    # order; one packed state array halves the per-step scratch traffic.
    d_span = np.int32(2 * lookback)
    packed_invalid = np.int32((2**30) // d_span * d_span)

    # offsets per iteration: 16 when the top-K depth and lookback allow it
    # (fewer slab loads and a cheaper sort: Batcher-16 is 63 comparators =
    # 3.9/candidate vs 19/8 = 2.4 BUT the per-candidate merge+sweep cost
    # halves — net ~9 vs ~11 VPU ops per candidate); 8 otherwise.  Slab
    # starts stay 8-aligned either way.
    d_block = 16 if (k_pad % 16 == 0 and lookback % 16 == 0
                     and lookback >= 16) else 8

    bitonic = (k_pad & (k_pad - 1)) == 0 and d_block <= k_pad
    sort_net = _batcher_network(d_block) if bitonic else None

    def _step(m, top):
        d0 = 1 + d_block * m
        # one 8-aligned dynamic slab covers offsets d0 .. d0+7
        pr_b = pr_ref[pl.ds(l - d0 - (d_block - 1), cs + d_block), :]
        ts_b = t_ref[pl.ds(l - d0 - (d_block - 1), cs + d_block), :]
        # unpack once per slab (vs once per candidate sub-slice)
        xs_b = (pr_b >> 8) & x_mask
        ys_b = pr_b >> y_shift
        rs_b = pr_b & 255
        cand = []
        for k in range(d_block):      # static sub-slices of the slab
            d = d0 + (d_block - 1 - k)
            dx = xs_b[k:k + cs, :] - xip
            dy = ys_b[k:k + cs, :] - yi
            # rotated-coordinate spiral index (see event_graph.spiral_index)
            # — the ring r doubles as the radius check
            uu = dx + dy
            ss = dy - dx
            rr = (jnp.abs(uu) + jnp.abs(ss)) >> 1
            upper = (uu > 0) | ((uu == 0) & (ss > 0))
            vv = ss - 2 * rr
            spi = 4 * rr * rr + jnp.where(upper, vv, -vv)
            rs = rs_b[k:k + cs, :]
            ok = ((rr <= radius) & (ts_b[k:k + cs, :] >= tth)
                  & (rs < q_cap))
            pk = jnp.where(ok, (spi * q_cap + rs) * d_span + d,
                           packed_invalid)
            cand.append(pk)
        rows = [top[i] for i in range(k_pad)]
        if bitonic:
            # merge all d_block candidates at once: sort them descending
            # (Batcher network), take the elementwise min against the
            # sorted-ascending tail — the low half of the bitonic concat
            # [rows asc | +inf.. cand desc] — then restore sorted order
            # with one bitonic sweep. ~9-14 VPU ops per candidate vs ~31
            # for per-candidate bubble insertion.
            for i, j in sort_net:
                a, b = cand[i], cand[j]
                cand[i] = jnp.maximum(a, b)
                cand[j] = jnp.minimum(a, b)
            base = k_pad - d_block
            for j in range(d_block):
                rows[base + j] = jnp.minimum(rows[base + j], cand[j])
            dd = k_pad >> 1
            while dd:
                for i in range(k_pad):
                    if (i & dd) == 0:
                        a, b = rows[i], rows[i + dd]
                        rows[i] = jnp.minimum(a, b)
                        rows[i + dd] = jnp.maximum(a, b)
                dd >>= 1
        else:
            # fallback (k_pad not a power of two): per-candidate bubble
            # insertion — displace the tail, compare-swap toward the head
            for pk in cand:
                rows[k_pad - 1] = jnp.minimum(rows[k_pad - 1], pk)
                for i in range(k_pad - 1, 0, -1):
                    a, b = rows[i - 1], rows[i]
                    rows[i - 1] = jnp.minimum(a, b)
                    rows[i] = jnp.maximum(a, b)
        return jnp.stack(rows, axis=0)

    lmax = lmax_ref[pid]
    n_steps = jnp.minimum((lmax + d_block - 1) // d_block, l // d_block)
    top0 = jnp.full((k_pad, cs, _LANES), packed_invalid)
    top = jax.lax.fori_loop(0, n_steps, _step, top0, unroll=False)

    found = top < packed_invalid
    # output the FULL packed value (-1 = no neighbour): the caller decodes
    # both the stream offset (top % 2L) and the spiral index
    # (top // (2L*Q)), from which the edge's pixel offset is recovered
    # arithmetically (spiral_offset) — no position gather downstream.
    # (Decoding in the kernel epilogue was tried and measured a wash: the
    # kernel grew by exactly what the XLA decode fusions cost, ~0.15 ms —
    # the decode is element-bound either way.)
    d_out_ref[...] = jnp.where(found, top, -1)


def effective_chunk(chunk: int, n: int) -> int:
    """The destination-chunk width :func:`build_graph_pallas` actually uses
    for a requested ``chunk`` at stream length ``n`` (single source of truth
    for host-side staging of the per-chunk bounds)."""
    c = min(chunk, n)
    return max(-(-c // 8) * 8, 8)


def chunk_starts_host(t, chunk: int, delta_t_us: int):
    """Host (numpy) replica of the kernel's per-chunk temporal loop bound:
    for every destination chunk, the first stream index that can still
    satisfy ``dt <= delta_t_us``.  ``t [B, N]`` must be the exact timestamp
    array the device kernel will see (including any padding values) so the
    binary search is bit-identical to the in-graph ``searchsorted``.
    Shipping this with the batch removes ~15 per-step index gathers
    (the searchsorted while-loop) from the device program."""
    import numpy as np_
    b, n = t.shape
    n_chunks = -(-n // chunk)
    tail = n_chunks * chunk - n
    t_pad = np_.pad(np_.asarray(t), ((0, 0), (0, tail)),
                    constant_values=2**30)
    t_first = t_pad[:, ::chunk]
    return np_.stack([
        np_.searchsorted(t_pad[i], t_first[i] - delta_t_us, side="left")
        for i in range(b)]).astype(np_.int32)        # [B, n_chunks]


def build_graph_pallas(pos: jnp.ndarray,
                       valid: jnp.ndarray,
                       ranks: jnp.ndarray = None,
                       *,
                       radius: int,
                       delta_t_us: int,
                       max_neighbors: int = 16,
                       max_queue_size: int = 128,
                       lookback: int = 1024,
                       chunk: int = 128,
                       grid_wh: tuple = None,
                       starts: jnp.ndarray = None,
                       interpret: bool = False):
    """Batched neighbour search: ``pos [B, N, 3]``, ``valid [B, N]``.
    Returns ``nbr [B, N, K]``, ``nbr_mask [B, N, K]`` (slot 0 = self).

    ``grid_wh = (width, height)`` bounds the pixel coordinates: the packed
    int32 key gives x the fewest bits that fit ``width``, and the fit of
    ``height`` in the remaining bits is asserted statically. Without it the
    legacy split (x: 15 bits) applies, which silently requires y < 256 —
    production call sites must pass ``grid_wh``."""
    b, n, _ = pos.shape
    k_other = max_neighbors - 1
    k_pad = -(-k_other // 8) * 8      # sublane-friendly top-K depth
    chunk = effective_chunk(chunk, n)
    # lookback rounded to a chunk multiple (window built from C-blocks) —
    # also satisfies the (8, 128) sublane tiling
    lookback = min(lookback, n)
    lookback = max(-(-lookback // chunk) * chunk, chunk)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    tail = n_pad - n
    w = lookback + chunk
    q_cap = np.int32(max_queue_size)

    if grid_wh is not None:
        gw, gh = int(grid_wh[0]), int(grid_wh[1])
        x_bits = max(int(gw - 1).bit_length(), 1)
        assert (gh - 1) * (1 << x_bits) + (gw - 1) < (1 << 23), \
            f"grid {gw}x{gh} overflows the 23-bit packed pixel key"
    else:
        x_bits = 15   # legacy split; caller must guarantee y < 256

    x = pos[:, :, 0]
    y = pos[:, :, 1]
    t = pos[:, :, 2]
    pix = y * jnp.int32(1 << x_bits) + x
    if ranks is None:   # in-graph fallback (streaming path); the batch
        # pipeline precomputes ranks on the host (native evio)
        ranks = jax.vmap(queue_rank)(pix, valid)
    # encode: valid events clip to [0, Q] (>= Q means evicted from the queue
    # but still a legal destination); Q+1 marks invalid/padded slots.
    # pix and rank pack into ONE int32 window (pix < 2^23, rank <= 255):
    # halves the window relayout + kernel slab reads
    assert max_queue_size + 1 <= 255
    big = jnp.int32(max_queue_size + 1)
    ranks = jnp.where(valid, jnp.minimum(ranks, jnp.int32(max_queue_size)),
                      big)
    pr = pix * jnp.int32(256) + ranks

    p_total = b * n_chunks
    p_pad = -(-p_total // _LANES) * _LANES
    n_programs = p_pad // _LANES

    n_lblocks = lookback // chunk    # lookback padded to a chunk multiple

    def to_lanes(a, fill):
        """[B, N] -> [W, p_pad] overlapping windows, chunks on lanes.

        One base-sized transpose + (L/C + 1) shifted slices instead of
        transposing the W/C-times-expanded window matrix."""
        ap = jnp.pad(a, ((0, 0), (lookback, tail)), constant_values=fill)
        blocks = ap.reshape(b, n_lblocks + n_chunks, chunk)
        tb = blocks.transpose(2, 0, 1)           # [C, B, nb] one relayout
        rows = [
            jax.lax.slice_in_dim(tb, k, k + n_chunks, axis=2)
            for k in range(n_lblocks + 1)
        ]                                        # each [C, B, nc]
        wins = jnp.stack(rows, axis=0)           # [W/C, C, B, nc]
        wins = wins.reshape(w, b * n_chunks)
        return jnp.pad(wins, ((0, 0), (0, p_pad - p_total)),
                       constant_values=fill)     # [W, p_pad]

    prw = to_lanes(pr, int(max_queue_size) + 1)  # fill: pix 0, invalid rank
    tw = to_lanes(t, 0)

    # per-program dynamic loop bound from the temporal cutoff. One
    # conservative bound per CHUNK (a per-event searchsorted costs a gather
    # per binary-search step — measured 13 ms at 98k events): every
    # candidate of any destination in chunk c has
    # ``t_j >= t_first(c) - delta_t``, so the chunk's lookback is at most
    # ``last_index(c) - searchsorted(t, t_first(c) - delta_t)``.  The batch
    # pipeline precomputes ``starts`` on the host (chunk_starts_host, same
    # binary search over the same array) — the in-graph searchsorted is the
    # fallback for call sites without host data (streaming, seq-shard).
    if starts is None:
        t_pad = jnp.pad(t, ((0, 0), (0, tail)), constant_values=2**30)
        t_first = t_pad[:, ::chunk]                      # [B, n_chunks]
        starts = jax.vmap(
            lambda tb, q: jnp.searchsorted(tb, q, side="left")
        )(t_pad, t_first - delta_t_us).astype(jnp.int32)  # [B, n_chunks]
    else:
        starts = jnp.asarray(starts, jnp.int32)
        assert starts.shape == (b, n_chunks), \
            (starts.shape, (b, n_chunks))
    cid = jnp.arange(n_chunks, dtype=jnp.int32)
    lmax_chunk = jnp.clip((cid[None, :] + 1) * chunk - 1 - starts,
                          0, lookback)
    lmax_chunk = jnp.where(cid[None, :] * chunk < n, lmax_chunk, 0) \
        .reshape(p_total)
    lmax_chunk = jnp.pad(lmax_chunk, (0, p_pad - p_total))
    lmax = jnp.max(lmax_chunk.reshape(n_programs, _LANES), axis=-1) \
        .astype(jnp.int32)

    # packed-key range check (see _select_kernel): key * 2L + d < 2^30
    side = 2 * radius + 1
    key_max = side * side * int(max_queue_size)
    assert (key_max + 1) * 2 * lookback < 2**30, \
        "radius/queue/lookback too large for packed int32 keys"

    kern = functools.partial(
        _select_kernel, lookback=lookback, chunk=chunk, k_pad=k_pad,
        radius=np.int32(radius), delta_t_us=np.int32(delta_t_us),
        q_cap=q_cap, x_bits=x_bits)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_programs,),
        in_specs=[pl.BlockSpec((w, _LANES), lambda pi, lm: (0, pi))
                  for _ in range(2)],
        out_specs=pl.BlockSpec((k_pad, chunk, _LANES),
                               lambda pi, lm: (0, 0, pi)),
    )
    d_sel = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_pad, chunk, p_pad), jnp.int32),
        interpret=interpret,
    )(lmax, prw, tw)

    # Decode the packed keys in the kernel's OWN [k, chunk, p] layout —
    # p (b*chunks) rides the lanes at full 128-wide vregs. The [B, n, k]
    # layout puts k=15 minor, wasting 7/8 of every vreg on the ~20-op
    # spiral decode (trace: 0.14 ms in the compare/select chain alone).
    # Pack (dy, dx, d) into one s32 here, transpose ONCE (same bytes the
    # old path transposed), and unpack with 6 cheap int ops after.
    d_span = jnp.int32(2 * lookback)
    side_i = jnp.int32(side)
    km = d_sel[:k_other]                            # [k_other, chunk, p_pad]
    kfound = km >= 0
    kd = jnp.where(kfound, km % d_span, 0)
    kspiral = jnp.where(kfound, (km // d_span) // q_cap, 0)
    ksdx, ksdy = spiral_offset(kspiral)       # src - dst pixel offsets
    kok = kfound & (kd > 0)
    kcode = (ksdy + radius) * side_i + (ksdx + radius)
    kv = jnp.where(kok, kcode * d_span + kd, -1)    # kd in [1, d_span)

    # [k_other, chunk, p_pad] -> [B, n_pad, k_other]
    v = kv[:, :, :p_total].transpose(2, 1, 0) \
        .reshape(b, n_pad, k_other)[:, :n]
    found = v >= 0
    d = jnp.where(found, v % d_span, 0)             # -1 % d_span masked
    code = v // d_span                              # floor: -1 -> -1, masked
    sdx = jnp.where(found, code % side_i - radius, 0)
    sdy = jnp.where(found, code // side_i - radius, 0)
    dst = jnp.arange(n, dtype=jnp.int32)[None, :, None]
    nbr = jnp.where(found, dst - d, 0)

    self_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :,
                                                               None],
                                (b, n, 1))
    nbr = jnp.concatenate([self_idx, nbr], axis=2)
    mask = jnp.concatenate([valid[:, :, None], found], axis=2)
    doff = jnp.concatenate(
        [jnp.zeros((b, n, 1, 2), jnp.int32),
         jnp.where(found[..., None],
                   jnp.stack([-sdx, -sdy], axis=-1), 0)], axis=2)
    return jnp.where(mask, nbr, 0), mask, doff
