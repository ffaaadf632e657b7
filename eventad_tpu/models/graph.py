"""Static-shape graph container shared by all network levels.

The reference threads torch_geometric ``Data`` objects (ragged node/edge
arrays) through the backbone; here every level is a fixed-shape table:

* level 0: ``B * N_max`` padded event slots (``node_mask`` marks real events)
* level i>=1: ``B * nx_i * ny_i`` voxel cells (``node_mask`` marks non-empty)

``nbr``/``nbr_mask`` give each destination's incoming source slots, which
turns message aggregation into gather+sum (no scatter on the hot path).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Graph(NamedTuple):
    x: jnp.ndarray          # [N, C] node features
    pos: jnp.ndarray        # [N, 3] normalized (x, y, t)
    nbr: jnp.ndarray        # [N, K] int32
    nbr_mask: jnp.ndarray   # [N, K] bool
    node_mask: jnp.ndarray  # [N] bool
    batch: jnp.ndarray      # [N] int32
    # level-0 only: per-edge integer pixel offsets (x_dst-x_src, y_dst-y_src)
    # decoded from the search kernel's spiral key — edge attrs and source
    # positions derive from these arithmetically (no position gather)
    off: Optional[jnp.ndarray] = None   # [N, K, 2] int32 or None


def neighbor_rows(src: jnp.ndarray, grid, batch_size: int,
                  span: int) -> jnp.ndarray:
    """Neighbour rows of a pooled cell table WITHOUT a gather.

    At pooled levels the neighbour table is arithmetic — slot ``s`` of cell
    ``(b, cy, cx)`` is cell ``(b, cy + oy, cx + ox)`` with
    ``(oy, ox) = (s // side - span, s % side - span)``
    (:func:`eventad_tpu.ops.pooling.pool_graph` builds ``nbr`` exactly this
    way).  A TPU gather fetches a full memory tile (~4 KB) per index, so
    ``src[nbr]`` costs ``M * S`` tiles; the same rows are ``S`` contiguous
    2-D shifts of the grid-shaped table, costing only the actual bytes.

    Args:
      src: ``[M, C]`` cell table, ``M = batch_size * ny * nx`` in the
        pooling's (b, iy, ix) order.
      grid: ``(nx, ny)`` cells.
      span: neighbourhood half-width (slots = ``(2*span+1)**2``).

    Returns ``[M, S, C]``; out-of-grid slots are zero (callers mask them via
    ``nbr_mask``, which is False there).
    """
    nx, ny = grid
    side = 2 * span + 1
    c = src.shape[1]
    g = src.reshape(batch_size, ny, nx, c)
    gp = jnp.pad(g, ((0, 0), (span, span), (span, span), (0, 0)))
    slots = []
    for oy in range(-span, span + 1):
        for ox in range(-span, span + 1):
            slots.append(jax.lax.slice(
                gp, (0, span + oy, span + ox, 0),
                (batch_size, span + oy + ny, span + ox + nx, c)))
    stk = jnp.stack(slots, axis=3)                 # [B, ny, nx, S, C]
    return stk.reshape(batch_size * ny * nx, side * side, c)


@functools.lru_cache(maxsize=None)
def _interp_matrix(dst: int, src: int):
    """``A[d, s]``: bilinear tap weights of source row ``s`` for output
    pixel ``d`` under the grid_sample align_corners mapping
    ``f(d) = d * (src-1) / (dst-1)`` (net.py:224 semantics)."""
    import numpy as np
    f = np.arange(dst) * (src - 1) / max(dst - 1, 1)
    i0 = np.floor(f).astype(int)
    t = (f - i0).astype(np.float32)
    i1 = np.minimum(i0 + 1, src - 1)
    a = np.zeros((dst, src), np.float32)
    a[np.arange(dst), i0] += 1 - t
    a[np.arange(dst), i1] += t
    return a


def upsample_align_corners(feat: jnp.ndarray, full_width: int,
                           full_height: int) -> jnp.ndarray:
    """Bilinear upsample of an NHWC map to the full sensor resolution with
    TWO static interpolation matmuls — gather-free. Sampling node features
    then becomes one integer-index row lookup instead of 4 bilinear tap
    gathers per node (TPU gathers are per-index bound: ~1 ms per 98k
    indices)."""
    b, hp, wp, c = feat.shape
    ay = jnp.asarray(_interp_matrix(full_height, hp), feat.dtype)
    ax = jnp.asarray(_interp_matrix(full_width, wp), feat.dtype)
    # W first, H second: the last contraction's natural output layout then
    # matches the row-lookup consumer (c minor), avoiding a full-resolution
    # transpose copy of the upsampled map (~0.2 ms/batch at [6,240,360,80])
    up = jnp.einsum("Ww,bhwc->bhWc", ax, feat)
    return jnp.einsum("Hh,bhWc->bHWc", ay, up)


def upsample_lookup(feats, pos: jnp.ndarray, batch: jnp.ndarray,
                    node_mask: jnp.ndarray, full_width: int,
                    full_height: int, mask_rows: bool = True) -> jnp.ndarray:
    """Fused upsample-to-full-resolution + per-node row lookup over one or
    more NHWC maps (channel-concatenated output) — the level-0/1 image
    feature fetch.

    Equals ``lookup_pixel_features(concat(upsample_align_corners(f)))`` but
    keeps every intermediate in its producer's NATURAL layout: the two
    interpolation contractions emit ``[Wf, b, h, c]`` then ``[Hf, Wf, b, c]``
    row-major, and the lookup gathers flat rows ``(y * Wf + x) * b + batch``
    of the ``[Hf * Wf * b, C]`` view. The einsum+NHWC-gather form leaves XLA
    operand-layout freedom it spends on full-resolution relayout copies
    (~0.5 ms/batch at [6,240,360,80]; tools/bench_upsample.py)."""
    b, h, w = feats[0].shape[0], full_height, full_width
    ups = []
    for f in feats:
        hp, wp = f.shape[1:3]
        ay = jnp.asarray(_interp_matrix(h, hp), f.dtype)
        ax = jnp.asarray(_interp_matrix(w, wp), f.dtype)
        # [Wf, b, hp, c] — natural row-major output of the W contraction
        uw = jax.lax.dot_general(ax, f, (((1,), (2,)), ((), ())))
        # [Hf, Wf, b, c]
        ups.append(jax.lax.dot_general(ay, uw, (((1,), (2,)), ((), ()))))
    up = ups[0] if len(ups) == 1 else jnp.concatenate(ups, axis=-1)
    c = up.shape[-1]
    xi = jnp.clip(jnp.round(pos[:, 0] * full_width).astype(jnp.int32),
                  0, w - 1)
    yi = jnp.clip(jnp.round(pos[:, 1] * full_height).astype(jnp.int32),
                  0, h - 1)
    # 3-index gather on the 4-D operand: its natural {3,2,1,0} layout is
    # already what the row gather wants; a flat [H*W*b, C] view would
    # re-pad the (b, c) tile (0.75 ms relayout pair, trace-measured)
    rows = up[yi, xi, batch]
    if not mask_rows:
        # a masked event's row is a finite map value at its (clipped)
        # pixel; every downstream consumer re-masks (nbr_mask gates edge
        # aggregation, apply_layer/pool_graph/batch_norm mask by
        # node_mask), so the [N, C]-wide select is provably droppable —
        # the backbone path skips it (~0.06 ms/batch at 98k x 80)
        return rows
    return jnp.where(node_mask[:, None], rows, 0)


def lookup_pixel_features(feat: jnp.ndarray,
                          pos: jnp.ndarray,
                          batch: jnp.ndarray,
                          node_mask: jnp.ndarray,
                          full_width: int,
                          full_height: int) -> jnp.ndarray:
    """Row lookup of a FULL-RESOLUTION map at pixel-aligned normalized
    positions (event positions are int pixels / width; pooled positions are
    pixel-snapped). Equivalent to :func:`sample_image_features` on the
    upsampled map to ~1e-6 (the bilinear weights there are 0/1 up to float
    rounding of ``pos * W``)."""
    b, h, w, c = feat.shape
    xi = jnp.clip(jnp.round(pos[:, 0] * full_width).astype(jnp.int32),
                  0, w - 1)
    yi = jnp.clip(jnp.round(pos[:, 1] * full_height).astype(jnp.int32),
                  0, h - 1)
    out = feat[batch, yi, xi]
    return jnp.where(node_mask[:, None], out, 0)


def sample_image_features(feat: jnp.ndarray,
                          pos: jnp.ndarray,
                          batch: jnp.ndarray,
                          node_mask: jnp.ndarray,
                          full_width: int,
                          full_height: int) -> jnp.ndarray:
    """Bilinear CNN-feature lookup at node positions.

    Mirrors the reference ``sample_features`` (net.py:200-228): nodes carry
    normalized positions; torch ``grid_sample(align_corners=True)`` maps the
    grid coordinate ``2*(pos*W)/(W-1)-1`` onto feature-map pixel
    ``pos * W * (W'-1) / (W-1)`` for a W'-wide map. Out-of-range samples are
    zero (grid_sample zero padding).

    Args:
      feat: ``[B, H', W', C]`` feature map (NHWC).
      pos: ``[N, >=2]`` normalized positions; batch ``[N]`` item ids.
    Returns ``[N, C]``.
    """
    b, hp, wp, c = feat.shape
    fx = pos[:, 0] * full_width * (wp - 1) / max(full_width - 1, 1)
    fy = pos[:, 1] * full_height * (hp - 1) / max(full_height - 1, 1)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[:, None]
    ty = (fy - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # pair the two horizontal taps channel-wise so bilinear sampling costs 2
    # row gathers instead of 4 (TPU gathers fetch a full tile per index);
    # gather by FLAT row index on a [B*H*W, 2C] operand — the 4-D indexed
    # form leaves XLA operand-layout freedom it spends on transpose pairs
    # around each gather (~0.38 ms/iter of layout churn at level 2-4 scale)
    feat_r = jnp.concatenate([feat[:, :, 1:], feat[:, :, -1:]], axis=2)
    pair = jnp.concatenate([feat, feat_r], axis=3)   # [B, H, W, 2C]
    pair = pair.reshape(b * hp * wp, 2 * c)

    def tap_pair(yy):
        ok_y = (yy >= 0) & (yy < hp)
        idx = (batch * hp + jnp.clip(yy, 0, hp - 1)) * wp \
            + jnp.clip(x0i, 0, wp - 1)
        v = pair[idx]                                # [N, 2C]
        v0, v1 = v[:, :c], v[:, c:]
        # x0 = -1 clips to column 0, whose pair is (feat[0], feat[1]) —
        # the live x0+1 tap is feat[0], i.e. the *first* half
        v1 = jnp.where((x0i < 0)[:, None], v0, v1)
        okx0 = (x0i >= 0) & (x0i < wp) & ok_y
        okx1 = (x0i + 1 >= 0) & (x0i + 1 < wp) & ok_y
        return (jnp.where(okx0[:, None], v0, 0.0),
                jnp.where(okx1[:, None], v1, 0.0))

    v00, v01 = tap_pair(y0i)
    v10, v11 = tap_pair(y0i + 1)
    tx = tx.astype(feat.dtype)   # keep the blend in the feature dtype
    ty = ty.astype(feat.dtype)
    out = ((1 - ty) * ((1 - tx) * v00 + tx * v01)
           + ty * ((1 - tx) * v10 + tx * v11))
    return jnp.where(node_mask[:, None], out, 0.0)
