"""Voxel-grid graph pooling with static cell tables.

Replaces the reference ``Pooling`` (src/dagr/model/layers/pooling.py:19-97):
``grid_cluster`` over ``(x, y, t, batch)`` + consecutive relabelling + edge
dedup + scatter max/mean.  The reference already sizes its cluster space
statically (``max_num_voxels = batch_size * num_grid_cells``,
pooling.py:34); we keep that full table as the pooled node set (with an
``active`` mask instead of compaction), which makes every downstream shape
static.

Pooled edges: the reference maps original edges through the cluster
assignment, removes self-loops and deduplicates (pooling.py:58-64).  Because
edge endpoints are spatially local, a source cell can only be within a small
window of its destination cell, so we represent pooled adjacency as a
``(2*span+1)**2`` existence bitmap per destination cell — deduplication is
free and the neighbour table is arithmetic (no sort, no compaction).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PooledGraph(NamedTuple):
    x: jnp.ndarray          # [M, C]
    pos: jnp.ndarray        # [M, 3]
    nbr: jnp.ndarray        # [M, S] int32
    nbr_mask: jnp.ndarray   # [M, S] bool
    node_mask: jnp.ndarray  # [M] bool
    batch: jnp.ndarray      # [M] int32


def _round_to_pixel(p: jnp.ndarray, size: int) -> jnp.ndarray:
    """reference pooling.py:47-49: floor((pos + 1e-5) / (1/size)) * (1/size)."""
    return jnp.floor((p + 1e-5) * size) / size


def pool_graph(x: jnp.ndarray,
               pos: jnp.ndarray,
               nbr: jnp.ndarray,
               nbr_mask: jnp.ndarray,
               node_mask: jnp.ndarray,
               batch: jnp.ndarray,
               *,
               grid: tuple,
               batch_size: int,
               width: int,
               height: int,
               aggr: str = "max",
               span: int = 2,
               keep_temporal_ordering: bool = False,
               pos_src: jnp.ndarray = None,
               host_table: jnp.ndarray = None,
               return_pos_nbr: bool = False):
    """Args:
      x ``[N, C]``, pos ``[N, 3]`` normalized, nbr/nbr_mask ``[N, K]``,
      node_mask ``[N]``, batch ``[N]`` int32 item ids.
      grid: (nx, ny) cells of this level.
      span: max |cell offset| an edge can reach (asserted by tests).
      host_table: optional ``[batch_size*nx*ny, 4]`` f32
        ``[sum_x, sum_y, sum_t, count]`` per cell, precomputed on the host
        (data/pool_tables.py) — replaces the per-index-bound position
        add-scatter; sums differ from the device scatter only in f32
        accumulation order.
      pos_src: optional pre-gathered neighbour positions ``[N, K, 2]``
        (normalized) — avoids re-gathering ``cell[nbr]`` (TPU gathers cost
        a full tile per index; the conv already gathered these rows).
      return_pos_nbr: also return the pooled table's per-slot neighbour
        positions ``[M, S, 2]`` (== ``neighbor_rows(pooled_pos[:, :2])``);
        they ride the SAME 2-D shift pass as the activity/temporal columns,
        saving the downstream conv its own 25-slice shift set.

    Returns a :class:`PooledGraph` over ``M = batch_size * nx * ny`` cells
    (with ``return_pos_nbr``: a ``(PooledGraph, pos_nbr)`` tuple).
    """
    nx, ny = grid
    ncells = nx * ny
    m_total = batch_size * ncells
    side = 2 * span + 1
    # adjacency bitmap width: 31 usable bits per int32 word (the sign bit
    # must stay clear so 0/1 expansion can ride a max-scatter); span=2
    # (25 offsets) packs into one word, larger spans split across words
    nwords = -(-(side * side) // 31)
    n = x.shape[0]

    pc = jnp.clip(pos, 0.0, 0.9999999)
    ix = jnp.floor(pc[:, 0] * nx).astype(jnp.int32)
    iy = jnp.floor(pc[:, 1] * ny).astype(jnp.int32)
    cell = batch * ncells + iy * nx + ix                       # [N]
    cell_safe = jnp.where(node_mask, cell, m_total)            # overflow row

    # ---- one combined ADD-scatter row per node: [pos(3) | count(1) |
    # (mean features) | adjacency bitmap] — TPU scatters are per-index
    # bound, so everything additive rides a single row scatter; only the
    # feature MAX needs its own op ----
    mean_feats = aggr == "mean"
    if aggr not in ("max", "mean"):
        raise ValueError(aggr)

    add_parts = []
    if host_table is None:
        add_parts += [
            jnp.where(node_mask[:, None], pos, 0.0).astype(jnp.float32),
            node_mask[:, None].astype(jnp.float32)]
    if mean_feats:
        add_parts.append(
            jnp.where(node_mask[:, None], x, 0).astype(jnp.float32))

    # ---- pooled adjacency bitmap ----
    if pos_src is not None:
        # derive source cells from pre-gathered positions (same floor/clip)
        ps = jnp.clip(pos_src, 0.0, 0.9999999)
        sx = jnp.floor(ps[..., 0] * nx).astype(jnp.int32)
        sy = jnp.floor(ps[..., 1] * ny).astype(jnp.int32)
        rel_x = sx - ix[:, None]
        rel_y = sy - iy[:, None]
        e_ok = nbr_mask & node_mask[:, None]
        not_self = (rel_x != 0) | (rel_y != 0)
    else:
        src_cell = cell_safe[nbr]                              # [N, K]
        dst_cell = cell_safe[:, None]
        e_ok = nbr_mask & node_mask[:, None] & (src_cell < m_total) \
            & (dst_cell < m_total)
        rel_x = (src_cell % nx) - (dst_cell % nx)
        rel_y = (src_cell // nx) % ny - (dst_cell // nx) % ny
        same_b = (src_cell // ncells) == (dst_cell // ncells)
        e_ok = e_ok & same_b
        not_self = src_cell != dst_cell                        # pooling.py:62
    in_span = (jnp.abs(rel_x) <= span) & (jnp.abs(rel_y) <= span)
    e_ok = e_ok & in_span & not_self
    rel_idx = (rel_y + span) * side + (rel_x + span)
    rel_idx = jnp.clip(rel_idx, 0, side * side - 1)
    # per-node adjacency as int32 bitmask word(s) (bit j = an edge with
    # cell offset j exists): a K-wide bitwise OR instead of K one-hot adds
    # at event scale; the 0/1 columns then ride the feature MAX-scatter
    # (max of 0/1 == OR), so the per-cell bitmap costs no extra scatter
    if nwords == 1:
        bits = jnp.zeros((n,), jnp.int32)
        for k in range(nbr.shape[1]):
            bits = bits | jnp.where(e_ok[:, k],
                                    jnp.left_shift(1, rel_idx[:, k]), 0)
        node_onehot = ((bits[:, None] >> jnp.arange(side * side)) & 1)
    else:
        words = [jnp.zeros((n,), jnp.int32) for _ in range(nwords)]
        for k in range(nbr.shape[1]):
            sh = jnp.where(e_ok[:, k],
                           jnp.left_shift(1, rel_idx[:, k] % 31), 0)
            wsel = rel_idx[:, k] // 31
            for wi in range(nwords):
                words[wi] = words[wi] | jnp.where(wsel == wi, sh, 0)
        node_onehot = jnp.concatenate(
            [(words[wi][:, None]
              >> jnp.arange(min(31, side * side - 31 * wi))) & 1
             for wi in range(nwords)], axis=1)

    # ---- the single combined add-scatter (skipped entirely in the
    # max-aggr path when the host shipped the position table) ----
    if mean_feats:
        # no max-scatter in the mean path: existence rides the add row
        add_parts.append(node_onehot.astype(jnp.float32))
    if add_parts:
        add_rows = jnp.concatenate(add_parts, axis=1)
        acc = jnp.zeros((m_total + 1, add_rows.shape[1]), jnp.float32) \
            .at[cell_safe].add(add_rows)
    if host_table is None:
        psum = acc[:m_total, :3]
        pcnt = acc[:m_total, 3]
        col = 4
    else:
        psum = host_table[:, :3]
        pcnt = host_table[:, 3]
        col = 0
    if mean_feats:
        fsum = acc[:m_total, col:col + x.shape[1]]
        col += x.shape[1]
        exist = acc[:m_total, col:col + side * side] > 0

    pooled_pos = (psum / jnp.maximum(pcnt[:, None], 1.0)).astype(pos.dtype)
    pooled_pos = pooled_pos.at[:, 0].set(
        _round_to_pixel(pooled_pos[:, 0], width))
    pooled_pos = pooled_pos.at[:, 1].set(
        _round_to_pixel(pooled_pos[:, 1], height))
    active = pcnt > 0

    if mean_feats:
        pooled_x = (fsum / jnp.maximum(pcnt[:, None], 1.0)).astype(x.dtype)
    else:
        c = x.shape[1]
        accm = jnp.full((m_total + 1, c + side * side), -jnp.inf,
                        dtype=x.dtype)
        xin = jnp.concatenate(
            [jnp.where(node_mask[:, None], x, -jnp.inf),
             node_onehot.astype(x.dtype)], axis=1)
        accm = accm.at[cell_safe].max(xin)
        pooled_x = accm[:m_total, :c]
        pooled_x = jnp.where(jnp.isfinite(pooled_x), pooled_x, 0.0)
        exist = accm[:m_total, c:] > 0

    # neighbour indices decoded arithmetically from the bitmap slots
    cells = jnp.arange(m_total, dtype=jnp.int32)
    cx = cells % nx
    cy = (cells // nx) % ny
    cb = cells // ncells
    offs = jnp.arange(side * side, dtype=jnp.int32)
    ox = offs % side - span
    oy = offs // side - span
    nxs = cx[:, None] + ox[None, :]
    nys = cy[:, None] + oy[None, :]
    in_fov = (nxs >= 0) & (nxs < nx) & (nys >= 0) & (nys < ny)
    nbr_out = cb[:, None] * ncells + jnp.clip(nys, 0, ny - 1) * nx \
        + jnp.clip(nxs, 0, nx - 1)
    # source-cell activity/tmax/positions: dense 2-D shifts of ONE combined
    # grid-shaped column table (slot order matches neighbor_rows), not an
    # [M, S] gather — and not one shift set per quantity (each shift set is
    # ~27 tiny device ops; the pooled tables are small enough that op count
    # is the cost)
    from ..models.graph import neighbor_rows
    mask_out = exist & in_fov & active[:, None]
    cols = [active[:, None].astype(jnp.float32)]
    if keep_temporal_ordering:  # pooling.py:69-72
        tmax = jnp.full((m_total + 1,), -jnp.inf, dtype=pos.dtype)
        tmax = tmax.at[cell_safe].max(
            jnp.where(node_mask, pos[:, 2], -jnp.inf))[:m_total]
        cols.append(jnp.where(jnp.isfinite(tmax), tmax,
                              -jnp.inf)[:, None].astype(jnp.float32))
    if return_pos_nbr:
        cols.append(pooled_pos[:, :2].astype(jnp.float32))
    shifts = neighbor_rows(jnp.concatenate(cols, axis=1), grid,
                           batch_size, span)
    mask_out = mask_out & (shifts[..., 0] > 0)
    col = 1
    if keep_temporal_ordering:
        # out-of-grid slots come back 0 from the shift; they are already
        # masked by in_fov above
        mask_out = mask_out & (tmax[:, None] > shifts[..., 1])
        col = 2
    pos_nbr_out = shifts[..., col:col + 2] if return_pos_nbr else None

    nbr_out = jnp.where(mask_out, nbr_out, 0)
    pooled_x = jnp.where(active[:, None], pooled_x, 0.0)
    batch_out = cb

    pg = PooledGraph(pooled_x, pooled_pos, nbr_out, mask_out, active,
                     batch_out)
    if return_pos_nbr:
        return pg, pos_nbr_out
    return pg
