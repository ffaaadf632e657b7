"""Event-axis sequence parallelism (SP) for the frozen feature path.

The reference has no distributed execution at all (SURVEY.md 2.12); its
long-stream scaling story is the bounded sliding window (SURVEY.md 5.7).
On TPU the natural scale-out for ONE long event stream is to shard the
EVENT axis over the mesh: the level-0 stage (neighbour search + layer-1,
~98% of the nodes and most of the device time) is embarrassingly parallel
up to a ``lookback`` halo, while the pooled upper levels are tiny dense
cell tables (2240/560/140/35 cells) that are cheapest replicated.

Design (exact by construction, not approximate):

* the stream ``[N]`` is sharded into ``D`` contiguous blocks (events are
  time-sorted, so a block is a time slice);
* each shard receives the FULL previous block as halo via one
  ``lax.ppermute`` (requires ``2 * lookback <= block``): destinations in
  the current block reach back ``lookback`` events, and their block-2 conv
  gathers block-1 outputs of rows up to ``lookback`` further back — so
  block-1 is additionally computed for the halo's tail ``lookback`` rows;
* per-pixel queue ranks are computed once GLOBALLY (outside the sharded
  region, exactly like the batch path's host-precomputed ranks) so the
  search's priority/eviction semantics cannot drift at shard boundaries;
* the sharded stage returns the level-1 outputs + neighbour tables for its
  own block; one ``all_gather`` (via the out-spec) re-assembles the
  stream, and the replicated finish reuses the SAME code the streaming
  path uses (``backbone_forward(start_level=1, pos_src0=...)``).

Equality with the single-device path is asserted in
tests/test_seq_shard.py against the streaming ``refresh`` computation
(itself proven equal to the batch forward by tests/test_streaming.py).

Reference anchor: this replaces nothing in the reference (single GPU,
src/dagr/graph/ev_graph.py streams on one device); it is the TPU-native
answer to scaling the unbounded event stream beyond one chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.backbone import backbone_forward, level0_attr_range, _act
from ..models.graph import Graph, lookup_pixel_features
from ..ops.event_graph import build_graph_auto, queue_rank
from ..ops.norm import batch_norm
from ..ops.spline_conv import offset_attr, spline_conv


def _input_rows(posn, pol, valid, image_feats, bc):
    """Level-0 input features for a row set (mirrors
    streaming/incremental._input_rows: polarity + full-res CNN row lookup
    + normalized xy, the net.py:107-123 order)."""
    feats = [jnp.where(valid[:, None], pol[:, None], 0.0)]
    img1 = jnp.zeros((posn.shape[0], 1))
    zeros = jnp.zeros((posn.shape[0],), jnp.int32)
    if bc.use_image:
        feats.append(lookup_pixel_features(image_feats[0], posn, zeros,
                                           valid, bc.width, bc.height))
        img1 = lookup_pixel_features(image_feats[1], posn, zeros, valid,
                                     bc.width, bc.height)
    feats.append(jnp.where(valid[:, None], posn[:, :2], 0.0))
    return jnp.concatenate(feats, axis=1), img1


def seq_sharded_level0(params, mstate, bc, gsc, pos, polarity, valid,
                       image_feats, mesh: Mesh, axis: str = "data"):
    """Sharded graph build + layer-1 over the event axis.

    Args: ``pos [N, 3]`` int32 (time-sorted, absolute t), ``polarity [N]``,
    ``valid [N]``; ``image_feats``: CNN pyramid with maps 0/1 upsampled to
    full resolution (as ``streaming.incremental.update_image`` stores
    them), or None. ``N`` must divide by the mesh axis size and the block
    must satisfy ``2 * lookback <= block``.

    Returns full-stream ``(h1 [N,C1], img1 [N,Cimg], nbr [N,K] global,
    nbr_mask [N,K], off [N,K,2])``.
    """
    (radius_px, delta_t_us, max_nb, max_q, lookback, width, height,
     time_window) = gsc
    n = pos.shape[0]
    d = mesh.shape[axis]
    blk = n // d
    assert blk * d == n, (n, d)
    lb = min(lookback, blk)
    assert 2 * lb <= blk, \
        f"seq shard needs 2*lookback <= block ({2 * lb} > {blk})"

    # global queue ranks (the search's eviction/priority semantics must
    # not depend on where shard boundaries fall)
    pix = pos[:, 1] * jnp.int32(width) + pos[:, 0]
    ranks = queue_rank(pix, valid)

    t_now = jnp.where(valid, pos[:, 2], 0).max()
    act = _act(bc.activation)
    lp = params.dagr.backbone.layers[0]
    ls = mstate.dagr.backbone.layers[0]
    fold = bc.aggr == "sum"
    s0 = 1 if fold else 0
    arange = level0_attr_range(bc)

    def stage(pos_b, pol_b, val_b, rank_b):
        idx = jax.lax.axis_index(axis)
        perm = [(i, i + 1) for i in range(d - 1)]

        def halo(a, fill):
            h = jax.lax.ppermute(a, axis, perm)
            return jnp.where(idx == 0,
                             jnp.full_like(h, fill), h)

        hp = halo(pos_b, 0)
        win_pos = jnp.concatenate([hp, pos_b])              # [2blk, 3]
        win_val = jnp.concatenate([halo(val_b.astype(jnp.int32), 0) > 0,
                                   val_b])
        win_pol = jnp.concatenate([halo(pol_b, 0.0), pol_b])
        win_rank = jnp.concatenate([halo(rank_b, 10 ** 6), rank_b])

        nbr, nbrm, off = build_graph_auto(
            win_pos[None], win_val[None], win_rank[None],
            radius=radius_px, delta_t_us=delta_t_us, max_neighbors=max_nb,
            max_queue_size=max_q, lookback=lb, grid_wh=(width, height))
        nbr, nbrm, off = nbr[0], nbrm[0], off[0]

        denom = jnp.asarray([width, height, time_window], jnp.float32)
        t_rel = win_pos[:, 2] - t_now + time_window
        posn = (win_pos.astype(jnp.float32).at[:, 2]
                .set(t_rel.astype(jnp.float32))) / denom
        x_in, img1 = _input_rows(posn, win_pol, win_val, image_feats, bc)

        # block-1 for the halo tail + current block (their outputs feed
        # the current block's block-2 gathers); rows below blk-lb have
        # possibly-truncated windows and are never consumed
        lo = blk - lb
        nbr_c = nbr[lo:, s0:]
        nbrm_c = nbrm[lo:, s0:]
        off_c = off[lo:, s0:]
        attr_c = offset_attr(off_c, nbrm_c, bc.cart_max[0], width, height)
        dmask_c = win_val[lo:]
        h = spline_conv(x_in, nbr_c, nbrm_c, attr_c, lp.block1.conv,
                        kernel_size=bc.kernel_size, aggr=bc.aggr,
                        x_dst=x_in[lo:], attr_range=arange,
                        add_center_to_root=fold)
        h, _ = batch_norm(h, dmask_c, lp.block1.bn, ls.block1.bn,
                          training=False)
        h_b1 = jnp.zeros((2 * blk, h.shape[1])).at[lo:].set(
            jnp.where(dmask_c[:, None], act(h), 0.0))

        # block-2 + skip for the current block only
        nbr_d = nbr[blk:, s0:]
        nbrm_d = nbrm[blk:, s0:]
        off_d = off[blk:, s0:]
        attr_d = offset_attr(off_d, nbrm_d, bc.cart_max[0], width, height)
        dmask = val_b
        h2 = spline_conv(h_b1, nbr_d, nbrm_d, attr_d, lp.block2.conv,
                         kernel_size=bc.kernel_size, aggr=bc.aggr,
                         x_dst=h_b1[blk:], attr_range=arange,
                         add_center_to_root=fold)
        h2, _ = batch_norm(h2, dmask, lp.block2.bn, ls.block2.bn,
                           training=False)
        skip = x_in[blk:] @ lp.skip_lin + lp.skip_lin_bias
        skip, _ = batch_norm(skip, dmask, lp.skip_bn, ls.skip_bn,
                             training=False)
        h1 = jnp.where(dmask[:, None], act(h2 + skip), 0.0)

        # local window indices -> global stream indices (window row 0 is
        # global ``idx*blk - blk``)
        base = idx * blk - blk
        nbr_g = jnp.where(nbrm[blk:], nbr[blk:] + base, 0)
        return h1, img1[blk:], nbr_g, nbrm[blk:], off[blk:]

    spec = P(axis)
    stage_sm = jax.shard_map(
        stage, mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec, spec),
        check_vma=False)
    return stage_sm(pos, polarity, valid, ranks)


def seq_sharded_features(params, mstate, bc, gsc, pos, polarity, valid,
                         image_feats, mesh: Mesh, axis: str = "data"):
    """Full frozen-feature extraction with the level-0 stage sharded over
    the event axis and the (tiny) pooled upper levels replicated: returns
    the ``(out3, out4)`` graphs like ``dagr_extract_features`` at B=1."""
    (radius_px, _d, _k, _q, _l, width, height, time_window) = gsc
    h1, img1, nbr, nbrm, off = seq_sharded_level0(
        params, mstate, bc, gsc, pos, polarity, valid, image_feats, mesh,
        axis)
    x1 = jnp.concatenate([h1, img1], axis=1) if bc.use_image else h1
    n = pos.shape[0]
    t_now = jnp.where(valid, pos[:, 2], 0).max()
    denom = jnp.asarray([width, height, time_window], jnp.float32)
    t_rel = pos[:, 2] - t_now + time_window
    posn = (pos.astype(jnp.float32).at[:, 2]
            .set(t_rel.astype(jnp.float32))) / denom
    g = Graph(x1, posn, nbr, nbrm, valid, jnp.zeros((n,), jnp.int32))
    wh = jnp.asarray([width, height], jnp.float32)
    pos_src0 = (pos[:, None, :2] - off).astype(jnp.float32) / wh
    outs, _ = backbone_forward(params.dagr.backbone, mstate.dagr.backbone,
                               g, image_feats, bc, training=False,
                               start_level=1, pos_src0=pos_src0)
    return outs
