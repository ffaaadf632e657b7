"""Incremental (delta) streaming: cached level-0 activations.

The TPU-native equivalent of the reference's asynchronous runtime
(src/dagr/asynchronous/): recompute only what a new event chunk can change.

Key structural fact (from the graph contract, ev_graph.cu:62-64): edges
always point from OLDER to NEWER events, so an event's receptive field never
grows after it arrives — with eval-mode batch norm (pointwise, running
stats) the level-0 layer outputs of buffered events are immutable. A chunk
step therefore only:

1. rolls the ring caches and computes the new rows' input features
   (polarity + cached-CNN samples + rel-xy, net.py:107-123 order);
2. runs the neighbour search with the new chunk as destinations (candidate
   window = the buffer tail, one static slice);
3. runs Layer-1 for the new rows only, gathering neighbour features from the
   caches (``spline_conv(x_dst=...)``), and writes them back;
4. re-pools the whole buffer from caches and runs the small upper levels +
   the recurrent head exactly like the batch path (``backbone_forward``
   with ``start_level=1``).

A new FRAME invalidates the CNN samples: ``refresh_caches`` rebuilds the
whole buffer once per frame (amortized across the event-rate chunk steps).
Consistency with the batch path is exact and covered by
tests/test_streaming.py.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.backbone import (BackboneConfig, _act, backbone_forward,
                               layer_in_out_channels, level0_attr_range)
from ..models.dagr import ModelParams, ModelState
from ..models.eventad import EventADConfig, fusion_forward, spatial_attention
from ..models.feature_extract import extract_box_features
from ..models.graph import Graph, lookup_pixel_features
from ..models.gru import gru_step
from ..ops.event_graph import build_graph_auto
from ..ops.norm import batch_norm
from ..ops.spline_conv import offset_attr, spline_conv


class IncrementalState(NamedTuple):
    pos: jnp.ndarray        # [N_buf, 3] int32 absolute t (newest at end)
    polarity: jnp.ndarray   # [N_buf]
    valid: jnp.ndarray      # [N_buf]
    x_in: jnp.ndarray       # [N_buf, Cin0] layer-1 inputs (time-invariant)
    h_b1: jnp.ndarray       # [N_buf, C1] layer-1 block-1 outputs
    h1: jnp.ndarray         # [N_buf, C1] layer-1 outputs
    img1: jnp.ndarray       # [N_buf, Cimg1] image_feat[1] samples
    nbr0: jnp.ndarray       # [N_buf, K] level-0 neighbour table
    nbrm0: jnp.ndarray      # [N_buf, K]
    off0: jnp.ndarray       # [N_buf, K, 2] int32 per-edge pixel offsets
                            # (dst - src); attrs + exact pooling source
                            # positions derive from these arithmetically
    image_feats: Optional[tuple]
    h_event: jnp.ndarray
    h_coord: jnp.ndarray
    seen: jnp.ndarray
    t_now: jnp.ndarray
    # detector streaming only: per-frame CNN-head logit maps (computed once
    # per image by detect.update_image_detector; the read path adds them)
    cnn_maps: Optional[dict] = None


def init_incremental_state(n_buf: int, bc: BackboneConfig,
                           mc: EventADConfig,
                           image_feats=None,
                           max_neighbors: int = 16) -> IncrementalState:
    """``max_neighbors`` must match the graph config's neighbour cap
    (``graph_static_config(cfg)[2]`` / ``cfg.max_neighbors``) — it sizes the
    cached level-0 neighbour table."""
    pairs = layer_in_out_channels(bc)
    c_in0, c1 = pairs[0]
    c_img1 = bc.image_channels[1] if bc.use_image else 1
    s1 = mc.max_boxes + 1
    k = max_neighbors
    return IncrementalState(
        pos=jnp.zeros((n_buf, 3), jnp.int32),
        polarity=jnp.zeros((n_buf,)),
        valid=jnp.zeros((n_buf,), bool),
        x_in=jnp.zeros((n_buf, c_in0)),
        h_b1=jnp.zeros((n_buf, c1)),
        h1=jnp.zeros((n_buf, c1)),
        img1=jnp.zeros((n_buf, c_img1)),
        nbr0=jnp.zeros((n_buf, k), jnp.int32),
        nbrm0=jnp.zeros((n_buf, k), bool),
        off0=jnp.zeros((n_buf, k, 2), jnp.int32),
        image_feats=image_feats,
        h_event=jnp.zeros((s1, mc.event_layers, mc.h_dim)),
        h_coord=jnp.zeros((s1, mc.coord_layers, mc.coord_dim)),
        seen=jnp.zeros((s1,), bool),
        t_now=jnp.zeros((), jnp.int32))


def _norm_pos(pos, t_now, gsc):
    (_r, _d, _k, _q, _l, width, height, time_window) = gsc
    t_rel = pos[:, 2] - t_now + time_window
    denom = jnp.asarray([width, height, time_window], jnp.float32)
    p = pos.astype(jnp.float32).at[:, 2].set(t_rel.astype(jnp.float32))
    return p / denom


def _input_rows(state, posn_rows, pol_rows, valid_rows, bc):
    feats = [jnp.where(valid_rows[:, None], pol_rows[:, None], 0.0)]
    img1 = jnp.zeros((posn_rows.shape[0], state.img1.shape[1]))
    zeros = jnp.zeros((posn_rows.shape[0],), jnp.int32)
    if bc.use_image:
        # image_feats[0]/[1] are stored UPSAMPLED to full resolution
        # (update_image) — feature fetch is one integer row lookup,
        # identical to the batch path's upsample+lookup
        feats.append(lookup_pixel_features(
            state.image_feats[0], posn_rows, zeros, valid_rows, bc.width,
            bc.height))
        img1 = lookup_pixel_features(
            state.image_feats[1], posn_rows, zeros, valid_rows, bc.width,
            bc.height)
    feats.append(jnp.where(valid_rows[:, None], posn_rows[:, :2], 0.0))
    return jnp.concatenate(feats, axis=1), img1


def _layer1_rows(params, mstate, bc, x_in_full, h_b1_full, nbr, nbrm, attr,
                 x_dst_in, dmask):
    """Layer-1 (two conv blocks + skip) for a row subset, eval-mode BN.

    Numerics must be identical to the batch path's ``apply_layer`` at level
    0 (tests/test_streaming.py): same self-edge fold (slot 0 dropped, center
    kernel folded into root) and the same static attr-range tap restriction.
    """
    act = _act(bc.activation)
    lp = params.dagr.backbone.layers[0]
    ls = mstate.dagr.backbone.layers[0]
    fold = bc.aggr == "sum"
    s0 = 1 if fold else 0
    arange = level0_attr_range(bc)
    nbr, nbrm, attr = nbr[:, s0:], nbrm[:, s0:], attr[:, s0:]
    h = spline_conv(x_in_full, nbr, nbrm, attr, lp.block1.conv,
                    kernel_size=bc.kernel_size, aggr=bc.aggr,
                    x_dst=x_dst_in, attr_range=arange,
                    add_center_to_root=fold)
    h, _ = batch_norm(h, dmask, lp.block1.bn, ls.block1.bn, training=False)
    h_b1_rows = jnp.where(dmask[:, None], act(h), 0.0)
    # block2 gathers block-1 outputs of neighbours; same-chunk neighbours
    # are impossible to miss because the full h_b1 cache is updated first
    h_b1_full = h_b1_full.at[-h_b1_rows.shape[0]:].set(h_b1_rows)
    h2 = spline_conv(h_b1_full, nbr, nbrm, attr, lp.block2.conv,
                     kernel_size=bc.kernel_size, aggr=bc.aggr,
                     x_dst=h_b1_rows, attr_range=arange,
                     add_center_to_root=fold)
    h2, _ = batch_norm(h2, dmask, lp.block2.bn, ls.block2.bn,
                       training=False)
    skip = x_dst_in @ lp.skip_lin + lp.skip_lin_bias
    skip, _ = batch_norm(skip, dmask, lp.skip_bn, ls.skip_bn,
                         training=False)
    h1_rows = jnp.where(dmask[:, None], act(h2 + skip), 0.0)
    return h_b1_rows, h1_rows, h_b1_full


def pooled_backbone_outs(params, mstate, bc, state: IncrementalState,
                         posn, gsc):
    """Pool the cached level-0 outputs and run levels 2-5; returns the
    (out3, out4) graphs (shared by the anomaly and detection read paths)."""
    (_r, _d, _k, _q, _l, width, height, _tw) = gsc
    x1 = state.h1
    if bc.use_image:
        x1 = jnp.concatenate([x1, state.img1], axis=1)
    n_buf = x1.shape[0]
    g = Graph(x1, posn, state.nbr0, state.nbrm0, state.valid,
              jnp.zeros((n_buf,), jnp.int32))
    # exact source positions for pool-1's cell assignment from the cached
    # integer offsets (x_src = x_dst - off is the true source pixel; its
    # normalization is bitwise the batch normalizer's division) — avoids
    # pool_graph's per-edge cell gather
    wh = jnp.asarray([width, height], jnp.float32)
    pos_src0 = (state.pos[:, None, :2] - state.off0).astype(jnp.float32) / wh
    outs, _ = backbone_forward(params.dagr.backbone, mstate.dagr.backbone,
                               g, state.image_feats, bc, training=False,
                               start_level=1, pos_src0=pos_src0)
    return outs


def _upper_levels_and_head(params, mstate, bc, mc, state, posn, boxes,
                           box_present, gsc):
    """Pool the cached level-0 outputs and run levels 2-5 + the head."""
    (_r, _d, _k, _q, _l, width, height, _tw) = gsc
    outs = pooled_backbone_outs(params, mstate, bc, state, posn, gsc)
    out4 = outs[1]
    feats = extract_box_features(out4, boxes[None, None],
                                 box_present[None, None], 1, width,
                                 height)[0, 0]
    denom = jnp.asarray([width, height, width, height], jnp.float32)
    coords = boxes / denom
    feat_ok = jnp.abs(feats).sum(-1) > 0
    slot_ids = jnp.arange(boxes.shape[0])
    v = box_present & feat_ok & (slot_ids >= 1) & (slot_ids <= mc.max_boxes)
    h_in_e = jnp.where(state.seen[:, None, None], state.h_event, 0.0)
    h_in_c = jnp.where(state.seen[:, None, None], state.h_coord, 0.0)
    out_e, h_out_e = gru_step(params.head.gru_event, feats, h_in_e)
    out_c, h_out_c = gru_step(params.head.gru_coord, coords, h_in_c)
    logits = fusion_forward(params.head.fusion, out_e, out_c,
                            dropout=0.0, rng=None)
    att_e = spatial_attention(h_out_e, params.head.att_event_w, v)
    att_c = spatial_attention(h_out_c, params.head.att_coord_w, v)
    new = state._replace(
        h_event=jnp.where(v[:, None, None], att_e, state.h_event),
        h_coord=jnp.where(v[:, None, None], att_c, state.h_coord),
        seen=state.seen | v)
    return new, jnp.where(v[:, None], logits, 0.0)


def make_incremental_step(params: ModelParams, mstate: ModelState,
                          bc: BackboneConfig, mc: EventADConfig, gsc: tuple,
                          *, n_chunk: int, n_buf: int):
    """Builds (refresh_fn, step_fn), both jitted.

    ``refresh_fn(state)`` rebuilds every cache from the raw ring buffers
    (call after ``update_image`` on each new frame and once at start).
    ``step_fn(state, new_pos, new_pol, n_new, boxes, box_present)`` appends
    a chunk and returns per-slot logits.

    ``mc=None`` builds the shared level-0 machinery WITHOUT an anomaly
    head (the streaming detector's mode, detect.py): ``refresh``/``append``
    work as usual, while every head-dependent entry point
    (``step``/``read_scores``/``step_many``) raises instead of silently
    tracing placeholder head dimensions.

    The returned namespace also exposes the split API:
    ``append(state, new_pos, new_pol, n_new)`` ingests a chunk updating only
    the level-0 caches (the event-rate hot path), and
    ``read_scores(state, boxes, box_present)`` runs the pooled upper levels
    + recurrent head on demand (frame rate / alert checks).
    """
    assert bc.batch_size == 1
    (radius_px, delta_t_us, max_nb, max_q, lookback, width, height,
     time_window) = gsc
    # the batch path's lookback (exact-consistency contract); the chunk
    # window additionally needs lookback <= n_buf - n_chunk
    lb_exact = min(lookback, n_buf)
    lookback = min(lookback, n_buf - n_chunk)

    @jax.jit
    def refresh(state: IncrementalState) -> IncrementalState:
        posn = _norm_pos(state.pos, state.t_now, gsc)
        x_in, img1 = _input_rows(state, posn, state.polarity, state.valid,
                                 bc)
        nbr, nbrm, doff = build_graph_auto(
            state.pos[None], state.valid[None], radius=radius_px,
            delta_t_us=delta_t_us, max_neighbors=max_nb,
            max_queue_size=max_q, lookback=lb_exact,
            grid_wh=(width, height))
        nbr, nbrm, doff = nbr[0], nbrm[0], doff[0]
        attr = offset_attr(doff, nbrm, bc.cart_max[0], width, height)
        h_b1_rows, h1_rows, h_b1_full = _layer1_rows(
            params, mstate, bc, x_in, jnp.zeros_like(state.h_b1), nbr, nbrm,
            attr, x_in, state.valid)
        return state._replace(x_in=x_in, img1=img1, nbr0=nbr, nbrm0=nbrm,
                              off0=doff, h_b1=h_b1_rows, h1=h1_rows)

    @jax.jit
    def append(state: IncrementalState, new_pos, new_pol, n_new):
        k = n_chunk
        # 1. roll ring caches, insert new rows
        slot_ok = jnp.arange(k) < n_new

        def roll_set(a, rows, fill=0):
            a = jnp.roll(a, -k, axis=0)
            return a.at[-k:].set(rows)

        pos = roll_set(state.pos, jnp.where(slot_ok[:, None], new_pos, 0))
        pol = roll_set(state.polarity, jnp.where(slot_ok, new_pol, 0.0))
        valid = roll_set(state.valid, slot_ok)
        t_now = jnp.maximum(state.t_now,
                            jnp.where(slot_ok, new_pos[:, 2], 0).max())
        # neighbour indices shift with the roll; evicted sources mask out
        nbr0 = jnp.roll(state.nbr0, -k, axis=0) - k
        nbrm0 = jnp.roll(state.nbrm0, -k, axis=0) & (nbr0 >= 0)
        nbr0 = jnp.where(nbrm0, nbr0, 0)
        off0 = jnp.where(nbrm0[..., None],
                         jnp.roll(state.off0, -k, axis=0), 0)
        state = state._replace(
            pos=pos, polarity=pol, valid=valid, t_now=t_now,
            x_in=jnp.roll(state.x_in, -k, axis=0),
            h_b1=jnp.roll(state.h_b1, -k, axis=0),
            h1=jnp.roll(state.h1, -k, axis=0),
            img1=jnp.roll(state.img1, -k, axis=0))

        # 2. new rows' input features
        posn = _norm_pos(pos, t_now, gsc)
        x_rows, img1_rows = _input_rows(state, posn[-k:], pol[-k:],
                                        valid[-k:], bc)
        x_in = state.x_in.at[-k:].set(x_rows)
        img1 = state.img1.at[-k:].set(img1_rows)

        # 3. neighbour search: chunk destinations over the buffer tail
        w0 = n_buf - (lookback + k)
        tail_pos = jax.lax.dynamic_slice(pos, (w0, 0), (lookback + k, 3))
        tail_valid = jax.lax.dynamic_slice(valid, (w0,), (lookback + k,))
        # chunk=16: the tail search has only (lookback + n_chunk)/chunk
        # destination chunks to spread over the Pallas kernel's 128 lanes —
        # at the default chunk=128 that is ~12 active lanes (9% utilization)
        # and every VPU op runs on [128, 128] tiles; 16 destinations per
        # chunk fills 96 lanes at [16, 128] tiles, 8x less work per step.
        # chunk is an implementation tile only: every destination's
        # candidate reach is exactly ``lookback`` events regardless
        # (consistency with the batch path is pinned by test_streaming).
        nbr_t, nbrm_t, doff_t = build_graph_auto(
            tail_pos[None], tail_valid[None], radius=radius_px,
            delta_t_us=delta_t_us, max_neighbors=max_nb,
            max_queue_size=max_q, lookback=lookback,
            chunk=16, grid_wh=(width, height))
        nbr_t, nbrm_t, doff_t = nbr_t[0], nbrm_t[0], doff_t[0]
        nbr_c = nbr_t[-k:] + w0
        nbrm_c = nbrm_t[-k:]
        off_c = doff_t[-k:]
        nbr_c = jnp.where(nbrm_c, nbr_c, 0)
        nbr0 = nbr0.at[-k:].set(nbr_c)
        nbrm0 = nbrm0.at[-k:].set(nbrm_c)
        off0 = off0.at[-k:].set(off_c)

        # 4. Layer-1 for the chunk rows only
        attr = offset_attr(off_c, nbrm_c, bc.cart_max[0], width, height)
        h_b1_rows, h1_rows, h_b1_full = _layer1_rows(
            params, mstate, bc, x_in, state.h_b1, nbr_c, nbrm_c, attr,
            x_rows, valid[-k:])
        return state._replace(x_in=x_in, img1=img1, nbr0=nbr0,
                               nbrm0=nbrm0, off0=off0, h_b1=h_b1_full,
                               h1=state.h1.at[-k:].set(h1_rows))

    def _require_head():
        if mc is None:
            raise RuntimeError(
                "this incremental step was built without an anomaly-head "
                "config (mc=None, the streaming-detector mode): "
                "step/read_scores/step_many are unavailable; use "
                "append/read_detections")

    @jax.jit
    def read_scores(state: IncrementalState, boxes, box_present):
        _require_head()
        posn = _norm_pos(state.pos, state.t_now, gsc)
        return _upper_levels_and_head(params, mstate, bc, mc, state, posn,
                                      boxes, box_present, gsc)

    @jax.jit
    def step(state: IncrementalState, new_pos, new_pol, n_new, boxes,
             box_present):
        _require_head()
        state = append(state, new_pos, new_pol, n_new)
        posn = _norm_pos(state.pos, state.t_now, gsc)
        return _upper_levels_and_head(params, mstate, bc, mc, state, posn,
                                      boxes, box_present, gsc)

    @jax.jit
    def append_many(state: IncrementalState, pos_chunks, pol_chunks,
                    n_chunks):
        """Ingest ``M`` chunks in one call (``pos_chunks [M, n_chunk, 3]``,
        ``pol_chunks [M, n_chunk]``, ``n_chunks [M]``): a ``lax.scan`` over
        :func:`append`.  Semantically identical to ``M`` separate appends;
        one dispatch amortizes the per-call host round-trip (catch-up
        ingest, and the honest device-rate measurement)."""
        def body(st, xs):
            p, q, n = xs
            return append(st, p, q, n), ()

        state, _ = jax.lax.scan(body, state,
                                (pos_chunks, pol_chunks, n_chunks))
        return state

    @jax.jit
    def step_many(state: IncrementalState, pos_chunks, pol_chunks, n_chunks,
                  boxes_frames, present_frames):
        """``M`` full frame steps (append + score read) in one dispatch:
        ``pos_chunks [M, n_chunk, 3]``, ``boxes_frames [M, S, 4]``,
        ``present_frames [M, S]``.  Returns (state, logits ``[M, S, 2]``).
        Semantically identical to ``M`` separate ``step`` calls; one
        dispatch amortizes the per-call host round-trip, so the per-frame
        quotient is the honest device frame rate (the streaming north-star
        measurement)."""
        _require_head()

        def body(st, xs):
            p, q, n, bx, bp = xs
            st = append(st, p, q, n)
            posn = _norm_pos(st.pos, st.t_now, gsc)
            st, logits = _upper_levels_and_head(params, mstate, bc, mc, st,
                                                posn, bx, bp, gsc)
            return st, logits

        return jax.lax.scan(body, state,
                            (pos_chunks, pol_chunks, n_chunks,
                             boxes_frames, present_frames))

    step.append = append
    step.append_many = append_many
    append.many = append_many      # riders of the bare append (detect.py)
    step.read_scores = read_scores
    step.many = step_many
    return refresh, step


def insert_raw(state: IncrementalState, pos_rows, pol_rows,
               n_new) -> IncrementalState:
    """Fill the raw ring buffers without computing caches (used before the
    initial refresh)."""
    k = pos_rows.shape[0]
    ok = jnp.arange(k) < n_new
    return state._replace(
        pos=jnp.roll(state.pos, -k, 0).at[-k:].set(
            jnp.where(ok[:, None], pos_rows, 0)),
        polarity=jnp.roll(state.polarity, -k, 0).at[-k:].set(
            jnp.where(ok, pol_rows, 0.0)),
        valid=jnp.roll(state.valid, -k, 0).at[-k:].set(ok),
        t_now=jnp.maximum(state.t_now,
                          jnp.where(ok, pos_rows[:, 2], 0).max()))


def update_image(params: ModelParams, mstate: ModelState,
                 state: IncrementalState, image,
                 img_net: str = "resnet50",
                 width: int = None, height: int = None) -> IncrementalState:
    from ..models.graph import upsample_align_corners
    from ..models.resnet import cnn_branch_forward
    feats, _, _ = cnn_branch_forward(params.dagr.cnn, mstate.dagr.cnn,
                                     image[None], img_net, training=False)
    w = width if width is not None else image.shape[1]
    h = height if height is not None else image.shape[0]
    # maps 0/1 are consumed at event positions every chunk: store them
    # upsampled to full resolution so the fetch is an integer row lookup
    feats = list(feats)
    feats[0] = upsample_align_corners(feats[0], w, h)
    feats[1] = upsample_align_corners(feats[1], w, h)
    return state._replace(image_feats=tuple(feats))
