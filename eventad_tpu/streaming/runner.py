"""Streaming inference step: ``(state, new_events) -> (state, scores)``.

Replaces the reference's asynchronous runtime driver
(src/dagr/asynchronous/evaluate_flops.py:82-165): the sliding window
advances by appending the newest events to a ring buffer and dropping the
oldest (``SlidingWindowGraph.delete_nodes`` semantics via slot shifting —
the whole buffer is a static-shape array, so "deleting n oldest" is a roll);
the temporal-radius cutoff makes old events unreachable to the neighbour
search before they are physically evicted, so results match the batch path
whenever the buffer covers the time window (tested by
tests/test_streaming.py, the analog of the reference's
``check_consistency``).

The CNN pyramid is cached between frames (reference recomputes it every
forward); the GRU hidden state persists across steps (its natural streaming
semantics).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.backbone import BackboneConfig, backbone_forward
from ..models.dagr import ModelParams, ModelState, build_level0_graph
from ..models.eventad import (EventADConfig, fusion_forward,
                              spatial_attention)
from ..models.feature_extract import extract_box_features
from ..models.gru import gru_step
from .state import StreamingState


def insert_events(state: StreamingState, new_pos: jnp.ndarray,
                  new_pol: jnp.ndarray, n_new: jnp.ndarray
                  ) -> StreamingState:
    """Appends up to ``len(new_pos)`` events (first ``n_new`` valid), evicting
    the oldest. The buffer stays chronologically sorted."""
    k = new_pos.shape[0]
    pos = jnp.roll(state.pos, -k, axis=0)
    pol = jnp.roll(state.polarity, -k, axis=0)
    val = jnp.roll(state.valid, -k, axis=0)
    slot_ok = jnp.arange(k) < n_new
    pos = pos.at[-k:].set(jnp.where(slot_ok[:, None], new_pos, 0))
    pol = pol.at[-k:].set(jnp.where(slot_ok, new_pol, 0.0))
    val = val.at[-k:].set(slot_ok)
    t_now = jnp.maximum(state.t_now, jnp.where(slot_ok, new_pos[:, 2],
                                               0).max())
    return state._replace(pos=pos, polarity=pol, valid=val, t_now=t_now)


def make_stream_step(params: ModelParams, mstate: ModelState,
                     bc: BackboneConfig, mc: EventADConfig, gsc: tuple,
                     *, n_chunk: int):
    """Builds the jitted streaming step.

    The step consumes a chunk of up to ``n_chunk`` new events and the
    current frame's box slots; emits per-slot anomaly logits. Single-item
    (B=1) streaming — ``bc.batch_size`` must be 1.
    """
    assert bc.batch_size == 1, "streaming runs one stream (batch_size=1)"
    (radius_px, delta_t_us, max_nb, max_q, lookback, width, height,
     time_window) = gsc

    @jax.jit
    def step(state: StreamingState,
             new_pos: jnp.ndarray,     # [n_chunk, 3] int32 absolute t
             new_pol: jnp.ndarray,     # [n_chunk]
             n_new: jnp.ndarray,       # scalar
             boxes: jnp.ndarray,       # [S+1, 4] pixels (current frame)
             box_present: jnp.ndarray  # [S+1] bool
             ) -> Tuple[StreamingState, jnp.ndarray]:
        state = insert_events(state, new_pos, new_pol, n_new)
        # rebase timestamps so the window ends at time_window (the
        # preprocessing contract, dsec_data.py:124-130)
        t_rel = state.pos[:, 2] - state.t_now + time_window
        in_window = state.valid & (t_rel >= 0)
        pos_rel = state.pos.at[:, 2].set(jnp.where(in_window, t_rel, 0))
        g0 = build_level0_graph(pos_rel[None], state.polarity[None],
                                in_window[None], gsc)
        outs, _ = backbone_forward(params.dagr.backbone,
                                   mstate.dagr.backbone, g0,
                                   state.image_feats, bc, training=False)
        out4 = outs[1]
        feats = extract_box_features(
            out4, boxes[None, None], box_present[None, None], 1, width,
            height)[0, 0]                                  # [S+1, C]
        denom = jnp.asarray([width, height, width, height], jnp.float32)
        coords = boxes / denom

        feat_ok = jnp.abs(feats).sum(-1) > 0
        slot_ids = jnp.arange(boxes.shape[0])
        v = box_present & feat_ok & (slot_ids >= 1) \
            & (slot_ids <= mc.max_boxes)
        h_in_e = jnp.where(state.seen[:, None, None], state.h_event, 0.0)
        h_in_c = jnp.where(state.seen[:, None, None], state.h_coord, 0.0)
        out_e, h_out_e = gru_step(params.head.gru_event, feats, h_in_e)
        out_c, h_out_c = gru_step(params.head.gru_coord, coords, h_in_c)
        logits = fusion_forward(params.head.fusion, out_e, out_c,
                                dropout=0.0, rng=None)
        att_e = spatial_attention(h_out_e, params.head.att_event_w, v)
        att_c = spatial_attention(h_out_c, params.head.att_coord_w, v)
        state = state._replace(
            h_event=jnp.where(v[:, None, None], att_e, state.h_event),
            h_coord=jnp.where(v[:, None, None], att_c, state.h_coord),
            seen=state.seen | v)
        logits = jnp.where(v[:, None], logits, 0.0)
        return state, logits

    return step


def update_image(params: ModelParams, mstate: ModelState,
                 state: StreamingState, image: jnp.ndarray,
                 img_net: str = "resnet50") -> StreamingState:
    """Refreshes the cached CNN pyramid when a new frame arrives."""
    from ..models.resnet import cnn_branch_forward
    feats, _, _ = cnn_branch_forward(params.dagr.cnn, mstate.dagr.cnn,
                                     image[None], img_net, training=False)
    return state._replace(image_feats=tuple(feats))
