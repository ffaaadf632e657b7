"""EventAD anomaly head — the trained part of the pipeline, TPU-native.

Reference: ``EventADModel`` (models/EventAD.py:141-499). The reference walks
every batch element and every track id in Python, running one GRU step per
bounding box and keeping per-track hidden states in string-keyed dicts; every
``.item()`` in that loop is a device sync. Here the state is a dense slot
tensor over ``max_boxes+1`` track slots and the whole per-frame update is one
vectorized step inside ``lax.scan`` over the batch axis (batch elements are
*consecutive frames* of a video — hidden state deliberately flows across
them, reference EventAD.py:202-206; preserved).

Semantics preserved from the reference, including its quirks:
* a slot is processed iff its current-frame feature is non-zero *and* a bbox
  with that track id exists (EventAD.py:229,237-239);
* the previous-frame feature plane ``features[:, 0]`` is computed but unused
  by the recurrent update (only ``features[:, 1]`` feeds the GRU);
* ``Fuse_GRUNet``'s MultiheadAttention is constructed but never called
  (EventAD.py:20) — omitted here;
* anomaly score = raw logit channel 1 (utils/test.py:109-111), no softmax;
* loss = *sum* (not mean) of per-box cross entropies (EventAD.py:280-309).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .gru import GRUParams, gru_step, init_gru


class FusionParams(NamedTuple):
    event_proj_w: jnp.ndarray   # [h_dim, 256]
    event_proj_b: jnp.ndarray
    coord_proj_w: jnp.ndarray   # [32, 256]
    coord_proj_b: jnp.ndarray
    fuse1_w: jnp.ndarray        # [512, 256]
    fuse1_b: jnp.ndarray
    fuse2_w: jnp.ndarray        # [256, 2]
    fuse2_b: jnp.ndarray


class EventADParams(NamedTuple):
    gru_event: GRUParams        # 2-layer, x_dim -> h_dim
    gru_coord: GRUParams        # 1-layer, 4 -> 32
    fusion: FusionParams
    att_event_w: jnp.ndarray    # [h_dim, 1] SpatialAttention weight
    att_coord_w: jnp.ndarray    # [32, 1]


class EventADConfig(NamedTuple):
    x_dim: int = 64
    h_dim: int = 256
    coord_dim: int = 32
    max_boxes: int = 30
    event_layers: int = 2
    coord_layers: int = 1
    dropout: float = 0.3


def _linear_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    s = 1.0 / cin ** 0.5
    w = jax.random.uniform(k1, (cin, cout), minval=-s, maxval=s)
    b = jax.random.uniform(k2, (cout,), minval=-s, maxval=s)
    return w, b


def init_eventad(key, mc: EventADConfig) -> EventADParams:
    ks = jax.random.split(key, 8)
    ew, eb = _linear_init(ks[0], mc.h_dim, 256)
    cw, cb = _linear_init(ks[1], mc.coord_dim, 256)
    f1w, f1b = _linear_init(ks[2], 512, 256)
    f2w, f2b = _linear_init(ks[3], 256, 2)
    fusion = FusionParams(ew, eb, cw, cb, f1w, f1b, f2w, f2b)
    # SpatialAttention weight: kaiming_normal_(a=sqrt(5)) on [h, 1]
    aw_e = jax.random.normal(ks[4], (mc.h_dim, 1)) * (2.0 / (1 + 5) / mc.h_dim) ** 0.5
    aw_c = jax.random.normal(ks[5], (mc.coord_dim, 1)) * (2.0 / (1 + 5) / mc.coord_dim) ** 0.5
    return EventADParams(
        init_gru(ks[6], mc.x_dim, mc.h_dim, mc.event_layers),
        init_gru(ks[7], 4, mc.coord_dim, mc.coord_layers),
        fusion, aw_e, aw_c)


def spatial_attention(h: jnp.ndarray, w: jnp.ndarray,
                      valid: jnp.ndarray) -> jnp.ndarray:
    """Masked soft attention over track slots (EventAD.py:100-138).

    Args: h ``[S, L, H]`` hidden states, w ``[H, 1]``, valid ``[S]``.
    Softmax runs over the slot axis independently per layer; invalid slots
    are excluded and left unchanged by the caller.
    """
    m = jnp.tanh(h)
    score = jnp.squeeze(m @ w, -1)                      # [S, L]
    score = jnp.where(valid[:, None], score, -jnp.inf)
    alpha = jax.nn.softmax(score, axis=0)
    alpha = jnp.where(valid[:, None], alpha, 0.0)
    return h * alpha[..., None]


def fusion_forward(p: FusionParams, ev: jnp.ndarray, co: jnp.ndarray,
                   *, dropout: float, rng: Optional[jax.Array]):
    e = ev @ p.event_proj_w + p.event_proj_b
    c = co @ p.coord_proj_w + p.coord_proj_b
    h = jnp.concatenate([e, c], axis=-1)
    h = jax.nn.relu(h @ p.fuse1_w + p.fuse1_b)
    if dropout > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    return h @ p.fuse2_w + p.fuse2_b


class EventADOutputs(NamedTuple):
    logits: jnp.ndarray   # [B, S+1, 2]
    valid: jnp.ndarray    # [B, S+1] which slots produced outputs
    labels: jnp.ndarray   # [B, S+1]
    loss: jnp.ndarray     # scalar, summed CE over valid boxes
    n_valid: jnp.ndarray  # scalar count


def eventad_forward(params: EventADParams,
                    mc: EventADConfig,
                    features: jnp.ndarray,      # [B, 2, S+1, x_dim]
                    coords: jnp.ndarray,        # [B, S+1, 4] normalized xywh
                    bbox_present: jnp.ndarray,  # [B, S+1] bool
                    labels: jnp.ndarray,        # [B, S+1] int32
                    *,
                    training: bool = False,
                    rng: Optional[jax.Array] = None) -> EventADOutputs:
    b, _, s1, _ = features.shape
    curr_feat = features[:, 1]                           # [B, S+1, x]
    feat_nonzero = jnp.abs(curr_feat).sum(-1) > 0        # EventAD.py:229
    slot_ids = jnp.arange(s1)
    in_range = (slot_ids >= 1) & (slot_ids <= mc.max_boxes)
    valid = bbox_present & feat_nonzero & in_range[None, :]

    h_event0 = jnp.zeros((s1, mc.event_layers, mc.h_dim))
    h_coord0 = jnp.zeros((s1, mc.coord_layers, mc.coord_dim))
    seen0 = jnp.zeros((s1,), dtype=bool)
    drop = mc.dropout if (training and rng is not None) else 0.0
    rngs = jax.random.split(rng if rng is not None
                            else jax.random.PRNGKey(0), b)

    def frame_step(carry, inp):
        h_event, h_coord, seen = carry
        feat, coord, v, lab, key = inp
        k1, k2 = jax.random.split(key)
        # unseen tracks start from zero hidden state (EventAD.py:292-296)
        h_in_e = jnp.where(seen[:, None, None], h_event, 0.0)
        h_in_c = jnp.where(seen[:, None, None], h_coord, 0.0)
        out_e, h_out_e = gru_step(params.gru_event, feat, h_in_e,
                                  dropout=drop, rng=k1)
        out_c, h_out_c = gru_step(params.gru_coord, coord, h_in_c)
        logits = fusion_forward(params.fusion, out_e, out_c,
                                dropout=drop, rng=k2)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, lab[:, None].astype(jnp.int32),
                                  axis=1)[:, 0]
        loss = jnp.where(v, ce, 0.0).sum()
        # attention over this frame's valid slots, then merge into the carry
        att_e = spatial_attention(h_out_e, params.att_event_w, v)
        att_c = spatial_attention(h_out_c, params.att_coord_w, v)
        h_event = jnp.where(v[:, None, None], att_e, h_event)
        h_coord = jnp.where(v[:, None, None], att_c, h_coord)
        seen = seen | v
        return (h_event, h_coord, seen), (logits, loss)

    (_, _, _), (all_logits, losses) = jax.lax.scan(
        frame_step, (h_event0, h_coord0, seen0),
        (curr_feat, coords, valid, labels, rngs))
    total = losses.sum()
    return EventADOutputs(all_logits, valid, labels, total,
                          valid.sum().astype(jnp.int32))
