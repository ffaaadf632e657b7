"""Streaming (sliding-window) inference state.

The reference's low-latency path is the ``SlidingWindowGraph`` +
asynchronous layer converters (src/dagr/graph/ev_graph.py:106-166,
src/dagr/asynchronous/): per-pixel queues persist across calls, the oldest
nodes are deleted and edge indices re-based, and each layer caches its
previous activations to recompute only changed nodes.

The TPU-native contract (SURVEY.md 5.7): a fixed-size event ring buffer
carried as jit state (slot reuse instead of index re-basing — index
decrement is hostile to static shapes), cached CNN features (the image
changes at frame rate, events at event rate), persistent GRU hidden states,
and one functional ``(state, new_events) -> (state, scores)`` step compiled
once.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class StreamingState(NamedTuple):
    # event ring buffer (chronological: oldest at 0 after normalization)
    pos: jnp.ndarray        # [N_buf, 3] int32 (x, y, t_us absolute)
    polarity: jnp.ndarray   # [N_buf]
    valid: jnp.ndarray      # [N_buf] bool
    # cached CNN pyramid (updated only when a new image arrives)
    image_feats: Optional[tuple]   # 5 NHWC maps with B=1, or None
    # persistent recurrent head state (per track slot)
    h_event: jnp.ndarray    # [S+1, L_e, h_dim]
    h_coord: jnp.ndarray    # [S+1, L_c, 32]
    seen: jnp.ndarray       # [S+1] bool
    t_now: jnp.ndarray      # scalar int32, latest event time


def init_streaming_state(n_buf: int, max_boxes: int, h_dim: int = 256,
                         coord_dim: int = 32, event_layers: int = 2,
                         coord_layers: int = 1,
                         image_feats=None) -> StreamingState:
    s1 = max_boxes + 1
    return StreamingState(
        pos=jnp.zeros((n_buf, 3), jnp.int32),
        polarity=jnp.zeros((n_buf,), jnp.float32),
        valid=jnp.zeros((n_buf,), bool),
        image_feats=image_feats,
        h_event=jnp.zeros((s1, event_layers, h_dim)),
        h_coord=jnp.zeros((s1, coord_layers, coord_dim)),
        seen=jnp.zeros((s1,), bool),
        t_now=jnp.zeros((), jnp.int32),
    )
