"""Static-shape graph container shared by all network levels.

The reference threads torch_geometric ``Data`` objects (ragged node/edge
arrays) through the backbone; here every level is a fixed-shape table:

* level 0: ``B * N_max`` padded event slots (``node_mask`` marks real events)
* level i>=1: ``B * nx_i * ny_i`` voxel cells (``node_mask`` marks non-empty)

``nbr``/``nbr_mask`` give each destination's incoming source slots, which
turns message aggregation into gather+sum (no scatter on the hot path).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Graph(NamedTuple):
    x: jnp.ndarray          # [N, C] node features
    pos: jnp.ndarray        # [N, 3] normalized (x, y, t)
    nbr: jnp.ndarray        # [N, K] int32
    nbr_mask: jnp.ndarray   # [N, K] bool
    node_mask: jnp.ndarray  # [N] bool
    batch: jnp.ndarray      # [N] int32


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

    def tap(yy, xx):
        ok = (xx >= 0) & (xx < wp) & (yy >= 0) & (yy < hp)
        v = feat[batch, jnp.clip(yy, 0, hp - 1), jnp.clip(xx, 0, wp - 1)]
        return jnp.where(ok[:, None], v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    out = ((1 - ty) * ((1 - tx) * v00 + tx * v01)
           + ty * ((1 - tx) * v10 + tx * v11))
    return jnp.where(node_mask[:, None], out, 0.0)
