"""Per-bounding-box feature pooling from backbone node features.

Reference: ``EventADModel.extract_features`` / ``_process_bbox``
(models/EventAD.py:335-499) — a Python double loop over batch elements and
boxes with ``.item()`` syncs. Here all ``B * 2 * (max_boxes+1)`` boxes are
pooled at once with masked reductions over the (small, static) out4 node
table.

Per box, in priority order (EventAD.py:456-499):
1. distance-weighted mean (weights ``1/(d+1e-6)``) of nodes inside the box;
2. else mean of the <=5 nearest nodes of the same batch element;
3. else the batch element's global mean feature.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .graph import Graph


def extract_box_features(out4: Graph,
                         boxes: jnp.ndarray,      # [B, 2, S, 4] xywh pixels
                         box_present: jnp.ndarray,  # [B, 2, S] bool
                         batch_size: int,
                         width: int,
                         height: int) -> jnp.ndarray:
    """Returns ``[B, 2, S, C]`` box features (S = max_boxes + 1; slot = track
    id; frame axis 0 = previous, 1 = current)."""
    x = out4.x                             # [M, C]
    posn = out4.pos[:, :2]                 # normalized node positions
    nmask = out4.node_mask
    nbatch = out4.batch
    m, c = x.shape
    b, nf, s, _ = boxes.shape

    # global per-item mean feature (EventAD.py:369-375)
    gsum = jnp.zeros((batch_size, c)).at[nbatch].add(
        jnp.where(nmask[:, None], x, 0.0))
    gcnt = jnp.zeros((batch_size,)).at[nbatch].add(nmask.astype(x.dtype))
    gfeat = gsum / jnp.maximum(gcnt[:, None], 1.0)
    has_nodes = gcnt > 0

    # normalized box corners and centers
    x1 = boxes[..., 0] / width
    y1 = boxes[..., 1] / height
    x2 = (boxes[..., 0] + boxes[..., 2]) / width
    y2 = (boxes[..., 1] + boxes[..., 3]) / height
    cx = 0.5 * (x1 + x2)
    cy = 0.5 * (y1 + y2)

    flat = (b * nf * s,)
    bx1, by1, bx2, by2 = (v.reshape(flat) for v in (x1, y1, x2, y2))
    bcx, bcy = cx.reshape(flat), cy.reshape(flat)
    bb = jnp.broadcast_to(jnp.arange(b)[:, None, None], (b, nf, s)) \
        .reshape(flat)

    px = posn[None, :, 0]
    py = posn[None, :, 1]
    same_b = (nbatch[None, :] == bb[:, None]) & nmask[None, :]
    in_box = same_b & (px >= bx1[:, None]) & (px <= bx2[:, None]) \
        & (py >= by1[:, None]) & (py <= by2[:, None])

    d = jnp.sqrt((px - bcx[:, None]) ** 2 + (py - bcy[:, None]) ** 2)

    # 1. distance-weighted in-box mean
    w_in = jnp.where(in_box, 1.0 / (d + 1e-6), 0.0)
    w_sum = w_in.sum(axis=1, keepdims=True)
    w_in = w_in / jnp.maximum(w_sum, 1e-30)
    feat_in = w_in @ jnp.where(nmask[:, None], x, 0.0)      # [NB, C]
    any_in = in_box.any(axis=1)

    # 2. kNN-5 fallback among same-batch nodes
    d_knn = jnp.where(same_b, d, jnp.inf)
    neg, idx5 = jax.lax.top_k(-d_knn, 5)                    # [NB, 5]
    ok5 = jnp.isfinite(-neg)
    cnt5 = jnp.maximum(ok5.sum(axis=1, keepdims=True), 1)
    feat_knn = (x[idx5] * ok5[..., None]).sum(axis=1) / cnt5

    feat = jnp.where(any_in[:, None], feat_in,
                     jnp.where(has_nodes[bb][:, None], feat_knn, gfeat[bb]))
    feat = feat.reshape(b, nf, s, c)
    return jnp.where(box_present[..., None], feat, 0.0)
