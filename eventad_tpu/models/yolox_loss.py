"""YOLOX detection loss with simOTA assignment, static shapes.

Reference: the vendored YOLOX head's ``get_losses`` (used at
src/dagr/model/networks/dagr.py:281-290 with targets from
``convert_to_training_format``, model/utils.py:46-61: ``[B, 100, 5]`` rows
of (class, cx, cy, w, h) in pixels).

simOTA, fixed-shape formulation: per image a ``[D, A]`` cost matrix over
(gt, anchor) pairs; candidate anchors are those whose cell center lies in
the gt box or its 2.5-stride center region; dynamic-k per gt from the sum of
its top-10 IoUs; assignment = per-gt top-k lowest cost, conflicts resolved
by min cost. Losses: IoU on matched boxes, BCE on objectness (all anchors),
BCE on class (matched), L1 optional — all normalized by num_fg.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


def _bbox_iou_xywh(a, b):
    """a [..., 4] (cx, cy, w, h), b likewise -> IoU."""
    ax1, ay1 = a[..., 0] - a[..., 2] / 2, a[..., 1] - a[..., 3] / 2
    ax2, ay2 = a[..., 0] + a[..., 2] / 2, a[..., 1] + a[..., 3] / 2
    bx1, by1 = b[..., 0] - b[..., 2] / 2, b[..., 1] - b[..., 3] / 2
    bx2, by2 = b[..., 0] + b[..., 2] / 2, b[..., 1] + b[..., 3] / 2
    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0)
    inter = iw * ih
    area = (jnp.maximum(ax2 - ax1, 0) * jnp.maximum(ay2 - ay1, 0)
            + jnp.maximum(bx2 - bx1, 0) * jnp.maximum(by2 - by1, 0) - inter)
    return inter / jnp.maximum(area, 1e-9)


def _bce(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))


class AnchorGeometry(NamedTuple):
    centers: jnp.ndarray   # [A, 2] pixel centers
    strides: jnp.ndarray   # [A]


def make_anchor_geometry(grids: Sequence, strides: Sequence[int]):
    cs, ss = [], []
    for (nx, ny), stride in zip(grids, strides):
        gx = jnp.tile(jnp.arange(nx), ny).astype(jnp.float32)
        gy = jnp.repeat(jnp.arange(ny), nx).astype(jnp.float32)
        cs.append(jnp.stack([(gx + 0.5) * stride, (gy + 0.5) * stride], -1))
        ss.append(jnp.full((nx * ny,), float(stride)))
    return AnchorGeometry(jnp.concatenate(cs), jnp.concatenate(ss))


def yolox_loss(outputs: jnp.ndarray,       # [B, A, 5+C] decoded (px, logits)
               targets: jnp.ndarray,       # [B, D, 5] (cls, cx, cy, w, h)
               target_mask: jnp.ndarray,   # [B, D] bool
               geom: AnchorGeometry,
               num_classes: int = 2,
               center_radius: float = 2.5,
               topk_candidates: int = 10,
               l1_weight: jnp.ndarray | float = 0.0):
    """Returns dict(total, iou, obj, cls, l1, num_fg).

    ``l1_weight`` gates YOLOX's L1 regression branch (vendored head's
    ``use_l1``, enabled for the aug-off final epochs; reference
    dagr.py:192-193). The raw-output L1 is computed from the decoded boxes —
    decode is invertible, so |raw - l1_target| = |d_center|/stride and
    |log(w_pred/w_gt)| exactly."""

    def per_image(out, tgt, tmask):
        boxes = out[:, :4]                    # cx, cy, w, h px
        obj_logit = out[:, 4]
        cls_logit = out[:, 5:5 + num_classes]
        a = boxes.shape[0]
        d = tgt.shape[0]
        gt_box = tgt[:, 1:5]
        gt_cls = tgt[:, 0].astype(jnp.int32)

        # candidate mask (is_in_boxes_or_center)
        cx, cy = geom.centers[:, 0], geom.centers[:, 1]
        gx1 = gt_box[:, 0] - gt_box[:, 2] / 2
        gx2 = gt_box[:, 0] + gt_box[:, 2] / 2
        gy1 = gt_box[:, 1] - gt_box[:, 3] / 2
        gy2 = gt_box[:, 1] + gt_box[:, 3] / 2
        in_box = ((cx[None] >= gx1[:, None]) & (cx[None] <= gx2[:, None])
                  & (cy[None] >= gy1[:, None]) & (cy[None] <= gy2[:, None]))
        r = center_radius * geom.strides[None]
        in_ctr = ((cx[None] >= gt_box[:, 0:1] - r)
                  & (cx[None] <= gt_box[:, 0:1] + r)
                  & (cy[None] >= gt_box[:, 1:2] - r)
                  & (cy[None] <= gt_box[:, 1:2] + r))
        fg_cand = (in_box | in_ctr) & tmask[:, None]          # [D, A]

        iou = _bbox_iou_xywh(gt_box[:, None, :], boxes[None, :, :])  # [D,A]
        iou_loss_mat = -jnp.log(iou + 1e-8)
        cls_onehot = jax.nn.one_hot(gt_cls, num_classes)      # [D, C]
        # YOLOX cost uses sigmoid(cls)*sigmoid(obj) vs one-hot BCE
        p = jax.nn.sigmoid(cls_logit) * jax.nn.sigmoid(obj_logit)[:, None]
        p = jnp.sqrt(jnp.clip(p, 1e-8, 1.0))
        cls_cost = -(cls_onehot[:, None, :] * jnp.log(p[None])
                     + (1 - cls_onehot[:, None, :])
                     * jnp.log(1 - p[None] + 1e-8)).sum(-1)
        cost = cls_cost + 3.0 * iou_loss_mat \
            + 1e5 * (~fg_cand).astype(jnp.float32)

        # dynamic k per gt: sum of top-10 candidate IoUs, >= 1
        iou_cand = jnp.where(fg_cand, iou, 0.0)
        topk_iou = jax.lax.top_k(iou_cand, min(topk_candidates, a))[0]
        dyn_k = jnp.clip(topk_iou.sum(-1).astype(jnp.int32), 1, a)

        # per-gt rank of each anchor by cost; selected iff rank < dyn_k
        order = jnp.argsort(cost, axis=1)
        rank = jnp.zeros_like(cost, dtype=jnp.int32)
        rank = jax.vmap(lambda o: jnp.zeros((a,), jnp.int32)
                        .at[o].set(jnp.arange(a, dtype=jnp.int32)))(order)
        selected = (rank < dyn_k[:, None]) & fg_cand          # [D, A]

        # conflict resolution: anchor claimed by the min-cost gt only
        sel_cost = jnp.where(selected, cost, jnp.inf)
        best_gt = jnp.argmin(sel_cost, axis=0)                # [A]
        fg = selected.any(axis=0)
        claims = jax.nn.one_hot(best_gt, d, dtype=bool,
                                axis=0) & selected
        matched = claims & fg[None]

        num_fg = jnp.maximum(matched.sum(), 1).astype(jnp.float32)
        m_any = matched.any(axis=0)
        m_gt = jnp.argmax(matched, axis=0)                    # [A]

        iou_l = jnp.where(
            m_any, 1.0 - _bbox_iou_xywh(gt_box[m_gt], boxes), 0.0).sum()
        obj_l = _bce(obj_logit, m_any.astype(jnp.float32)).sum()
        cls_t = cls_onehot[m_gt] * jnp.where(m_any[:, None], 1.0, 0.0)
        cls_l = jnp.where(m_any[:, None],
                          _bce(cls_logit, cls_t), 0.0).sum()
        # raw-space L1 on matched anchors (YOLOX get_l1_target semantics)
        mb = gt_box[m_gt]
        l1 = (jnp.abs(boxes[:, 0] - mb[:, 0]) / geom.strides
              + jnp.abs(boxes[:, 1] - mb[:, 1]) / geom.strides
              + jnp.abs(jnp.log(jnp.maximum(boxes[:, 2], 1e-9)
                                / jnp.maximum(mb[:, 2], 1e-9)))
              + jnp.abs(jnp.log(jnp.maximum(boxes[:, 3], 1e-9)
                                / jnp.maximum(mb[:, 3], 1e-9))))
        l1_l = jnp.where(m_any, l1, 0.0).sum()
        return iou_l, obj_l, cls_l, l1_l, num_fg

    iou_l, obj_l, cls_l, l1_l, num_fg = jax.vmap(per_image)(
        outputs, targets, target_mask)
    nfg = jnp.maximum(num_fg.sum(), 1.0)
    iou_total = 5.0 * iou_l.sum() / nfg
    obj_total = obj_l.sum() / nfg
    cls_total = cls_l.sum() / nfg
    l1_total = l1_weight * l1_l.sum() / nfg
    return {
        "total": iou_total + obj_total + cls_total + l1_total,
        "iou": iou_total, "obj": obj_total, "cls": cls_total,
        "l1": l1_total, "num_fg": num_fg.sum(),
    }


def convert_to_training_format(bbox: jnp.ndarray, bbox_mask: jnp.ndarray):
    """[B, D, 6] (x, y, w, h, cls, track) xywh corner -> [B, D, 5]
    (cls, cx, cy, w, h) + mask (reference model/utils.py:46-61)."""
    cx = bbox[..., 0] + bbox[..., 2] * 0.5
    cy = bbox[..., 1] + bbox[..., 3] * 0.5
    tgt = jnp.stack([bbox[..., 4], cx, cy, bbox[..., 2], bbox[..., 3]], -1)
    return tgt, bbox_mask
