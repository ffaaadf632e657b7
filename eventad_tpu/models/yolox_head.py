"""YOLOX-style detection heads on graph + CNN features.

Reference: ``GNNHead``/``CNNHead`` (src/dagr/model/networks/dagr.py:132-320)
and ``SplineConvToDense`` (src/dagr/model/layers/spline_conv.py:80-118).

TPU advantage: the pooled node tables ARE dense grids (cell = (b, iy, ix)),
so the reference's scatter-into-dense bridge is a reshape here. Head layout
per scale (dagr.py:174-187):

    stem (ConvBlock) -> cls_conv -> cls_pred (to dense, C=num_classes)
                     `-> reg_conv -> reg_pred (4) + obj_pred (1)

CNN head (YOLOX BaseConv stacks) runs on the ResNet output maps and its
logits are *added* to the GNN maps (hybrid fusion, dagr.py:247-262).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.norm import batch_norm, init_batch_norm
from ..ops.spline_conv import (SplineConvParams, init_spline_conv,
                               spline_conv)
from .backbone import (BackboneConfig, ConvBlockParams, ConvBlockState, _act)
from .graph import Graph, neighbor_rows


class ScaleHeadParams(NamedTuple):
    stem: ConvBlockParams
    cls_conv: ConvBlockParams
    reg_conv: ConvBlockParams
    cls_pred: SplineConvParams
    reg_pred: SplineConvParams
    obj_pred: SplineConvParams


class ScaleHeadState(NamedTuple):
    stem: ConvBlockState
    cls_conv: ConvBlockState
    reg_conv: ConvBlockState


class GNNHeadParams(NamedTuple):
    scales: Tuple[ScaleHeadParams, ...]
    cnn: Optional[Any]     # CNN head nested dict or None


class GNNHeadState(NamedTuple):
    scales: Tuple[ScaleHeadState, ...]
    cnn: Optional[Any]


def _init_block(key, cin, cout, ks):
    p = ConvBlockParams(init_spline_conv(key, cin, cout, ks),
                        init_batch_norm(cout)[0])
    s = ConvBlockState(init_batch_norm(cout)[1])
    return p, s


def init_gnn_head(key, bc: BackboneConfig, num_classes: int = 2,
                  num_scales: int = 2, cnn_in_channels=(256, 256),
                  yolo_stem_width: float = 0.5, use_image: bool = True):
    in_ch = [bc.channels[-2], bc.channels[-1]]
    n_reg = max(in_ch)
    ks = bc.kernel_size
    scales_p, scales_s = [], []
    for i in range(num_scales):
        key, k1, k2, k3, k4, k5, k6 = jax.random.split(key, 7)
        stem, st_s = _init_block(k1, in_ch[i], n_reg, ks)
        cc, cc_s = _init_block(k2, n_reg, n_reg, ks)
        rc, rc_s = _init_block(k3, n_reg, n_reg, ks)
        cls_p = init_spline_conv(k4, n_reg, num_classes, ks, bias=True)
        reg_p = init_spline_conv(k5, n_reg, 4, ks, bias=True)
        obj_p = init_spline_conv(k6, n_reg, 1, ks, bias=True)
        scales_p.append(ScaleHeadParams(stem, cc, rc, cls_p, reg_p, obj_p))
        scales_s.append(ScaleHeadState(st_s, cc_s, rc_s))
    cnn_p = cnn_s = None
    if use_image:
        key, k = jax.random.split(key)
        cnn_p, cnn_s = init_cnn_head(k, num_classes, cnn_in_channels,
                                     yolo_stem_width)
    return (GNNHeadParams(tuple(scales_p), cnn_p),
            GNNHeadState(tuple(scales_s), cnn_s))


def _apply_block(p: ConvBlockParams, s: ConvBlockState, g: Graph, attr,
                 bc: BackboneConfig, training: bool, grid=None):
    act = _act(bc.activation)
    if g.x.dtype != jnp.float32:
        p = jax.tree.map(lambda a: a.astype(g.x.dtype)
                         if a.dtype == jnp.float32 else a, p)
    x_j = (neighbor_rows(g.x, grid, bc.batch_size, span=2)
           if grid is not None else None)
    h = spline_conv(g.x, g.nbr, g.nbr_mask, attr.astype(g.x.dtype), p.conv,
                    kernel_size=bc.kernel_size, aggr=bc.aggr,
                    node_mask=g.node_mask, x_j=x_j)
    h, ns = batch_norm(h, g.node_mask, p.bn, s.bn, training=training)
    h = act(h)
    h = jnp.where(g.node_mask[:, None], h, 0.0)
    return g._replace(x=h), ConvBlockState(ns)


def _to_dense(x: jnp.ndarray, grid: Tuple[int, int], batch_size: int,
              node_mask: jnp.ndarray) -> jnp.ndarray:
    """[B*ny*nx cells, C] table -> [B, C, ny, nx] dense map. The cell order
    (b, iy, ix) is the pooling's cluster order, identical to the reference's
    voxel scatter (spline_conv.py:99-105)."""
    nx, ny = grid
    c = x.shape[1]
    xm = jnp.where(node_mask[:, None], x, 0.0)
    return xm.reshape(batch_size, ny, nx, c).transpose(0, 3, 1, 2)


def gnn_head_scale_forward(p: ScaleHeadParams, s: ScaleHeadState, g: Graph,
                           attr, grid, bc: BackboneConfig, training: bool):
    g1, ns1 = _apply_block(p.stem, s.stem, g, attr, bc, training, grid)
    gc, ns2 = _apply_block(p.cls_conv, s.cls_conv, g1, attr, bc, training,
                           grid)
    gr, ns3 = _apply_block(p.reg_conv, s.reg_conv, g1, attr, bc, training,
                           grid)

    def pred(pp, gg):
        if gg.x.dtype != jnp.float32:
            pp = jax.tree.map(lambda a: a.astype(gg.x.dtype)
                              if a.dtype == jnp.float32 else a, pp)
        return spline_conv(gg.x, gg.nbr, gg.nbr_mask,
                           attr.astype(gg.x.dtype), pp,
                           kernel_size=bc.kernel_size, aggr=bc.aggr,
                           node_mask=gg.node_mask,
                           x_j=neighbor_rows(gg.x, grid, bc.batch_size,
                                             span=2))
    cls_o = _to_dense(pred(p.cls_pred, gc), grid, bc.batch_size, g.node_mask)
    reg_o = _to_dense(pred(p.reg_pred, gr), grid, bc.batch_size, g.node_mask)
    obj_o = _to_dense(pred(p.obj_pred, gr), grid, bc.batch_size, g.node_mask)
    return (cls_o, reg_o, obj_o), ScaleHeadState(ns1, ns2, ns3)


# ---------------------------------------------------------------------------
# CNN head (YOLOX decoupled head on image features; dagr.py:132-148)
# ---------------------------------------------------------------------------
def _conv2d(x, w, b=None, stride=1):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b if b is not None else y


def _base_conv_init(key, cin, cout, ks):
    k1, = jax.random.split(key, 1)
    fan = ks * ks * cin
    w = jax.random.normal(k1, (ks, ks, cin, cout)) * (2.0 / fan) ** 0.5
    bn_p, bn_s = ({"scale": jnp.ones((cout,)), "offset": jnp.zeros((cout,))},
                  {"mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))})
    return {"w": w, "bn": bn_p}, {"bn": bn_s}


def _base_conv(x, p, s, training):
    from .resnet import _bn_apply
    h = _conv2d(x, p["w"])
    h, ns = _bn_apply(h, p["bn"], s["bn"], training)
    return jax.nn.silu(h), {"bn": ns}


def init_cnn_head(key, num_classes, in_channels=(256, 256), width=0.5):
    hidden = int(256 * width)
    params, state = {"scales": []}, {"scales": []}
    for cin in in_channels:
        key, k1, k2, k3, k4, k5, k6, k7, k8 = jax.random.split(key, 9)
        sp, ss = {}, {}
        sp["stem"], ss["stem"] = _base_conv_init(k1, cin, hidden, 1)
        sp["cls1"], ss["cls1"] = _base_conv_init(k2, hidden, hidden, 3)
        sp["cls2"], ss["cls2"] = _base_conv_init(k3, hidden, hidden, 3)
        sp["reg1"], ss["reg1"] = _base_conv_init(k4, hidden, hidden, 3)
        sp["reg2"], ss["reg2"] = _base_conv_init(k5, hidden, hidden, 3)
        s_ = 1.0 / hidden ** 0.5
        sp["cls_pred"] = {"w": jax.random.uniform(k6, (1, 1, hidden,
                                                       num_classes),
                                                  minval=-s_, maxval=s_),
                          "b": jnp.zeros((num_classes,))}
        sp["reg_pred"] = {"w": jax.random.uniform(k7, (1, 1, hidden, 4),
                                                  minval=-s_, maxval=s_),
                          "b": jnp.zeros((4,))}
        sp["obj_pred"] = {"w": jax.random.uniform(k8, (1, 1, hidden, 1),
                                                  minval=-s_, maxval=s_),
                          "b": jnp.zeros((1,))}
        params["scales"].append(sp)
        state["scales"].append(ss)
    return params, state


def cnn_head_forward(params, state, feats: Sequence[jnp.ndarray],
                     out_sizes, training=False):
    """feats: NHWC maps, resized to out_sizes (ny, nx) like dagr.py:233.
    Returns dict of lists (cls/reg/obj) in NCHW + new state."""
    outs = {"cls_output": [], "reg_output": [], "obj_output": []}
    ns = {"scales": []}
    for i, f in enumerate(feats):
        ny, nx = out_sizes[i]
        f = jax.image.resize(f, (f.shape[0], ny, nx, f.shape[3]),
                             method="nearest")
        sp, ss = params["scales"][i], state["scales"][i]
        if f.dtype != jnp.float32:
            if training:
                # batch-stat BN updates stay f32; upcast the features
                f = f.astype(jnp.float32)
            else:
                cast = lambda a: (a.astype(f.dtype)
                                  if a.dtype == jnp.float32 else a)
                sp = jax.tree.map(cast, sp)
                ss = jax.tree.map(cast, ss)
        nss = {}
        h, nss["stem"] = _base_conv(f, sp["stem"], ss["stem"], training)
        c, nss["cls1"] = _base_conv(h, sp["cls1"], ss["cls1"], training)
        c, nss["cls2"] = _base_conv(c, sp["cls2"], ss["cls2"], training)
        r, nss["reg1"] = _base_conv(h, sp["reg1"], ss["reg1"], training)
        r, nss["reg2"] = _base_conv(r, sp["reg2"], ss["reg2"], training)
        cls_o = _conv2d(c, sp["cls_pred"]["w"], sp["cls_pred"]["b"])
        reg_o = _conv2d(r, sp["reg_pred"]["w"], sp["reg_pred"]["b"])
        obj_o = _conv2d(r, sp["obj_pred"]["w"], sp["obj_pred"]["b"])
        outs["cls_output"].append(cls_o.transpose(0, 3, 1, 2))
        outs["reg_output"].append(reg_o.transpose(0, 3, 1, 2))
        outs["obj_output"].append(obj_o.transpose(0, 3, 1, 2))
        ns["scales"].append(nss)
    return outs, ns


# ---------------------------------------------------------------------------
# decode + NMS (model/utils.py:63-132 equivalents, fixed shapes)
# ---------------------------------------------------------------------------
def decode_outputs(maps, strides):
    """maps: list of [B, 5+C, ny, nx] (reg4, obj, cls...) per scale, already
    sigmoided on obj/cls for eval. Returns [B, A, 5+C] with xy in pixels and
    wh decoded via exp (dagr.py:314-320)."""
    outs = []
    for m, stride in zip(maps, strides):
        m = m.astype(jnp.float32)   # decode/NMS geometry stays f32
        b, c, ny, nx = m.shape
        flat = m.reshape(b, c, ny * nx).transpose(0, 2, 1)
        gx = jnp.tile(jnp.arange(nx), ny).astype(flat.dtype)
        gy = jnp.repeat(jnp.arange(ny), nx).astype(flat.dtype)
        xy = (flat[..., :2] + jnp.stack([gx, gy], -1)[None]) * stride
        wh = jnp.exp(flat[..., 2:4]) * stride
        outs.append(jnp.concatenate([xy, wh, flat[..., 4:]], axis=-1))
    return jnp.concatenate(outs, axis=1)


def _iou_matrix(boxes):
    """boxes [N, 4] xyxy -> [N, N] IoU."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    return inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)


def nms_fixed(boxes, scores, class_ids, *, iou_threshold=0.65,
              score_threshold=0.001, max_out=64, width=640, height=640):
    """Class-offset NMS with static output size (the reference's
    ``batched_nms_coordinate_trick``, model/utils.py:25-33). Returns
    (keep_idx [max_out], keep_mask [max_out])."""
    offset = class_ids.astype(boxes.dtype) * (max(width, height) + 1)
    shifted = boxes + offset[:, None]
    valid = scores >= score_threshold
    s = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-s)
    shifted = shifted[order]
    s_sorted = s[order]
    iou = _iou_matrix(shifted)
    n = boxes.shape[0]

    def body(i, keep):
        sup = (iou[i] > iou_threshold) & keep & \
            (jnp.arange(n) > i) & keep[i]
        return keep & ~sup
    keep = jnp.isfinite(s_sorted)
    keep = jax.lax.fori_loop(0, n, body, keep)
    kidx = jnp.argsort(-jnp.where(keep, s_sorted, -jnp.inf))[:max_out]
    kmask = keep[kidx] & jnp.isfinite(s_sorted[kidx])
    return order[kidx], kmask


def postprocess(outputs, num_classes, *, conf_threshold=0.001,
                nms_threshold=0.65, width=640, height=640, max_out=64):
    """reference postprocess_network_output (model/utils.py:63-110) with
    fixed shapes: outputs [B, A, 5+C] -> per-image dict arrays of size
    max_out with masks."""
    xy = outputs[..., :2] - outputs[..., 2:4] / 2
    boxes = jnp.concatenate([xy, xy + outputs[..., 2:4]], axis=-1)
    cls_conf = outputs[..., 5:5 + num_classes]
    class_conf = cls_conf.max(-1)
    class_pred = cls_conf.argmax(-1)
    score = outputs[..., 4] * class_conf

    def per_image(bx, sc, cp):
        idx, mask = nms_fixed(bx, sc, cp, iou_threshold=nms_threshold,
                              score_threshold=conf_threshold,
                              max_out=max_out, width=width, height=height)
        return bx[idx], sc[idx], cp[idx], mask
    b, s, c, m = jax.vmap(per_image)(boxes, score, class_pred)
    return {"boxes": b, "scores": s, "labels": c, "mask": m}
