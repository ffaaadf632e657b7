"""Full DAGR detector: backbone + GNN/CNN hybrid head + decode + NMS.

Reference: ``DAGR.forward`` eval path (src/dagr/model/networks/dagr.py:73-106)
— YOLOX backbone/head forward, ``postprocess_network_output`` with
class-offset NMS (model/utils.py:63-110), hybrid fusion adding the CNN
head's maps onto the GNN maps (dagr.py:247-262).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from .backbone import BackboneConfig, backbone_forward
from .dagr import DAGRParams, DAGRState, build_level0_graph, \
    graph_static_config, init_dagr
from ..ops.spline_conv import cartesian_attr
from .resnet import cnn_branch_forward
from .yolox_head import (GNNHeadParams, GNNHeadState, cnn_head_forward,
                         decode_outputs, gnn_head_scale_forward,
                         init_gnn_head, postprocess)


class DetectorParams(NamedTuple):
    dagr: DAGRParams
    head: GNNHeadParams


class DetectorState(NamedTuple):
    dagr: DAGRState
    head: GNNHeadState


def init_detector(key, cfg: Config):
    k1, k2 = jax.random.split(key)
    dp, ds, bc = init_dagr(k1, cfg)
    hp, hs = init_gnn_head(k2, bc, num_classes=2,
                           num_scales=cfg.num_scales,
                           yolo_stem_width=cfg.yolo_stem_width,
                           use_image=cfg.use_image)
    return DetectorParams(dp, hp), DetectorState(ds, hs), bc


def detector_forward(params: DetectorParams,
                     state: DetectorState,
                     batch: Any,
                     cfg: Config,
                     bc: BackboneConfig,
                     *,
                     training: bool = False,
                     no_events: bool = False):
    """Eval-path detection forward. Returns (detections dict of fixed-shape
    arrays, raw decoded outputs, new_state)."""
    gsc = graph_static_config(cfg)
    g0 = build_level0_graph(batch.pos, batch.polarity, batch.valid,
                            gsc, getattr(batch, 'rank', None))
    image_feats = None
    image_outs = None
    ncs = state.dagr.cnn
    if bc.use_image:
        image_feats, image_outs, ncs = cnn_branch_forward(
            params.dagr.cnn, state.dagr.cnn, batch.image, cfg.img_net,
            training=False, compute_dtype=bc.compute_dtype)
    outs, nbs = backbone_forward(params.dagr.backbone, state.dagr.backbone,
                                 g0, image_feats, bc, training=training,
                                 pool_tables=getattr(batch, 'pool_tables',
                                                     None))

    grids = [bc.grids[2], bc.grids[3]]
    out_sizes = [(g[1], g[0]) for g in grids]     # (ny, nx)
    strides = [int(round(bc.height / g[1])) for g in grids]

    cnn_maps = None
    ncc = state.head.cnn
    if bc.use_image:
        cnn_maps, ncc = cnn_head_forward(params.head.cnn, state.head.cnn,
                                         image_outs, out_sizes,
                                         training=training)

    maps = []
    new_scale_states = []
    for i, g in enumerate(outs[: len(params.head.scales)]):
        attr = cartesian_attr(g.pos, g.nbr, g.nbr_mask, bc.cart_max[3 + i],
                              clamp=True)
        (cls_o, reg_o, obj_o), ns = gnn_head_scale_forward(
            params.head.scales[i], state.head.scales[i], g, attr, grids[i],
            bc, training)
        new_scale_states.append(ns)
        if bc.use_image:
            # hybrid fusion (dagr.py:247-262): CNN logits added, detached
            cls_o = cls_o + jax.lax.stop_gradient(cnn_maps["cls_output"][i])
            reg_o = reg_o + jax.lax.stop_gradient(cnn_maps["reg_output"][i])
            obj_o = obj_o + jax.lax.stop_gradient(cnn_maps["obj_output"][i])
        if no_events and bc.use_image:
            cls_o = cnn_maps["cls_output"][i]
            reg_o = cnn_maps["reg_output"][i]
            obj_o = cnn_maps["obj_output"][i]
        m = jnp.concatenate(
            [reg_o, jax.nn.sigmoid(obj_o), jax.nn.sigmoid(cls_o)], axis=1)
        maps.append(m)

    decoded = decode_outputs(maps, strides)       # [B, A, 5+C]
    detections = postprocess(decoded, num_classes=2,
                             conf_threshold=0.001, nms_threshold=0.65,
                             width=bc.width, height=bc.height)
    new_state = DetectorState(
        DAGRState(nbs, ncs),
        GNNHeadState(tuple(new_scale_states), ncc))
    return detections, decoded, new_state
