"""Streaming detection read-out from the incremental level-0 caches.

The reference's asynchronous runtime wraps EVERY layer of the detector —
including the GNN head's spline convs (asynchronous/__init__.py:41-110
dispatches per layer type over the whole module tree) — so streaming state
can produce decoded detections, not just anomaly logits.  Here the same
capability rides the incremental cache design: the event-rate ``append``
path is shared with the anomaly model (level-0 layer outputs are cached
per event), and ``read_detections`` re-pools the buffer, runs the small
upper levels, the GNN head, hybrid CNN fusion, decode and NMS — one jitted
program per read.

Per-frame CNN work (ResNet pyramid + the CNN head's logit maps, which
depend only on the image) is computed once per frame by
``update_image_detector`` and cached in the state.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.detector import DetectorParams, DetectorState
from ..models.graph import upsample_align_corners
from ..models.resnet import cnn_branch_forward
from ..models.yolox_head import (cnn_head_forward, decode_outputs,
                                 gnn_head_scale_forward, postprocess)
from ..ops.spline_conv import cartesian_attr
from .incremental import (IncrementalState, _norm_pos,
                          make_incremental_step, pooled_backbone_outs)


def _head_geometry(bc):
    grids = [bc.grids[2], bc.grids[3]]
    out_sizes = [(g[1], g[0]) for g in grids]
    strides = [int(round(bc.height / g[1])) for g in grids]
    return grids, out_sizes, strides


def update_image_detector(params: DetectorParams, mstate: DetectorState,
                          state: IncrementalState, image,
                          bc, img_net: str = "resnet50") -> IncrementalState:
    """New frame: refresh the cached CNN pyramid (for the backbone's
    node-position lookups) AND the CNN head's logit maps (hybrid fusion)."""
    feats, image_outs, _ = cnn_branch_forward(
        params.dagr.cnn, mstate.dagr.cnn, image[None], img_net,
        training=False)
    feats = list(feats)
    feats[0] = upsample_align_corners(feats[0], bc.width, bc.height)
    feats[1] = upsample_align_corners(feats[1], bc.width, bc.height)
    _, out_sizes, _ = _head_geometry(bc)
    cnn_maps, _ = cnn_head_forward(params.head.cnn, mstate.head.cnn,
                                   image_outs, out_sizes, training=False)
    return state._replace(image_feats=tuple(feats), cnn_maps=cnn_maps)


def make_incremental_detector(params: DetectorParams,
                              mstate: DetectorState,
                              bc, gsc: tuple, *,
                              n_chunk: int, n_buf: int):
    """Returns ``(refresh, append, read_detections)``, all jitted.

    ``refresh``/``append`` are the shared incremental level-0 machinery
    (the anomaly and detection models have the same frozen backbone);
    ``read_detections(state)`` produces ``(detections dict, decoded)`` like
    the batch ``detector_forward`` on the same event window (consistency
    covered by tests/test_streaming_detect.py)."""
    # mc=None: headless mode — the shared level-0 machinery only; any
    # head-dependent entry point (step/read_scores) raises instead of
    # silently tracing placeholder anomaly-head dimensions
    refresh, step = make_incremental_step(params, mstate, bc, None, gsc,
                                          n_chunk=n_chunk, n_buf=n_buf)
    grids, _, strides = _head_geometry(bc)
    num_scales = len(params.head.scales)

    @jax.jit
    def read_detections(state: IncrementalState):
        posn = _norm_pos(state.pos, state.t_now, gsc)
        outs = pooled_backbone_outs(params, mstate, bc, state, posn, gsc)
        maps = []
        for i in range(num_scales):
            g = outs[i]
            attr = cartesian_attr(g.pos, g.nbr, g.nbr_mask,
                                  bc.cart_max[3 + i], clamp=True)
            (cls_o, reg_o, obj_o), _ = gnn_head_scale_forward(
                params.head.scales[i], mstate.head.scales[i], g, attr,
                grids[i], bc, False)
            if bc.use_image and state.cnn_maps is not None:
                cls_o = cls_o + state.cnn_maps["cls_output"][i]
                reg_o = reg_o + state.cnn_maps["reg_output"][i]
                obj_o = obj_o + state.cnn_maps["obj_output"][i]
            maps.append(jnp.concatenate(
                [reg_o, jax.nn.sigmoid(obj_o), jax.nn.sigmoid(cls_o)],
                axis=1))
        decoded = decode_outputs(maps, strides)
        detections = postprocess(decoded, num_classes=2,
                                 conf_threshold=0.001, nms_threshold=0.65,
                                 width=bc.width, height=bc.height)
        return detections, decoded

    return refresh, step.append, read_detections
