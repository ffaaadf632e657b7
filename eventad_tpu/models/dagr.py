"""DAGR detector assembly + the full EventAD anomaly model.

Reference: ``DAGR`` (src/dagr/model/networks/dagr.py:14-130) wires the GNN
backbone, the CNN branch and the YOLOX-style head; ``EventADModel``
(models/EventAD.py:141) freezes DAGR and trains the recurrent anomaly head on
its ``out4`` features.

Here the whole thing is a pure function of (params, state, batch): the graph
construction, CNN pyramid, GNN pyramid, box-feature pooling and recurrent
head compile into ONE jitted program (no host syncs on the hot path).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.event_graph import build_graph
from .backbone import (BackboneConfig, BackboneParams, BackboneState,
                       backbone_forward, init_backbone, make_backbone_config)
from .eventad import (EventADConfig, EventADOutputs, EventADParams,
                      eventad_forward, init_eventad)
from .feature_extract import extract_box_features
from .graph import Graph
from .resnet import cnn_branch_forward, init_cnn_branch


class DAGRParams(NamedTuple):
    backbone: BackboneParams
    cnn: Optional[Any]            # nested dict or None


class DAGRState(NamedTuple):
    backbone: BackboneState
    cnn: Optional[Any]


class ModelParams(NamedTuple):
    dagr: DAGRParams
    head: EventADParams


class ModelState(NamedTuple):
    dagr: DAGRState


def init_dagr(key, cfg: Config):
    bc = make_backbone_config(cfg)
    k1, k2 = jax.random.split(key)
    bp, bs = init_backbone(k1, bc)
    cp = cs = None
    if cfg.use_image:
        ch = cfg.channels()
        cp, cs = init_cnn_branch(k2, cfg.img_net, list(ch[1:]), [256, 256])
    return DAGRParams(bp, cp), DAGRState(bs, cs), bc


def init_model(key, cfg: Config):
    k1, k2 = jax.random.split(key)
    dp, ds, bc = init_dagr(k1, cfg)
    mc = EventADConfig(x_dim=cfg.x_dim, h_dim=cfg.h_dim,
                       max_boxes=cfg.max_boxes)
    hp = init_eventad(k2, mc)
    return ModelParams(dp, hp), ModelState(ds), bc, mc


# ---------------------------------------------------------------------------
# level-0 graph construction (replaces EV_TGN + SlidingWindowGraph)
# ---------------------------------------------------------------------------
def build_level0_graph(pos: jnp.ndarray,       # [B, N, 3] int32
                       polarity: jnp.ndarray,  # [B, N] float
                       valid: jnp.ndarray,     # [B, N] bool
                       cfg_static,
                       ranks: jnp.ndarray = None,
                       starts: jnp.ndarray = None,
                       chunk: int = None) -> Graph:
    """cfg_static: (radius_px, delta_t_us, max_neighbors, max_queue_size,
    lookback, width, height, time_window).  ``starts``/``chunk``: optional
    host-precomputed per-chunk temporal bounds + the matching destination
    chunk width of the Pallas search kernel (Config.search_chunk)."""
    (radius_px, delta_t_us, max_nb, max_q, lookback, width, height,
     time_window) = cfg_static
    b, n, _ = pos.shape
    from ..ops.event_graph import build_graph_auto
    kw = {}
    if chunk is not None:
        kw["chunk"] = chunk
    nbr, nbrm, doff = build_graph_auto(
        pos, valid, ranks, radius=radius_px, delta_t_us=delta_t_us,
        max_neighbors=max_nb, max_queue_size=max_q,
        lookback=min(lookback, n), grid_wh=(width, height),
        starts=starts, **kw)
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    nbr_f = (nbr + off).reshape(b * n, -1)
    nbrm_f = nbrm.reshape(b * n, -1)
    denom = jnp.asarray([width, height, time_window], jnp.float32)
    posn = (pos.astype(jnp.float32) / denom).reshape(b * n, 3)
    pol = polarity.reshape(b * n, 1)
    batch_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    vm = valid.reshape(b * n)
    return Graph(jnp.where(vm[:, None], pol, 0.0), posn, nbr_f, nbrm_f, vm,
                 batch_ids, doff.reshape(b * n, -1, 2))


def graph_static_config(cfg: Config) -> tuple:
    return (cfg.radius_px, cfg.delta_t_us, cfg.max_neighbors,
            cfg.max_queue_size, cfg.graph_lookback, cfg.model_width,
            cfg.model_height, cfg.time_window_us)


def dagr_extract_features(params: DAGRParams, state: DAGRState,
                          pos, polarity, valid, image,
                          bc: BackboneConfig, gsc: tuple, *,
                          img_net: str = "resnet50",
                          training: bool = False, ranks=None,
                          pool_tables=None, search_starts=None,
                          image_s2d=None):
    """Frozen-DAGR feature path (reference dagr.py:108-130): returns
    (out3, out4) graphs + new state. Gradients are stopped by the caller.

    ``search_starts``/``image_s2d``: optional host-staged inputs (per-chunk
    search bounds; space-to-depth bf16 image) — pure input reformatting the
    batcher does once per batch instead of the device doing it per step."""
    g0 = build_level0_graph(pos, polarity, valid, gsc, ranks,
                            starts=search_starts, chunk=bc.search_chunk)
    image_feats = None
    ncs = state.cnn
    if bc.use_image:
        feats, _, ncs = cnn_branch_forward(params.cnn, state.cnn, image,
                                           img_net, training=False,
                                           compute_dtype=bc.compute_dtype,
                                           image_s2d=image_s2d)
        image_feats = feats
    outs, nbs = backbone_forward(params.backbone, state.backbone, g0,
                                 image_feats, bc, training=training,
                                 pool_tables=pool_tables)
    return outs, DAGRState(nbs, ncs)


# ---------------------------------------------------------------------------
# the full anomaly model forward
# ---------------------------------------------------------------------------
def model_forward(params: ModelParams,
                  state: ModelState,
                  batch: Any,            # EventBatch of jnp arrays
                  bc: BackboneConfig,
                  mc: EventADConfig,
                  gsc: tuple,
                  *,
                  img_net: str = "resnet50",
                  training: bool = False,
                  rng: Optional[jax.Array] = None
                  ) -> Tuple[EventADOutputs, ModelState]:
    """One batch through the whole pipeline. DAGR runs frozen/eval-mode
    (reference EventAD.py:149-150,357-360)."""
    outs, nds = dagr_extract_features(
        params.dagr, state.dagr, batch.pos, batch.polarity, batch.valid,
        batch.image, bc, gsc, img_net=img_net, training=False,
        ranks=getattr(batch, "rank", None),
        pool_tables=getattr(batch, "pool_tables", None),
        search_starts=getattr(batch, "search_starts", None),
        image_s2d=getattr(batch, "image_s2d", None))
    out4 = outs[1]
    out4 = out4._replace(x=jax.lax.stop_gradient(out4.x))

    feats = extract_box_features(out4, batch.boxes, batch.box_present,
                                 bc.batch_size, bc.width, bc.height)
    # the trained recurrent head always runs f32 (bf16 is only the frozen
    # feature path's compute dtype)
    feats = jax.lax.stop_gradient(feats).astype(jnp.float32)

    denom = jnp.asarray([bc.width, bc.height, bc.width, bc.height],
                        jnp.float32)
    coords = batch.boxes[:, 1] / denom
    out = eventad_forward(params.head, mc, feats, coords,
                          batch.box_present[:, 1], batch.box_labels,
                          training=training, rng=rng)
    return out, ModelState(nds)
