#!/usr/bin/env python
"""Per-stage device timing of the batched inference pipeline.

Times each pipeline stage as its own jitted program (pipelined protocol:
enqueue N iterations, fetch the last output — the only honest sync through
the axon tunnel is a device->host fetch). Stage programs re-run everything
upstream of the stage, so per-stage cost = t(stage) - t(upstream prefix);
the table prints both cumulative and marginal times.

Usage: python tools/profile_stages.py [n_events] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from eventad_tpu.utils.jaxtools import setup_compilation_cache
setup_compilation_cache()
import jax.numpy as jnp
import numpy as np


def main():
    from eventad_tpu.config import Config
    from eventad_tpu.data.synthetic import make_synthetic_batch
    from eventad_tpu.models.dagr import (build_level0_graph,
                                         graph_static_config, init_model,
                                         model_forward)
    from eventad_tpu.models.backbone import backbone_forward
    from eventad_tpu.models.feature_extract import extract_box_features
    from eventad_tpu.models.resnet import cnn_branch_forward

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    cfg = Config(batch_size=6, use_image=True, event_buckets=(n_events,),
                 compute_dtype=dtype)
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    gsc = graph_static_config(cfg)
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, boxes_per_item=6))

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf).ravel()[0]

    def scalar(out):
        # benched programs must return (near-)scalars: fetching a large
        # array through the axon tunnel costs ms-per-MB and poisons timings
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(out) if hasattr(l, 'dtype')
                   and jnp.issubdtype(l.dtype, jnp.number))

    def bench(fn, *args):
        f = jax.jit(fn)
        fetch(f(*args))           # compile
        for _ in range(3):
            fetch(f(*args))
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        fetch(outs[-1])
        return (time.perf_counter() - t0) / iters * 1e3

    # ---- stage programs (each includes its upstream prefix) ----
    def g0_of(batch):
        return build_level0_graph(batch.pos, batch.polarity, batch.valid,
                                  gsc, batch.rank)

    def s_graph(batch):
        return scalar(g0_of(batch))

    def cnn_of(batch):
        feats, _, _ = cnn_branch_forward(params.dagr.cnn, state.dagr.cnn,
                                         batch.image, cfg.img_net,
                                         training=False,
                                         compute_dtype=bc.compute_dtype)
        return feats

    def s_cnn(batch):
        return scalar(cnn_of(batch))

    def s_backbone(batch):
        g0 = g0_of(batch)
        feats = cnn_of(batch)
        outs, _ = backbone_forward(params.dagr.backbone,
                                   state.dagr.backbone, g0, feats, bc,
                                   training=False)
        return scalar(outs[1].x) + scalar(outs[0].x)

    def s_to_level(batch, end_level):
        g0 = g0_of(batch)
        feats = cnn_of(batch)
        outs, _ = backbone_forward(params.dagr.backbone,
                                   state.dagr.backbone, g0, feats, bc,
                                   training=False, end_level=end_level)
        return scalar(outs[-1].x)

    def s_level0(batch):
        """graph + cnn + level-0 layer only (pyramid cut after layer 1),
        with the production-path options (fold/tap-range/fused)."""
        from eventad_tpu.models.backbone import (_act, apply_layer,
                                                 level0_attr_range)
        from eventad_tpu.models.graph import sample_image_features
        g = g0_of(batch)
        feats = cnn_of(batch)
        dtc = jnp.bfloat16 if bc.compute_dtype == "bfloat16" else jnp.float32
        g = g._replace(x=g.x.astype(dtc))
        f0 = sample_image_features(feats[0].astype(dtc), g.pos, g.batch,
                                   g.node_mask, bc.width, bc.height)
        rel = jnp.where(g.node_mask[:, None], g.pos[:, :2], 0.0)
        g = g._replace(x=jnp.concatenate([g.x, f0, rel.astype(dtc)],
                                         axis=1))
        g, _, _ = apply_layer(params.dagr.backbone.layers[0],
                              state.dagr.backbone.layers[0], g,
                              cart_max=bc.cart_max[0],
                              kernel_size=bc.kernel_size, aggr=bc.aggr,
                              activation=_act(bc.activation),
                              training=False, return_pos_nbr=True,
                              gather_lookback=bc.gather_lookback,
                              attr_range=level0_attr_range(bc),
                              self_slot0=True, width=bc.width,
                              height=bc.height)
        return scalar(g.x)

    def s_full(batch):
        out, _ = model_forward(params, state, batch, bc, mc, gsc,
                               img_net=cfg.img_net, training=False)
        return scalar(out.logits)

    import functools
    rows = [
        ("graph build (ranks precomputed)", s_graph),
        ("cnn branch (resnet50 + remaps)", s_cnn),
        ("level-0 layer (incl. graph+cnn)", s_level0),
        ("thru level-1 (incl. pool1)", functools.partial(s_to_level,
                                                         end_level=2)),
        ("thru level-2 (incl. pool2)", functools.partial(s_to_level,
                                                         end_level=3)),
        ("backbone out4 (incl. graph+cnn)", s_backbone),
        ("full model_forward", s_full),
    ]
    results = {}
    for name, fn in rows:
        ms = bench(fn, batch)
        results[name] = ms
        print(f"{name:40s} {ms:8.2f} ms")

    print("-" * 52)
    g_ms = results["graph build (ranks precomputed)"]
    c_ms = results["cnn branch (resnet50 + remaps)"]
    l0 = results["level-0 layer (incl. graph+cnn)"]
    l1 = results["thru level-1 (incl. pool1)"]
    l2 = results["thru level-2 (incl. pool2)"]
    bb = results["backbone out4 (incl. graph+cnn)"]
    full = results["full model_forward"]
    print(f"{'marginal level-0 layer':40s} {l0 - g_ms - c_ms:8.2f} ms")
    print(f"{'marginal pool1+level-1':40s} {l1 - l0:8.2f} ms")
    print(f"{'marginal pool2+level-2':40s} {l2 - l1:8.2f} ms")
    print(f"{'marginal levels 3-4':40s} {bb - l2:8.2f} ms")
    print(f"{'marginal head (boxes+gru)':40s} {full - bb:8.2f} ms")


if __name__ == "__main__":
    main()
