"""Edge cases: empty boxes, empty events, span bound at default geometry."""
import numpy as np
import jax
import jax.numpy as jnp

from eventad_tpu.config import Config
from eventad_tpu.data.batching import EventBatch
from eventad_tpu.data.synthetic import make_synthetic_batch
from eventad_tpu.models.dagr import (graph_static_config, init_model,
                                     model_forward)
from eventad_tpu.ops.pooling import pool_graph


def _cfg():
    return Config(batch_size=2, width=96, height=72, scale=1,
                  use_image=False, event_buckets=(1024,), graph_lookback=256)


def test_no_boxes_zero_loss():
    cfg = _cfg()
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    gsc = graph_static_config(cfg)
    b = make_synthetic_batch(cfg, events_per_item=1024, boxes_per_item=0)
    out, _ = model_forward(params, state, jax.tree.map(jnp.asarray, b), bc,
                           mc, gsc, img_net=cfg.img_net, training=False)
    assert float(out.loss) == 0.0
    assert int(out.n_valid) == 0
    assert bool(jnp.isfinite(out.logits).all())


def test_empty_events_forward():
    """All-padding event windows must not produce NaNs (the reference skips
    such batches; we must at least stay finite)."""
    cfg = _cfg()
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    gsc = graph_static_config(cfg)
    b = make_synthetic_batch(cfg, events_per_item=1024, boxes_per_item=2)
    b = b._replace(valid=np.zeros_like(b.valid))
    out, _ = model_forward(params, state, jax.tree.map(jnp.asarray, b), bc,
                           mc, gsc, img_net=cfg.img_net, training=False)
    assert bool(jnp.isfinite(out.loss))
    assert bool(jnp.isfinite(out.logits).all())


def test_pool_span_bound_default_geometry(rng):
    """At the default dagr-S geometry the 5x5 offset bitmap (span=2) must
    lose no edges: compare against span=3 on radius-graph-like data."""
    cfg = Config()   # 360x240, radius 4 px
    n = 600
    w, h = cfg.model_width, cfg.model_height
    x = rng.randint(0, w, n)
    y = rng.randint(0, h, n)
    pos = np.stack([x / w, y / h, rng.rand(n)], 1).astype(np.float32)
    nbr = np.zeros((n, 8), np.int32)
    mask = np.zeros((n, 8), bool)
    r = cfg.radius_px
    for i in range(n):
        near = np.where((np.abs(x - x[i]) <= r) & (np.abs(y - y[i]) <= r))[0]
        sel = near[:8]
        nbr[i, :len(sel)] = sel
        mask[i, :len(sel)] = True
    batch = np.zeros(n, np.int32)
    node_mask = np.ones(n, bool)
    outs = {}
    for span in (2, 3):
        g = pool_graph(jnp.asarray(rng.randn(n, 4).astype(np.float32)),
                       jnp.asarray(pos), jnp.asarray(nbr), jnp.asarray(mask),
                       jnp.asarray(node_mask), jnp.asarray(batch),
                       grid=cfg.grid_dims()[0], batch_size=1, width=w,
                       height=h, aggr="max", span=span)
        edges = set()
        gn, gm = np.asarray(g.nbr), np.asarray(g.nbr_mask)
        for d in range(gn.shape[0]):
            for s_ in gn[d][gm[d]]:
                edges.add((int(s_), d))
        outs[span] = edges
    assert outs[2] == outs[3], "span=2 bitmap drops edges at default geometry"
