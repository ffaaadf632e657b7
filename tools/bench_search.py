#!/usr/bin/env python
"""Neighbour-search kernel micro-bench over destination-chunk tiles.

The per-chunk temporal loop bound is ``~rate*delta_t + chunk`` offsets, so a
smaller destination tile does strictly less VPU work per destination — at
the cost of a W/chunk-times larger window expansion in HBM.  This measures
the end-to-end search (window build + kernel + decode) at the batch
benchmark's operating point for several tiles.

Usage: python tools/bench_search.py [n_events] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    import jax
    from eventad_tpu.utils.jaxtools import setup_compilation_cache
    setup_compilation_cache()
    import jax.numpy as jnp
    from eventad_tpu.config import Config
    from eventad_tpu.data.synthetic import make_synthetic_batch
    from eventad_tpu.ops.event_graph_pallas import build_graph_pallas

    cfg = Config(batch_size=b, event_buckets=(n,), use_image=False)
    batch = make_synthetic_batch(cfg, boxes_per_item=2)
    pos = jnp.asarray(batch.pos)
    valid = jnp.asarray(batch.valid)
    ranks = jnp.asarray(batch.rank)
    kw = dict(radius=cfg.radius_px, delta_t_us=cfg.delta_t_us,
              max_neighbors=cfg.max_neighbors,
              max_queue_size=cfg.max_queue_size,
              lookback=min(cfg.graph_lookback, n),
              grid_wh=(cfg.model_width, cfg.model_height))

    def sync(x):
        np.asarray(x).ravel()[0]

    ref = None
    for chunk in (128, 64, 32, 16):
        fn = jax.jit(lambda p, v, r, c=chunk: build_graph_pallas(
            p, v, r, chunk=c, **kw))
        nbr, mask, off = fn(pos, valid, ranks)
        sync(mask.sum())
        if ref is None:
            ref = (np.asarray(nbr), np.asarray(mask))
        else:
            assert (np.asarray(mask) == ref[1]).all(), chunk
            assert (np.where(ref[1], np.asarray(nbr), 0)
                    == np.where(ref[1], ref[0], 0)).all(), chunk
        # profiler-based device time (tunnel-proof); reduce the fetched
        # output to a scalar inside jit so the fetch is tiny
        red = jax.jit(lambda p, v, r, c=chunk: build_graph_pallas(
            p, v, r, chunk=c, **kw)[1].sum())
        sync(red(pos, valid, ranks))
        from eventad_tpu.utils.jaxtools import trace_device_ms
        try:
            dev = trace_device_ms(lambda: sync(red(pos, valid, ranks)),
                                  iters=6,
                                  trace_dir=f"/tmp/ev_trace_search{chunk}")
        except Exception as e:
            print(f"chunk={chunk:4d}: trace failed ({e})", flush=True)
            continue
        dev_s = "    n/a" if dev is None else f"{dev:7.3f}"
        print(f"chunk={chunk:4d}: device {dev_s} ms", flush=True)


if __name__ == "__main__":
    main()
